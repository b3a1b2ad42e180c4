package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at warehouse scale.
  *
  * AQE's skew-join handling covers sort-merge joins after the fact;
  * these helpers are for declaring the mitigation up front when the
  * hot keys are known or the aggregation itself is the skew point:
  *
  *  - [[saltedCount]]: two-phase aggregation — partial agg on
  *    (key, salt), final agg on key. The hot key's rows spread over
  *    `salts` reducers instead of one straggler.
  *  - [[saltedJoin]]: replicate the (small) build side `salts` times,
  *    salt the probe side randomly-but-deterministically, join on
  *    (key, salt). The hot key's probe rows fan across `salts` tasks.
  *
  * Both are result-identical to their unsalted forms (proven in
  * SkewSpec).
  */
object Skew {

  /** Deterministic salt derived from row content — stable across
    * retries (a random salt would break task re-execution). */
  private def salt(c: Column, salts: Int): Column =
    pmod(hash(c), lit(salts))

  /** Two-phase (salted) count+sum aggregation on a possibly-skewed key.
    * The salt hashes the whole row, so a hot key's rows spread across
    * reducers while identical rows still combine map-side. */
  def saltedCount(df: DataFrame, key: String, valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(struct(df.columns.map(col): _*), salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))

  /** Salted equi-join: `big` (skewed probe) ⋈ `small` (build). The
    * build side is exploded `salts` ways; each probe row picks one
    * replica. Use when the build side is small enough to replicate but
    * too big (or too dynamic) to broadcast. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
    salts: Int = 16): DataFrame = {
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    // Salt from the FULL probe row, not the key: hash(key) is constant
    // per key value, which would send every row of the hot key to the
    // same (key, salt) reducer and mitigate nothing. Full-row content
    // varies within the hot key, so its rows fan across `salts` tasks,
    // and it stays deterministic under task retry.
    val salted = big.withColumn("__salt",
      salt(struct(big.columns.map(col): _*), salts))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
