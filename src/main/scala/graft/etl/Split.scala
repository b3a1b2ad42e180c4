package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Deterministic train/test splitting — a first-class pipeline step
  * (the reference treats splitting as one; r08/r12/r14 all reuse it).
  *
  * Membership is content-addressed: md5-56 of the '_'-joined key
  * columns, `% mod == 0` → test. That makes the split (a) identical in
  * the DuckDB oracle, (b) stable across engines, partitionings, reruns
  * and retries — the property a 100 TB pipeline needs so that a
  * re-materialized split never leaks train rows into test — and
  * (c) disjoint by construction for any row with the same keys.
  */
object Split {

  /** Tag rows with `is_test`: hash(keys) % mod == 0 (≈ 1/mod held out). */
  def tagTest(df: DataFrame, keys: Seq[String], mod: Int = 5): DataFrame =
    df.withColumn("is_test", Hashing.hash56(keyExpr(keys.map(col))) % mod === 0)

  private def keyExpr(keys: Seq[Column]): Column =
    concat_ws("_", keys.map(_.cast("string")): _*)

  /** The identical predicate in the oracle dialect. */
  def sqlIsTest(keys: Seq[String], mod: Int = 5): String = {
    val joined = keys.map(k => s"$k::VARCHAR").mkString(" || '_' || ")
    s"${Hashing.sqlHash56(joined)} % $mod = 0"
  }
}
