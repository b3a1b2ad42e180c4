package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Implicit-feedback rating matrix — the engine's equivalent of the
  * reference's ratings file (user, item, rating).
  *
  * user = o_custkey, item = l_partkey, rating = total ordered quantity.
  * One shuffle: orders⋈lineitem on the orderkey (both sides naturally
  * keyed on it — bucketable at warehouse scale), then a partial-agg
  * groupBy on (user, item). Quantities are integer-valued so the
  * double `rating` is exact (safe for the DuckDB oracle).
  */
object Ratings {

  def implicitRatings(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val l = Tables.lineitem(s, d).select("l_orderkey", "l_partkey", "l_quantity")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("rating"),
        count(lit(1)).as("n_lines"))
  }

  /** Same construction in the oracle dialect (used as a CTE). */
  val sqlRatings: String =
    """SELECT o_custkey AS user_id, l_partkey AS item_id,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS rating,
      |  count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2""".stripMargin

  /** Distinct (order, item) pairs — basis for co-occurrence counts. */
  def orderItems(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select("l_orderkey", "l_partkey").distinct()

  val sqlOrderItems: String =
    "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"
}
