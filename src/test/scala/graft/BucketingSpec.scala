package graft

import org.apache.spark.sql.functions._

/** Bucketing: the warehouse-scale answer to repeated fact⋈fact joins.
  * Writing both sides bucketed by the join key lets every subsequent
  * join run with ZERO exchanges — at 100 TB that's the difference
  * between an all-cluster shuffle and a local merge per bucket. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val l = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")

    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      val ob = spark.table("orders_b")
      val lb = spark.table("lineitem_b")
      val joined = lb.join(ob, lb("l_orderkey") === ob("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      // and it is still correct
      assert(joined.count() ==
        l.join(o, l("l_orderkey") === o("o_orderkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
