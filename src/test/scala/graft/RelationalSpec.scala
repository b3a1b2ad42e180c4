package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  // Every relational query must at least plan + execute on sf0.001.
  ops.Relational.queries.foreach { case (name, fn) =>
    test(s"$name executes") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q01 aggregates exactly (decimal path)") {
    val rows = ops.Relational.q01(spark, sf).collect()
    assert(rows.length == 6) // 3 returnflags × 2 linestatus
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val liCount = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1999-12-31")).count()
    assert(total == liCount)
  }

  test("q03 returns exactly 10 descending revenues") {
    val rows = ops.Relational.q03(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q09 emits at most 3 rows per supplier, ranked") {
    val rows = ops.Relational.q09(spark, sf).collect()
    val bySupp = rows.groupBy(_.getAs[Long]("l_suppkey"))
    assert(bySupp.values.forall(_.length <= 3))
    assert(rows.forall(_.getAs[Int]("rn") <= 3))
  }

  test("q13 rollup contains the grand-total row") {
    val rows = ops.Relational.q13(spark, sf).collect()
    val all = rows.filter(r => r.getAs[String]("nation") == "ALL")
    assert(all.length == 1)
    assert(all.head.getAs[Long]("n_customers") ==
      Tables.customer(spark, sf).count())
  }

  test("q21 as-of join: every matched click precedes its purchase") {
    val rows = ops.Relational.q21(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("click_us") <= r.getAs[Long]("purchase_us")))
  }

  test("q22 range join keeps every purchase (left) with n>=0") {
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    val rows = ops.Relational.q22(spark, sf).collect()
    assert(rows.length == purchases)
    assert(rows.forall(_.getAs[Long]("n_clicks_1h") >= 0))
  }
}
