package graft

import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("q26 plans through the custom AsOfJoinExec") {
    val p = ops.Relational.q26(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(1500)) // nodeName strips "Exec"
  }

  test("custom as-of join equals the union+window formulation (q21)") {
    val custom = ops.Relational.q26(spark, sf).collect().map(_.toString).sorted
    val window = ops.Relational.q21(spark, sf).collect().map(_.toString).sorted
    assert(custom.sameElements(window))
  }

  test("as-of picks the latest right row at or before each left time") {
    val left = Seq((1L, 100L), (1L, 200L), (2L, 150L), (3L, 50L))
      .toDF("k", "t")
    val right = Seq((1L, 90L, "a"), (1L, 100L, "b"), (1L, 150L, "c"),
      (2L, 149L, "d"), (3L, 60L, "e"))
      .toDF("rk", "rt", "v")
    val got = plans.AsOf.join(left, right, "k", "rk", "t", "rt")
      .select("k", "t", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // k=1,t=100 → "b" (rt=100 inclusive); k=1,t=200 → "c"; k=2 → "d";
    // k=3,t=50 → no right row at/before 50 → dropped (inner)
    assert(got == Set((1L, 100L, "b"), (1L, 200L, "c"), (2L, 150L, "d")))
  }

  test("unsupported key/time types are rejected with a clear error") {
    val df = Seq(("x", 1L)).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      plans.AsOf.join(df, df.select(col("k").as("rk"), col("t").as("rt")),
        "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("left-outer as-of keeps unmatched left rows with nulls") {
    val left = Seq((1L, 100L), (3L, 50L)).toDF("k", "t")
    val right = Seq((1L, 90L, "a"), (3L, 60L, "e")).toDF("rk", "rt", "v")
    val got = plans.AsOf.join(left, right, "k", "rk", "t", "rt", "left_outer")
      .select("k", "t", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set((1L, 100L, Some("a")), (3L, 50L, None)))
  }

  test("int and timestamp keys ride the order-preserving long helpers") {
    val left = Seq((1, "2024-01-01 10:00:00"), (2, "2024-01-01 09:00:00"))
      .toDF("k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((1, "2024-01-01 09:59:59", "hit"),
      (2, "2024-01-01 09:30:00", "late")) // after left's 09:00 → no match
      .toDF("rk", "rt", "v").withColumn("rt", col("rt").cast("timestamp"))
    val got = plans.AsOf.join(left, right, "k", "rk", "t", "rt", "left")
      .select("k", "v").collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    assert(got == Set((1, Some("hit")), (2, None)))
    // helper columns must not leak into the joined schema
    val cols = plans.AsOf.join(left, right, "k", "rk", "t", "rt", "left").columns
    assert(!cols.exists(_.startsWith("__asof")))
  }

  test("q43 plans through the custom AsOfJoinExec") {
    val p = ops.Relational.q43(spark, sf).queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(1500))
  }

  test("rightTiebreak pins the pick among equal (key, time) right rows") {
    // two right rows with IDENTICAL (key, time): without a tiebreak the
    // winner follows partition sort order (arbitrary); with one, the
    // greatest tiebreak value wins — run-to-run deterministic
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 90L, 7L, "low"), (1L, 90L, 9L, "high"))
      .toDF("rk", "rt", "id", "v")
    val got = plans.AsOf.join(left, right, "k", "rk", "t", "rt",
        rightTiebreak = Some("id"))
      .select("v").collect().map(_.getString(0)).toSeq
    assert(got == Seq("high"), got.toString)
    // forward direction: same rule among AT-OR-AFTER ties (the right
    // rows must sit at/after the left time to qualify at all)
    val rightAfter = Seq((1L, 110L, 7L, "low"), (1L, 110L, 9L, "high"))
      .toDF("rk", "rt", "id", "v")
    val fwd = plans.AsOf.join(left, rightAfter, "k", "rk", "t", "rt",
        direction = "forward", rightTiebreak = Some("id"))
    assert(fwd.select("v").collect().map(_.getString(0)).toSeq == Seq("high"))
  }

  test("forward as-of picks the earliest right row at-or-after") {
    val left = Seq((1L, 100L), (2L, 50L)).toDF("k", "t")
    val right = Seq((1L, 99L, "before"), (1L, 101L, "first_after"),
      (1L, 150L, "later"), (2L, 50L, "exact")).toDF("rk", "rt", "v")
    val got = plans.AsOf.join(left, right, "k", "rk", "t", "rt",
        direction = "forward")
      .select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "first_after"), (2L, "exact")), got.toString)
  }
}
