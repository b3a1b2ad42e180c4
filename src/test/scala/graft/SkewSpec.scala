package graft

import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation equals the unsalted result") {
    val li = Tables.lineitem(spark, sf)
    val salted = ops.Skew.saltedCount(li, "l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (n, t)) =>
      assert(salted(k)._1 == n)
      assert(math.abs(salted(k)._2 - t) < 1e-6)
    }
  }

  test("salted join equals the plain join") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val saltedN = ops.Skew.saltedJoin(o, c, "o_custkey").count()
    val plainN = o.join(c, Seq("o_custkey")).count()
    assert(saltedN == plainN)
    // spot-check content equality on a sample key
    val k = o.limit(1).collect()(0).getAs[Long]("o_custkey")
    val a = ops.Skew.saltedJoin(o, c, "o_custkey")
      .filter(col("o_custkey") === k).collect().map(_.toString).sorted
    val b = o.join(c, Seq("o_custkey"))
      .filter(col("o_custkey") === k).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // One hot key holding ~83% of the probe side: the skewed shuffle
    // partition must be split by OptimizeSkewedJoin (skew=true in the
    // final adaptive plan), not serialized through one straggler task.
    // Thresholds are lowered so the toy volume triggers the same code
    // path a multi-GB hot partition does on a cluster.
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val big = spark.range(0, 300000).select(
        when(col("id") < 250000, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(0, 5000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = big.join(dim, "k")
      // execute THIS QueryExecution (a .count() would build another
      // one and leave this adaptive plan un-finalized)
      val n = joined.queryExecution.toRdd.count()
      assert(n > 0)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), "AQE did not split the skewed join:\n" + p.take(3000))
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("SimplifySelfCosine folds cosine_sim(x, x) out of the plan") {
    val s0 = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // non-constant input: only the injected rule can fold this (and
      // unlike the evaluated loop it is exactly 1.0, not 0.99999...98)
      val df = s2.sql(
        """SELECT cosine_sim(v, v) AS c
          |FROM (SELECT array(CAST(id AS DOUBLE), 2.0d) AS v FROM range(5))""".stripMargin)
      assert(!df.queryExecution.optimizedPlan.toString.contains("cosine_sim"),
        "rule did not fold the self-cosine")
      assert(df.collect().forall(_.getDouble(0) == 1.0))
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(s0)
      org.apache.spark.sql.SparkSession.setDefaultSession(s0)
    }
  }

  test("extensions-built session exposes cosine_sim in SQL") {
    val s0 = spark // ensure shared context exists
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val v = s2.sql("SELECT cosine_sim(array(1.0d,2.0d), array(1.0d,2.0d)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
      // the full native-kernel surface is SQL-callable
      val r = s2.sql(
        """SELECT md5_prefix56('a') AS h56, md5_prefix48('a') AS h48,
          |  minhash_sig(array(md5_prefix56('a'), md5_prefix56('b')), 4) AS mh,
          |  simhash_sig(array(md5_prefix48('a'), md5_prefix48('b'))) AS sh
          |""".stripMargin).collect()(0)
      assert(r.getLong(0) > 0 && r.getLong(1) > 0)
      assert(r.getSeq[Long](2).size == 4)
      assert(r.getLong(3) >= 0)
      // nfc_normalize: decomposed e + combining acute → precomposed é
      val n = s2.sql("SELECT nfc_normalize('cafe\u0301') AS s")
        .collect()(0).getString(0)
      assert(n == "caf\u00e9", n)
      // bitmap aggregates: distinct of {1,2,3} via per-group bitmaps
      val bc = s2.sql(
        """SELECT bitset_merge_count(bm) AS n FROM (
          |  SELECT g, bitset_agg(id, 64) AS bm FROM VALUES
          |    (0, 1L), (0, 2L), (1, 3L), (1, 2L) AS t(g, id)
          |  GROUP BY g)""".stripMargin).collect()(0).getLong(0)
      assert(bc == 3L, s"bitmap distinct: $bc")
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(s0)
      org.apache.spark.sql.SparkSession.setDefaultSession(s0)
    }
  }
}
