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

  test("q29 hash sample is deterministic and near the target fraction") {
    val a = ops.Relational.q29(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = ops.Relational.q29(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "content-hash sample must be exactly reproducible")
    // seeded Bernoulli sampling (the built-in scale path) is also
    // deterministic for a fixed seed + partitioning
    val s1 = Tables.lineitem(spark, sf).sample(false, 0.1, 42L).count()
    val s2 = Tables.lineitem(spark, sf).sample(false, 0.1, 42L).count()
    assert(s1 == s2, "seeded .sample must be stable for a fixed partitioning")
    val totals = Tables.lineitem(spark, sf).groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { case (k, n) =>
      val frac = n.toDouble / totals(k)
      assert(frac > 0.05 && frac < 0.15, s"$k sampled at $frac")
    }
  }

  test("stratified sampling (sampleBy) respects per-stratum fractions") {
    val li = Tables.lineitem(spark, sf)
    val sampled = li.stat.sampleBy("l_returnflag",
      Map("A" -> 0.05, "N" -> 0.2, "R" -> 0.1), 42L)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def frac(k: String) = sampled(k).toDouble / totals(k)
    assert(frac("A") < frac("R") && frac("R") < frac("N"))
    assert(math.abs(frac("N") - 0.2) < 0.07)
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

  test("q47 baskets are sorted, delimited, and sized to the group") {
    val rows = ops.Relational.q47(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val parts = r.getAs[String]("basket").split(",")
      assert(parts.length == r.getAs[Long]("n_items"))
      assert(parts.sameElements(parts.sorted), "basket not in sorted order")
    }
  }

  test("q48 SCD2 join versions facts by time, not by today's dim row") {
    val rows = ops.Relational.q48(spark, sf).collect()
    val migratedYears = rows.filter(_.getAs[String]("segment") == "MIGRATED")
      .map(_.getAs[Int]("o_year"))
    // the migrated segment exists, and only after its valid_from year
    assert(migratedYears.nonEmpty, "no order ever saw the v2 dim row")
    assert(migratedYears.forall(_ >= 1996), "v2 leaked before its validity")
    // pre-migration years still carry original segments for migrated
    // customers: at least one pre-1996 year has no MIGRATED at all
    assert(rows.filter(_.getAs[Int]("o_year") < 1996)
      .forall(_.getAs[String]("segment") != "MIGRATED"))
  }

  test("q49 flags exactly the planted anomalies, no false positives") {
    val flagged = ops.Relational.q49(spark, sf).collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    val planted = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 500 === 0)
      .collect().map(_.getAs[Long]("o_orderkey")).toSet
    assert(planted.nonEmpty, "no planted anomalies at this scale")
    // every flag is a planted anomaly — zero false positives even
    // with the contamination-inflated sigma
    assert(flagged.subsetOf(planted),
      s"false positives: ${(flagged -- planted).take(5)}")
    // and the screen catches real mass (z-score MASKING is a known
    // limit: a small x10 can hide behind a larger one in the same
    // segment, so exact equality is NOT the contract)
    assert(flagged.nonEmpty, "screen caught nothing")
  }

  test("q56: subtree masses recompute from the raw prefix relation") {
    val rows = ops.Relational.q56(spark, sf).collect()
    assert(rows.length == 50)
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice").cast("decimal(12,2)"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
    rows.take(10).foreach { r =>
      val node = r.getAs[Long]("node")
      // descendants of `node` = parts whose decimal-prefix chain hits it
      val desc = parts.filter { case (p, _) =>
        Iterator.iterate(p)(_ / 10).takeWhile(_ > 0).contains(node)
      }
      assert(r.getAs[Long]("n_desc") == desc.length.toLong,
        s"node $node: descendant count mismatch")
      val mass = desc.map(_._2.unscaledValue.longValue).sum
      assert(math.round(r.getAs[Double]("subtree_price") * 100) == mass,
        s"node $node: subtree mass mismatch")
      assert(r.getAs[Boolean]("is_leaf") == (desc.length == 1))
    }
    // internal consistency: a parent's subtree strictly exceeds any child's
    val byNode = rows.map(r => r.getAs[Long]("node") -> r.getAs[Double]("subtree_price")).toMap
    byNode.foreach { case (n, m) =>
      byNode.get(n / 10).foreach(pm => assert(pm > m, s"parent of $n lighter than child"))
    }
  }

  test("q57: bucketed interval join matches a direct driver-side inequality join") {
    val rows = ops.Relational.q57(spark, sf).collect()
    assert(rows.nonEmpty)
    val W = 1800000000L
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    val expect = byUser.flatMap { case (u, g) =>
      val as = g.filter(_._2 == "purchase").map(e => (e._3 - W, e._3))
      val bs = g.filter(_._2 == "error").map(e => (e._3, e._3 + W))
      val pairs = for (a <- as; b <- bs if a._1 < b._2 && b._1 < a._2)
        yield math.min(a._2, b._2) - math.max(a._1, b._1)
      if (pairs.isEmpty) None else Some(u -> (pairs.length.toLong, pairs.sum))
    }
    assert(rows.length == expect.size)
    rows.foreach { r =>
      val (n, ov) = expect(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("n_pairs") == n && r.getAs[Long]("sum_ov_us") == ov,
        s"user ${r.getAs[Long]("user_id")} drifted from the direct join")
    }
  }

  test("q55: bootstrap CI brackets the point estimate with real width") {
    val r = ops.Relational.q55(spark, sf).collect().head
    val (p, lo, hi) = (r.getAs[Double]("point"), r.getAs[Double]("ci_lo"),
      r.getAs[Double]("ci_hi"))
    assert(r.getAs[Long]("n_replicates") == 40L)
    assert(lo < hi, "degenerate interval")
    assert(p >= lo && p <= hi, s"point $p outside [$lo, $hi]")
  }

  test("q53 MAD screen: zero false positives, every out-of-range plant caught") {
    val flagged = ops.Relational.q53(spark, sf).collect()
      .map(_.getAs[Long]("o_orderkey")).toSet
    val orders = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("seg"),
        col("o_totalprice").cast("double").as("p")).collect()
    val planted = orders.filter(_.getAs[Long]("o_orderkey") % 500 == 0)
    assert(planted.nonEmpty, "no planted anomalies at this scale")
    // zero false positives: median/MAD have a 50% breakdown point, so
    // the plants cannot inflate the scale estimate the way they
    // inflate q49's std
    assert(flagged.subsetOf(planted.map(_.getAs[Long]("o_orderkey")).toSet),
      s"false positives: ${(flagged -- planted.map(_.getAs[Long]("o_orderkey"))).take(5)}")
    // robustness-to-masking: a plant whose ×10 value exceeds its
    // segment's natural max CANNOT hide behind other plants (q49's
    // documented failure mode) — all such plants must be flagged.
    // (A plant whose ×10 value lands inside the natural range is
    // legitimately invisible to any outlier screen.)
    val natMax = orders.filter(_.getAs[Long]("o_orderkey") % 500 != 0)
      .groupBy(_.getAs[String]("seg"))
      .map { case (s2, rs) => s2 -> rs.map(_.getAs[Double]("p")).max }
    val mustCatch = planted.filter(r =>
      r.getAs[Double]("p") * 10 > natMax(r.getAs[String]("seg")))
      .map(_.getAs[Long]("o_orderkey")).toSet
    assert(mustCatch.nonEmpty, "no out-of-range plants at this scale")
    assert(mustCatch.subsetOf(flagged),
      s"masked plants missed: ${(mustCatch -- flagged).take(5)}")
  }

  test("q46 gap fill densifies the timeline and carries values forward") {
    val rows = ops.Relational.q46(spark, sf).collect()
    assert(rows.nonEmpty)
    // the gate would pass vacuously on a dense timeline — there must
    // BE holes, and each filled row must carry the last actual value
    assert(rows.exists(_.getAs[Boolean]("is_filled")),
      "no gaps filled: densification untested")
    rows.groupBy(_.getAs[String]("prio")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[java.sql.Date]("day").getTime)
      assert(!sorted.head.getAs[Boolean]("is_filled"),
        "spine starts before the group's first actual")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[java.sql.Date]("day").toLocalDate ==
            a.getAs[java.sql.Date]("day").toLocalDate.plusDays(1),
            "timeline not dense")
          if (b.getAs[Boolean]("is_filled"))
            assert(b.getAs[Double]("rev_filled") == a.getAs[Double]("rev_filled"),
              "filled row does not carry the previous value")
        case _ => ()
      }
    }
  }

  test("q51: islands partition coverage — bounds hold and merging is real") {
    import org.apache.spark.sql.functions._
    val rows = ops.Relational.q51(spark, sf).collect()
    assert(rows.nonEmpty)
    val perUserEvents = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val (u, n, cov, longest) = (r.getAs[Long]("user_id"),
        r.getAs[Long]("n_islands"), r.getAs[Long]("covered_us"),
        r.getAs[Long]("longest_us"))
      val span = 600000000L
      // each island covers at least one interval; coverage is bounded
      // by (events × span) above and (islands × span) below
      assert(cov >= n * span, s"user $u: island shorter than one interval")
      assert(cov <= perUserEvents(u) * span, s"user $u: coverage over-counts")
      assert(longest >= span && longest <= cov)
      assert(n <= perUserEvents(u))
    }
    // merging is non-vacuous: someone has fewer islands than events
    assert(rows.exists(r => r.getAs[Long]("n_islands") <
      perUserEvents(r.getAs[Long]("user_id"))),
      "no overlapping intervals merged — span too small for the corpus")
  }

  test("q50: trailing-7d actives dominate the daily actives and dedup users") {
    import org.apache.spark.sql.functions._
    val weekly = ops.Relational.q50(spark, sf).collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("n_active_7d")).toMap
    val daily = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy("day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("n")).toMap
    assert(weekly.nonEmpty && weekly.keySet == daily.keySet)
    val allUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    daily.foreach { case (day, n) =>
      assert(weekly(day) >= n, s"$day: 7d actives below daily actives")
      assert(weekly(day) <= allUsers, s"$day: distinct count exceeds universe")
    }
  }

  test("q52: the weighted median satisfies the exact characterization") {
    val med = ops.Relational.q52(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("w_median"), r.getAs[Long]("total_weight"))).toMap
    assert(med.nonEmpty)
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"),
        col("l_quantity").cast("long")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    med.foreach { case (flag, (m, tw)) =>
      val grp = rows.filter(_._1 == flag)
      assert(grp.map(_._3).sum == tw)
      val below = grp.filter(_._2 < m).map(_._3).sum
      val atOrBelow = grp.filter(_._2 <= m).map(_._3).sum
      assert(below * 2 < tw, s"$flag: weight below median reaches half")
      assert(atOrBelow * 2 >= tw, s"$flag: median does not cover half the weight")
    }
  }

  test("q58: sketch union is LOSSLESS reaggregation and estimates sit inside the bound") {
    val rows = ops.Relational.q58(spark, sf).collect()
    assert(rows.length >= 2)
    assert(rows.forall(_.getAs[Boolean]("est_ok")), "an estimate broke the 5% bound")
    // the reaggregability identity the op exists for: unioning the
    // nation-level sketches must give the IDENTICAL estimate as one
    // direct global sketch at the same lgK (HLL union is register-max —
    // lossless at equal lgK)
    val facts = Tables.orders(spark, sf).select("o_custkey")
      .join(Tables.customer(spark, sf).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nation"), col("c_custkey").as("cust"))
    val direct = facts.agg(
      hll_sketch_estimate(hll_sketch_agg(col("cust"), lit(12))).as("est"))
      .collect().head.getAs[Long]("est")
    val merged = facts.groupBy("nation")
      .agg(hll_sketch_agg(col("cust"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getAs[Long]("est")
    assert(direct == merged,
      s"sketch union is not lossless: direct $direct vs merged $merged")
    // non-vacuity: the global row aggregates more than any single region
    val global = rows.find(_.getAs[Long]("region") == -1L).get.getAs[Long]("n_exact")
    rows.filter(_.getAs[Long]("region") >= 0L).foreach { r =>
      assert(r.getAs[Long]("n_exact") < global)
    }
  }

  test("q59: chi-square statistic replays from the raw contingency table") {
    val r = ops.Relational.q59(spark, sf).collect().head
    // the 15.507 significance constant is chi2(0.05, dof=8) — the dof
    // the data must actually have for the verdict column to mean
    // anything; a schema/data change that alters the card must fail here
    assert(r.getAs[Long]("dof") == 8L, "dof drifted; signif constant invalid")
    val chi2 = r.getAs[Double]("chi2")
    val v = r.getAs[Double]("cramers_v")
    assert(chi2 >= 0.0 && v >= 0.0 && v <= 1.0)
    // driver-side replay from the raw cells (independent arithmetic
    // path: no grid completion, no decimal staging)
    val cells = Tables.orders(spark, sf)
      .groupBy("o_orderpriority", "o_orderstatus").count()
      .collect().map(x => ((x.getString(0), x.getString(1)), x.getLong(2))).toMap
    val pris = cells.keys.map(_._1).toSeq.distinct
    val sts = cells.keys.map(_._2).toSeq.distinct
    val n = cells.values.sum.toDouble
    val replay = (for { p <- pris; s0 <- sts } yield {
      val o = cells.getOrElse((p, s0), 0L).toDouble
      val rt = cells.collect { case ((pp, _), c) if pp == p => c }.sum.toDouble
      val ct = cells.collect { case ((_, ss), c) if ss == s0 => c }.sum.toDouble
      val e = rt * ct / n
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(chi2 - replay) < 1e-3,
      s"chi2 $chi2 diverges from raw replay $replay")
    assert(r.getAs[Long]("n") == n.toLong)
  }

  test("q68: equi-depth buckets conserve mass, nest, and balance within ties") {
    val rows = ops.Relational.q68(spark, sf).collect()
      .sortBy(_.getAs[Long]("bucket"))
    assert(rows.length == 16)
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == n, "mass not conserved")
    rows.foreach { r =>
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
      assert(r.getAs[Long]("n") > 0)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_cents") == b.getAs[Long]("lo_cents"),
        "buckets not contiguous")
      case _ => ()
    }
    // near-distinct values ⇒ depths within 1 of each other (the
    // whole point of equi-depth; ties would loosen this, prices are
    // 2dp-distinct enough here)
    val depths = rows.map(_.getAs[Long]("n"))
    assert(depths.max - depths.min <= 2,
      s"buckets unbalanced: ${depths.mkString(",")}")
    // boundary replay: rank selection over the sorted raw values
    val sorted = Tables.orders(spark, sf)
      .select((col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long")).collect().map(_.getLong(0)).sorted
    (1 to 16).foreach { k =>
      val rank = math.ceil(sorted.length.toDouble * k / 16).toInt
      assert(rows(k - 1).getAs[Long]("hi_cents") == sorted(rank - 1),
        s"boundary $k is not the rank-$rank order statistic")
    }
  }

  test("q67: the recursion really runs through UnionLoop and replays " +
    "driver-side") {
    val df = ops.Relational.q67(spark, sf)
    val rows = df.collect().sortBy(_.getAs[Int]("depth"))
    assert(rows.nonEmpty)
    // the closure replays from the raw key set in plain Scala
    val keys = Tables.part(spark, sf).select("p_partkey").collect()
      .map(_.getLong(0))
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
    keys.foreach { k =>
      var (a, depth) = (k / 10, 1L)
      while (a > 0) {
        val (n, sn, sa) = expect.getOrElse(depth, (0L, 0L, 0L))
        expect(depth) = (n + 1, sn + k, sa + a)
        a /= 10; depth += 1
      }
    }
    rows.foreach { r =>
      val (n, sn, sa) = expect(r.getAs[Int]("depth").toLong)
      assert(r.getAs[Long]("n_paths") == n &&
        r.getAs[Long]("sum_node") == sn && r.getAs[Long]("sum_anc") == sa,
        s"closure mismatch at depth ${r.getAs[Int]("depth")}")
    }
    assert(rows.length == expect.size, "missing recursion depths")
    // the physical plan must actually recurse (Spark 4's UnionLoop),
    // not have been rewritten away — q56 is the manual flattening;
    // this op exists to exercise the native operator
    val analyzed = ops.Relational.q67(spark, sf)
    // localCheckpoint hides the original plan; re-state the recursion
    Tables.part(spark, sf).createOrReplaceTempView("graft_q67_part")
    try {
      val p = spark.sql(
        """WITH RECURSIVE anc(node, a, depth) AS (
          |  SELECT p_partkey, p_partkey div 10, 1 FROM graft_q67_part
          |  WHERE p_partkey div 10 > 0
          |  UNION ALL
          |  SELECT node, a div 10, depth + 1 FROM anc WHERE a div 10 > 0)
          |SELECT count(*) FROM anc""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("UnionLoop"), s"no UnionLoop in:\n${p.take(800)}")
    } finally spark.catalog.dropTempView("graft_q67_part")
  }

  test("q66: KS statistic replays driver-side and both verdict branches fire") {
    val rows = ops.Relational.q66(spark, sf).collect()
      .map(r => r.getAs[String]("test_name") -> r).toMap
    assert(rows("planted_shift").getAs[Boolean]("reject_h0"),
      "planted 10% reprice not detected")
    assert(!rows("parity_null").getAs[Boolean]("reject_h0"),
      "false positive on the identical-distribution split")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("d_ppm") == r.getAs[Long]("d_num") * 1000000L /
        (r.getAs[Long]("n1") * r.getAs[Long]("n2")))
    }
    // exact replay of the null case from raw prices
    val vals = Tables.orders(spark, sf)
      .select((col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long").as("v"), (col("o_orderkey") % 2).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n1 = vals.count(_._2 == 1L).toLong // grp1 = odd%2==1? grp=(k%2)+1
    val n2 = vals.length - n1
    var (c1, c2, best) = (0L, 0L, 0L)
    // value grain, not row grain: the CDF step lands AFTER all ties
    vals.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      c1 += g.count(_._2 == 1L); c2 += g.count(_._2 != 1L)
      best = math.max(best, math.abs(c1 * n2 - c2 * n1))
    }
    assert(best == rows("parity_null").getAs[Long]("d_num"),
      s"driver replay $best != gated ${rows("parity_null").getAs[Long]("d_num")}")
  }

  test("q69: sparse bitmap codec round-trips, converts at the threshold, " +
    "and OR equals set union") {
    import graft.functions.SparseBitmapCodec
    def bm(ids: Seq[Long]): SparseBitmapCodec.Chunks = {
      val c = SparseBitmapCodec.empty
      ids.foreach(SparseBitmapCodec.add(c, _))
      c
    }
    // sparse ids scattered over a huge domain — mostly-singleton chunks
    val a = (0 until 3000).map(i => i.toLong * 1000003L)
    val b = (0 until 3000).map(i => (i.toLong + 1500L) * 1000003L)
    assert(SparseBitmapCodec.cardinality(bm(a)) == a.distinct.size)
    // serialize → deserialize is identity on both cardinality and bytes
    val rt = SparseBitmapCodec.chunks(SparseBitmapCodec.bytes(bm(a)))
    assert(SparseBitmapCodec.bytes(rt).sameElements(
      SparseBitmapCodec.bytes(bm(a))))
    // OR = set union (fresh copies — or mutates its left argument)
    assert(SparseBitmapCodec.cardinality(
      SparseBitmapCodec.or(bm(a), bm(b))) == (a ++ b).distinct.size)
    // dense cluster inside ONE chunk crosses the array→bitmap
    // threshold and stays exact through the conversion + a merge
    val dense = (0L until 5000L)                      // one chunk, converts
    val densePlus = (2500L until 7000L)
    assert(SparseBitmapCodec.cardinality(bm(dense)) == 5000)
    assert(SparseBitmapCodec.cardinality(
      SparseBitmapCodec.or(bm(dense), bm(densePlus))) == 7000)
    val rtd = SparseBitmapCodec.chunks(SparseBitmapCodec.bytes(bm(dense)))
    assert(SparseBitmapCodec.cardinality(rtd) == 5000)
    // end-to-end through the aggregates on a user frame
    import graft.functions.SparseBitmapAgg.{sparseBitmap, sparseBitmapMergeCount}
    import spark.implicits._
    val df = (a.map(("g1", _)) ++ b.map(("g2", _))).toDF("g", "id")
    val merged = df.groupBy("g").agg(sparseBitmap(col("id")).as("bm"))
      .agg(sparseBitmapMergeCount(col("bm"))).collect()(0).getLong(0)
    assert(merged == (a ++ b).distinct.size,
      s"aggregate union $merged != ${(a ++ b).distinct.size}")
  }

  test("q64: bitmap codec round-trips and the OR-merge equals set union") {
    import graft.functions.BitsetCodec
    // deterministic id sets with overlap
    val a = (0 until 500).map(i => (i * 7L) % 1000L).toSet
    val b = (0 until 500).map(i => (i * 13L + 3L) % 1000L).toSet
    def bm(ids: Set[Long]): Array[Long] = {
      val w = new Array[Long](16)
      ids.foreach(id => w((id >> 6).toInt) |= 1L << (id & 63))
      w
    }
    // codec roundtrip is identity
    assert(BitsetCodec.words(BitsetCodec.bytes(bm(a))).sameElements(bm(a)))
    // popcount = cardinality; OR = union (on fresh copies — or mutates)
    assert(BitsetCodec.popcount(bm(a)) == a.size)
    assert(BitsetCodec.popcount(BitsetCodec.or(bm(a), bm(b))) ==
      (a ++ b).size)
    // end-to-end through the aggregates: per-group bitmaps, then the
    // merge-count over them equals the plain distinct count
    import graft.functions.BitsetAgg.{bitset, bitsetMergeCount}
    import spark.implicits._
    val df = (a.toSeq.map(("g1", _)) ++ b.toSeq.map(("g2", _)))
      .toDF("g", "id")
    val merged = df.groupBy("g").agg(bitset(col("id"), 1024).as("bm"))
      .agg(bitsetMergeCount(col("bm"))).collect()(0).getLong(0)
    assert(merged == (a ++ b).size,
      s"aggregate union $merged != ${(a ++ b).size}")
  }

  test("q63: V-matches are well-formed, non-overlapping, and replay from " +
    "one nation's raw series") {
    val vs = ops.Relational.q63(spark, sf).collect()
    assert(vs.nonEmpty, "no V patterns found — the series never dips?")
    vs.foreach { v =>
      assert(v.getAs[String]("peak_month") < v.getAs[String]("bottom_month") &&
        v.getAs[String]("bottom_month") < v.getAs[String]("end_month"),
        s"months out of order: $v")
      assert(v.getAs[Long]("depth_cents") > 0 &&
        v.getAs[Long]("recovery_cents") > 0, s"non-strict V: $v")
      assert(v.getAs[Long]("down_len") >= 1 && v.getAs[Long]("up_len") >= 1)
    }
    // matches within a nation never overlap (greedy/maximal runs)
    vs.groupBy(r => r.get(r.fieldIndex("nation"))).values.foreach { g =>
      g.map(v => (v.getAs[String]("peak_month"), v.getAs[String]("end_month")))
        .sortBy(_._1).sliding(2).foreach {
          case Array((_, e1), (p2, _)) =>
            assert(e1 <= p2, "overlapping matches")
          case _ => ()
        }
    }
    // full replay for the nation with the most matches: scan its raw
    // monthly series and enumerate maximal DOWN+ UP+ spans by hand
    val nation = vs.groupBy(r => r.get(r.fieldIndex("nation")))
      .maxBy(_._2.length)._1
    val series = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === nation)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg((sum(col("o_totalprice").cast("decimal(14,2)")) * 100)
        .cast("long").as("cents"))
      .orderBy("month").collect()
      .map(r => (r.getAs[String]("month"), r.getAs[Long]("cents")))
    val sigs = series.sliding(2).map {
      case Array((_, a), (m, b)) => (m, java.lang.Long.signum(b - a)) }.toArray
    // enumerate maximal (-1)+ (+1)+ adjacencies
    var replayed = List.empty[(String, String)]
    var i = 0
    while (i < sigs.length) {
      var j = i
      while (j < sigs.length && sigs(j)._2 == -1) j += 1
      if (j > i && j < sigs.length && sigs(j)._2 == 1) {
        var k = j
        while (k < sigs.length && sigs(k)._2 == 1) k += 1
        replayed ::= (sigs(j - 1)._1, sigs(k - 1)._1) // (bottom, end)
        i = k
      } else i = math.max(j, i + 1)
    }
    val mine = vs.filter(r => r.get(r.fieldIndex("nation")) == nation)
      .map(v => (v.getAs[String]("bottom_month"), v.getAs[String]("end_month")))
      .toSet
    assert(mine == replayed.toSet,
      s"replayed matches $replayed != gated $mine for nation $nation")
  }

  test("q70: 3-step rebound matches are well-formed and their DOWN UP " +
    "prefix is exactly the q63 V-matches followed by a decline") {
    val rs = ops.Relational.q70(spark, sf).collect()
    assert(rs.nonEmpty, "no dead-cat bounces found — the series never " +
      "declines twice?")
    rs.foreach { r =>
      assert(r.getAs[String]("peak_month") < r.getAs[String]("trough_month") &&
        r.getAs[String]("trough_month") < r.getAs[String]("bounce_month") &&
        r.getAs[String]("bounce_month") <
          r.getAs[String]("second_trough_month"),
        s"months out of order: $r")
      assert(r.getAs[Long]("drop1_cents") > 0 &&
        r.getAs[Long]("bounce_cents") > 0 &&
        r.getAs[Long]("drop2_cents") > 0, s"non-strict rebound: $r")
      assert(r.getAs[Long]("down1_len") >= 1 &&
        r.getAs[Long]("up_len") >= 1 && r.getAs[Long]("down2_len") >= 1)
    }
    // containment pin: a (down,up,down) match is precisely a q63
    // (down,up) V-match whose up-run is IMMEDIATELY followed by a
    // down-run — so q70's (nation, peak, trough, bounce) triples must
    // be a subset of q63's (nation, peak, bottom, recovered), and any
    // q63 V NOT in q70 must not be followed by an immediate decline
    val vs = ops.Relational.q63(spark, sf).collect()
      .map(v => (v.get(v.fieldIndex("nation")), v.getAs[String]("peak_month"),
        v.getAs[String]("bottom_month"), v.getAs[String]("end_month"))).toSet
    val mine = rs.map(r => (r.get(r.fieldIndex("nation")),
      r.getAs[String]("peak_month"), r.getAs[String]("trough_month"),
      r.getAs[String]("bounce_month"))).toSet
    assert(mine.subsetOf(vs),
      s"q70 emitted a rebound whose V prefix q63 never saw: ${(mine -- vs).take(3)}")
    assert(mine.size < vs.size,
      "every V rebounds — the 3rd step never filtered, suspicious")
  }

  test("q62: decomposition is exactly additive in rationals, frame-aligned, " +
    "and seasonal is one index per (nation, month-of-year)") {
    val rows = ops.Relational.q62(spark, sf).collect()
    assert(rows.nonEmpty)
    val byNation = rows.groupBy(r => r.get(r.fieldIndex("nation")))
    byNation.values.foreach { series =>
      val s = series.sortBy(_.getAs[String]("month"))
      // trend exists exactly on complete 13-month centered frames:
      // the first 6 and last 6 observations of each series are null,
      // everything between is defined
      s.zipWithIndex.foreach { case (r, i) =>
        val defined = i >= 6 && i < s.length - 6
        assert(!r.isNullAt(r.fieldIndex("trend24")) == defined,
          s"trend defined-ness wrong at index $i of ${s.length}")
      }
    }
    val decomposed = rows.filter(r => !r.isNullAt(r.fieldIndex("detr24")))
    assert(decomposed.nonEmpty)
    decomposed.foreach { r =>
      // detrending identity is EXACT in cents×24: detr = 24·rev − trend
      assert(r.getAs[Long]("detr24") ==
        24L * r.getAs[Long]("rev_cents") - r.getAs[Long]("trend24"),
        s"detrending identity broken at $r")
      assert(r.getAs[Long]("seas_cnt") > 0)
    }
    // one seasonal rational per (nation, month-of-year), not per month,
    // and it really is the group mean: Σ detr24 over the group = num
    decomposed
      .groupBy(r => (r.get(r.fieldIndex("nation")),
        r.getAs[String]("month").substring(5)))
      .foreach { case (k, g) =>
        val nums = g.map(_.getAs[Long]("seas_num")).distinct
        val cnts = g.map(_.getAs[Long]("seas_cnt")).distinct
        assert(nums.size == 1 && cnts.size == 1,
          s"seasonal rational not constant within $k")
        assert(g.map(_.getAs[Long]("detr24")).sum == nums.head &&
          g.length.toLong == cnts.head,
          s"seasonal mean does not replay from the group at $k")
      }
  }

  test("q72 holtForecast: a planted exact-linear series projects the " +
    "line exactly, with zero seasonal indices (round 12)") {
    // rev = 100000 + 5000·t cents over 26 months: OLS on an exact line
    // recovers the line as a rational identity (num == den·value), the
    // 2x12 centered MA of a line equals the line so every detr24 is 0,
    // and the combined floor forecast IS the planted h-step value.
    val rows = (0 until 26).map { t =>
      val month = f"${2020 + t / 12}%04d-${t % 12 + 1}%02d"
      (7L, month, 100000L + 5000L * t)
    }
    val monthly = spark.createDataFrame(rows)
      .toDF("nation", "month", "rev_cents")
    val fc = ops.Relational.holtForecast(monthly, hMax = 3)
      .orderBy("h").collect()
    assert(fc.length == 3)
    assert(fc.map(_.getAs[String]("fc_month")).toSeq ==
      Seq("2022-03", "2022-04", "2022-05"))
    fc.foreach { r =>
      val h = r.getAs[Long]("h")
      val planted = 100000L + 5000L * (25 + h)
      assert(r.getAs[Long]("lin_num") ==
        r.getAs[Long]("lin_den") * planted,
        s"OLS rational is not the planted line at h=$h")
      assert(r.getAs[Long]("seas_num24") == 0L,
        s"pure line detrended to a nonzero seasonal at h=$h")
      assert(r.getAs[Long]("fc_cents_floor") == planted,
        s"combined floor forecast off the planted value at h=$h")
    }
    // a planted SEASONAL bump on top of the line must surface in the
    // index and shift the forecast by exactly num/den: +1200 cents
    // every March (moy 03) → detr24 mean = +1200·24·(11/12) on March
    // rows ... the exact value is engine-derived; pin the IDENTITY
    // fc = floor(lin + seas) instead of re-deriving the MA here
    val bumped = (0 until 26).map { t =>
      val month = f"${2020 + t / 12}%04d-${t % 12 + 1}%02d"
      val bump = if (t % 12 == 2) 1200L else 0L
      (7L, month, 100000L + 5000L * t + bump)
    }
    val fc2 = ops.Relational.holtForecast(
      spark.createDataFrame(bumped).toDF("nation", "month", "rev_cents"),
      hMax = 3).orderBy("h").collect()
    fc2.foreach { r =>
      val num = BigInt(r.getAs[Long]("lin_num"))
      val den = BigInt(r.getAs[Long]("lin_den"))
      val sn = BigInt(r.getAs[Long]("seas_num24"))
      val sd = BigInt(r.getAs[Long]("seas_den24"))
      val expect = (num * sd + sn * den) / (den * sd) // floors: positive
      assert(BigInt(r.getAs[Long]("fc_cents_floor")) == expect,
        s"fc_cents_floor does not close the rational identity at " +
          s"h=${r.getAs[Long]("h")}")
    }
    // March (h lands on 2022-03 at h=1) carries a strictly positive
    // seasonal index under the planted bump
    assert(fc2(0).getAs[String]("fc_month") == "2022-03" &&
      fc2(0).getAs[Long]("seas_num24") > 0L)
  }

  test("q73 holtForecastIntervals: planted orthogonal noise yields " +
    "exactly derivable conformal bounds (round 13)") {
    // 10 months (< 13, so no seasonal window opens — the fit is pure
    // OLS and everything is closed-form): rev = 100000 + 5000·t plus
    // noise (+300 at t∈{1,9}, −300 at t∈{4,6}) chosen ORTHOGONAL to
    // the {1, t} design (Σv = 0, Σt·v = 0), so OLS recovers the
    // planted line EXACTLY and the residuals ARE the noise:
    // sorted [−300,−300,0×6,+300,+300]. n = 10 → k_lo = ⌈n/10⌉ = 1 →
    // r_lo = −300 (the 1st smallest), k_hi = n → r_hi = +300. Bounds:
    // fc(h) ± 300·(10+h)/10 = fc ± 30·(10+h), exactly.
    val noise = Map(1 -> 300L, 4 -> -300L, 6 -> -300L, 9 -> 300L)
    val rows = (0 until 10).map { t =>
      (7L, f"2023-${t + 1}%02d", 100000L + 5000L * t + noise.getOrElse(t, 0L))
    }
    val fc = ops.Relational.holtForecastIntervals(
      spark.createDataFrame(rows).toDF("nation", "month", "rev_cents"),
      hMax = 3).orderBy("h").collect()
    assert(fc.length == 3)
    assert(fc.map(_.getAs[String]("fc_month")).toSeq ==
      Seq("2023-11", "2023-12", "2024-01"))
    fc.foreach { r =>
      val h = r.getAs[Long]("h")
      val planted = 100000L + 5000L * (9 + h)
      assert(r.getAs[Long]("fc_cents_floor") == planted,
        s"point forecast off the planted line at h=$h")
      assert(r.getAs[Long]("n_obs") == 10L)
      assert(r.getAs[Long]("r_lo") == -300L && r.getAs[Long]("r_hi") == 300L,
        s"empirical residual quantiles off at h=$h: " +
          s"${r.getAs[Long]("r_lo")}/${r.getAs[Long]("r_hi")}")
      assert(r.getAs[Long]("lo_cents_floor") == planted - 30L * (10 + h),
        s"lower bound off at h=$h")
      assert(r.getAs[Long]("hi_cents_floor") == planted + 30L * (10 + h),
        s"upper bound off at h=$h")
    }
    // zero noise degenerates to a zero-width interval pinned to the fc
    val clean = (0 until 10).map { t =>
      (7L, f"2023-${t + 1}%02d", 100000L + 5000L * t)
    }
    ops.Relational.holtForecastIntervals(
      spark.createDataFrame(clean).toDF("nation", "month", "rev_cents"),
      hMax = 2).collect().foreach { r =>
      assert(r.getAs[Long]("r_lo") == 0L && r.getAs[Long]("r_hi") == 0L &&
        r.getAs[Long]("lo_cents_floor") == r.getAs[Long]("fc_cents_floor") &&
        r.getAs[Long]("hi_cents_floor") == r.getAs[Long]("fc_cents_floor"))
    }
  }
}
