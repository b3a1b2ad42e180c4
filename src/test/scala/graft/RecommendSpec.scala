package graft

import org.apache.spark.sql.functions._

class RecommendSpec extends SparkSpec {

  ops.Recommend.queries.foreach { case (name, fn) =>
    test(s"$name executes") {
      assert(fn(spark, sf).count() >= 0)
    }
  }

  test("r04 similarity is within (0, 1]") {
    val sims = ops.Recommend.r04(spark, sf).collect()
      .map(_.getAs[Double]("sim"))
    assert(sims.forall(v => v > 0.0 && v <= 1.0))
  }

  test("r05 recs never contain already-seen items") {
    val recs = ops.Recommend.r05(spark, sf)
    val hist = etl.Ratings.implicitRatings(spark, sf)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("item_id").as("rec_item"))
    assert(recs.join(hist, Seq("user_id", "rec_item"), "left_semi").count() == 0)
  }

  test("r23 MMR re-rank diverges from pure relevance for some user") {
    val mmr = ops.Recommend.r23(spark, sf).collect()
    val byUser = mmr.groupBy(_.getAs[Long]("user_id"))
    // contract: exactly 5 picks per user, positions 1..5
    assert(byUser.values.forall(_.map(_.getAs[Int]("pos")).sorted.sameElements(1 to 5)))
    // pick 1 is the pure-relevance argmax (tie → lowest item)
    val top1 = ops.Recommend.r05(spark, sf).collect()
      .filter(_.getAs[Int]("rank") == 1)
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("rec_item")).toMap
    assert(byUser.forall { case (u, rows) =>
      rows.find(_.getAs[Int]("pos") == 1).get.getAs[Long]("rec_item") == top1(u)
    })
    // non-vacuity: diversity changed the SET for at least one user
    val top5 = ops.Recommend.r05(spark, sf).collect()
      .groupBy(_.getAs[Long]("user_id")).view
      .mapValues(_.map(_.getAs[Long]("rec_item")).toSet).toMap
    val diverged = byUser.count { case (u, rows) =>
      rows.map(_.getAs[Long]("rec_item")).toSet != top5(u)
    }
    assert(diverged > 0, "MMR never deviated from relevance top-5")
  }

  test("r24 content fallback serves day-zero items popularity cannot") {
    val rows = ops.Recommend.r24(spark, sf).collect()
    assert(rows.nonEmpty)
    // only hidden (day-zero) items are served, every score is a real
    // content match
    assert(rows.forall(_.getAs[Long]("new_item") % 17 == 0))
    assert(rows.forall(_.getAs[Long]("score") > 0))
    // ranks are dense from 1, capped at 3 (a user can match fewer
    // than 3 of the small day-zero slice); someone gets the full 3
    val perUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(perUser.values.forall { rs =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      ranks.sameElements(1 to ranks.length) && ranks.length <= 3
    })
    assert(perUser.values.exists(_.length == 3))
    // the hidden items DO have interactions in the raw data — so a
    // CF/popularity path would have seen them; hiding is what makes
    // this the item-cold-start scenario
    val hiddenInteractions = etl.Ratings.implicitRatings(spark, sf)
      .filter(col("item_id") % 17 === 0).count()
    assert(hiddenInteractions > 0, "no hidden interactions: scenario vacuous")
  }

  test("r25 explanations name a real history item for every rec") {
    val expl = ops.Recommend.r25(spark, sf).collect()
    assert(expl.nonEmpty)
    // one explanation per (user, rec)
    val keys = expl.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("rec_item")))
    assert(keys.distinct.length == keys.length)
    // the because-item is genuinely in the user's history
    val hist = etl.Ratings.implicitRatings(spark, sf)
      .filter(col("user_id") < 50).select("user_id", "item_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expl.forall(r =>
      hist((r.getAs[Long]("user_id"), r.getAs[Long]("because_item")))))
    assert(expl.forall(_.getAs[Long]("contrib") > 0))
  }

  test("r06 ALS recs: 5 per user, unseen only, gates all true") {
    val recs = ops.Recommend.alsTop5(spark, sf).cache()
    val perUser = recs.groupBy("user_id").count().collect()
    assert(perUser.forall(_.getAs[Long]("count") <= 5))
    val seen = etl.Ratings.implicitRatings(spark, sf).select("user_id", "item_id")
    assert(recs.join(seen, Seq("user_id", "item_id"), "left_semi").count() == 0)
    recs.unpersist()
    val gates = ops.Recommend.r06(spark, sf).collect().head
    assert(gates.getAs[Long]("n_users") > 0)
    assert(gates.getAs[Boolean]("coverage_ok"))
    assert(gates.getAs[Boolean]("sorted_ok"))
    assert(gates.getAs[Boolean]("unseen_ok"))
  }

  test("r11 factor neighbors: 5 ranked per probe, cosine in [-1,1]") {
    val rows = ops.Recommend.itemNeighbors(spark, sf).collect()
    val byProbe = rows.groupBy(_.getAs[Long]("probe_item"))
    assert(byProbe.nonEmpty)
    assert(byProbe.values.forall(_.length == 5))
    assert(rows.forall(r => math.abs(r.getAs[Double]("cos")) <= 1.0 + 1e-9))
    val gates = ops.Recommend.r11(spark, sf).collect().head
    assert(gates.getAs[Boolean]("coverage_ok"))
    assert(gates.getAs[Boolean]("cos_range_ok"))
    assert(gates.getAs[Boolean]("sorted_ok"))
  }

  test("r20 MAP/recall: bounds, fixed-point exactness, precision consistency") {
    val rows = ops.Recommend.r20(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nRel, nHits) = (r.getAs[Long]("n_rel"), r.getAs[Long]("n_hits"))
      val (ap, rec) = (r.getAs[Double]("ap_at_5"), r.getAs[Double]("recall_at_5"))
      assert(nHits <= math.min(nRel, 5), s"user ${r.get(0)}: $nHits hits > bound")
      assert(ap >= 0.0 && ap <= 1.0, s"user ${r.get(0)}: AP $ap out of [0,1]")
      assert(rec >= 0.0 && rec <= 1.0, s"user ${r.get(0)}: recall $rec")
      // ap_fp is a sum of exact 60·cum/k integers: divisible sanity
      assert(r.getAs[Long]("ap_fp") <= 60L * math.min(nRel, 5),
        s"user ${r.get(0)}: ap_fp exceeds the all-hits bound")
      // a user with zero hits must have AP = recall = 0
      if (nHits == 0) assert(ap == 0.0 && rec == 0.0)
    }
    // the corpus split produces SOME signal: mean AP strictly positive,
    // consistent with r12's precision@5 being > 0 on the same recs
    val meanAp = rows.map(_.getAs[Double]("ap_at_5")).sum / rows.length
    assert(meanAp > 0.0, "MAP@5 is zero — no test-set hits at all")
  }

  test("r21 grid: chosen config beats the worst by a real margin") {
    val fits = ops.Recommend.alsGridEval(spark, sf)
    assert(fits.size == 4)
    val best = fits.minBy(_._3)
    val worst = fits.maxBy(_._3)
    // the grid must discriminate: winner beats loser by > 0.02 RMSE,
    // and the winner is a low-regularization config (0.5 is 10× over)
    assert(worst._3 - best._3 > 0.02,
      s"grid spread too small: best $best worst $worst")
    assert(best._2 < 0.1, s"over-regularized config won the grid: $best")
  }

  test("r22 cold-start: exactly 5 per user, cold users get top-popularity") {
    val rows = ops.Recommend.r22(spark, sf).collect()
    val perUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(perUser.size == 60, s"served ${perUser.size} users, want 60")
    perUser.foreach { case (u, rs) =>
      assert(rs.length == 5, s"user $u got ${rs.length} recs")
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 5))
    }
    // users 50-59 postdate the CF model: ALL their rows are fallback
    val coldRows = rows.filter(_.getAs[Long]("user_id") >= 50)
    assert(coldRows.nonEmpty && coldRows.forall(_.getAs[String]("src") == "pop"))
    // fallback items come from the top of the popularity ranking:
    // every pop rec sits in the head, and a cold user's list is the
    // head minus their own seen items, in head order
    val popHead = etl.Ratings.implicitRatings(spark, sf)
      .groupBy("item_id").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("item_id")).limit(100)
      .collect().map(_.getAs[Long]("item_id"))
    val seen50 = etl.Ratings.implicitRatings(spark, sf)
      .filter(col("user_id") === 50L).select("item_id").collect()
      .map(_.getLong(0)).toSet
    val got50 = coldRows.filter(_.getAs[Long]("user_id") == 50L)
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("rec_item"))
    val want50 = popHead.filterNot(seen50).take(5)
    assert(got50.sameElements(want50),
      s"user 50 fallback ${got50.toSeq} != head-minus-seen ${want50.toSeq}")
  }

  test("r08 baseline rmse is a positive scalar") {
    val row = ops.Recommend.r08(spark, sf).collect().head
    assert(row.getAs[Long]("n_train") > 0)
    assert(row.getAs[Long]("n_test") > 0)
    assert(row.getAs[Double]("rmse") > 0.0)
  }

  test("r13 item→users: ≤5 ranked users per item, every item covered") {
    val rows = ops.Recommend.itemTopUsers(spark, sf).collect()
    val byItem = rows.groupBy(_.getAs[Int]("item_id"))
    assert(byItem.nonEmpty)
    assert(byItem.values.forall { rs =>
      rs.length <= 5 && rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length)
    })
    val nItems = ops.Recommend.alsModel(spark, sf).itemFactors.count()
    assert(byItem.size == nItems, s"${byItem.size} items with recs vs $nItems factors")
    val gates = ops.Recommend.r13(spark, sf).collect().head
    assert(gates.getAs[Boolean]("coverage_ok"))
    assert(gates.getAs[Boolean]("sorted_ok"))
    assert(gates.getAs[Boolean]("users_valid_ok"))
  }

  test("r14 explicit ALS beats the item-mean baseline on the same split") {
    val row = ops.Recommend.r14Eval(spark, sf).collect().head
    val alsRmse = row.getAs[Double]("rmse")
    assert(row.getAs[Boolean]("rmse_ok"), s"rmse out of range: $alsRmse")
    // item-mean baseline on the SAME synthetic ratings + split
    val stars = etl.Ratings.implicitRatings(spark, sf)
      .select(col("user_id").cast("int").as("user_id"),
        col("item_id").cast("int").as("item_id"))
      .withColumn("rating",
        (lit(1.0f) + (col("user_id") % 7 + col("item_id") % 7)
          .cast("float") * lit(4.0f / 12.0f)))
    val tagged = etl.Split.tagTest(stars, Seq("user_id", "item_id"))
    val train = tagged.filter(!col("is_test"))
    val itemMean = train.groupBy("item_id").agg(avg("rating").as("m"))
    val baseline = tagged.filter(col("is_test"))
      .join(itemMean, Seq("item_id"))
      .agg(sqrt(avg(pow(col("rating") - col("m"), 2))))
      .collect().head.getDouble(0)
    assert(alsRmse < baseline,
      s"ALS rmse $alsRmse should beat item-mean baseline $baseline")
  }

  test("r15 persisted model round-trips factor-exact") {
    val row = ops.Recommend.r15(spark, sf).collect().head
    assert(row.getAs[Boolean]("roundtrip_ok"))
    assert(row.getAs[Int]("rank") == 8)
    assert(row.getAs[Long]("n_users") > 0 && row.getAs[Long]("n_items") > 0)
  }

  test("r16 ANN serving recovers most of the exact top-5 from 2/8 cells") {
    import org.apache.spark.sql.functions._
    val exact = ops.Recommend.alsTop5(spark, sf).select("user_id", "item_id")
    val ann = ops.Recommend.annTop5(spark, sf).select("user_id", "item_id")
    val nUsers = exact.select("user_id").distinct().count()
    val hits = exact.join(ann, Seq("user_id", "item_id")).count()
    val overlap = hits.toDouble / (nUsers * 5)
    // measured 0.78 at sf0.01, 0.58 at this fixture's sf0.001 (fewer
    // items → coarser cells), seed 42 throughout; 0.5 leaves margin
    // while still proving the index recovers the majority of the
    // exact list from a quarter of the catalog
    assert(overlap >= 0.5, f"overlap@5 $overlap%.3f < 0.5")
  }

  test("r28: decay strictly demotes stale quantity relative to r02's raw counts") {
    import org.apache.spark.sql.functions._
    val rows = ops.Recommend.r28(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // decayed score can never exceed the raw quantity sum it decays
      assert(r.getAs[Double]("decayed_qty") > 0.0)
    }
    val scores = rows.map(_.getAs[Double]("decayed_qty"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // decay is real: at least one item's decayed score is strictly
    // below its raw quantity total (some order is older than max year)
    val raw = etl.Ratings.implicitRatings(spark, sf)
      .groupBy("item_id").agg(sum("rating").as("raw"))
    val joined = ops.Recommend.r28(spark, sf)
      .join(raw, Seq("item_id")).collect()
    assert(joined.exists(r =>
      r.getAs[Double]("decayed_qty") < r.getAs[Double]("raw")),
      "no decay observed — all orders in the newest year?")
  }

  test("r26: user-kNN recs are unseen items endorsed by 1..5 neighbors") {
    import org.apache.spark.sql.functions._
    val recs = ops.Recommend.r26(spark, sf)
    val hist = etl.Ratings.implicitRatings(spark, sf)
      .select(col("user_id"), col("item_id").as("rec_item")).distinct()
    // no recommendation may already be in the user's history
    assert(recs.join(hist, Seq("user_id", "rec_item")).count() == 0,
      "recommended an already-seen item")
    val rows = recs.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val votes = r.getAs[Long]("n_nb")
      assert(votes >= 1L && votes <= 5L, s"vote count out of range: $votes")
    }
    // at most 5 per user, ranks contiguous from 1
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to ranks.length))
      assert(ranks.length <= 5)
    }
  }

  test("r30: RRF scores are exact integer units inside the dual-source bounds") {
    val rows = ops.Recommend.r30(spark, sf).collect()
    assert(rows.nonEmpty)
    val unit = (r: Int) => 1000000000L / (60 + r)
    rows.foreach { r =>
      val sc = r.getAs[Long]("score_units")
      // one source at worst rank 10 .. both sources at rank 1
      assert(sc >= unit(10) && sc <= 2 * unit(1), s"score out of bounds: $sc")
    }
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.sameElements(1 to ranks.length) && ranks.length <= 5)
      // fused order is non-increasing in score
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("score_units"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("r36: surfaced rules are high-lift with consistent probabilities") {
    val rows = ops.Recommend.r36(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // lift > 1: the rule beats independence (else it isn't a rule)
      assert(r.getAs[Double]("lift") > 1.0)
      val conf = r.getAs[Long]("conf_ppm")
      assert(conf > 0 && conf <= 1000000L)
      assert(r.getAs[Long]("support_ppm") <= conf,
        "support cannot exceed confidence (c(A) <= N)")
    }
  }

  test("r35: every segment is audited and percentile means are in range") {
    val rows = ops.Recommend.r35(spark, sf).collect()
    assert(rows.length == 5, "a market segment fell out of the audit")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") > 0)
      assert(r.getAs[Long]("n_distinct_items") <= r.getAs[Long]("n_recs"))
      val m = r.getAs[Double]("mean_pop_pm")
      assert(m >= 0.0 && m <= 1000.0)
    }
  }

  test("r34: ALS re-rank serves a candidate subset and genuinely reorders retrieval") {
    val served = ops.Recommend.r34Served(spark, sf).collect()
    assert(served.nonEmpty)
    val cands = ops.Recommend.r05Candidates(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("rec_item"))).toSet
    served.foreach { r =>
      assert(cands.contains((r.getAs[Long]("user_id"), r.getAs[Long]("rec_item"))),
        "served an item outside the retrieval candidates")
      assert(r.getAs[Int]("rr") <= 5)
    }
    // two-stage non-vacuity: the model stage must CHANGE the ranking
    // for at least one user vs the retrieval top-5
    val retrievalTop5 = ops.Recommend.r05(spark, sf).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.map(_.getAs[Long]("rec_item")).toSet }
    val servedBy = served.groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.map(_.getAs[Long]("rec_item")).toSet }
    assert(servedBy.exists { case (u, items) =>
      retrievalTop5.get(u).exists(_ != items)
    }, "ALS stage never changed any user's top-5 — re-ranking vacuous")
  }

  test("r33: IPS mass is positive and popularity debiasing only shrinks CTR") {
    val r = ops.Recommend.r33(spark, sf).collect().head
    assert(r.getAs[Long]("n_clicks") > 0L, "no test clicks — eval vacuous")
    assert(r.getAs[Long]("ips_mass") > 0L)
    // w(i) = 1e6 div audience(i) <= 1e6, so the IPS estimate can never
    // exceed the raw CTR — equality only if every clicked item has
    // audience 1
    assert(r.getAs[Double]("ips_ctr") <= r.getAs[Double]("raw_ctr"))
    assert(r.getAs[Double]("ips_ctr") > 0.0)
  }

  test("r32: scoreboard conserves users and both rankers draw real clicks") {
    val r = ops.Recommend.r32(spark, sf).collect().head
    val n = r.getAs[Long]("n_users")
    assert(n > 0)
    assert(r.getAs[Long]("wins_cf") + r.getAs[Long]("wins_pop") +
      r.getAs[Long]("ties") == n)
    // non-vacuity: the comparison only means something if clicks land
    // on BOTH rankers' displayed slots somewhere in the panel
    assert(r.getAs[Long]("clicks_cf") > 0L, "CF never clicked — eval vacuous")
    assert(r.getAs[Long]("clicks_pop") > 0L, "popularity never clicked — eval vacuous")
  }

  test("r31: gini matches a driver-side recompute and bounds hold") {
    val r = ops.Recommend.r31(spark, sf).collect().head
    val n = r.getAs[Long]("n_items")
    val tot = r.getAs[Long]("total_exposure")
    val gini = r.getAs[Double]("gini")
    assert(gini >= 0.0 && gini < 1.0)
    // with zero-exposure items in the population, share conservation:
    assert(r.getAs[Long]("n_zero_exposure") < n)
    assert(r.getAs[Double]("top1pct_share") > 0.0 &&
      r.getAs[Double]("top1pct_share") <= 1.0)
    // driver-side recompute from the raw artifact (dim-bounded)
    val counts = ops.Recommend.r05(spark, sf).groupBy("rec_item")
      .count().collect().map(x => x.getAs[Long]("rec_item") -> x.getAs[Long]("count")).toMap
    val catalog = graft.etl.Ratings.implicitRatings(spark, sf)
      .select("item_id").distinct().collect().map(_.getAs[Long]("item_id"))
    val xs = catalog.map(i => (counts.getOrElse(i, 0L), i)).sorted.map(_._1)
    val nn = xs.length.toLong
    val s1 = xs.sum
    val rankMass = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val expect = BigDecimal((2.0 * rankMass - (nn + 1).toDouble * s1) /
      (nn.toDouble * s1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(n == nn && tot == s1 && math.abs(gini - expect) < 1e-9,
      s"gini $gini vs recompute $expect")
  }

  test("r39: exploration replaces only rank-5, never repeats the slate or history") {
    val rows = ops.Recommend.r39(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (u, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L),
        s"user $u: slate is not exactly ranks 1..5")
      val explored = rs.filter(_.getAs[String]("source") == "explore")
      assert(explored.forall(_.getAs[Long]("rank") == 5L),
        s"user $u: exploration outside the rank-5 slot")
      assert(explored.length <= 1)
    }
    val nExplore = rows.count(_.getAs[String]("source") == "explore")
    assert(nExplore > 0, "epsilon cohort is empty — exploration never exercised")
    assert(nExplore < byUser.size, "every user exploring — epsilon gate lost")
    // the explore item is genuinely novel for its user: not in the
    // exploit slate and not in their interaction history
    val exploit = ops.Recommend.r05(spark, sf).collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.map(_.getAs[Long]("rec_item")).toSet }
    val hist = graft.etl.Ratings.implicitRatings(spark, sf)
      .filter(col("user_id") < 50).select("user_id", "item_id").collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.map(_.getLong(1)).toSet }
    rows.filter(_.getAs[String]("source") == "explore").foreach { r =>
      val (u, it) = (r.getAs[Long]("user_id"), r.getAs[Long]("item_id"))
      assert(!exploit.getOrElse(u, Set.empty).contains(it),
        s"user $u explores an item already on their exploit slate")
      assert(!hist.getOrElse(u, Set.empty).contains(it),
        s"user $u explores an item from their own history")
    }
  }

  test("r38: coverage grows with k, slots fill exactly, novelty stays in-range") {
    val rows = ops.Recommend.r38(spark, sf).collect().sortBy(_.getAs[Int]("k"))
    assert(rows.map(_.getAs[Int]("k")).toSeq == Seq(1, 3, 5))
    val nUsers = ops.Recommend.r05(spark, sf)
      .select("user_id").distinct().count()
    rows.foreach { r =>
      val k = r.getAs[Int]("k")
      // every cohort user serves a full slate at every k
      assert(r.getAs[Long]("n_slots") == nUsers * k,
        s"k=$k: slots ${r.getAs[Long]("n_slots")} != $nUsers*$k")
      assert(r.getAs[Long]("n_distinct_items") <= r.getAs[Long]("n_slots"))
      assert(r.getAs[Long]("coverage_ppm") ==
        1000000L * r.getAs[Long]("n_distinct_items") / r.getAs[Long]("catalog_n"))
      val nov = r.getAs[Double]("novelty_mean")
      val bound = math.log(r.getAs[Long]("catalog_n").toDouble * 1000) / math.log(2)
      assert(nov > 0 && nov < bound, s"novelty $nov out of range")
    }
    // wider slates can only touch MORE of the catalog
    val dist = rows.map(_.getAs[Long]("n_distinct_items"))
    assert(dist.zip(dist.tail).forall { case (a, b) => a <= b })
  }

  test("r37: AUC rank-sum bounds, exact ppm quotient, cohort consistency with r20") {
    val rows = ops.Recommend.r37(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Long]("n_pos"); val n = r.getAs[Long]("n_neg")
      val u2 = r.getAs[Long]("u2"); val ppm = r.getAs[Long]("auc_ppm")
      assert(p > 0 && n > 0)
      // 0 <= U <= P*N  (U is a count of concordant pairs + half-ties)
      assert(u2 >= 0 && u2 <= 2 * p * n, s"u2 $u2 outside [0, ${2 * p * n}]")
      assert(ppm == (1000000L * u2) / (2 * p * n), "ppm must be the exact quotient")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
    // calibration: the testdata's interactions are hash-uniform, so the
    // pooled AUC must sit NEAR CHANCE (measured 0.476/0.500 at
    // sf0.001/0.01) — a biased rank-sum (e.g. mishandled ties, off-by-one
    // in the U statistic) shows up as systematic drift from 0.5
    val num = rows.map(r => 1000000L * r.getAs[Long]("u2")).sum
    val den = rows.map(r => 2 * r.getAs[Long]("n_pos") * r.getAs[Long]("n_neg")).sum
    assert(num / den > 400000L && num / den < 600000L,
      s"pooled AUC ${num / den} ppm systematically off chance on uniform data")
    // protocol consistency: every AUC user has held-out positives in r20,
    // and never more scored positives than relevant items
    val rel = ops.Recommend.r20(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_rel")).toMap
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(rel.contains(u), s"user $u in r37 but not r20")
      assert(r.getAs[Long]("n_pos") <= rel(u),
        s"user $u: scored positives exceed held-out relevants")
    }
  }

  test("r29: calibration TV is a distance in [0,1] and covered users beat uncovered") {
    val rows = ops.Recommend.r29(spark, sf).collect()
    assert(rows.length == 50, "every cohort user must be audited")
    rows.foreach { r =>
      val tv = r.getAs[Double]("tv")
      assert(tv >= 0.0 && tv <= 1.0, s"tv out of range: $tv")
      // tv == tv_scaled / (10 * h_tot) exactly
      assert(tv == r.getAs[Long]("tv_scaled").toDouble /
        (10.0 * r.getAs[Long]("h_tot")))
    }
    // a user with any recs at all has tv < 1 (some mass overlaps or
    // at minimum the metric stays a proper distance); non-vacuity:
    // distributions differ somewhere
    assert(rows.exists(_.getAs[Double]("tv") > 0.0), "all users perfectly calibrated — vacuous")
  }

  test("r41: SPPMI values recompute from raw co-occurrence statistics") {
    val rows = ops.Recommend.r41(spark, sf).collect()
    assert(rows.nonEmpty)
    val oi = graft.etl.Ratings.orderItems(spark, sf)
    val nB = oi.select("l_orderkey").distinct().count()
    val freq = oi.groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("count")).toMap
    rows.take(20).foreach { r =>
      val (i, j, cnt) = (r.getAs[Long]("i"), r.getAs[Long]("j"), r.getAs[Long]("cnt"))
      val (ni, nj) = (freq(i), freq(j))
      val pmi = BigDecimal(math.log((cnt * nB).toDouble / (ni * nj).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("pmi6") == pmi, s"pair ($i,$j): pmi mismatch")
      val sppmi = math.max(0.0,
        BigDecimal(math.log((cnt * nB).toDouble / (5.0 * (ni * nj)).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Double]("sppmi6") == sppmi, s"pair ($i,$j): sppmi mismatch")
      assert(r.getAs[Long]("lift_ppm") == 1000000L * cnt * nB / (ni * nj))
      assert(r.getAs[Double]("sppmi6") <= r.getAs[Double]("pmi6"),
        "shift raised the score")
    }
    // ranking runs on the rounded score with the (i, j) ladder
    val keys = rows.map(r => (-r.getAs[Double]("sppmi6"),
      r.getAs[Long]("i"), r.getAs[Long]("j"))).toSeq
    assert(keys == keys.sorted, "output is not in SPPMI-desc tie-ladder order")
  }

  test("r42: the 0.75 smoothing provably flattens the sampling distribution") {
    val rows = ops.Recommend.r42(spark, sf).collect()
    assert(rows.length == 50)
    // head share must SHRINK and the (relative) tail share must GROW:
    // ppm/share ratio is monotone non-increasing in n
    val head = rows.head // max n under the (n DESC, item_id) ladder
    assert(head.getAs[Long]("ppm") < head.getAs[Long]("share_ppm"),
      "smoothing failed to shrink the head item's share")
    val ratios = rows.map(r =>
      (r.getAs[Long]("n"),
        r.getAs[Long]("ppm").toDouble / r.getAs[Long]("share_ppm").toDouble))
    // integer-ppm rounding wobbles the ratio by ~1/ppm, so compare with
    // a 1% slack — the 0.75-power trend dominates at any real gap in n
    ratios.sliding(2).foreach { case Array((nA, rA), (nB, rB)) =>
      if (nA > nB) assert(rA <= rB * 1.01,
        s"ppm/share ratio not monotone: n=$nA ratio=$rA vs n=$nB ratio=$rB")
    }
    // driver-side recompute of the head item's weight and table slot
    val n = head.getAs[Long]("n").toDouble
    val w6 = BigDecimal(math.pow(n, 0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(head.getAs[Double]("w6") - w6) < 1e-9)
    assert(head.getAs[Long]("n_neg") == 250000L * head.getAs[Long]("ppm") / 1000000L)
  }

  test("r43: leave-last-out protocol counts are consistent and leakage-free") {
    val r = ops.Recommend.r43(spark, sf).collect().head
    val (nEval, nScored) = (r.getAs[Long]("n_eval"), r.getAs[Long]("n_scored"))
    val (h1, h5) = (r.getAs[Long]("hit1"), r.getAs[Long]("hit5"))
    assert(nEval > 0, "no evaluable customers at this SF")
    assert(nScored <= nEval && nScored > 0)
    assert(h1 <= h5 && h5 <= nScored)
    assert(r.getAs[Long]("hit1_ppm") == 1000000L * h1 / nScored)
    assert(r.getAs[Long]("hit5_ppm") == 1000000L * h5 / nScored)
    // no-leakage: the eval customers' final transitions must be absent
    // from the training table. Rebuild both in the driver and check the
    // train pair multiset never counts a (penultimate → last) pair that
    // only the held-out transition could contribute.
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("string").as("od")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val byCust = orders.groupBy(_._2).view.mapValues(
      _.sortBy(o => (o._3, o._1)).map(_._1).toSeq).toMap
    val items = graft.etl.Ratings.orderItems(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // one customer with >= 3 orders: its earlier transitions train,
    // its last does not — recompute that customer's candidate scores
    val cust = byCust.collect { case (c, os) if os.length >= 3 => c }.min
    val os = byCust(cust)
    val trainPairs = scala.collection.mutable.Map[(Long, Long), Long]()
    byCust.values.foreach { seqO =>
      seqO.sliding(2).zipWithIndex.foreach { case (Seq(a, b), k) =>
        if (k != seqO.length - 2) // NOT the transition into the last order
          for (i <- items.getOrElse(a, Set.empty);
               j <- items.getOrElse(b, Set.empty))
            trainPairs((i, j)) = trainPairs.getOrElse((i, j), 0L) + 1L
      }
    }
    val ctx = items.getOrElse(os(os.length - 2), Set.empty)
    val scores = trainPairs.toSeq
      .filter { case ((i, _), _) => ctx.contains(i) }
      .groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (j, sc) => (-sc, j) }.take(5)
    val sparkTop = ops.Recommend.r43Probe(spark, sf, cust)
    assert(sparkTop == scores.map(_._1).toList,
      s"customer $cust: top-5 ${sparkTop} vs driver replay ${scores.map(_._1)}")
  }

  test("r44: RFM segments conserve customers and order by behavior") {
    val rows = ops.Recommend.r44(spark, sf).collect()
      .map(r => r.getAs[String]("segment") -> r).toMap
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(rows.values.map(_.getAs[Long]("n_users")).sum == nCust,
      "segmentation lost or duplicated customers")
    // behavioral sanity: champions are more recent than hibernating,
    // and spend more per head than the corpus average
    val champs = rows("champions"); val hib = rows("hibernating")
    assert(champs.getAs[Long]("avg_recency_days") <
      hib.getAs[Long]("avg_recency_days"))
    val champMean = BigDecimal(champs.getAs[Long]("monetary_sum_cents")) /
      champs.getAs[Long]("n_users")
    val globalMean = rows.values.map(r =>
      BigDecimal(r.getAs[Long]("monetary_sum_cents"))).sum / nCust
    assert(champMean > globalMean,
      s"champions per-head spend $champMean not above corpus mean $globalMean")
  }

  test("r45: ratio arithmetic replays and both behavioral classes appear") {
    val rows = ops.Recommend.r45(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, ns) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_same"))
      assert(ns <= nb, "same-basket customers exceed both-ever customers")
      assert(r.getAs[Long]("same_ppm") == 1000000L * ns / nb)
      val lbl = r.getAs[String]("label")
      assert(if (ns == 0) lbl == "substitute"
        else if (1000000L * ns / nb >= 200000L) lbl == "complement"
        else lbl == "mixed")
    }
    val labels = rows.map(_.getAs[String]("label")).toSet
    assert(labels.contains("substitute") && (labels - "substitute").nonEmpty,
      s"only $labels present — the classification is vacuous on this corpus")
  }

  test("r46: Wilson bound shrinks toward zero and actually reorders p-hat") {
    val rows = ops.Recommend.r46(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lb = r.getAs[Double]("wilson_lb")
      val ph = r.getAs[Double]("phat")
      val n = r.getAs[Long]("n_users")
      assert(n >= 5, "support floor violated")
      assert(lb >= 0.0 && lb < ph,
        s"lower bound $lb not strictly below p-hat $ph (z>0, finite n)")
    }
    // the op's whole point, non-vacuously: somewhere in the full item
    // set, a higher-p-hat item ranks BELOW a lower-p-hat item because
    // its support is smaller (sort-by-average would order them wrongly)
    val full = graft.etl.Ratings.implicitRatings(spark, sf)
      .groupBy("item_id")
      .agg(count(lit(1)).as("n"),
        count(when(col("rating") >= 26.0, lit(1))).as("pos"))
      .filter(col("n") >= 5)
      .collect().map { x =>
        val (n, pos) = (x.getAs[Long]("n").toDouble, x.getAs[Long]("pos").toDouble)
        val ph = pos / n
        val lb = (ph + 3.8416 / (2 * n) -
          1.96 * math.sqrt((ph * (1 - ph) + 3.8416 / (4 * n)) / n)) /
          (1 + 3.8416 / n)
        (ph, lb)
      }
    val inverted = full.exists { case (ph1, lb1) =>
      full.exists { case (ph2, lb2) => ph1 > ph2 && lb1 < lb2 }
    }
    assert(inverted,
      "no p-hat/Wilson rank inversion anywhere — the correction is vacuous here")
  }

  test("r50: LTV curves are monotone, conserve revenue, and cohorts " +
    "partition the customer base") {
    val rows = ops.Recommend.r50(spark, sf).collect()
    assert(rows.nonEmpty)
    // cumulative curves never decrease within a cohort
    rows.groupBy(_.getAs[String]("cohort")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("age"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(b.getAs[Long]("cum_cents") >= a.getAs[Long]("cum_cents"))
        assert(b.getAs[Int]("age") > a.getAs[Int]("age"))
        case _ => ()
      }
      // the curve ends at the cohort's total revenue
      assert(sorted.last.getAs[Long]("cum_cents") ==
        g.map(_.getAs[Long]("rev_cents")).sum)
      // age zero exists: a cohort's first month is by construction an
      // active month
      assert(sorted.head.getAs[Int]("age") == 0)
    }
    // cohort sizes partition the customer base exactly
    val sizes = rows.groupBy(_.getAs[String]("cohort"))
      .map(_._2.head.getAs[Long]("n_customers"))
    assert(sizes.sum == Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left_semi").count())
    // total revenue conserves across the whole matrix
    val totalCents = Tables.orders(spark, sf)
      .agg(sum((col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("rev_cents")).sum == totalCents)
  }

  test("r49: the fixed-point bias chain replays driver-side from the split") {
    val row = ops.Recommend.r49(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_train") > 0 && row.getAs[Long]("n_test") > 0)
    // replay mu and the damped bias of one item in exact fixed point
    val tagged = etl.Split.tagTest(
      etl.Ratings.implicitRatings(spark, sf), Seq("user_id", "item_id"))
      .select(col("item_id"),
        (col("rating").cast("decimal(12,2)") * 1000000).cast("long").as("rm"),
        col("is_test")).collect()
    val train = tagged.filter(!_.getAs[Boolean]("is_test"))
    assert(train.length.toLong == row.getAs[Long]("n_train"))
    def floorDiv(num: Long, den: Long): Long =
      (num + 10000000000L * den) / den - 10000000000L
    val mu = floorDiv(train.map(_.getAs[Long]("rm")).sum, train.length)
    val anItem = train.head.getAs[Long]("item_id")
    val mine = train.filter(_.getAs[Long]("item_id") == anItem)
    val bi = floorDiv(mine.map(_.getAs[Long]("rm") - mu).sum, mine.length + 5L)
    // the damped bias shrinks the residual mean toward zero
    val rawResid = floorDiv(mine.map(_.getAs[Long]("rm") - mu).sum, mine.length)
    assert(math.abs(bi) <= math.abs(rawResid) + 1,
      s"damping failed to shrink: bi=$bi raw=$rawResid")
    // and the gated verdicts are internally consistent with the SSEs
    // (centi²-unit BIGINT sums since round 10 — HUGEINT-free oracle)
    val (sim, sit, sfull) = (
      row.getAs[Long]("sse_itemmean_c2"),
      row.getAs[Long]("sse_item_c2"),
      row.getAs[Long]("sse_full_c2"))
    assert(sim > 0 && sit > 0 && sfull > 0)
    assert(row.getAs[Boolean]("shrinkage_wins") == (sit <= sim))
    assert(row.getAs[Boolean]("user_term_wins") == (sfull <= sit))
    assert(row.getAs[Long]("mse_item_centi2") == sit / row.getAs[Long]("n_test"))
  }

  test("r48: fold-in lands on the trained factor for every panel user and " +
    "the dense solve inverts a known system") {
    // the op's own contract, asserted directly (the oracle pins TRUE)
    val rows = ops.Recommend.r48(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("cos_ok")),
      "a fold-in factor diverged from the trained factor")
    assert(rows.forall(_.getAs[Boolean]("full_slate")))
    // solver sanity on a deterministic SPD system: A = MᵀM + I, b = A·x
    val m = Array.tabulate(8, 8)((i, j) => ((i * 13 + j * 7) % 11 - 5).toDouble)
    val a = Array.tabulate(8 * 8) { k =>
      val (i, j) = (k / 8, k % 8)
      (0 until 8).map(t => m(t)(i) * m(t)(j)).sum + (if (i == j) 1.0 else 0.0)
    }
    val x = Array.tabulate(8)(i => (i - 3.5) / 2.0)
    val b = Array.tabulate(8)(i =>
      (0 until 8).map(j => a(i * 8 + j) * x(j)).sum)
    val got = ops.Recommend.solve8ForTest(a, b)
    assert(x.zip(got).forall { case (e, g) => math.abs(e - g) < 1e-9 },
      s"solver drift: ${got.mkString(",")}")
  }

  test("r51: item fold-in lands on MLlib's own next item half-step " +
    "(6-iter replay) for every panel item, with a full notify slate") {
    val rows = ops.Recommend.r51(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("cos_ok")),
      "an item fold-in factor diverged from the 6-iter replay target")
    assert(rows.forall(_.getAs[Boolean]("full_slate")))
    // panel membership is exactly the % 89 rule over rated items
    val expect = etl.Ratings.implicitRatings(spark, sf)
      .select("item_id").distinct().collect()
      .map(_.getLong(0)).filter(_ % 89 == 0).sorted
    assert(rows.map(_.getAs[Long]("item_id")).sorted.sameElements(expect))
  }

  test("r47: Slope One rational replays driver-side from raw ratings") {
    val preds = ops.Recommend.r47(spark, sf).limit(2000).collect()
    assert(preds.nonEmpty)
    // every prediction is a well-formed rational with pred = num/den @6dp
    preds.foreach { p =>
      val (num, den) = (p.getAs[Long]("num"), p.getAs[Long]("den"))
      assert(den > 0, "zero-support prediction emitted")
      val expect = BigDecimal(num.toDouble / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(p.getAs[Double]("pred") == expect, s"pred != num/den for $p")
    }
    // full protocol replay for one served user: rebuild deviations and
    // the weighted sum from the raw rating matrix in plain Scala
    val u = preds.head.getAs[Long]("user_id")
    val all = etl.Ratings.implicitRatings(spark, sf)
      .select(col("user_id"), col("item_id"), col("rating").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = all.groupBy(_._1).map { case (k, v) =>
      k -> v.map(t => t._2 -> t._3).toMap }
    val mine = byUser(u)
    preds.filter(_.getAs[Long]("user_id") == u).foreach { p =>
      val i = p.getAs[Long]("item_id")
      assert(!mine.contains(i), "predicted an already-rated item")
      var (num, den) = (0L, 0L)
      for ((j, ruj) <- mine) {
        // deviation of target i vs j over all co-raters
        var (sdiff, c) = (0L, 0L)
        for ((_, ri) <- byUser if ri.contains(i) && ri.contains(j)) {
          sdiff += ri(i) - ri(j); c += 1
        }
        if (c > 0) { num += sdiff + ruj * c; den += c }
      }
      assert(num == p.getAs[Long]("num") && den == p.getAs[Long]("den"),
        s"rational mismatch for (u=$u, i=$i): scala ($num,$den) vs $p")
    }
  }
}
