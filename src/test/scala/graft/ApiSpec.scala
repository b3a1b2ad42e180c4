package graft

import org.apache.spark.sql.functions._

/** The generic-API contract: every kernel in graft.api runs on a
  * USER-SCHEMA DataFrame built inline here — different column names,
  * no testdata directory anywhere — and its semantics replay
  * driver-side. (Oracle parity for the same kernels is covered by the
  * gated dNN/sNN keys, which delegate to graft.api.) */
class ApiSpec extends SparkSpec {

  // a tiny user corpus with its OWN schema: planted exact duplicate
  // (101/104) and near-duplicate (102/105: one token appended)
  private lazy val userDocs = {
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the cat watches from the warm windowsill nearby"
    val other = "completely different content about distributed query " +
      "engines shuffling partitioned columnar data across executors"
    spark.createDataFrame(Seq(
      (101L, base),
      (102L, base + " tonight"),
      (103L, other),
      (104L, base),
      (105L, base + " tonight extra"),
      (106L, other + " with a long appended tail of unrelated words " +
        "that drops jaccard below any sensible duplicate threshold " +
        "because the overlap fraction shrinks fast")
    )).toDF("item_key", "body")
  }

  test("api.Dedup.exactGroups keeps the lowest id of the planted pair") {
    val groups = api.Dedup.exactGroups(userDocs, "item_key", "body")
      .filter(col("n_docs") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep") == 101L)
    assert(groups.head.getAs[Long]("drop_max") == 104L)
  }

  test("api.Dedup.lshCandidates surfaces the exact pair and stays reflexive-free") {
    val cands = api.Dedup.lshCandidates(userDocs, "item_key", "body")
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    assert(cands.contains((101L, 104L)), "exact copy not a candidate")
    cands.foreach { case (a, b) => assert(a < b, s"unordered pair ($a,$b)") }
  }

  test("api.Dedup.nearDuplicates verifies with exact jaccard and respects the threshold") {
    val nd = api.Dedup.nearDuplicates(userDocs, "item_key", "body",
      threshold = 0.6).collect()
    val pairs = nd.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(pairs.contains((101L, 104L)))
    nd.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.6 && j <= 1.0)
      if (r.getAs[Long]("a") == 101L && r.getAs[Long]("b") == 104L)
        assert(j == 1.0, "identical docs must score jaccard 1")
    }
    // the long-tail doc must NOT pair with its base at 0.6
    assert(!pairs.contains((103L, 106L)),
      "tail-extended doc wrongly verified as near-dup")
  }

  test("api.Text.withQualityPpm is exact integer ppm and handles empty text") {
    val df = spark.createDataFrame(Seq(
      (1L, Seq.fill(200)("word").mkString(" ")),     // saturated length
      (2L, "the a of and"),                          // all stopwords
      (3L, ""),                                      // zero tokens
      (4L, Seq.fill(50)("term").mkString(" "))       // half length, no stops
    )).toDF("k", "txt")
    val got = api.Text.withQualityPpm(df, "txt",
        stopwords = Seq("the", "a", "of", "and"))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Int]("n_tokens"), r.getAs[Long]("quality_ppm"))).toMap
    assert(got(1L) == ((200, 1000000L)), "full-length no-stop must max out")
    assert(got(2L) == ((4, 20000L)), "all-stopword doc: length term only")
    assert(got(3L) == ((0, 0L)), "empty text must score 0, not error")
    assert(got(4L) == ((50, 750000L)), "half length + clean = 250k + 500k")
  }

  test("api.Text.languageId predicts by marker counts with order ties") {
    val markers = Seq(
      "en" -> Seq("the", "and"), "de" -> Seq("der", "und"))
    val df = spark.createDataFrame(Seq(
      (1L, "the cat and the hat"),
      (2L, "der hund und der ball"),
      (3L, "no marker words here at all")  // 0-0 tie → first language
    )).toDF("k", "txt")
    val got = api.Text.languageId(df, "k", "txt", markers)
      .collect().map(r => r.getAs[Long]("k") ->
        r.getAs[String]("predicted")).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "en"))
  }

  test("api.Chunks.contentDefined is shift-immune where fixed-width is not") {
    val body = (1 to 120).map(i => s"tok$i").mkString(" ")
    val df = spark.createDataFrame(Seq(
      (1L, body),
      (2L, "inserted head words " + body)  // prefix shift
    )).toDF("k", "txt")
    val chunks = api.Chunks.contentDefined(df, "k", "txt", avgTokens = 8)
      .collect()
    val h1 = chunks.filter(_.getAs[Long]("k") == 1L)
      .map(_.getAs[Long]("chunk_hash")).toSet
    val h2 = chunks.filter(_.getAs[Long]("k") == 2L)
      .map(_.getAs[Long]("chunk_hash")).toSet
    // content-defined boundaries realign after the insertion: all but
    // the head chunk(s) of the original reappear verbatim in the copy
    val shared = (h1 & h2).size
    assert(shared >= h1.size - 2,
      s"only $shared of ${h1.size} chunks survived a prefix insertion")
    // chunk_no is a contiguous 0-based sequence per doc
    val nos = chunks.filter(_.getAs[Long]("k") == 1L)
      .map(_.getAs[Long]("chunk_no")).sorted
    assert(nos.head == 0L && nos.toSeq == (0L until nos.length).toSeq)
  }

  test("api.Events.sessionize assigns gap sessions deterministically") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val df = spark.createDataFrame(Seq(
      ("u1", 1L, at(0)), ("u1", 2L, at(10)),   // session 1
      ("u1", 3L, at(70)),                      // gap 60m > 30m → session 2
      ("u1", 4L, at(75)),
      ("u2", 5L, at(0)), ("u2", 6L, at(31))    // 31m gap → two sessions
    )).toDF("acct", "seq", "when_ts")
    val got = api.Events.sessionize(df, "acct", "when_ts", "seq",
        gapSeconds = 1800)
      .collect().map(r => (r.getAs[String]("acct"), r.getAs[Long]("seq")) ->
        r.getAs[Long]("session_id")).toMap
    assert(got == Map(("u1", 1L) -> 1L, ("u1", 2L) -> 1L,
      ("u1", 3L) -> 2L, ("u1", 4L) -> 2L,
      ("u2", 5L) -> 1L, ("u2", 6L) -> 2L))
  }

  test("api.TopK.perGroup matches a driver-side sort") {
    val df = spark.createDataFrame(Seq(
      ("g1", 1L, 10.0), ("g1", 2L, 30.0), ("g1", 3L, 20.0),
      ("g2", 4L, 5.0), ("g2", 5L, 5.0), ("g2", 6L, 1.0)
    )).toDF("grp", "row_id", "score")
    val got = api.TopK.perGroup(df, Seq("grp"),
        Seq(col("score").desc, col("row_id").asc), k = 2)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Int]("rank"),
        r.getAs[Long]("row_id"))).toSet
    assert(got == Set(("g1", 1, 2L), ("g1", 2, 3L),
      ("g2", 1, 4L), ("g2", 2, 5L)))
  }

  test("api.Recommend.alsTopK serves ranked unseen items on a user frame") {
    // 6 users × 8 items, block preference structure: evens like
    // low items, odds like high items
    val rows = for (u <- 0 until 6; i <- 0 until 8
                    if (u % 2 == 0) == (i < 4)) yield (u.toLong, i.toLong, 1.0)
    val df = spark.createDataFrame(rows).toDF("member", "product", "w")
    val recs = api.Recommend.alsTopK(df, "member", "product", "w", k = 3)
      .collect()
    val byUser = recs.groupBy(_.getAs[Int]("member"))
    assert(byUser.size == 6, "a user got no recommendations")
    byUser.values.foreach { rs =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rs.length).toSeq)
      // scores non-increasing in rank
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(
          a.getAs[Float]("score") >= b.getAs[Float]("score"))
        case _ => ()
      }
    }
    // no served item was in the user's history
    val seen = rows.map(r => (r._1.toInt, r._2.toInt)).toSet
    recs.foreach { r =>
      assert(!seen.contains((r.getAs[Int]("member"), r.getAs[Int]("product"))),
        "served an already-seen item")
    }
  }

  test("api.Ann.bruteForceTopK returns exact ranked neighbors on a user frame") {
    // 4 points on the plane, padded to length-4 vectors
    def v(x: Double, y: Double) = Seq(x, y, 0.0, 0.0)
    val df = spark.createDataFrame(Seq(
      (1L, v(1, 0)), (2L, v(0.9, 0.1)), (3L, v(0, 1)), (4L, v(-1, 0.05))
    )).toDF("pid", "emb")
    val res = api.Ann.bruteForceTopK(df, df.filter(col("pid") === 1L),
        "pid", "emb", "pid", "emb", k = 3)
      .orderBy("rank").collect()
    assert(res.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L, 4L),
      "cosine ranking disagrees with geometry")
    assert(res.head.getAs[Double]("cosine") > 0.99)
  }

  test("api.Ann.knnGraph builds a degree-bounded graph from dense ids") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("point"),
        col("embedding").cast("array<double>").as("feat"))
    val g = api.Ann.knnGraph(emb, "point", "feat", degree = 4, rounds = 2)
    val rows = g.collect()
    val deg = rows.groupBy(_.getLong(0)).map(_._2.length)
    assert(deg.max <= 4)
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(deg.size.toLong == emb.count(), "a node lost its adjacency")
  }

  test("api.Curation funnel shrinks monotonically and survivors exclude planted dups") {
    val counts = api.Curation.funnelCounts(userDocs, "item_key", "body",
        minTokens = 5)
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs"))
      .toMap
    assert(counts("a_raw") == 6L)
    assert(counts("b_quality") <= counts("a_raw"))
    assert(counts("c_exact_dedup") < counts("b_quality"),
      "exact stage failed to drop the planted copy")
    assert(counts("d_near_dedup") < counts("c_exact_dedup"),
      "near-dup stage failed to drop the planted near-copy")
    val surv = api.Curation.funnelSurvivors(userDocs, "item_key", "body",
      minTokens = 5).collect().map(_.getAs[Long]("item_key")).toSet
    assert(surv.size.toLong == counts("d_near_dedup"))
    assert(!surv.contains(104L) && surv.contains(101L))
  }
}
