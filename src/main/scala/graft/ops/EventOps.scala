package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream analytics, batch form (e01..e04): tumbling windows,
  * gap sessionization, ordered funnels, cohort retention. The
  * streaming (Structured Streaming) counterparts live in
  * graft.streaming.Streams and are exercised in ScalaTest.
  *
  * Scale: every op shuffles once on user_id (or the window key);
  * sessionization is a partitioned window scan, the funnel is one
  * pivot-style agg — no self-joins on the raw stream.
  */
object EventOps {

  // e01: tumbling 1-hour window counts/sums per event type.
  def e01(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start")).as("hour_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_us", "event_type")

  val e01Sql: String =
    """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS hour_us, event_type,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // e02: gap-based sessionization (30-min inactivity closes a session).
  // (api.Events.sessionize is the generic form — this key is its gate)
  def e02(s: SparkSession, d: String): DataFrame = {
    val sess = graft.api.Events.sessionize(Tables.events(s, d),
      "user_id", "ts", tieBreak = "event_id", gapSeconds = 1800)
    sess.groupBy("user_id", "session_id").agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max(col("n_events")).as("max_session_events"),
        sum(col("n_events")).as("n_events"))
      .orderBy("user_id")
  }

  val e02Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      OR lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, event_id,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_id
      |  FROM tagged),
      |per_session AS (
      |  SELECT user_id, session_id, count(*) AS n_events
      |  FROM sess GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions, max(n_events) AS max_session_events,
      |  CAST(sum(n_events) AS BIGINT) AS n_events
      |FROM per_session GROUP BY 1 ORDER BY user_id""".stripMargin

  // e03: ordered funnel — users whose first view < first click < first
  // purchase. One agg with conditional mins; no joins.
  def e03(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "click", col("ts"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"))
      .filter(col("first_view") < col("first_click") &&
        col("first_click") < col("first_purchase"))
      .select(col("user_id"),
        unix_micros(col("first_view")).as("view_us"),
        unix_micros(col("first_click")).as("click_us"),
        unix_micros(col("first_purchase")).as("purchase_us"))
      .orderBy("user_id")

  val e03Sql: String =
    """SELECT user_id, epoch_us(first_view) AS view_us,
      |  epoch_us(first_click) AS click_us, epoch_us(first_purchase) AS purchase_us
      |FROM (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
      |    min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      |  FROM events GROUP BY 1)
      |WHERE first_view < first_click AND first_click < first_purchase
      |ORDER BY user_id""".stripMargin

  // e04: next-day retention per activity date.
  def e04(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val next = days.select(col("user_id").as("u2"), col("day").as("day2"))
    days.join(next, col("u2") === col("user_id") &&
        col("day2") === date_add(col("day"), 1), "left")
      .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("active"),
        countDistinct(when(col("u2").isNotNull, col("user_id"))).as("retained"))
      .orderBy("day")
  }

  val e04Sql: String =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT strftime(a.day, '%Y-%m-%d') AS day,
      |  count(DISTINCT a.user_id) AS active,
      |  count(DISTINCT CASE WHEN b.user_id IS NOT NULL THEN a.user_id END) AS retained
      |FROM days a LEFT JOIN days b
      |  ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
      |GROUP BY a.day ORDER BY day""".stripMargin

  // e05: semi-structured extraction — the props JSON column parsed and
  // aggregated. get_json_object is codegen'd; at scale prefer from_json
  // with an explicit schema once the shape is known (single parse).
  def e05(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  val e05Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Run `body` (a micro-batch stream build + drain) with
    * spark.sql.shuffle.partitions temporarily lowered. Stateful
    * streaming operators create one state store per shuffle partition
    * PER MICRO-BATCH; at the batch-analytics default (32 here) a
    * 3-batch interval join pays ~100 state-store open/commit cycles
    * for a few thousand rows — pure fixed overhead. The right number
    * tracks per-batch stream volume, not batch-table fan-out (the
    * standard Structured Streaming deployment tuning); results are
    * partition-count-independent, only the state plumbing shrinks.
    * Restored after the drain, so the sink-side batch rollup (executed
    * by the caller later) plans at the session default.
    *
    * Round 13 (guide §2.2 — fewer, larger partitions): a stack sample
    * of e44's 4 s micro-batches showed the time in per-partition state
    * plumbing, not data — every batch pays (partitions × stores-per-
    * operator) delta-file commits, each a create/rename/chmod chain on
    * the checkpoint FS (a stream-stream join keeps 4 stores per
    * partition, so 8 partitions = 32 commit chains per batch for a
    * ~40k-row state). Dropping the default to 2 cut e44 from 15.4 s of
    * trigger time to ~7 s and e20 from 5.5 s to ~4 s with identical
    * results. The per-key default suits the gate corpora (≤200k rows
    * per batch — two partitions keep each state store at the ~100 MB
    * guidance with orders of margin); a production deployment sizes it
    * from its own per-batch volume via spark.graft.streamShufflePartitions,
    * which overrides the per-key default when set. */
  /** Data-derived stream shuffle width (round 14, VERDICT r13 #6):
    * size state partitions from the PER-BATCH input volume instead of
    * a constant — every bounded gate runs maxFilesPerTrigger=1, so the
    * largest file under `path` bounds one batch; one partition per
    * ~32 MB of it, clamped to [2, session width]. The gate corpora
    * land 1–6 MB files, so this resolves to the measured optimum 2
    * (the 1/2/8-partition sweeps live in OPTIMIZATION_r13/r14.md); a
    * production deployment's bigger batches spread automatically, and
    * spark.graft.streamShufflePartitions still overrides everything.
    * Non-local paths (where java.nio can't stat) fall back to 2 — at
    * that point the deployment sets the override anyway. */
  private[ops] def streamPartitionsFor(s: SparkSession,
      path: java.nio.file.Path): Int = {
    import java.nio.file.Files
    val maxBytes: Long = try {
      if (!Files.exists(path)) 0L
      else if (Files.isRegularFile(path)) Files.size(path)
      else {
        val st = Files.walk(path)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala
            .filter(p => Files.isRegularFile(p))
            .map(p => Files.size(p))
            .maxOption.getOrElse(0L)
        } finally st.close()
      }
    } catch { case _: Exception => 0L }
    math.max(2, math.min(s.sparkContext.defaultParallelism,
      (maxBytes >> 25).toInt))
  }

  /** [[streamPartitionsFor]] over the shared events source file (the
    * Streams.eventStream gates: per-batch volume = events.parquet). */
  private def eventsParts(s: SparkSession, d: String): Int =
    streamPartitionsFor(s, java.nio.file.Paths.get(d, "events.parquet"))

  private def withStreamPartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    // the override, when set, takes precedence over every per-key
    // default n — it is the deployment-wide sizing knob
    val eff = s.conf.getOption("spark.graft.streamShufflePartitions")
      .map { v =>
        try v.trim.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"spark.graft.streamShufflePartitions must be an integer, got '$v'")
        }
      }.getOrElse(n)
    s.conf.set("spark.sql.shuffle.partitions", eff.toString)
    // Optional state-store provider override (round 14, VERDICT r13
    // #5): spark.graft.streamStateStoreProvider, scoped to the gated
    // stream exactly like the partition override; default unchanged
    // (HDFSBackedStateStoreProvider). Measured on these bounded gates
    // the RocksDB provider was a wash-to-loss (its per-partition
    // native-instance setup outweighs the already-small delta-commit
    // chains at 2 partitions), but a deployment with large per-batch
    // state sets it here without touching query code.
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = s.conf.getOption(provKey)
    val overProv = s.conf.getOption("spark.graft.streamStateStoreProvider")
    overProv.foreach(p => s.conf.set(provKey, p))
    try body finally {
      s.conf.set("spark.sql.shuffle.partitions", prev)
      if (overProv.isDefined) prevProv match {
        case Some(p) => s.conf.set(provKey, p)
        case None => s.conf.unset(provKey)
      }
    }
  }

  /** Run a BOUNDED streaming write under Trigger.AvailableNow (round
    * 13 — VERDICT r12 #1): the e16/e17/e19/e20/e21/e44 gates all
    * drain a finite landing dir, but under the default trigger +
    * processAllAvailable the query keeps scheduling idle ticks while
    * the poll handshake settles — the r12 bench measured those six
    * keys 2.1–7.6× slower with BIT-IDENTICAL stage/task counts, pure
    * micro-batch scheduling latency on a heavier session.
    * AvailableNow plans exactly the already-landed files (micro-batch
    * sequencing still honors maxFilesPerTrigger, so the
    * two-batches-back watermark choreography is unchanged), runs the
    * trailing no-data batch that flushes finalized state, and
    * TERMINATES itself. Batch count + summed triggerExecution ms land
    * in [[graft.streaming.MicroBatch]] under `key`, so the bench line
    * decomposes any future drift into more-batches vs slower-batches.
    */
  private[ops] def runAvailableNow(key: String,
      w: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row])
      : Unit = {
    val q = w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      if (!q.awaitTermination(600000L))
        throw new IllegalStateException(
          s"$key: AvailableNow query did not terminate within 600s")
    } finally {
      if (q.isActive) q.stop()
      graft.streaming.MicroBatch.note(key, q)
    }
  }

  // e06: the SAME hourly rollup as e01, computed through Structured
  // Streaming (file micro-batches → complete-mode memory sink) and
  // checked against e01's oracle — proving batch/stream symmetry.
  def e06(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_e06_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(s, eventsParts(s, d)) {
      runAvailableNow("e06", graft.streaming.Streams
        .tumblingCounts(graft.streaming.Streams.eventStream(s, d))
        .writeStream.outputMode("complete")
        .format("memory").queryName(sink))
    }
    s.table(sink)
      .select(unix_micros(col("hour")).as("hour_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_us", "event_type")
  }

  // e07: gap sessionization through the STATEFUL API
  // (flatMapGroupsWithState, same code path the streaming variant
  // uses — Spark runs it as a single group pass in batch mode),
  // checked against the window-formulation oracle. Proves the
  // custom-state operator against an independent engine.
  def e07(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.streaming.Streams.sessionize(
        graft.streaming.Streams.typedEvents(s, d))
      .toDF()
      .select(col("user_id"), col("n_sessions").cast("long").as("n_sessions"),
        col("n_events"))
      .orderBy("user_id")
  }

  val e07Sql: String =
    """WITH tagged AS (
      |  SELECT user_id,
      |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
      |      OR lag(epoch_ms(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events)
      |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM tagged GROUP BY 1 ORDER BY user_id""".stripMargin

  // e08: schema-declared JSON parsing (from_json) — at scale, ONE parse
  // per row into a typed struct beats per-field get_json_object; the
  // struct then feeds ordinary typed expressions.
  def e08(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("p", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
      .groupBy((col("p.k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum(col("p.k")).as("sum_k"))
      .orderBy("k_mod")

  val e08Sql: String =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
      |  count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1 ORDER BY k_mod""".stripMargin

  // e09: stream-stream interval join (purchases ⋈ clicks in the prior
  // hour, per user) run through Structured Streaming micro-batches and
  // gated against DuckDB's batch interval join — the join-state
  // eviction semantics under the correctness gate, not just ScalaTest.
  def e09(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_e09_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(s, eventsParts(s, d)) {
      runAvailableNow("e09", graft.streaming.Streams
        .purchaseClickPairs(graft.streaming.Streams.eventStream(s, d))
        .writeStream.outputMode("append")
        .format("memory").queryName(sink))
    }
    s.table(sink)
      .groupBy(col("p_user").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  val e09Sql: String =
    """SELECT p.user_id, count(*) AS n_pairs
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // e10: streaming dedup under the gate — dropDuplicates over
  // micro-batches, then a batch rollup of the deduped sink; the oracle
  // is the batch count(DISTINCT), so the stream must dedup exactly.
  def e10(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_e10_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(s, eventsParts(s, d)) {
      runAvailableNow("e10", graft.streaming.Streams
        .dedupPairs(graft.streaming.Streams.eventStream(s, d))
        .writeStream.outputMode("append")
        .format("memory").queryName(sink))
    }
    s.table(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
  }

  val e10Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // e19: stream dedup with BOUNDED state — e10's dropDuplicates keeps
  // every key forever (state grows without bound on an endless
  // stream); dropDuplicatesWithinWatermark is the production API:
  // duplicates are dropped within the watermark horizon and state
  // evicts as the watermark advances. The corpus spans 30 days, the
  // watermark 60 — so within-horizon dedup here equals exact distinct
  // and the e10 oracle gates it; on a real endless stream only the
  // eviction behavior differs, which is exactly the point.
  def e19(s: SparkSession, d: String): DataFrame = {
    val sink = "graft_e19_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(s, eventsParts(s, d)) {
      runAvailableNow("e19", graft.streaming.Streams.eventStream(s, d)
        .withWatermark("ts", "60 days")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .writeStream.outputMode("append")
        .format("memory").queryName(sink))
    }
    s.table(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("event_type")
      .localCheckpoint()
  }

  // e11: stream-static enrichment join — the stream picks up a
  // per-user segment from a (broadcast) batch dimension, then a batch
  // rollup of the enriched sink is gated against computing the same
  // segments directly in the oracle.
  def e11(s: SparkSession, d: String): DataFrame = {
    val dim = graft.Tables.events(s, d).select("user_id").distinct()
      .withColumn("seg", col("user_id") % 5)
    val sink = "graft_e11_" + java.util.UUID.randomUUID().toString.replace("-", "")
    runAvailableNow("e11", graft.streaming.Streams
      .enrich(graft.streaming.Streams.eventStream(s, d), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName(sink))
    s.table(sink)
      .groupBy("seg", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("seg", "event_type")
  }

  val e11Sql: String =
    """SELECT user_id % 5 AS seg, event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // e12: sliding 1-hour windows advancing every 30 minutes — each
  // event lands in duration/slide = 2 windows. Spark's window() emits
  // the per-event window structs inline (a 2× row fan-out absorbed by
  // map-side partial agg before the single exchange — the fan-out
  // never crosses the shuffle as raw events). Epoch-aligned starts
  // match DuckDB's time_bucket, so the oracle is the union of the
  // two 30-minute-offset bucketings.
  def e12(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("win_us", "event_type")

  val e12Sql: String =
    """WITH slid AS (
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart, event_type, value
      |  FROM events
      |  UNION ALL
      |  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
      |    event_type, value
      |  FROM events)
      |SELECT epoch_us(wstart) AS win_us, event_type, count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value
      |FROM slid GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // e13: STREAMING heavy hitters — the Misra–Gries aggregate running
  // inside a Structured Streaming aggregation (complete mode): each
  // micro-batch's partial summaries merge into the state-store buffer,
  // and the mergeable-summary property is exactly what keeps the
  // error bound N/(k+1) over the whole stream, however the batches
  // split. Hot keys constructed as in q41 (a third of events collapse
  // onto 4 keys over ~all user ids); the gate is the same
  // order-independent pair of booleans (membership + error bound)
  // against the batch-exact counts.
  def e13(s: SparkSession, d: String): DataFrame = {
    val k = 24
    val hk = when(col("user_id") % 3 === 0,
      concat(lit("hot"), (col("user_id") % 4).cast("string")))
      .otherwise(concat(lit("u"), col("user_id").cast("string")))
    val sink = "graft_e13_" + java.util.UUID.randomUUID().toString.replace("-", "")
    runAvailableNow("e13", graft.streaming.Streams.eventStream(s, d)
      .select(hk.as("hk"))
      .agg(graft.functions.MisraGriesAgg.misraGries(col("hk"), k).as("mg"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(sink))
    val sketch = s.table(sink).select(col("mg"))
    val keyed = Tables.events(s, d).select(hk.as("hk"))
    val exact = keyed.groupBy("hk").agg(count(lit(1)).as("cnt"))
    val totals = keyed.agg(count(lit(1)).as("n"))
    exact.crossJoin(totals).crossJoin(sketch)
      .filter(col("cnt") > col("n") / 16.0)
      .select(col("hk"), col("cnt"),
        element_at(col("mg"), col("hk")).isNotNull.as("in_sketch"),
        (col("cnt") - coalesce(element_at(col("mg"), col("hk")), lit(0L))
          <= col("n") / (k + 1).toDouble).as("bound_ok"))
      .orderBy("hk")
  }

  val e13Sql: String =
    """WITH keyed AS (
      |  SELECT CASE WHEN user_id % 3 = 0 THEN 'hot' || (user_id % 4)
      |              ELSE 'u' || user_id END AS hk
      |  FROM events),
      |tot AS (SELECT count(*) AS n FROM keyed)
      |SELECT hk, count(*) AS cnt, true AS in_sketch, true AS bound_ok
      |FROM keyed, tot
      |GROUP BY hk, n HAVING count(*) > n / 16.0
      |ORDER BY hk""".stripMargin

  // e15: NATIVE session windows — Spark's session_window merges
  // events into dynamic [start, last+gap) windows inside ordinary
  // aggregation (and, in streaming, with state-store merge support),
  // vs e02's hand-rolled lag/cumsum and e07's flatMapGroupsWithState.
  // All three formulations are gated against the SAME gap-session
  // oracle, pinning the operator-family equivalence. One shuffle on
  // (user, session) then a per-user rollup.
  def e15(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_sessions"),
        sum("n_events").as("n_events"))
      .orderBy("user_id")

  // Full-microsecond gap comparison: session_window compares complete
  // timestamps, so the oracle must too — epoch_ms truncation would
  // classify a gap within 1ms of the 30-minute boundary differently.
  // Boundary convention pinned empirically (OpsSpec "session_window
  // gap boundary"): an event exactly gap after the previous one
  // MERGES into the session, so strictly-greater (`>`) is correct.
  val e15Sql: String =
    """WITH tagged AS (
      |  SELECT user_id,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      OR lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events)
      |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
      |FROM tagged GROUP BY 1 ORDER BY user_id""".stripMargin

  // e16: WATERMARK LATE-DATA SEMANTICS under the gate — the one
  // streaming-correctness behavior the e-series hadn't directly
  // gated: an append-mode windowed aggregation must DROP rows that
  // arrive after the watermark has passed their window. Three
  // controlled micro-batches (maxFilesPerTrigger=1, file modTimes
  // pin the order): (1) the even-HOUR half of the corpus advances
  // the watermark to max(even ts) − 26h; (2) the odd-hour half
  // arrives "late" — only rows whose 1h window is still open
  // (window end > watermark) may count; (3) a far-future sentinel
  // pushes the watermark past every real window so append mode
  // emits them all (the sentinel's own window stays unemitted and is
  // filtered). The oracle recomputes exactly the surviving set, so
  // the stream must drop exactly the right rows — not more, not
  // fewer. The drop boundary (end > wm keeps) is pinned in
  // StreamingSpec.
  def e16(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ev = Tables.events(s, d).select("event_id", "ts", "event_type")
    val dirP = Files.createTempDirectory("graft_e16_")
    val streamDir = dirP.resolve("stream")
    Files.createDirectories(streamDir)
    val sink = "graft_e16_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val maxEvenTs = ev.filter(hour(col("ts")) % 2 === 0)
        .agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val sentinelSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType)))
      val sentinel = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          0L, java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(10L * 86400)),
          "sentinel")),
        sentinelSchema)
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp) // close: each leaked stream holds an fd
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = streamDir.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      // the late-events filter runs on the watermark as of TWO batches
      // back (Spark finalizes a batch's watermark after it commits, and
      // the late filter uses the PREVIOUS committed value) — so a
      // "nudge" batch sits between the head and the stragglers: it
      // carries one sentinel-typed event at the head's max ts (advances
      // nothing, excluded from output) purely so the stragglers' batch
      // runs with the head-derived late watermark in force.
      val nudge = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(0L, maxEvenTs, "sentinel")),
        sentinelSchema)
      val t0 = System.currentTimeMillis()
      land(ev.filter(hour(col("ts")) % 2 === 0), "batch0", t0 - 80000)
      land(nudge, "batch1", t0 - 60000)
      land(ev.filter(hour(col("ts")) % 2 === 1), "batch2", t0 - 40000)
      land(sentinel, "batch3", t0 - 20000)
      val stream = s.readStream
        .schema("event_id LONG, ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val agg = stream.withWatermark("ts", "26 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      withStreamPartitions(s, streamPartitionsFor(s, streamDir)) {
        runAvailableNow("e16", agg.writeStream.outputMode("append")
          .format("memory").queryName(sink))
      }
      s.table(sink)
        .filter(col("event_type") =!= "sentinel")
        .select(unix_micros(col("window.start")).as("hour_us"),
          col("event_type"), col("n"))
        .orderBy("hour_us", "event_type")
        .localCheckpoint()
    } finally {
      s.catalog.dropTempView(sink)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e16Sql: String =
    """WITH ehead AS (SELECT * FROM events WHERE hour(ts) % 2 = 0),
      |late AS (SELECT * FROM events WHERE hour(ts) % 2 = 1),
      |wm AS (SELECT max(ts) - INTERVAL 26 HOUR AS w FROM ehead),
      |surv AS (
      |  SELECT late.* FROM late, wm
      |  WHERE time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR > wm.w),
      |allr AS (SELECT * FROM ehead UNION ALL SELECT * FROM surv)
      |SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS hour_us,
      |  event_type, count(*) AS n
      |FROM allr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // e17: failure/RECOVERY — the cluster-operations half of the
  // streaming story the e01–e16 semantics gates don't touch. A
  // file-source stream runs against a checkpointLocation, is STOPPED
  // (the "failure") while more data lands, then a second incarnation
  // restarts from the same checkpoint: the source offset log replays
  // only not-yet-committed files, and the parquet sink's commit log
  // (_spark_metadata) keeps the first incarnation's output
  // exactly-once. The gate returns the sink's committed rows against
  // the plain batch oracle over the same slice — a re-processed file
  // (duplicates) or a lost file (missing rows) hash-fails. The
  // restart-reads-only-the-remainder half is pinned in StreamingSpec
  // via the second incarnation's progress counters.
  private[graft] def e17WithStats(s: SparkSession, d: String): (DataFrame, Long) = {
    val dirP = java.nio.file.Files.createTempDirectory("graft_e17_")
    val landing = dirP.resolve("landing").toString
    val ckpt = dirP.resolve("ckpt").toString
    val out = dirP.resolve("out").toString
    try {
      val docs = Tables.documents(s, d)
        .select("doc_id", "lang", "source", "n_chars")
      docs.filter(col("doc_id") < 30).repartition(3)
        .write.parquet(landing)
      def runOnce(): Long = {
        val q = s.readStream
          .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG")
          .option("maxFilesPerTrigger", "1")
          .parquet(landing)
          .withColumn("lang_class",
            when(col("lang") === "en", lit("en")).otherwise(lit("other")))
          .writeStream.outputMode("append")
          .format("parquet")
          .option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try {
          if (!q.awaitTermination(600000L))
            throw new IllegalStateException(
              "e17: AvailableNow query did not terminate within 600s")
          q.recentProgress.map(_.numInputRows).sum
        } finally {
          if (q.isActive) q.stop()
          graft.streaming.MicroBatch.note("e17", q)
        }
      }
      runOnce() // first incarnation sees only the first 30 docs
      // the query is DOWN while more data lands — then restarts from
      // the same checkpoint
      docs.filter(col("doc_id") >= 30 && col("doc_id") < 60).repartition(3)
        .write.mode("append").parquet(landing)
      val run2Rows = runOnce()
      // _spark_metadata-aware read: only COMMITTED sink files count
      val result = s.read.parquet(out)
        .orderBy("doc_id")
        .localCheckpoint() // pin rows so the finally can delete the dirs
      (result, run2Rows)
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  def e17(s: SparkSession, d: String): DataFrame = e17WithStats(s, d)._1

  val e17Sql: String =
    """SELECT doc_id, lang, source, n_chars,
      |  CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS lang_class
      |FROM documents WHERE doc_id < 60 ORDER BY doc_id""".stripMargin

  // e18: broker-shaped INGEST — every other e-query streams from
  // landed files; a cluster deployment ingests from an unbounded
  // broker (Kafka). The connector jar isn't in this environment, so
  // the gated stand-in is Spark's rate-micro-batch source — the
  // public unbounded source with DETERMINISTIC per-batch content
  // (value = cumulative row number) — and the pipeline is the Kafka
  // consumer shape: key the payload (value % 10 ≈ partition key),
  // aggregate per key, complete-mode sink. At deployment the
  // readStream swaps to format("kafka") + subscribe options; nothing
  // downstream changes. The claim is BOUNDED on an unbounded source
  // via the value filter (< N): however many extra batches fire
  // before stop(), they contribute nothing — so the gate is exact,
  // not timing-dependent. The oracle regenerates the same integer
  // interval relationally (DuckDB range(N)) — a lost or doubled
  // micro-batch hash-fails.
  def e18(s: SparkSession, d: String): DataFrame = {
    // 2 batches of 2500, not 5 of 1000 (round 13 — VERDICT r12 #1):
    // the r12 bench measured e18 at a 17.8 s floor both runs with the
    // job count (47→89) showing the unbounded source spinning no-op
    // scheduling ticks while the poll loop waited — the wall is
    // per-micro-batch SCHEDULING latency, not data. n stays 5000 so
    // the oracle (range(5000)) and the gate hash are unchanged; ≥2
    // batches keeps the offset-contiguity claim real. The measured
    // per-batch floor is pinned in BASELINE.md §6 from the ledger's
    // durationMs below.
    val rowsPerBatch = 2500L
    val batches = 2
    val n = rowsPerBatch * batches
    val sink = "graft_e18_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val agg = s.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("startTimestamp", "0")
      .load()
      .filter(col("value") < n)
      .select(col("value"), (col("value") % 10).as("part_key"))
      .groupBy("part_key")
      .agg(count(lit(1)).as("n_rows"), sum("value").as("sum_v"))
    // Offset ledger via a listener, NOT q.recentProgress: recentProgress
    // is a ring buffer (spark.sql.streaming.numRecentProgressUpdates,
    // default 100) and a slow host can tick past 100 micro-batches
    // inside the 60 s poll loop — the earliest ranges would silently
    // drop and offsets_contiguous would hash-fail for a harness reason.
    // The listener sees EVERY progress event; keyed by batchId so a
    // re-delivered event can't double-count. Registered BEFORE start
    // (matched by query name) so batch 0 can't be missed.
    val progressLog =
      new java.util.concurrent.ConcurrentHashMap[Long, (String, String, Long, Double)]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        ev: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = ev.progress
        if (p.name == sink && p.sources.nonEmpty)
          progressLog.put(p.batchId,
            (p.sources.head.startOffset, p.sources.head.endOffset,
              p.sources.head.numInputRows,
              Option(p.durationMs.get("triggerExecution"))
                .map(_.toDouble).getOrElse(0.0))): Unit
      }
      override def onQueryTerminated(
        e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    s.streams.addListener(listener)
    // rate-micro-batch source: rows are generated in-JVM (no landed
    // files to size from), volume fixed by the gate literal — the
    // constant stays; a real deployment sets the override conf
    try withStreamPartitions(s, 2) {
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(sink)
        .start()
      try {
        // an unbounded source never drains, so processAllAvailable can't
        // terminate it — poll the sink until the bounded claim is fully
        // delivered (extra in-flight batches are no-ops past the filter)
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        def delivered(): Long = {
          val r = s.table(sink).agg(coalesce(sum("n_rows"), lit(0L))).collect()(0)
          r.getLong(0)
        }
        while (delivered() < n && System.nanoTime() < deadline)
          Thread.sleep(50)
        q.stop()
        // fail LOUDLY on a stalled host rather than freezing a partial
        // snapshot: a silent under-count downstream would hash-fail in
        // a way that reads as an engine correctness bug
        val got = delivered()
        if (got < n) throw new IllegalStateException(
          s"e18 ingest timed out: $got of $n rows delivered within 60s")
        // OFFSET ACCOUNTING, gated (the contract a Kafka swap-in must
        // keep — format("kafka") changes only the source line): every
        // micro-batch's [start, end) offset range must tile the
        // consumed prefix with no gap and no overlap (contiguous:
        // batch k's start == batch k-1's end, first start == 0), and
        // the input-row ledger must equal the offset span — one row
        // per offset, delivered exactly once. Both booleans ride
        // every output row; the oracle pins them TRUE.
        // Listener events are delivered async on the listener bus —
        // wait (bounded) until the ledger accounts for every consumed
        // row before reading it.
        val lDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        def ledgerRows(): Long = {
          import scala.jdk.CollectionConverters._
          progressLog.values.asScala.map(_._3).sum
        }
        while (ledgerRows() < n && System.nanoTime() < lDeadline)
          Thread.sleep(20)
        import scala.jdk.CollectionConverters._
        // per-batch scheduling-floor attribution for the bench line —
        // every batch the listener saw, no-op ticks included, so the
        // mean IS the session's micro-batch latency floor
        graft.streaming.MicroBatch.noteRaw("e18",
          progressLog.size.toLong,
          progressLog.values.asScala.map(_._4).sum)
        val ranges = progressLog.values.asScala.toSeq
          .map { case (so, eo, rows, _) =>
            // rate-micro-batch offsets serialize as JSON — either a
            // bare number or {"offset":N,...} depending on version;
            // take the first integer either way
            def off(x: String): Long =
              Option(x).flatMap("""-?\d+""".r.findFirstIn(_))
                .map(_.toLong).getOrElse(0L)
            (off(so), off(eo), rows)
          }
          .filter { case (a, b, _) => b > a } // drop idle no-data ticks
          .sortBy(_._1)
        val contiguous = ranges.nonEmpty && ranges.head._1 == 0L &&
          ranges.sliding(2).forall {
            case Seq((_, e1, _), (s2, _, _)) => e1 == s2
            case _ => true
          }
        val exactlyOnce = ranges.map(_._3).sum ==
          ranges.lastOption.map(_._2).getOrElse(0L)
        s.table(sink)
          .withColumn("offsets_contiguous", lit(contiguous))
          .withColumn("exactly_once_ledger", lit(exactlyOnce))
          .orderBy("part_key").localCheckpoint()
      } finally {
        if (q.isActive) q.stop()
        s.catalog.dropTempView(sink)
      }
    } finally s.streams.removeListener(listener)
  }

  val e18Sql: String =
    """SELECT range % 10 AS part_key, count(*) AS n_rows,
      |  CAST(sum(range) AS BIGINT) AS sum_v,
      |  true AS offsets_contiguous, true AS exactly_once_ledger
      |FROM range(5000) GROUP BY 1 ORDER BY 1""".stripMargin

  // e20: stream-stream LEFT OUTER interval join — the null-emission
  // half of the join story e09's inner join doesn't touch. An outer
  // stream-stream join can only emit its unmatched (null-padded) rows
  // once the watermark proves no future match can arrive, so the
  // correctness hazard is rows that stay pending forever at the tail
  // of a bounded run. Two far-future sentinel micro-batches push the
  // watermark past every real purchase (sentinels double as rows on
  // both join sides so the watermark node — which sits AFTER the
  // event_type filter — still sees them; their own output rows are
  // value-filtered in the batch rollup). The oracle is the plain
  // batch LEFT JOIN: a missing null row (state stuck) or a duplicate
  // (emitted both matched and unmatched) flips the hash red. State
  // stays bounded exactly as in e09: both sides evict past
  // watermark+interval, O(window), not O(stream).
  def e20(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type")
    val dirP = Files.createTempDirectory("graft_e20_")
    val streamDir = dirP.resolve("stream")
    Files.createDirectories(streamDir)
    val sink = "graft_e20_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val sentinelSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType)))
      def sentinel(plusDays: Long): DataFrame = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          0L, java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(plusDays * 86400)),
          0L, "sentinel")),
        sentinelSchema)
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = streamDir.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(ev, "batch0", t0 - 60000)
      // two trailing sentinels: eviction runs on the watermark as of
      // the PREVIOUS committed batch (same two-batches-back rule e16
      // pins), so the first sentinel advances it and the second forces
      // the batch that actually flushes the null-padded tail
      land(sentinel(10), "batch1", t0 - 40000)
      land(sentinel(20), "batch2", t0 - 20000)
      val stream = s.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val p = stream.filter(col("event_type").isin("purchase", "sentinel"))
        .select(col("event_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"), col("event_type").as("p_type"))
        .withWatermark("p_ts", "2 hours")
      val c = stream.filter(col("event_type").isin("click", "sentinel"))
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val joined = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"),
        "left_outer")
      withStreamPartitions(s, streamPartitionsFor(s, streamDir)) {
        runAvailableNow("e20", joined.writeStream.outputMode("append")
          .format("memory").queryName(sink))
      }
      s.table(sink)
        .filter(col("p_type") === "purchase")
        .groupBy(col("p_user").as("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("c_ts")).as("n_pairs"),
          (count(lit(1)) - count(col("c_ts"))).as("n_lonely"))
        .orderBy("user_id")
        .localCheckpoint()
    } finally {
      s.catalog.dropTempView(sink)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e20Sql: String =
    """SELECT p.user_id, count(*) AS n_rows, count(c.ts) AS n_pairs,
      |  count(*) - count(c.ts) AS n_lonely
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // e44: stream-stream FULL OUTER interval join — the last cell of
  // the streaming join matrix (e09 inner, e20 left-outer): full outer
  // must emit BOTH null-padded tails, and each side's unmatched rows
  // can only flush once the watermark clears that side's state — the
  // two eviction clocks run independently, so the new hazard class is
  // one side's lonely rows flushing while the other's stay pending
  // forever. Same e20 harness (one real batch + two far-future
  // sentinel batches riding BOTH sides so each watermark advances);
  // the c side keeps its event_type so sentinel rows filter out of
  // the unmatched-right tail instead of masquerading as lonely
  // clicks. Gate = per-user (matched, lonely-purchase, lonely-click)
  // counts against the plain batch FULL JOIN — a stuck right tail, a
  // dropped left null, or a double emission all flip the hash. State
  // bounded exactly as e09/e20: both sides evict past
  // watermark+interval, O(window), not O(stream).
  def e44(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type")
    val dirP = Files.createTempDirectory("graft_e44_")
    val streamDir = dirP.resolve("stream")
    Files.createDirectories(streamDir)
    val sink = "graft_e44_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val sentinelSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType)))
      def sentinel(plusDays: Long): DataFrame = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          0L, java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(plusDays * 86400)),
          0L, "sentinel")),
        sentinelSchema)
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = streamDir.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(ev, "batch0", t0 - 60000)
      land(sentinel(10), "batch1", t0 - 40000)
      land(sentinel(20), "batch2", t0 - 20000)
      val stream = s.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      val p = stream.filter(col("event_type").isin("purchase", "sentinel"))
        .select(col("event_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"), col("event_type").as("p_type"))
        .withWatermark("p_ts", "2 hours")
      val c = stream.filter(col("event_type").isin("click", "sentinel"))
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_type").as("c_type"))
        .withWatermark("c_ts", "2 hours")
      val joined = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") < col("p_ts"),
        "full_outer")
      withStreamPartitions(s, streamPartitionsFor(s, streamDir)) {
        runAvailableNow("e44", joined.writeStream.outputMode("append")
          .format("memory").queryName(sink))
      }
      s.table(sink)
        .filter(col("p_type") === "purchase" ||
          (col("p_type").isNull && col("c_type") === "click"))
        .groupBy(coalesce(col("p_user"), col("c_user")).as("user_id"))
        .agg(count(when(col("p_ts").isNotNull && col("c_ts").isNotNull,
            lit(1))).as("n_matched"),
          count(when(col("p_ts").isNotNull && col("c_ts").isNull,
            lit(1))).as("n_lonely_purchases"),
          count(when(col("p_ts").isNull, lit(1))).as("n_lonely_clicks"))
        .orderBy("user_id")
        .localCheckpoint()
    } finally {
      s.catalog.dropTempView(sink)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e44Sql: String =
    """SELECT coalesce(p.user_id, c.user_id) AS user_id,
      |  count(CASE WHEN p.ts IS NOT NULL AND c.ts IS NOT NULL THEN 1 END)
      |    AS n_matched,
      |  count(CASE WHEN p.ts IS NOT NULL AND c.ts IS NULL THEN 1 END)
      |    AS n_lonely_purchases,
      |  count(CASE WHEN p.ts IS NULL THEN 1 END) AS n_lonely_clicks
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      |FULL JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts >= p.ts - INTERVAL 1 HOUR
      |    AND c.ts < p.ts
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // e21: STREAMING session windows — the fourth formulation of gap
  // sessionization (e02 lag/cumsum, e07 flatMapGroupsWithState, e15
  // batch session_window) and the one production ingest runs:
  // session_window inside a watermarked APPEND-mode streaming agg,
  // where the state store MERGES sessions as events arrive and emits
  // a session only once the watermark proves it closed. The corpus
  // lands OUT OF ORDER (even-hour batch then odd-hour batch) under a
  // watermark delay longer than the corpus span, so nothing drops
  // and per-user session state must absorb both batches — the
  // cross-batch merge is what distinguishes this from e15 (its
  // necessity is pinned in StreamingSpec: per-parity sessionization
  // gives different counts). Two far-future sentinel batches drive
  // the two-batches-back watermark past every real session (the e20
  // tail-flush rule); sentinels ride user −1 and are filtered. The
  // rollup is gated against the SAME gap-session oracle as
  // e02/e07/e15 — stuck state = missing sessions, premature emission
  // = split sessions; both flip the hash.
  def e21(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val ev = Tables.events(s, d).select("user_id", "ts")
    val dirP = Files.createTempDirectory("graft_e21_")
    val streamDir = dirP.resolve("stream")
    Files.createDirectories(streamDir)
    val sink = "graft_e21_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType)))
      def sentinel(plusDays: Long): DataFrame = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          -1L, java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(plusDays * 86400)))),
        schema)
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = streamDir.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(ev.filter(hour(col("ts")) % 2 === 0), "batch0", t0 - 80000)
      land(ev.filter(hour(col("ts")) % 2 === 1), "batch1", t0 - 60000)
      land(sentinel(400), "batch2", t0 - 40000)
      land(sentinel(401), "batch3", t0 - 20000)
      val stream = s.readStream
        .schema("user_id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      // delay > corpus span: out-of-order batches buffer, none drop
      val agg = stream.withWatermark("ts", "8760 hours")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
      withStreamPartitions(s, streamPartitionsFor(s, streamDir)) {
        runAvailableNow("e21", agg.writeStream.outputMode("append")
          .format("memory").queryName(sink))
      }
      s.table(sink)
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_sessions"),
          sum("n_events").as("n_events"))
        .orderBy("user_id")
        .localCheckpoint()
    } finally {
      s.catalog.dropTempView(sink)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  // e22: PEAK CONCURRENCY — "how many sessions were open at once,
  // per day": the interval sweep every capacity/load analysis runs.
  // Sessions (e02's gap rule) become ±1 boundary events; peak = max
  // of the running sum. The scalable shape is the SEGMENT-SCAN sweep:
  // the running sum is computed WITHIN each day partition (keyed
  // window, never a corpus-wide sort), and day partials stitch with a
  // cross-day carry — a prefix sum over the DAY DOMAIN (one row per
  // day: metadata-scale, 30 rows here, ~36k for a century — the
  // bounded-domain exception to the no-global-window rule, same tier
  // as the 1-row broadcast aggregates). Midnight-spanning sessions
  // are exactly why the carry exists: their +1 lands in one day's
  // net, their −1 in the next. Tie rule pinned: starts sort before
  // ends at the same instant (delta DESC), so touching/zero-length
  // sessions count as concurrent — and with RANGE peer framing the
  // day max is permutation-independent. The oracle computes the
  // NAIVE global running sum; the two formulations must agree at
  // every day boundary — a wrong carry flips the hash.
  def e22(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val iv = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("us").as("st"), max("us").as("en"))
    val deltas = iv.select(col("st").as("us"), lit(1L).as("delta"))
      .union(iv.select(col("en").as("us"), lit(-1L).as("delta")))
      .withColumn("day", expr("us div 86400000000"))
    val wd = Window.partitionBy("day").orderBy(col("us"), col("delta").desc)
    val perDay = deltas
      .withColumn("c", sum("delta").over(wd)) // RANGE frame: peers fold
      .groupBy("day")
      .agg(max("c").as("in_day_peak"), sum("delta").as("net"))
    val wc = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDay
      .withColumn("carry", coalesce(sum("net").over(wc), lit(0L)))
      .select(col("day"), (col("carry") + col("in_day_peak")).as("peak"))
      .orderBy("day")
  }

  val e22Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      OR lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS session_id
      |  FROM tagged),
      |iv AS (
      |  SELECT user_id, session_id, min(us) AS st, max(us) AS en
      |  FROM sess GROUP BY 1, 2),
      |ev AS (
      |  SELECT st AS us, 1 AS delta FROM iv
      |  UNION ALL SELECT en, -1 FROM iv),
      |run AS (
      |  SELECT us // 86400000000 AS day,
      |    sum(delta) OVER (ORDER BY us, delta DESC) AS c
      |  FROM ev)
      |SELECT day, max(c)::BIGINT AS peak
      |FROM run GROUP BY 1 ORDER BY day""".stripMargin

  // e23: STREAMING CDC APPLY via foreachBatch — the production sink
  // API the e-series hadn't touched: declarative sinks (parquet/
  // memory) can only append, so a change stream that must UPSERT and
  // DELETE goes through foreachBatch, which hands each micro-batch
  // to arbitrary batch code with exactly-once batch ids. Here each
  // batch applies the i07 MERGE shape (full-outer join on the key)
  // against the current lake version and writes a NEW version dir —
  // foreachBatch + i14's versioning discipline composed: the lake is
  // never rewritten in place, so a mid-merge crash can't corrupt the
  // readable version (the Delta streaming-MERGE pattern from first
  // principles). Wave 1 upserts + inserts, wave 2 deletes — applied
  // in landing order (modTime-pinned files, one file per trigger);
  // the oracle replays the identical waves relationally, so a
  // reordered, lost, or double-applied change flips the hash.
  private[graft] def e23WithStats(s: SparkSession, d: String): (DataFrame, Long) = {
    import java.nio.file.{Files, StandardCopyOption}
    val dirP = Files.createTempDirectory("graft_e23_")
    val landing = dirP.resolve("landing")
    val lakeRoot = dirP.resolve("lake").toString
    Files.createDirectories(landing)
    try {
      val base = Tables.documents(s, d).filter(col("doc_id") < 400)
        .select("doc_id", "lang", "n_chars")
      base.write.parquet(s"$lakeRoot/v0")
      // wave 1: updates (+1000 chars for every 10th doc) and inserts
      // (+5000-offset copies of every 25th); wave 2: deletes of every
      // 9th key in the POST-wave-1 keyspace (hits inserts too)
      val w1 = base.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), lit("U").as("op"),
          lit(null).cast("string").as("c_lang"),
          (col("n_chars") + 1000).as("c_chars"))
        .union(base.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 5000).as("doc_id"), lit("I").as("op"),
            col("lang").as("c_lang"), (col("n_chars") + 7).as("c_chars")))
      val w2 = base.select(col("doc_id"), col("lang"), col("n_chars"))
        .union(base.filter(col("doc_id") % 25 === 0)
          .select(col("doc_id") + 5000, col("lang"), col("n_chars")))
        .filter(col("doc_id") % 9 === 0)
        .select(col("doc_id"), lit("D").as("op"),
          lit(null).cast("string").as("c_lang"),
          lit(null).cast("long").as("c_chars"))
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = landing.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(w1, "wave1", t0 - 60000)
      land(w2, "wave2", t0 - 30000)
      @volatile var current = "v0"
      @volatile var nBatches = 0L
      val q = s.readStream
        .schema("doc_id LONG, op STRING, c_lang STRING, c_chars LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(landing.toString)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val lake = s.read.parquet(s"$lakeRoot/$current")
          lake.join(batch, Seq("doc_id"), "full_outer")
            .filter(col("op").isNull || col("op") =!= "D")
            .select(col("doc_id"),
              coalesce(col("c_lang"), col("lang")).as("lang"),
              coalesce(col("c_chars"), col("n_chars")).as("n_chars"))
            .write.parquet(s"$lakeRoot/v${id + 1}")
          current = s"v${id + 1}"
          nBatches += 1
          ()
        }
      runAvailableNow("e23", q)
      val out = s.read.parquet(s"$lakeRoot/$current")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("sum_chars"))
        .orderBy("lang")
        .localCheckpoint()
      (out, nBatches)
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  def e23(s: SparkSession, d: String): DataFrame = e23WithStats(s, d)._1

  val e23Sql: String =
    """WITH base AS (
      |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 400),
      |after1 AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN doc_id % 10 = 0 THEN n_chars + 1000 ELSE n_chars END
      |      AS n_chars
      |  FROM base
      |  UNION ALL
      |  SELECT doc_id + 5000, lang, n_chars + 7 FROM base
      |  WHERE doc_id % 25 = 0),
      |final AS (SELECT * FROM after1 WHERE doc_id % 9 <> 0)
      |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM final GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // e24: MULTI-TOUCH ATTRIBUTION with exact integer credit — every
  // purchase distributes its credit linearly across the user's
  // clicks in the 7 days before it. Credit is 360360 integer units
  // per purchase (divisible by 1..15, so equal shares are integral
  // for any realistic touch count); the div remainder goes to the
  // LATEST click (deterministic) so every purchase's credit sums
  // exactly — no float shares whose accumulation order drifts
  // cross-engine. Rollup: credit units and touch counts by the
  // click's hour-of-day (the "which hour earns conversions" report).
  // Scale: the q22 bounded range-join shape (equality on user_id
  // carries the shuffle, the time predicate is a post-filter), then
  // two windows keyed by purchase id — no global state.
  def e24(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val touches = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 7 DAYS") &&
        col("c_ts") < col("p_ts"))
    val wN = Window.partitionBy("p_id")
    // c_id tiebreak: same-timestamp clicks must pick the same
    // remainder-receiver in both engines
    val wLast = Window.partitionBy("p_id").orderBy(col("c_ts").desc, col("c_id"))
    touches
      .withColumn("n_touch", count(lit(1)).over(wN))
      .withColumn("rn", row_number().over(wLast))
      .withColumn("credit",
        expr("360360 div n_touch") +
          when(col("rn") === 1, expr("360360 % n_touch")).otherwise(lit(0L)))
      .groupBy(hour(col("c_ts")).as("click_hour"))
      .agg(sum(col("credit")).as("credit_units"),
        count(lit(1)).as("n_touches"))
      .orderBy("click_hour")
  }

  val e24Sql: String =
    """WITH p AS (SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
      |           FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT event_id AS c_id, user_id AS c_user, ts AS c_ts
      |      FROM events WHERE event_type = 'click'),
      |touches AS (
      |  SELECT p_id, c_ts,
      |    count(*) OVER (PARTITION BY p_id) AS n_touch,
      |    row_number() OVER (PARTITION BY p_id ORDER BY c_ts DESC, c_id) AS rn
      |  FROM p JOIN c ON p_user = c_user
      |    AND c_ts >= p_ts - INTERVAL 7 DAY AND c_ts < p_ts)
      |SELECT hour(c_ts) AS click_hour,
      |  sum(360360 // n_touch +
      |      CASE WHEN rn = 1 THEN 360360 % n_touch ELSE 0 END)::BIGINT
      |    AS credit_units,
      |  count(*) AS n_touches
      |FROM touches GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // e25: LATENESS PROFILE — the diagnostic that SIZES watermarks: for
  // each event, lateness = (max event-time seen so far in arrival
  // order) − (own event-time); its distribution tells you what
  // `withWatermark` delay loses which fraction of data (e16 gates the
  // drop semantics, this measures what delay to pick). The synthetic
  // log arrives perfectly event-time-ordered, so the replay adds a
  // deterministic per-event delivery delay (hash-derived, ≤ 2 h — the
  // out-of-orderness a real broker shows) and orders by the jittered
  // arrival time. The running max SHARDS EXACTLY by arrival day:
  // within each day a day-partitioned ordered window, plus a
  // carry-in = max event-time of all PRIOR days (a cumulative max on
  // the day grain — calendar-bounded at any corpus size); their
  // greatest equals the global running max value-for-value, so the
  // oracle keeps the one-window global formulation while the Spark
  // plan has no unpartitioned event-grain sort. Buckets in integer
  // micros — exact cross-engine, plus the max per bucket.
  def e25(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val wIn = Window.partitionBy("aday").orderBy("arrival_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDay = Window.orderBy("aday")
      .rowsBetween(Window.unboundedPreceding, -1)
    val arr = Tables.events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("arrival_us", col("us") +
        graft.functions.Hashing.hash56(
          concat_ws("#", lit("lat"), col("event_id"))) % (7200L * 1000000))
      .withColumn("aday", expr(s"arrival_us div $dayUs"))
    val carry = arr.groupBy("aday").agg(max(col("us")).as("dmax"))
      .withColumn("carry", max(col("dmax")).over(wDay))
      .select("aday", "carry")
    arr.join(broadcast(carry), "aday")
      .withColumn("late_us",
        greatest(max(col("us")).over(wIn),
          coalesce(col("carry"), lit(Long.MinValue))) - col("us"))
      .withColumn("bucket",
        when(col("late_us") === 0, "a_on_time")
          .when(col("late_us") <= 60L * 1000000, "b_1min")
          .when(col("late_us") <= 600L * 1000000, "c_10min")
          .when(col("late_us") <= 3600L * 1000000, "d_1hour")
          .when(col("late_us") <= 86400L * 1000000, "e_1day")
          .otherwise("f_over_1day"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"),
        max(col("late_us")).as("max_late_us"))
      .orderBy("bucket")
  }

  val e25Sql: String =
    s"""WITH arr AS (
      |  SELECT event_id, epoch_us(ts) AS us,
      |    epoch_us(ts) + ${graft.functions.Hashing.sqlHash56("'lat#' || event_id")}
      |      % 7200000000 AS arrival_us
      |  FROM events),
      |lat AS (
      |  SELECT event_id,
      |    max(us) OVER (ORDER BY arrival_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      - us AS late_us
      |  FROM arr)
      |SELECT CASE WHEN late_us = 0 THEN 'a_on_time'
      |  WHEN late_us <= 60000000 THEN 'b_1min'
      |  WHEN late_us <= 600000000 THEN 'c_10min'
      |  WHEN late_us <= 3600000000 THEN 'd_1hour'
      |  WHEN late_us <= 86400000000 THEN 'e_1day'
      |  ELSE 'f_over_1day' END AS bucket,
      |  count(*) AS n_events, max(late_us)::BIGINT AS max_late_us
      |FROM lat GROUP BY 1 ORDER BY 1""".stripMargin

  // e26: BATCH+STREAM BACKFILL HANDOFF (the lambda/kappa-architecture
  // correctness condition): history up to a cutoff is served by a
  // batch rollup, the tail after it by the streaming pipeline, and
  // their union must equal the pure-batch answer BIT-EXACTLY — the
  // property that lets a deployment bootstrap a stream job from a
  // warehouse backfill without a seam. The cutoff is day-truncated
  // (derived from the data, not wall clock), so no 1-hour window
  // straddles it and each (hour, event_type) row comes from exactly
  // one side; events at the cutoff belong to the stream (>= vs <).
  // Oracle: e01's full rollup — any dropped, duplicated, or
  // seam-split row hash-fails.
  // Scale: the batch side is the ordinary windowed agg; the stream
  // side is e06's plan with the cutoff filter pushed into the file
  // source; the union is append-only concatenation, no re-shuffle.
  def e26(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val mm = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val dayUs = 86400L * 1000000L
    val cutoffUs =
      ((mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2) / dayUs) * dayUs
    val batchPart = ev.filter(unix_micros(col("ts")) < cutoffUs)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(12,2)")), 2).cast("double")
          .as("sum_value"))
      .select(unix_micros(col("w.start")).as("hour_us"), col("event_type"),
        col("n"), col("sum_value"))
    val sink = "graft_e26_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStreamPartitions(s, eventsParts(s, d)) {
      runAvailableNow("e26", graft.streaming.Streams.tumblingCounts(
          graft.streaming.Streams.eventStream(s, d)
            .filter(unix_micros(col("ts")) >= cutoffUs))
        .writeStream.outputMode("complete")
        .format("memory").queryName(sink))
    }
    val streamPart = s.table(sink)
      .select(unix_micros(col("hour")).as("hour_us"), col("event_type"),
        col("n"), col("sum_value"))
    batchPart.unionByName(streamPart).orderBy("hour_us", "event_type")
  }

  // ------------------------------------------------------------------
  // e27: TRENDING MOVERS report — per (props.k, day), today's event
  // count against the trailing-7-day baseline, ranked by the rise
  // ratio: the "what's suddenly hot" standing job behind trending
  // topics / anomaly dashboards. A fixed burst THRESHOLD is the trap
  // — at sf0.1 (~33 events/key/day) a 2× daily jump never occurs
  // naturally (measured: zero), so a thresholded screen is vacuous
  // exactly when the data grows; the report form ranks ALL scored
  // (key, day) cells and keeps the top 20, non-vacuous at every
  // scale. The ratio is EXACT INTEGER per-mille — (7000·cnt) div
  // prev7 — so ranking is integer comparison, no float division
  // drift; scoring requires a full 7-day baseline (rn > 7, prev7 >
  // 0). Gaps are real zeros: each key's timeline densifies over its
  // min..max day via sequence()+explode (q46's group-local spine —
  // the parallel unit is the key count, never timeline length).
  // Composes e05's JSON extraction (get_json_object, codegen'd).
  // Scale: one (k,day)-keyed count agg, one per-key spine explode +
  // left join, one k-partitioned window — every shuffle keyed by the
  // ~|keys| domain, final TakeOrdered 20 (no global sort
  // materialization).
  def e27(s: SparkSession, d: String): DataFrame = {
    val dc = Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        to_date(col("ts")).as("day"))
      .groupBy("k", "day").agg(count(lit(1)).as("cnt"))
    val spine = dc.groupBy("k")
      .agg(min(col("day")).as("mind"), max(col("day")).as("maxd"))
      .select(col("k"), explode(expr("sequence(mind, maxd, interval 1 day)")).as("day"))
    val wOrd = Window.partitionBy("k").orderBy("day")
    spine.join(dc, Seq("k", "day"), "left")
      .select(col("k"), col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .withColumn("prev7", sum(col("cnt")).over(wOrd.rowsBetween(-7, -1)))
      .withColumn("rn", row_number().over(wOrd))
      .filter(col("rn") > 7 && col("prev7") > 0)
      .select(col("k"), col("day"), col("cnt"), col("prev7"),
        expr("(7000 * cnt) div prev7").as("ratio_pm"))
      .orderBy(col("ratio_pm").desc, col("k"), col("day"))
      .limit(20)
  }

  val e27Sql: String =
    """WITH dc AS (
      |  SELECT CAST(props->>'k' AS BIGINT) AS k, CAST(ts AS DATE) AS day,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |spine AS (
      |  SELECT k, unnest(generate_series(mind, maxd, INTERVAL 1 DAY))::DATE AS day
      |  FROM (SELECT k, min(day) AS mind, max(day) AS maxd FROM dc GROUP BY 1)),
      |dense AS (
      |  SELECT s.k, s.day, coalesce(dc.cnt, 0)::BIGINT AS cnt
      |  FROM spine s LEFT JOIN dc ON s.k = dc.k AND s.day = dc.day),
      |wv AS (
      |  SELECT k, day, cnt,
      |    sum(cnt) OVER (PARTITION BY k ORDER BY day
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)::BIGINT AS prev7,
      |    row_number() OVER (PARTITION BY k ORDER BY day) AS rn
      |  FROM dense)
      |SELECT k, day, cnt, prev7, (7000 * cnt) // prev7 AS ratio_pm
      |FROM wv WHERE rn > 7 AND prev7 > 0
      |ORDER BY ratio_pm DESC, k, day LIMIT 20""".stripMargin

  // ------------------------------------------------------------------
  // e28: UPDATE output mode gated — the third Structured Streaming
  // output semantics (e06 gates append, e13/e18 complete): update
  // mode emits, per micro-batch, exactly the aggregate rows that
  // CHANGED — the mode a downstream keyed store (Redis/serving cache)
  // consumes. Three deterministic micro-batches (event_id % 3 lands
  // each third in modTime order — the e16 controlled-replay
  // machinery) update a (day, event_type) count; the foreachBatch
  // sink records every emission WITH its batch id. The gate pins BOTH
  // halves of the semantics relationally: the final state (last
  // emission per key) must equal the batch aggregate, and
  // n_emissions per key must equal the number of thirds that contain
  // an event of that key — an over-emitting stream (complete-mode
  // behavior) or a missed update both flip the hash. No watermark:
  // update-without-watermark keeps all state — the bounded-state
  // variant is e19's dropDuplicatesWithinWatermark story.
  // Scale: state is one row per (day, type); per-batch emission work
  // ∝ changed keys, the property the gate proves.
  def e28(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ev = Tables.events(s, d).select("event_id", "ts", "event_type", "user_id")
    val dirP = Files.createTempDirectory("graft_e28_")
    val streamDir = dirP.resolve("stream")
    val outDir = dirP.resolve("updates").toString
    Files.createDirectories(streamDir)
    try {
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = streamDir.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      (0 to 2).foreach { b =>
        land(ev.filter(col("event_id") % 3 === b), s"batch$b",
          t0 - 80000 + b * 20000)
      }
      val stream = s.readStream
        .schema("event_id LONG, ts TIMESTAMP, event_type STRING, user_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
      // key includes a user cohort so that, at gate scale, many keys
      // genuinely DON'T change in every batch — without it every key
      // updates every batch and the gate could not tell update mode
      // from complete mode (measured: 0/150 sparse keys at sf0.01
      // with the coarse key; thousands with the cohort)
      val agg = stream
        .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"),
          (col("user_id") % 20).as("cohort"))
        .agg(count(lit(1)).as("n"))
      withStreamPartitions(s, streamPartitionsFor(s, streamDir)) {
        runAvailableNow("e28", agg.writeStream.outputMode("update")
          .foreachBatch { (df: DataFrame, id: Long) =>
            df.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(outDir)
          }
          .option("checkpointLocation", dirP.resolve("ckpt").toString))
      }
      val emissions = s.read.parquet(outDir)
        .select(to_date(col("w.start")).as("day"), col("event_type"),
          col("cohort"), col("n"), col("batch_id"))
      val wLast = org.apache.spark.sql.expressions.Window
        .partitionBy("day", "event_type", "cohort")
        .orderBy(col("batch_id").desc)
      emissions
        .withColumn("rn", row_number().over(wLast))
        .groupBy("day", "event_type", "cohort")
        .agg(max(when(col("rn") === 1, col("n"))).as("n_final"),
          count(lit(1)).as("n_emissions"))
        .orderBy("day", "event_type", "cohort")
        .localCheckpoint()
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e28Sql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type, user_id % 20 AS cohort,
      |  count(*) AS n_final,
      |  count(DISTINCT event_id % 3) AS n_emissions
      |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------------
  // e29: COHORT RETENTION MATRIX — the growth-analytics triangle
  // (cohort acquisition day × day-offset → how many came back): e04
  // gates the single next-day cell; this is the full 0..7-offset
  // curve every product team actually reads. Cohort = a user's first
  // active day; a (cohort, offset) cell counts DISTINCT users active
  // exactly offset days after their first day; rate closes with one
  // 4dp-rounded division against the cohort size. All integer until
  // that boundary. Scale: first-day is one user-keyed min-agg, the
  // matrix is one (user)-keyed join + one (cohort, offset)-keyed
  // count-distinct, cohort sizes broadcast back — no day×day work,
  // no window over the corpus.
  def e29(s: SparkSession, d: String): DataFrame = {
    val du = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val first = du.groupBy("user_id").agg(min(col("day")).as("cohort"))
    val cells = du.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort"),
        datediff(col("day"), col("cohort")).cast("long").as("offset"))
      .filter(col("offset") <= 7)
      .groupBy("cohort", "offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    cells.join(broadcast(sizes), Seq("cohort"))
      .select(col("cohort"), col("offset"), col("n_active"), col("n_cohort"),
        round(col("n_active").cast("double") / col("n_cohort"), 4).as("rate"))
      .orderBy("cohort", "offset")
  }

  val e29Sql: String =
    """WITH du AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |first AS (SELECT user_id, min(day) AS cohort FROM du GROUP BY 1),
      |cells AS (
      |  SELECT f.cohort, (du.day - f.cohort)::BIGINT AS "offset",
      |    count(DISTINCT du.user_id) AS n_active
      |  FROM du JOIN first f USING (user_id)
      |  WHERE du.day - f.cohort <= 7
      |  GROUP BY 1, 2),
      |sizes AS (SELECT cohort, count(*) AS n_cohort FROM first GROUP BY 1)
      |SELECT cohort, "offset", n_active, n_cohort,
      |  round(CAST(n_active AS DOUBLE) / n_cohort, 4) AS rate
      |FROM cells JOIN sizes USING (cohort)
      |ORDER BY cohort, "offset"""".stripMargin

  // ------------------------------------------------------------------
  // e30: CONVERSION-LATENCY distribution — time-to-first-action after
  // a trigger (signup → next purchase by the same user): the funnel
  // e03 counts WHO converts; this measures HOW FAST, the number
  // growth/activation teams actually watch. Pairing is the FORWARD
  // as-of through the custom AsOfJoinExec (left_outer — never-
  // converting signups survive as nulls; q44's direction, one
  // exchange+sort per side, no inequality explosion); conversion =
  // within 7 days. Per signup-day cohort: signups, conversions, a
  // 4dp-rounded rate, and EXACT median / p90 latency by value
  // selection (smallest latency with 2·cum ≥ n, 10·cum ≥ 9·n — the
  // q52 rule, integer micros, never interpolation). Scale: one as-of
  // pass + one cohort-keyed cum window over converted rows.
  private val CONV_WINDOW_US = 7L * 86400 * 1000000
  def e30(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("event_id", "ts", "user_id", "event_type")
    val su = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("s_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("p_us"))
    val paired = graft.plans.AsOf.join(su, p, "user_id", "p_user", "s_us", "p_us",
        joinType = "left_outer", direction = "forward", rightTiebreak = Some("p_id"))
      .select(col("event_id"), col("s_us"),
        (col("p_us") - col("s_us")).as("lat_us"))
      .withColumn("cohort", to_date(timestamp_micros(col("s_us"))))
      .withColumn("converted",
        col("lat_us").isNotNull && col("lat_us") <= CONV_WINDOW_US)
    val counts = paired.groupBy("cohort")
      .agg(count(lit(1)).as("n_signups"),
        count(when(col("converted"), lit(1))).as("n_converted"))
    val wCum = Window.partitionBy("cohort").orderBy("lat_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("cohort")
    val conv = paired.filter(col("converted"))
      .groupBy("cohort", "lat_us").agg(count(lit(1)).as("w"))
      .withColumn("cw", sum(col("w")).over(wCum))
      .withColumn("tw", sum(col("w")).over(wTot))
    val med = conv.filter(col("cw") * 2 >= col("tw"))
      .groupBy("cohort").agg(min(col("lat_us")).as("med_lat_us"))
    val p90 = conv.filter(col("cw") * 10 >= col("tw") * 9)
      .groupBy("cohort").agg(min(col("lat_us")).as("p90_lat_us"))
    counts.join(med, Seq("cohort"), "left").join(p90, Seq("cohort"), "left")
      .select(col("cohort"), col("n_signups"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_signups"), 4).as("conv_rate"),
        col("med_lat_us"), col("p90_lat_us"))
      .orderBy("cohort")
  }

  val e30Sql: String =
    s"""WITH su AS (SELECT event_id, user_id, epoch_us(ts) AS s_us
       |           FROM events WHERE event_type = 'signup'),
       |p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
       |      FROM events WHERE event_type = 'purchase'),
       |paired AS (
       |  SELECT su.event_id, su.s_us, mp.p_us - su.s_us AS lat_us
       |  FROM su LEFT JOIN (
       |    SELECT * FROM (
       |      SELECT su2.event_id AS sid, p.p_us,
       |        row_number() OVER (PARTITION BY su2.event_id
       |          ORDER BY p.p_us ASC, p.p_id DESC) AS rn
       |      FROM su su2 JOIN p ON su2.user_id = p.user_id
       |        AND p.p_us >= su2.s_us) WHERE rn = 1) mp
       |  ON su.event_id = mp.sid),
       |tagged AS (
       |  SELECT event_id, make_timestamp(s_us)::DATE AS cohort, lat_us,
       |    lat_us IS NOT NULL AND lat_us <= $CONV_WINDOW_US AS converted
       |  FROM paired),
       |counts AS (
       |  SELECT cohort, count(*) AS n_signups,
       |    count(CASE WHEN converted THEN 1 END) AS n_converted
       |  FROM tagged GROUP BY 1),
       |conv AS (
       |  SELECT cohort, lat_us,
       |    sum(w) OVER (PARTITION BY cohort ORDER BY lat_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
       |    sum(w) OVER (PARTITION BY cohort) AS tw
       |  FROM (SELECT cohort, lat_us, count(*) AS w FROM tagged
       |        WHERE converted GROUP BY 1, 2)),
       |med AS (SELECT cohort, min(lat_us) AS med_lat_us FROM conv
       |        WHERE cw * 2 >= tw GROUP BY 1),
       |p90 AS (SELECT cohort, min(lat_us) AS p90_lat_us FROM conv
       |        WHERE cw * 10 >= tw * 9 GROUP BY 1)
       |SELECT cohort, n_signups, n_converted,
       |  round(CAST(n_converted AS DOUBLE) / n_signups, 4) AS conv_rate,
       |  med_lat_us, p90_lat_us
       |FROM counts LEFT JOIN med USING (cohort) LEFT JOIN p90 USING (cohort)
       |ORDER BY cohort""".stripMargin

  // ------------------------------------------------------------------
  // e31: WINDOWED funnel (max-gap step semantics — the Amplitude-style
  // product funnel): e03 only requires first-view < first-click <
  // first-purchase over the whole history; real funnels require each
  // step within a WINDOW of the previous (view → click ≤ 24h → \
  // purchase ≤ 24h), with GREEDY anchoring (the FIRST qualifying
  // event at each step — deterministic, and what funnel products
  // actually compute). A user whose click trails the view by a week
  // passes e03 and must FAIL here (divergence pinned in OpsSpec).
  // Anchors chain: min view per user → min click in (view, view+24h]
  // → min purchase in (click, click+24h]. Each step is one user-keyed
  // join + conditional min-agg — integers in micros throughout.
  private val FUNNEL_GAP_US = 24L * 3600 * 1000000
  def e31(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("view_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("view_us") &&
        col("us") <= col("view_us") + FUNNEL_GAP_US)
      .groupBy("user_id").agg(min(col("us")).as("click_us"),
        min(col("view_us")).as("view_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") > col("click_us") &&
        col("us") <= col("click_us") + FUNNEL_GAP_US)
      .groupBy("user_id").agg(min(col("us")).as("purchase_us"),
        min(col("click_us")).as("click_us"), min(col("view_us")).as("view_us"))
    p.select("user_id", "view_us", "click_us", "purchase_us")
      .orderBy("user_id")
  }

  val e31Sql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
       |v AS (SELECT user_id, min(us) AS view_us FROM ev
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (
       |  SELECT ev.user_id, min(ev.us) AS click_us, min(v.view_us) AS view_us
       |  FROM ev JOIN v USING (user_id)
       |  WHERE ev.event_type = 'click' AND ev.us > v.view_us
       |    AND ev.us <= v.view_us + $FUNNEL_GAP_US
       |  GROUP BY 1),
       |p AS (
       |  SELECT ev.user_id, min(ev.us) AS purchase_us,
       |    min(c.click_us) AS click_us, min(c.view_us) AS view_us
       |  FROM ev JOIN c USING (user_id)
       |  WHERE ev.event_type = 'purchase' AND ev.us > c.click_us
       |    AND ev.us <= c.click_us + $FUNNEL_GAP_US
       |  GROUP BY 1)
       |SELECT user_id, view_us, click_us, purchase_us FROM p
       |ORDER BY user_id""".stripMargin

  // e32: INTER-ARRIVAL GAP monitoring (the heartbeat/freshness check
  // every ingest pipeline alarms on — "did the click feed stall?"):
  // per event type, the gap profile between consecutive events —
  // max gap, count of gaps over the 1-hour SLA, and the mean gap —
  // all EXACT integers (gaps in epoch micros via lag, seconds via
  // div; mean = sum div n div 10⁶ — no float in the gate). The
  // deterministic order is (ts, event_id), the engine-wide event tie
  // ladder.
  // Scale: ONE window shuffle keyed by event_type + the same-keyed
  // agg (no second exchange — the window output is already
  // partitioned by the group key); 5 rows out at any SF. A stalled
  // feed shows as max_gap_s >> mean_gap_s long before volume drops.
  def e32(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"),
        (unix_micros(col("ts")) -
          lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("gap_us")).as("n_gaps"),
        max(col("gap_us")).as("max_gap_us"),
        count(when(col("gap_us") > lit(3600L * 1000000L), lit(1)))
          .as("n_gaps_gt_1h"),
        sum(col("gap_us")).as("sum_gap_us"))
      .select(col("event_type"), col("n_events"), col("n_gaps"),
        expr("max_gap_us div 1000000").as("max_gap_s"),
        col("n_gaps_gt_1h"),
        expr("(sum_gap_us div n_gaps) div 1000000").as("mean_gap_s"))
      .orderBy("event_type")
  }

  val e32Sql: String =
    """WITH g AS (
      |  SELECT event_type, epoch_us(ts) - lag(epoch_us(ts), 1)
      |      OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      |  FROM events)
      |SELECT event_type, count(*) AS n_events,
      |  count(gap_us) AS n_gaps,
      |  (max(gap_us) // 1000000)::BIGINT AS max_gap_s,
      |  count(CASE WHEN gap_us > 3600000000 THEN 1 END) AS n_gaps_gt_1h,
      |  ((sum(gap_us)::BIGINT // count(gap_us)) // 1000000)::BIGINT AS mean_gap_s
      |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin

  // e33: CAPPED DWELL TIME (time-on-page — the engagement metric web
  // analytics reports; e32 watches the FEED's health, this watches
  // the USER's attention): dwell of an event = gap to the SAME
  // user's next event (lead under the (ts, event_id) ladder), capped
  // at 1800 s — the standard session-timeout convention that stops
  // an overnight gap from counting as eight hours of reading. Last
  // events have no successor and are excluded from the mean but
  // counted (n_last) — silently dropping them hides a
  // one-event-per-user corpus. All exact integers: micros via lead,
  // seconds via div, mean = sum div n.
  // Scale: ONE user-keyed window + one type-keyed agg; the cap is a
  // map-side least().
  private val DWELL_CAP_S = 1800L

  def e33(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("raw_s",
        (lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts"))),
      )
      .withColumn("raw_s", expr("raw_s div 1000000"))
      .withColumn("dwell_s", least(col("raw_s"), lit(DWELL_CAP_S)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(col("raw_s")).as("n_measured"),
        (count(lit(1)) - count(col("raw_s"))).as("n_last"),
        count(when(col("raw_s") > DWELL_CAP_S, lit(1))).as("n_capped"),
        sum(col("dwell_s")).as("dwell_sum_s"))
      .withColumn("mean_dwell_s", expr("dwell_sum_s div n_measured"))
      .orderBy("event_type")
  }

  val e33Sql: String =
    s"""WITH d AS (
       |  SELECT event_type,
       |    (lead(epoch_us(ts), 1) OVER (PARTITION BY user_id
       |                                 ORDER BY ts, event_id)
       |     - epoch_us(ts)) // 1000000 AS raw_s
       |  FROM events)
       |SELECT event_type, count(*) AS n_events,
       |  count(raw_s) AS n_measured,
       |  count(*) - count(raw_s) AS n_last,
       |  count(CASE WHEN raw_s > $DWELL_CAP_S THEN 1 END) AS n_capped,
       |  sum(least(raw_s, $DWELL_CAP_S))::BIGINT AS dwell_sum_s,
       |  (sum(least(raw_s, $DWELL_CAP_S))::BIGINT // count(raw_s))
       |    AS mean_dwell_s
       |FROM d GROUP BY 1 ORDER BY event_type""".stripMargin

  // e34: SESSION PATH MINING (top clickstream trigrams — the "what do
  // users actually do" query behind funnel design; e03/e31 CHECK a
  // hypothesized path, this DISCOVERS the paths worth hypothesizing):
  // events sessionize under e02's 30-min gap rule, and every run of
  // three consecutive events INSIDE one session contributes the
  // trigram t1>t2>t3; top-20 paths under the (n DESC, path ASC)
  // ladder plus each path's distinct-user reach. The session
  // constraint is enforced WITHOUT a second exchange: session_id is
  // a running sum over the user window and the trigram is valid iff
  // lead(session_id, 2) equals session_id — all four window columns
  // (running sum + three leads) share the ONE (user)-keyed
  // exchange+sort; a (user, session)-partitioned lead would re-hash
  // the corpus per window.
  // Scale: one user-keyed window shuffle + one path-keyed agg; paths
  // are a bounded alphabet (|event_type|³), the top-20 sort is
  // path-dim.
  def e34(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) > 1800000000L
          || lag(col("us"), 1).over(w).isNull, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(cum))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .withColumn("sid3", lead(col("sid"), 2).over(w))
      .filter(col("sid3") === col("sid"))
      .withColumn("path",
        concat_ws(">", col("event_type"), col("t2"), col("t3")))
      .groupBy("path")
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  val e34Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      OR lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS sid
      |  FROM tagged),
      |tri AS (
      |  SELECT user_id, sid,
      |    event_type AS t1,
      |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
      |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3,
      |    lead(sid, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid3
      |  FROM sess)
      |SELECT t1 || '>' || t2 || '>' || t3 AS path, count(*) AS n,
      |  count(DISTINCT user_id) AS n_users
      |FROM tri WHERE sid3 = sid
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin

  // e35: IDEMPOTENT SINK under AT-LEAST-ONCE REPLAY — the
  // exactly-once-by-construction pattern for arbitrary (non-file)
  // sinks: foreachBatch guarantees only at-least-once delivery (a
  // lost ack after a successful write re-delivers the batch), so the
  // sink must absorb duplicates. e17 relies on the parquet sink's own
  // commit log; this op builds the guarantee for a sink that has
  // none: the batch handler writes its rollup PARTITIONED BY batch_id
  // with dynamic partition overwrite, so a re-delivered batch
  // replaces its own partition with identical content instead of
  // appending a second copy. The handler here applies EVERY batch
  // TWICE — the worst-case redelivery schedule — and the gate reads
  // the store against the plain batch oracle: an append-shaped sink
  // doubles every count and hash-fails; a lost batch goes missing and
  // hash-fails. n_batches = 3 (3 landing files × maxFilesPerTrigger=1)
  // is pinned by the oracle literal.
  // Scale: per batch ONE keyed rollup shuffle + a partition-scoped
  // commit; the store grows by batch-dim partitions, and the final
  // audit rollup is a keyed agg over (batch, type)-dim rows, not raw
  // events.
  def e35(s: SparkSession, d: String): DataFrame = {
    val dirP = java.nio.file.Files.createTempDirectory("graft_e35_")
    val landing = dirP.resolve("landing").toString
    val store = dirP.resolve("store").toString
    try {
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
        .repartition(3)
        .write.parquet(landing)
      def applyBatch(df: DataFrame, batchId: Long): Unit =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(12,2)")).as("v"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(store)
      withStreamPartitions(s,
          streamPartitionsFor(s, java.nio.file.Paths.get(landing))) {
        runAvailableNow("e35", s.readStream
          .schema("event_id LONG, event_type STRING, value DOUBLE")
          .option("maxFilesPerTrigger", "1")
          .parquet(landing)
          .writeStream
          .foreachBatch { (df: DataFrame, bid: Long) =>
            applyBatch(df, bid)
            applyBatch(df, bid) // the redelivery: same batch, same id
          })
      }
      s.read.parquet(store)
        .groupBy("event_type")
        .agg(sum(col("n")).as("n_events"),
          round(sum(col("v")), 2).cast("double").as("sum_value"),
          countDistinct(col("batch_id")).as("n_batches"))
        .orderBy("event_type")
        .localCheckpoint()
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e35Sql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_value,
      |  CAST(3 AS BIGINT) AS n_batches
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // e36: INCREMENTAL BATCH over a stream — Trigger.AvailableNow (the
  // scheduled-job unification: a nightly job wants streaming's
  // exactly-once bookkeeping WITHOUT a 24/7 cluster, so it starts,
  // drains exactly what has arrived since the last run through the
  // SAME checkpoint, and terminates). Two separate query invocations
  // share one checkpoint: run 1 lands waves 0+1 and drains them; new
  // waves 2+3 land while nothing runs; run 2 drains ONLY the delta.
  // The parquet sink + checkpoint give exactly-once across the
  // invocations — a re-read of wave 0 by run 2 would double its rows
  // and hash-fail. n_after_run1 (the store row count BETWEEN runs) is
  // data-derived and oracle-pinned as exactly waves 0+1
  // (event_id % 4 < 2): a run-1 that under- or over-drains flips it.
  // Scale: the catch-up is bounded by arrivals since the last run,
  // not stream history; state/bookkeeping live in the checkpoint dir
  // exactly as the 24/7 variant's would.
  def e36(s: SparkSession, d: String): DataFrame = {
    val dirP = java.nio.file.Files.createTempDirectory("graft_e36_")
    val (landing, store, ckpt) = (dirP.resolve("landing").toString,
      dirP.resolve("store").toString, dirP.resolve("ckpt").toString)
    java.nio.file.Files.createDirectories(dirP.resolve("landing"))
    try {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          col("value"), (col("event_id") % 4).as("wave"))
      def land(w: Long): Unit =
        ev.filter(col("wave") === w).drop("wave")
          .coalesce(1).write.parquet(s"$landing/w$w")
      def drain(): Unit = withStreamPartitions(s,
          streamPartitionsFor(s, java.nio.file.Paths.get(landing))) {
        val q = s.readStream
          .schema("event_id LONG, event_type STRING, value DOUBLE")
          .option("pathGlobFilter", "*.parquet")
          .option("recursiveFileLookup", "true")
          .parquet(landing)
          .writeStream
          .format("parquet")
          .option("path", store)
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
      land(0); land(1)
      drain() // run 1: waves 0+1
      val afterRun1 = s.read.parquet(store).count()
      land(2); land(3)
      drain() // run 2: the delta only — same checkpoint
      s.read.parquet(store)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(12,2)")), 2).cast("double")
            .as("sum_value"))
        .withColumn("n_after_run1", lit(afterRun1))
        .orderBy("event_type")
        .localCheckpoint()
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e36Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
      |    AS sum_value,
      |  (SELECT count(*) FROM events WHERE event_id % 4 < 2) AS n_after_run1
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // e37: MULTI-SOURCE WATERMARK (the min-across-sources rule — a real
  // pipeline unions feeds that advance at different speeds; if the
  // global watermark followed the FASTEST source, every slower feed's
  // rows would arrive "late" and silently drop. Spark's default
  // multipleWatermarkPolicy=min is the correctness choice and this op
  // gates it): source A (even users) lands everything and a +10-day
  // sentinel IMMEDIATELY — its branch watermark leaps past the whole
  // corpus; source B (odd users) lands its early hours, THEN its late
  // hours, then its sentinels. Under min-policy B's second file is
  // on-time (the global watermark waited for B); under a max policy A's
  // sentinel would have closed every window first and B's file would
  // drop — half the odd-user counts vanish and the hash fails. The
  // oracle is the plain batch rollup over ALL events: the gate passes
  // ONLY if nothing dropped.
  // Scale: two file sources, one union, one watermarked keyed window
  // agg — state bounded by open windows, exactly the 24/7 shape.
  def e37(s: SparkSession, d: String): DataFrame = e37Flow(s, d, "min")

  /** The e37 topology with the watermark policy explicit — the spec
    * reruns it under "max" and pins that rows GENUINELY drop (the
    * divergence that makes the min gate non-vacuous). */
  private[graft] def e37Flow(s: SparkSession, d: String,
      policy: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val ev = Tables.events(s, d).select("event_id", "ts", "event_type", "user_id")
    val dirP = Files.createTempDirectory("graft_e37_")
    val (dirA, dirB) = (dirP.resolve("srcA"), dirP.resolve("srcB"))
    Files.createDirectories(dirA); Files.createDirectories(dirB)
    val sink = "graft_e37_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType)))
      def sentinel(plusDays: Long): DataFrame = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(0L,
          java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(plusDays * 86400)),
          "sentinel", -1L)),
        schema)
      def land(df: DataFrame, dir: java.nio.file.Path, name: String,
          mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = dir.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      val a = ev.filter(col("user_id") % 2 === 0)
      val b = ev.filter(col("user_id") % 2 === 1)
      // chronological midpoint — B's arrival genuinely trails in event
      // time, the situation the min policy exists for
      val Seq(minUs, maxUs) = ev
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .collect()(0).toSeq.map(_.asInstanceOf[Long])
      val midUs = (minUs + maxUs) / 2
      val bEarly = b.filter(unix_micros(col("ts")) < midUs)
      val bMaxTs = bEarly.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val bNudge = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(0L, bMaxTs, "sentinel", -1L)),
        schema)
      // A races ahead: corpus + far-future sentinels, first in line
      land(a, dirA, "a0", t0 - 100000)
      land(sentinel(10), dirA, "a1", t0 - 90000)
      land(sentinel(11), dirA, "a2", t0 - 80000)
      // B trails: first half of the timeline, a no-advance nudge (so
      // A's sentinel watermark is definitely in force when B's second
      // half arrives — the e16 two-batches-back rule), the second
      // half, then B's own flush sentinels
      land(bEarly, dirB, "b0", t0 - 100000)
      land(bNudge, dirB, "b1", t0 - 90000)
      land(b.filter(unix_micros(col("ts")) >= midUs), dirB, "b2", t0 - 80000)
      land(sentinel(10), dirB, "b3", t0 - 70000)
      land(sentinel(11), dirB, "b4", t0 - 60000)
      def src(dir: java.nio.file.Path): DataFrame = s.readStream
        .schema("event_id LONG, ts TIMESTAMP, event_type STRING, user_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString)
        .withWatermark("ts", "2 hours")
      val agg = src(dirA).union(src(dirB))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val prevPolicy = s.conf.getOption("spark.sql.streaming.multipleWatermarkPolicy")
      s.conf.set("spark.sql.streaming.multipleWatermarkPolicy", policy)
      try withStreamPartitions(s, streamPartitionsFor(s, dirP)) {
        runAvailableNow("e37", agg.writeStream.outputMode("append")
          .format("memory").queryName(sink))
      } finally prevPolicy match {
        case Some(v) => s.conf.set("spark.sql.streaming.multipleWatermarkPolicy", v)
        case None => s.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")
      }
      s.table(sink)
        .filter(col("event_type") =!= "sentinel")
        .select(unix_micros(col("window.start")).as("hour_us"),
          col("event_type"), col("n"))
        .orderBy("hour_us", "event_type")
        .localCheckpoint()
    } finally {
      s.catalog.dropTempView(sink)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e37Sql: String =
    """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS hour_us,
      |  event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // e38: TIMER-DRIVEN SESSION EMISSION — flatMapGroupsWithState with
  // EventTimeTimeout, the production stateful primitive the e-series
  // hasn't gated yet: e07's NoTimeout variant emits running summaries
  // per batch, but a real sessionizer must emit a session exactly once,
  // WHEN IT CLOSES — either because a later event opened the next
  // session (data-driven close) or because the watermark proved no
  // more events can arrive (TIMER close — the only way the last
  // session per user ever emits on an unbounded stream). State per
  // user is one open session (start, last, count); every update arms
  // a timeout at last + gap, and the timeout callback emits + clears.
  // The corpus lands as two chronological halves (sessions spanning
  // the file boundary must continue across batches — a state reset
  // between files would split them and hash-fail) plus two sentinel
  // batches that walk the watermark past every timer. The gate is the
  // full closed-session table (user, start, end, n) against e02's
  // gap-session oracle — byte-exact session boundaries, every session
  // emitted exactly once.
  // Scale: state is O(users), partitioned by the group key; timers
  // ride the state store — no scan of history at close time.
  def e38(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val ev = Tables.events(s, d).select("event_id", "ts", "user_id")
    val dirP = Files.createTempDirectory("graft_e38_")
    val streamDir = dirP.resolve("stream")
    Files.createDirectories(streamDir)
    val sink = "graft_e38_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val Seq(minUs, maxUs) = ev
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .collect()(0).toSeq.map(_.asInstanceOf[Long])
      val midUs = (minUs + maxUs) / 2
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType)))
      def sentinel(plusDays: Long): DataFrame = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(0L,
          new java.sql.Timestamp(maxUs / 1000 + plusDays * 86400000L), -1L)),
        schema)
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = streamDir.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(ev.filter(unix_micros(col("ts")) < midUs), "b0", t0 - 100000)
      land(ev.filter(unix_micros(col("ts")) >= midUs), "b1", t0 - 90000)
      land(sentinel(10), "b2", t0 - 80000)
      land(sentinel(11), "b3", t0 - 70000)
      // ts stays in the tuple: the watermark attribute must survive
      // projection all the way into the stateful operator
      val stream = s.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
        .withWatermark("ts", "2 hours")
        .select(col("user_id"), col("ts"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .as[(Long, java.sql.Timestamp, Long, Long)]
      val GAP = 1800L * 1000000L
      val sessions = stream.groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (user, it,
           state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Long)]) =>
            if (!it.hasNext && state.hasTimedOut) {
              // the timer close: the watermark proved the session over
              val (start, last, n) = state.get
              state.remove()
              Iterator.single((user, start, last, n))
            } else {
              val evs = it.toSeq.map(e => (e._3, e._4)).sortBy(identity)
              var out = List.empty[(Long, Long, Long, Long)]
              var (start, last, n) =
                state.getOption.getOrElse((-1L, -1L, 0L))
              evs.foreach { case (us, _) =>
                if (start < 0) { start = us; last = us; n = 1L }
                else if (us - last > GAP) {
                  out ::= ((user, start, last, n))
                  start = us; last = us; n = 1L
                } else { last = us; n += 1L }
              }
              state.update((start, last, n))
              state.setTimeoutTimestamp(last / 1000 + 1800000 + 1)
              out.reverseIterator
            }
        }
      withStreamPartitions(s, streamPartitionsFor(s, streamDir)) {
        runAvailableNow("e38",
          sessions.toDF("user_id", "start_us", "end_us", "n_events")
            .writeStream.outputMode("append")
            .format("memory").queryName(sink))
      }
      s.table(sink)
        .filter(col("user_id") >= 0)
        .orderBy("user_id", "start_us")
        .localCheckpoint()
    } finally {
      s.catalog.dropTempView(sink)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e38Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
      |      OR lag(epoch_us(ts), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM events),
      |sess AS (
      |  SELECT user_id, us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM tagged)
      |SELECT user_id, min(us) AS start_us, max(us) AS end_us,
      |  count(*) AS n_events
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, start_us""".stripMargin

  // e39: CHAINED STREAMING WINDOW AGGREGATIONS (multiple stateful
  // operators in ONE query — the Spark-4 capability that collapses
  // the classic two-job rollup cascade): hourly per-type counts feed
  // a SECOND stateful aggregation re-windowing `window` to 1 day —
  // hourly closes under the 2 h watermark, its emissions flow
  // straight into the daily state, daily closes when the watermark
  // passes the day. Before multi-stateful support this was two
  // queries glued by a sink+re-source (a full persistence round-trip
  // per tier at 100 TB); here the intermediate tier never touches
  // storage — the cube cascade (day←hour) as one standing query.
  // Append mode is mandatory for chaining, so the e21 sentinel
  // pattern closes the tail: two far-future batches push the
  // watermark past every real day, then filter the sentinel's own
  // cells out. Gate: per (day,type) totals, contributing-hour counts
  // and the peak hour's count vs the batch cascade in DuckDB — if
  // the inner tier dropped/duplicated any hourly cell, n_hours and
  // peak_hour hash-fail. Scale: state is O(open windows), both tiers
  // keyed by (window,type); the 2nd tier's input is pre-aggregated
  // hourly cells — tiny regardless of event volume.
  def e39(s: SparkSession, d: String): DataFrame = {
    import java.nio.file.{Files, StandardCopyOption}
    val ev = Tables.events(s, d).select(col("ts"), col("event_type"))
    val dirP = Files.createTempDirectory("graft_e39_")
    val streamDir = dirP.resolve("stream")
    Files.createDirectories(streamDir)
    val sink = "graft_e39_" + java.util.UUID.randomUUID().toString.replace("-", "")
    try {
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType)))
      def sentinel(plusDays: Long): DataFrame = s.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(
          java.sql.Timestamp.from(maxTs.toInstant.plusSeconds(plusDays * 86400)),
          "zzz_sentinel")),
        schema)
      def land(df: DataFrame, name: String, mtimeMs: Long): Unit = {
        val tmp = dirP.resolve(name + "_tmp")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = Files.list(tmp)
        val part = try listing.filter(p =>
          p.getFileName.toString.startsWith("part-") &&
            p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
        val dest = streamDir.resolve(name + ".parquet")
        Files.move(part, dest, StandardCopyOption.REPLACE_EXISTING)
        Files.setLastModifiedTime(dest,
          java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
      }
      val t0 = System.currentTimeMillis()
      land(ev.filter(hour(col("ts")) % 2 === 0), "b0", t0 - 80000)
      land(ev.filter(hour(col("ts")) % 2 === 1), "b1", t0 - 60000)
      land(sentinel(10), "b2", t0 - 40000)
      land(sentinel(11), "b3", t0 - 20000)
      val hourly = s.readStream
        .schema("ts TIMESTAMP, event_type STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(streamDir.toString)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_h"))
      val daily = hourly
        .groupBy(window(col("window"), "1 day").as("day_w"), col("event_type"))
        .agg(sum(col("n_h")).as("n_events"),
          count(lit(1)).as("n_hours"), max(col("n_h")).as("peak_hour"))
      withStreamPartitions(s, streamPartitionsFor(s, streamDir)) {
        runAvailableNow("e39", daily.writeStream.outputMode("append")
          .format("memory").queryName(sink))
      }
      s.table(sink)
        .filter(col("event_type") =!= "zzz_sentinel")
        .select(unix_micros(col("day_w.start")).as("day_us"), col("event_type"),
          col("n_events"), col("n_hours"), col("peak_hour"))
        .orderBy("day_us", "event_type")
        .localCheckpoint()
    } finally {
      s.catalog.dropTempView(sink)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(dirP.toString), true)
    }
  }

  val e39Sql: String =
    """WITH hourly AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts) AS hr, event_type,
      |    count(*) AS n_h
      |  FROM events GROUP BY 1, 2)
      |SELECT epoch_us(time_bucket(INTERVAL '1 day', hr)) AS day_us, event_type,
      |  CAST(sum(n_h) AS BIGINT) AS n_events, count(*) AS n_hours,
      |  CAST(max(n_h) AS BIGINT) AS peak_hour
      |FROM hourly GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // e40: STREAM ENRICHMENT AGAINST A VERSIONED (SCD2) DIMENSION —
  // e11 joins a FLAT dim; production dims have history, and joining a
  // stream to "the current version" silently rewrites the past every
  // time the dim changes (the classic streaming-SCD bug: yesterday's
  // events re-attributed to today's segment). The temporal-correct
  // join picks the version valid AT EVENT TIME; streams cannot run an
  // as-of (no per-key argmax without state), so the scalable rewrite
  // is the INTERVAL-BOUNDED stream-static join: versions carry
  // explicit [valid_from, valid_to) and the join predicate ts ∈
  // interval matches EXACTLY ONE version per event — no post-join
  // dedup, fan-out bounded by versions-per-key, broadcast-able dim.
  // Dim: seg = user%5 from epoch; every 3rd user migrates to seg+5 on
  // 2024-01-16 (mid-corpus, so both versions genuinely serve). Gate:
  // (seg, event_type) rollup vs the oracle's CASE form; the
  // migrated-user both-sides evidence is pinned in StreamingSpec.
  def e40(s: SparkSession, d: String): DataFrame = {
    val users = Tables.events(s, d).select("user_id").distinct()
    val cut = lit("2024-01-16").cast("timestamp")
    val lo = lit("1970-01-01").cast("timestamp")
    val hi = lit("9999-01-01").cast("timestamp")
    val v1 = users.select(col("user_id").as("u"), (col("user_id") % 5).as("seg"),
      lo.as("valid_from"),
      when(col("user_id") % 3 === 0, cut).otherwise(hi).as("valid_to"))
    val v2 = users.filter(col("user_id") % 3 === 0)
      .select(col("user_id").as("u"), (col("user_id") % 5 + 5).as("seg"),
        cut.as("valid_from"), hi.as("valid_to"))
    val dim = v1.unionByName(v2)
    val sink = "graft_e40_" + java.util.UUID.randomUUID().toString.replace("-", "")
    runAvailableNow("e40", graft.streaming.Streams.eventStream(s, d)
      .join(broadcast(dim),
        col("user_id") === col("u") &&
          col("ts") >= col("valid_from") && col("ts") < col("valid_to"))
      .writeStream.outputMode("append")
      .format("memory").queryName(sink))
    try s.table(sink)
      .groupBy("seg", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("seg", "event_type")
      .localCheckpoint()
    finally s.catalog.dropTempView(sink)
  }

  val e40Sql: String =
    """SELECT CASE WHEN user_id % 3 = 0 AND ts >= TIMESTAMP '2024-01-16'
      |  THEN user_id % 5 + 5 ELSE user_id % 5 END AS seg,
      |  event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // e41: KAPLAN–MEIER SURVIVAL life table over session durations (the
  // right-censoring estimator behind every churn/engagement-duration
  // analysis — naive mean duration is biased low because sessions cut
  // off by the observation window aren't over yet). Episodes are e02's
  // 30-min-gap sessions; duration t in whole minutes (integer div);
  // a session whose last event lies within one gap of the corpus end
  // is CENSORED (it may still be running — treating it as ended is the
  // classic bias KM exists to fix). The gate is the exact integer life
  // table: per distinct t, n_risk (episodes with duration ≥ t, via one
  // ordered cumulative window over the ≤duration-cap-sized table),
  // observed ends d, censored c, and hazard_ppm = 10⁶·d div n_risk —
  // all bigint, no float anywhere. The KM curve S(t) = Π(1 − dᵢ/nᵢ) is
  // a cumulative PRODUCT (no SQL window does it exactly), so it is
  // replayed in OpsSpec with exact BigInt rationals from this table —
  // the table determines the curve uniquely. Scale: one user-keyed
  // session window + one (user,sid) agg + one duration-grain agg; the
  // only unpartitioned window runs on the duration-grain table, bounded
  // by the session-length cap in minutes, never by corpus size.
  def e41(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .withColumn("new_s", when(col("gap").isNull || col("gap") > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("fu"), max(col("us")).as("lu"))
      // session-grain (corpus-bounded by the gap rule) — materialize
      // once: it feeds the corpus-end agg, the life table AND the
      // risk-set total, which would otherwise each re-scan events
      .localCheckpoint()
    // the corpus end is the max session end — no second events scan
    val endUs = sess.agg(max(col("lu")).as("end_us"))
    val labeled = sess.crossJoin(broadcast(endUs))
      .select(expr("(lu - fu) div 60000000").as("t"),
        when(col("end_us") - col("lu") < 1800000000L, 1L).otherwise(0L).as("cen"))
    val byT = labeled.groupBy("t")
      .agg(count(lit(1)).as("n_end"), sum(lit(1L) - col("cen")).as("d"),
        sum(col("cen")).as("c"))
    val cum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    byT.crossJoin(broadcast(labeled.agg(count(lit(1)).as("n_total"))))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("n_end")).over(cum), lit(0L)))
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        expr("d * 1000000 div n_risk").as("hazard_ppm"))
      .orderBy("t")
  }

  val e41Sql: String =
    """WITH ev AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us FROM events),
      |fin AS (SELECT max(us) AS end_us FROM ev),
      |tagged AS (
      |  SELECT user_id, us,
      |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |        > 1800000000
      |      OR lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |      THEN 1 ELSE 0 END AS new_s,
      |    ts, event_id
      |  FROM ev),
      |sess AS (
      |  SELECT user_id,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
      |    us
      |  FROM tagged),
      |spans AS (SELECT user_id, sid, min(us) AS fu, max(us) AS lu
      |  FROM sess GROUP BY 1, 2),
      |labeled AS (
      |  SELECT (lu - fu) // 60000000 AS t,
      |    CASE WHEN (SELECT end_us FROM fin) - lu < 1800000000
      |      THEN 1 ELSE 0 END AS cen
      |  FROM spans),
      |byt AS (
      |  SELECT t, count(*) AS n_end,
      |    CAST(sum(1 - cen) AS BIGINT) AS d, CAST(sum(cen) AS BIGINT) AS c
      |  FROM labeled GROUP BY 1),
      |risk AS (
      |  SELECT t, d, c,
      |    CAST((SELECT count(*) FROM labeled) -
      |      coalesce(sum(n_end) OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS n_risk
      |  FROM byt)
      |SELECT t, n_risk, d, c,
      |  CAST(d * 1000000 // n_risk AS BIGINT) AS hazard_ppm
      |FROM risk ORDER BY t""".stripMargin

  // ------------------------------------------------------------------
  // e42: SHAPLEY-VALUE MULTI-TOUCH ATTRIBUTION (the game-theoretic
  // credit split — e24's linear model gives every touch equal credit;
  // Shapley pays each channel its average marginal contribution over
  // all join orders, the only split that is efficient, symmetric and
  // dummy-free). Journeys: per purchase, the SET of touch channels
  // {view=1, click=2, signup=4} the user emitted in the prior 24h —
  // one user-keyed interval join (e24's bounded shape), masks via
  // per-bit max (no bit_or dialect dependence). Coalition value
  // v(S) = #journeys whose mask ⊆ S (monotone, v(∅) = untouched
  // conversions — cancels in every marginal). With n=3 the Shapley
  // sum unrolls exactly: φᵢ·3! = Σ_{S∌i} |S|!(2−|S|)!·(v(S∪i)−v(S)),
  // weights {2,1,2} — the gate carries φ·6 as exact BIGINT plus a
  // floor-div ppm share; all set algebra runs on ≤8-row broadcast
  // frames (the fact scan is the only corpus-sized stage at 100 TB).
  // Efficiency (Σφ·6 = 6·(v(N)−v(∅))) pinned in OpsSpec.
  def e42(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"),
        unix_micros(col("ts")).as("pus"))
    val t = ev.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id").as("t_user"), col("event_type").as("ch"),
        unix_micros(col("ts")).as("tus"))
    val j = p.join(t, col("user_id") === col("t_user") &&
        col("tus") >= col("pus") - 86400000000L && col("tus") < col("pus"),
        "left")
      .groupBy(col("user_id"), col("pid"))
      .agg((coalesce(max(when(col("ch") === "view", 1)), lit(0)) +
        coalesce(max(when(col("ch") === "click", 2)), lit(0)) +
        coalesce(max(when(col("ch") === "signup", 4)), lit(0))).as("mask"))
    // ≤8 rows; everything downstream (v twice, contrib twice) re-runs
    // its inputs — pin the corpus-sized stage to exactly one execution
    val mc = j.groupBy("mask").agg(count(lit(1)).as("cnt")).localCheckpoint()
    val subsets = s.range(0, 8).select(col("id").cast("int").as("s"))
    val v = subsets.join(broadcast(mc),
        col("mask").bitwiseAND(col("s")) === col("mask"), "left")
      .groupBy("s").agg(coalesce(sum("cnt"), lit(0L)).as("v"))
    val ch = subsets.filter(col("s").isin(1, 2, 4))
      .select(col("s").as("bit"),
        when(col("s") === 1, "view").when(col("s") === 2, "click")
          .otherwise("signup").as("channel"))
    val v0 = v.select(col("s").as("s0"), col("v").as("vs0"))
    val v1 = v.select(col("s").as("s1"), col("v").as("vs1"))
    val contrib = ch
      .join(broadcast(v0), col("s0").bitwiseAND(col("bit")) === 0)
      .join(broadcast(v1), col("s1") === col("s0").bitwiseOR(col("bit")))
      .withColumn("pc", expr("(s0 % 2) + ((s0 div 2) % 2) + ((s0 div 4) % 2)"))
      .groupBy("channel")
      .agg(sum((when(col("pc").isin(0, 2), 2L).otherwise(1L)) *
        (col("vs1") - col("vs0"))).as("shapley_x6"))
      .localCheckpoint() // 3 rows, consumed by itself + its total
    contrib
      .crossJoin(broadcast(contrib.agg(sum("shapley_x6").as("tot"))))
      .select(col("channel"), col("shapley_x6"),
        expr("shapley_x6 * 1000000 div tot").as("share_ppm"))
      .orderBy("channel")
  }

  val e42Sql: String =
    """WITH p AS (SELECT user_id, event_id AS pid, epoch_us(ts) AS pus
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (SELECT user_id, event_type, epoch_us(ts) AS tus
      |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
      |j AS (SELECT p.user_id, p.pid,
      |    coalesce(max(CASE WHEN t.event_type = 'view' THEN 1 END), 0) +
      |    coalesce(max(CASE WHEN t.event_type = 'click' THEN 2 END), 0) +
      |    coalesce(max(CASE WHEN t.event_type = 'signup' THEN 4 END), 0)
      |      AS mask
      |  FROM p LEFT JOIN t ON p.user_id = t.user_id
      |    AND t.tus >= p.pus - 86400000000 AND t.tus < p.pus
      |  GROUP BY 1, 2),
      |mc AS (SELECT mask, count(*) AS cnt FROM j GROUP BY 1),
      |subsets AS (SELECT * FROM (VALUES (0),(1),(2),(3),(4),(5),(6),(7))
      |  AS subs(s)),
      |v AS (SELECT s,
      |    CAST(coalesce(sum(CASE WHEN (mask & s) = mask THEN cnt END), 0)
      |      AS BIGINT) AS v
      |  FROM subsets LEFT JOIN mc ON (mask & s) = mask GROUP BY s),
      |ch AS (SELECT * FROM (VALUES ('view', 1), ('click', 2), ('signup', 4))
      |  AS c(channel, bit)),
      |contrib AS (
      |  SELECT ch.channel,
      |    CAST(sum((CASE WHEN ((v0.s % 2) + ((v0.s // 2) % 2) +
      |        ((v0.s // 4) % 2)) IN (0, 2) THEN 2 ELSE 1 END) *
      |      (v1.v - v0.v)) AS BIGINT) AS shapley_x6
      |  FROM ch JOIN v v0 ON (v0.s & ch.bit) = 0
      |  JOIN v v1 ON v1.s = (v0.s | ch.bit)
      |  GROUP BY 1)
      |SELECT channel, shapley_x6,
      |  CAST(shapley_x6 * 1000000 //
      |    (SELECT sum(shapley_x6) FROM contrib) AS BIGINT) AS share_ppm
      |FROM contrib ORDER BY channel""".stripMargin

  // ------------------------------------------------------------------
  // e43: MULTIWINDOW BURN-RATE SLO MONITOR (the Google SRE workbook
  // alerting rule — a single-window error-rate alarm either pages on
  // noise (short window) or pages an hour late (long window); the
  // production rule pages only when a SHORT (30 m) and a LONG (6 h)
  // window are BOTH burning the error budget). Everything is exact
  // integer algebra: 5-minute grid buckets (gap-filled DENSE via one
  // bounded sequence-explode so a k-bucket lag is exactly k·5 min),
  // rolling window sums as cumsum − lag(cumsum, k), and the burn
  // conditions as cross-multiplications against the 25% budget —
  // page ⟺ 2·err ≥ tot in both windows (burn ≥ 2), ticket ⟺
  // 5·err ≥ 2·tot (burn ≥ 1.6); empty windows can't alert. A
  // SIX-HOUR total outage is PLANTED at a deterministic offset
  // (q49's discipline — the natural 20% error floor never moves,
  // and a 45-min plant measured invisible to the 6 h window):
  // alerts fire exactly around the incident, pinned in OpsSpec —
  // the both-windows rule is WHY the bars are noise-proof (the 6 h
  // window sits +7σ/+4.5σ from the floor at 50%/40%, while the 30 m
  // window alone would trip ~3% of the time). Scale: the grid is
  // time-domain-bounded (8.6k rows/month at any corpus size), so the
  // one unpartitioned cumsum is domain-bounded; the corpus-sized
  // stage is the per-bucket count rollup under the event scan.
  def e43(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(expr("unix_micros(ts) div 300000000").as("b"),
        (col("event_type") === "error").cast("long").as("is_err"))
    val perB = ev.groupBy("b")
      .agg(count(lit(1)).as("n"), sum(col("is_err")).as("e"))
    val mm = ev.agg(min(col("b")).as("minb"), max(col("b")).as("maxb"))
    val grid = mm.select(explode(sequence(col("minb"), col("maxb"))).as("b"),
      col("minb"))
    val dense = grid.join(perB, Seq("b"), "left")
      .select(col("b"), col("minb"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("e"), lit(0L)).as("e"))
      .withColumn("err_eff",
        when(col("b") >= col("minb") + 2880 && col("b") < col("minb") + 2952,
          col("n")).otherwise(col("e")))
    val w = Window.orderBy("b")
    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dense
      .withColumn("ce", sum(col("err_eff")).over(cumW))
      .withColumn("cn", sum(col("n")).over(cumW))
    val roll = cum
      .withColumn("s_err", col("ce") - coalesce(lag(col("ce"), 6).over(w), lit(0L)))
      .withColumn("s_tot", col("cn") - coalesce(lag(col("cn"), 6).over(w), lit(0L)))
      .withColumn("l_err", col("ce") - coalesce(lag(col("ce"), 72).over(w), lit(0L)))
      .withColumn("l_tot", col("cn") - coalesce(lag(col("cn"), 72).over(w), lit(0L)))
    // alerts only on COMPLETE windows with MINIMUM VOLUME (the SRE
    // rule's fine print): a 2-event head-of-series denominator or a
    // sparse corpus would page on one unlucky error — measured at
    // 0.1× density, where 8-event long windows noise-fire the 50%
    // bar ~1% of the time; below 40 events the monitor stays quiet
    val ready = col("b") >= col("minb") + 72 && col("l_tot") >= 40
    roll.select(col("b"), col("s_err"), col("s_tot"), col("l_err"), col("l_tot"),
        (ready && col("s_tot") > 0 && col("l_tot") > 0 &&
          col("s_err") * 5 >= col("s_tot") * 2 &&
          col("l_err") * 5 >= col("l_tot") * 2).as("ticket"),
        (ready && col("s_tot") > 0 && col("l_tot") > 0 &&
          col("s_err") * 2 >= col("s_tot") &&
          col("l_err") * 2 >= col("l_tot")).as("page"))
      .orderBy("b")
  }

  val e43Sql: String =
    """WITH ev AS (
      |  SELECT epoch_us(ts) // 300000000 AS b,
      |    CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      |  FROM events),
      |perb AS (SELECT b, count(*) AS n, CAST(sum(is_err) AS BIGINT) AS e
      |  FROM ev GROUP BY 1),
      |mm AS (SELECT min(b) AS minb, max(b) AS maxb FROM ev),
      |grid AS (SELECT unnest(range((SELECT minb FROM mm),
      |  (SELECT maxb FROM mm) + 1)) AS b),
      |dense AS (
      |  SELECT g.b, coalesce(p.n, 0) AS n, coalesce(p.e, 0) AS e,
      |    CASE WHEN g.b >= (SELECT minb FROM mm) + 2880
      |          AND g.b < (SELECT minb FROM mm) + 2952
      |      THEN coalesce(p.n, 0) ELSE coalesce(p.e, 0) END AS err_eff
      |  FROM grid g LEFT JOIN perb p ON g.b = p.b),
      |cum AS (
      |  SELECT b,
      |    CAST(sum(err_eff) OVER cw AS BIGINT) AS ce,
      |    CAST(sum(n) OVER cw AS BIGINT) AS cn
      |  FROM dense
      |  WINDOW cw AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
      |    AND CURRENT ROW)),
      |roll AS (
      |  SELECT b,
      |    ce - coalesce(lag(ce, 6) OVER w, 0) AS s_err,
      |    cn - coalesce(lag(cn, 6) OVER w, 0) AS s_tot,
      |    ce - coalesce(lag(ce, 72) OVER w, 0) AS l_err,
      |    cn - coalesce(lag(cn, 72) OVER w, 0) AS l_tot
      |  FROM cum WINDOW w AS (ORDER BY b))
      |SELECT b, s_err, s_tot, l_err, l_tot,
      |  b >= (SELECT minb FROM mm) + 72 AND s_tot > 0 AND l_tot >= 40
      |    AND s_err * 5 >= s_tot * 2 AND l_err * 5 >= l_tot * 2 AS ticket,
      |  b >= (SELECT minb FROM mm) + 72 AND s_tot > 0 AND l_tot >= 40
      |    AND s_err * 2 >= s_tot AND l_err * 2 >= l_tot AS page
      |FROM roll ORDER BY b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e43_burn_rate" -> (e43 _),
    "e42_shapley_attribution" -> (e42 _),
    "e41_survival" -> (e41 _),
    "e40_stream_scd_enrich" -> (e40 _),
    "e39_chained_windows" -> (e39 _),
    "e38_session_timers" -> (e38 _),
    "e37_multisource_watermark" -> (e37 _),
    "e36_available_now" -> (e36 _),
    "e35_replay_merge" -> (e35 _),
    "e34_session_paths" -> (e34 _),
    "e33_dwell_time" -> (e33 _),
    "e32_gap_monitor" -> (e32 _),
    "e31_windowed_funnel" -> (e31 _),
    "e30_conversion_latency" -> (e30 _),
    "e29_retention_matrix" -> (e29 _),
    "e28_stream_update_mode" -> (e28 _),
    "e27_trending" -> (e27 _),
    "e26_stream_backfill" -> (e26 _),
    "e25_lateness_profile" -> (e25 _),
    "e24_attribution" -> (e24 _),
    "e23_stream_cdc" -> (e23 _),
    "e22_peak_concurrency" -> (e22 _),
    "e21_stream_sessions" -> (e21 _),
    "e44_stream_full_outer" -> (e44 _),
    "e20_stream_outer_join" -> (e20 _),
    "e18_rate_ingest" -> (e18 _),
    "e19_dedup_bounded_state" -> (e19 _),
    "e17_checkpoint_recovery" -> (e17 _),
    "e16_late_data" -> (e16 _),
    "e15_session_window" -> (e15 _),
    "e13_stream_hh" -> (e13 _),
    "e12_sliding_window" -> (e12 _),
    "e08_json_schema" -> (e08 _),
    "e09_stream_join" -> (e09 _),
    "e10_stream_dedup" -> (e10 _),
    "e11_stream_enrich" -> (e11 _),
    "e05_json_props" -> (e05 _),
    "e06_stream_tumbling" -> (e06 _),
    "e07_stateful_sessions" -> (e07 _),
    "e01_tumbling_window" -> (e01 _),
    "e02_sessionize" -> (e02 _),
    "e03_funnel" -> (e03 _),
    "e04_retention" -> (e04 _))

  val oracles: Map[String, String] = Map(
    "e43_burn_rate" -> e43Sql,
    "e42_shapley_attribution" -> e42Sql,
    "e41_survival" -> e41Sql,
    "e40_stream_scd_enrich" -> e40Sql,
    "e39_chained_windows" -> e39Sql,
    "e38_session_timers" -> e38Sql,
    "e37_multisource_watermark" -> e37Sql,
    "e36_available_now" -> e36Sql,
    "e35_replay_merge" -> e35Sql,
    "e34_session_paths" -> e34Sql,
    "e33_dwell_time" -> e33Sql,
    "e32_gap_monitor" -> e32Sql,
    "e31_windowed_funnel" -> e31Sql,
    "e30_conversion_latency" -> e30Sql,
    "e29_retention_matrix" -> e29Sql,
    "e28_stream_update_mode" -> e28Sql,
    "e27_trending" -> e27Sql,
    "e26_stream_backfill" -> e01Sql, // handoff union ≡ the pure-batch rollup
    "e25_lateness_profile" -> e25Sql,
    "e24_attribution" -> e24Sql,
    "e23_stream_cdc" -> e23Sql,
    "e22_peak_concurrency" -> e22Sql,
    "e21_stream_sessions" -> e15Sql, // 4th formulation, same oracle
    "e44_stream_full_outer" -> e44Sql,
    "e20_stream_outer_join" -> e20Sql,
    "e18_rate_ingest" -> e18Sql,
    "e19_dedup_bounded_state" -> e10Sql,
    "e17_checkpoint_recovery" -> e17Sql,
    "e16_late_data" -> e16Sql,
    "e15_session_window" -> e15Sql,
    "e13_stream_hh" -> e13Sql,
    "e12_sliding_window" -> e12Sql,
    "e08_json_schema" -> e08Sql,
    "e09_stream_join" -> e09Sql,
    "e10_stream_dedup" -> e10Sql,
    "e11_stream_enrich" -> e11Sql,
    "e05_json_props" -> e05Sql,
    "e07_stateful_sessions" -> e07Sql,
    "e06_stream_tumbling" -> e01Sql, // stream must reproduce the batch rollup
    "e01_tumbling_window" -> e01Sql,
    "e02_sessionize" -> e02Sql,
    "e03_funnel" -> e03Sql,
    "e04_retention" -> e04Sql)
}
