package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // TypedImperativeAggregate (TopKAgg/MinHashAgg/MisraGriesAgg)
      // runs in ObjectHashAggregate, which falls back to SORT-based
      // aggregation after 128 groups by default — that re-sorts the
      // whole fan-out the heap aggregates exist to avoid. The buffers
      // are tiny (k entries each); let the hash path keep them.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR (not WARN): the driver parses the tail of the run log, so
    // every stray warning between the result line and EOF risks pushing
    // the JSON out of the captured window.
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup: JIT + parquet footer caches, so per-query numbers
    // measure the query, not JVM startup. A micro-ALS fit warms the
    // MLlib code paths the same way q06 warms scan/agg codegen.
    try {
      SparkEntry.queries("q06_forecast_revenue")(spark, sfDir).count()
      import org.apache.spark.sql.functions.col
      new org.apache.spark.ml.recommendation.ALS()
        .setUserCol("user_id").setItemCol("item_id").setRatingCol("rating")
        .setImplicitPrefs(true).setRank(2).setMaxIter(1).setSeed(1L)
        .setNumUserBlocks(4).setNumItemBlocks(4)
        .fit(graft.etl.Ratings.implicitRatings(spark, sfDir)
          .limit(2000)
          .select(col("user_id").cast("int"), col("item_id").cast("int"),
            col("rating").cast("float")))
    } catch { case _: Throwable => () }
    // noop sink: full materialization of the gated plan — a bare
    // .count() lets Catalyst elide final sorts/projects, so orderBy
    // tails would go unmeasured.
    //
    // TWO timed runs per query, reporting min AND mean: a single
    // sample can't distinguish the query's cost from a host stall
    // (r4 shipped an unparseable bench, r5 a noise-dominated one
    // where one stalled run printed as a 14x regression). The min is
    // the headline — it is reproducible run-to-run; the mean keeps
    // the cold-path cost visible (run 1 pays training-artifact
    // builds that the memo caches then serve). GC/JIT totals make a
    // collector- or compiler-bound session visible in the line
    // itself.
    import scala.jdk.CollectionConverters._
    def gcSec: Double = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum / 1e3
    def jitSec: Double = Option(java.lang.management.ManagementFactory
      .getCompilationMXBean)
      .filter(_.isCompilationTimeMonitoringSupported)
      .map(_.getTotalCompilationTime / 1e3).getOrElse(0.0)
    val (gc0, jit0) = (gcSec, jitSec)
    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    // Memory hygiene between query FAMILIES (first-letter prefix):
    // memoized training artifacts are shared within a family (the ALS
    // evals) but almost never across one, and 330 queries of retained
    // checkpoints under a memory-pressured host cascade into
    // TorrentBroadcast store failures on unrelated queries (the r7
    // driver bench's 50x phantom q40). Dropping artifacts + cached
    // frames at each boundary costs at most one rebuild per family.
    var family = ' '
    // Memo forensics (round-8 driver host: mean≈min on exactly the
    // memoized-artifact consumers, implying run 2 paid the build both
    // times): count artifact builds per timed run — on a healthy host
    // builds_r2 is ZERO (family boundaries clear BEFORE run 1) — and
    // name the queries whose run 2 rebuilt, plus any swallowed query
    // failures (a failed run's timing is garbage and must be visible).
    var buildsR1 = 0
    var buildsR2 = 0
    val rebuiltR2 = scala.collection.mutable.ListBuffer.empty[String]
    val errs = scala.collection.mutable.ListBuffer.empty[String]
    // Per-key run1/run2 + per-run build attribution (round-10, VERDICT
    // r9 #2): the r9 driver host benched r09 at a 9.5 s MIN that no
    // local run reproduces, with builds_r2=0 saying run 2 was warm —
    // a min alone can't show WHICH run carried the cost or whether an
    // artifact build landed on it. runsByKey feeds BENCH_FULL.json
    // (every key) and the printed line's "watch" object (the known
    // driver-host outliers), so the next driver bench attributes its
    // own outliers without builder-side guessing.
    val runsByKey =
      scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double, Int, Int)]
    // SILENT-REBUILD instrument (round-11, VERDICT r10 #2): the Memo
    // ledger only counts Memo.getOrElseUpdate builds — an EVICTED
    // cached/checkpointed frame re-executes invisibly (r10 driver:
    // r17/r19/r20 at 11–21× with builds=0 on both runs, plus a
    // TorrentBroadcast store-fail in the tail). A SparkListener counts,
    // per timed run: stages submitted + tasks completed (a "warm"
    // memo-hit key that suddenly runs hundreds of tasks IS re-executing
    // its artifact lineage, whatever the ledger says) and cache-block
    // releases (an RDD block leaving BOTH memory and disk — NOTE this
    // counts deliberate unpersist()/Memo-cleanup transitions as well as
    // memory-pressure evictions, so drops_rN > 0 means "blocks
    // released", not necessarily "future recompute"; eviction pressure
    // shows as drops PAIRED with a run-2 stage/task surge). The bench
    // is sequential, so attributing listener events to the
    // currently-running (key, run) is sound up to end-of-run race
    // slop, which the post-run sleep(10) bounds.
    val runStats = new java.util.concurrent.atomic.AtomicLongArray(3)
    object lst extends org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        runStats.incrementAndGet(0): Unit
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        runStats.incrementAndGet(1): Unit
      override def onBlockUpdated(
          e: org.apache.spark.scheduler.SparkListenerBlockUpdated): Unit = {
        val u = e.blockUpdatedInfo
        if (u.blockId.isRDD && !u.storageLevel.isValid)
          runStats.incrementAndGet(2): Unit
      }
    }
    spark.sparkContext.addSparkListener(lst)
    // Drain AFTER the listener bus quiesces: a slow run can end with
    // thousands of TaskEnd events still queued in the AsyncEventQueue,
    // and a fixed sleep would attribute run 1's task storm to run 2 —
    // the exact spurious signature this instrument exists to detect.
    // Poll until two consecutive reads agree (50 ms apart, ≤2 s cap —
    // the bench is sequential, so a stable counter means the queue for
    // THIS key's events is empty).
    def drainStats(): (Long, Long, Long) = {
      def snap() = (runStats.get(0), runStats.get(1), runStats.get(2))
      var prev = snap()
      var tries = 0
      var cur = { Thread.sleep(10); snap() }
      while (cur != prev && tries < 40) {
        prev = cur; Thread.sleep(50); cur = snap(); tries += 1
      }
      (runStats.getAndSet(0, 0L), runStats.getAndSet(1, 0L),
        runStats.getAndSet(2, 0L))
    }
    // per key: [stages_r1, tasks_r1, drops_r1, stages_r2, tasks_r2, drops_r2]
    val execByKey =
      scala.collection.mutable.LinkedHashMap.empty[String, Array[Long]]
    // MICRO-BATCH attribution (round-13, VERDICT r12 #1): the gated
    // streaming keys note (batches, summed triggerExecution ms) into
    // graft.streaming.MicroBatch per query run; the bench is
    // sequential, so everything drained after a run belongs to that
    // (key, run). Per key: [batches_r1, mean_batch_ms_r1, batches_r2,
    // mean_batch_ms_r2] — a drifting e-key then decomposes into
    // more-batches vs slower-batches without a re-run.
    val streamByKey =
      scala.collection.mutable.LinkedHashMap.empty[String, Array[Double]]
    graft.streaming.MicroBatch.drain(): Unit // warmup slop
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (name.head != family) {
        family = name.head
        graft.ops.Memo.clearAll()
        spark.catalog.clearCache()
        System.gc()
      }
      graft.ops.Memo.drainBuilds(): Unit // attribute builds per run below
      drainStats(): Unit // family boundary / previous key slop
      val detail = (1 to 2).map { run =>
        val t0 = System.nanoTime()
        var failed = false
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => failed = true }
        val dt = (System.nanoTime() - t0) / 1e9
        val built = graft.ops.Memo.drainBuilds()
        val (stg, tsk, drp) = drainStats()
        val mb = graft.streaming.MicroBatch.drain()
        if (mb.nonEmpty) {
          val batches = mb.valuesIterator.map(_._1).sum
          val meanMs =
            if (batches > 0) mb.valuesIterator.map(_._2).sum / batches else 0.0
          val arr = streamByKey.getOrElseUpdate(name, Array.fill(4)(0.0))
          arr(2 * (run - 1)) = batches.toDouble
          arr(2 * run - 1) = math.rint(meanMs * 10) / 10
        }
        if (run == 1) buildsR1 += built.size
        else {
          buildsR2 += built.size
          if (built.nonEmpty) rebuiltR2 += name.takeWhile(_ != '_')
        }
        if (failed) errs += s"${name.takeWhile(_ != '_')}/r$run"
        (dt, built.size, Seq(stg, tsk, drp))
      }
      val times = detail.map(_._1)
      execByKey(name) = (detail(0)._3 ++ detail(1)._3).toArray
      // keyed by FULL name here; shortened below through the same
      // dup-aware guard as the queries maps (a bare-prefix key would
      // silently last-wins on a prefix collision)
      runsByKey(name) =
        (r3(times(0)), r3(times(1)), detail(0)._2, detail(1)._2)
      // Keys shortened to the unique query prefix ("q01_pricing_summary"
      // → "q01") and 3 decimals: r2/r3's full-name 4-decimal line
      // overflowed the driver's captured log tail and parsed as null.
      name -> (r3(times.min), r3(times.sum / times.size))
    }
    // collision guard: duplicate JSON keys are silently last-wins in
    // every parser — if two query names ever share a prefix, keep the
    // full names for those rather than dropping a timing.
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    val dup = prefixes.groupBy(identity).collect { case (p, v) if v.size > 1 => p }.toSet
    val short = results.zip(prefixes).map { case ((full, v), p) =>
      (if (dup(p)) full else p, v)
    }
    def jmap(rs: Seq[(String, (Double, Double))],
             pick: ((Double, Double)) => Double): String =
      rs.map { case (k, v) => "\"" + k + "\":" + pick(v) }
        .mkString("{", ",", "}")
    val total = r3(results.map(_._2._1).sum)
    val totalMean = r3(results.map(_._2._2).sum)
    val gcJit = s""""gc_sec":${r3(gcSec - gc0)},"jit_sec":${r3(jitSec - jit0)}"""
    def jarr(xs: Seq[String]): String =
      xs.take(8).map("\"" + _ + "\"").mkString("[", ",", "]")
    val memoDiag = s""""builds_r1":$buildsR1,"builds_r2":$buildsR2,""" +
      s""""rebuilt_r2":${jarr(rebuiltR2.distinct.toSeq)},""" +
      s""""errs":${jarr(errs.toSeq)}"""
    // FULL per-query detail (min + mean, all queries) goes to a file the
    // round commits — the driver only captures the last 2000 bytes of
    // the run log, and the full map outgrew that window at 173 queries
    // (r6 shipped parsed:null). The printed line carries the totals
    // plus the slowest-N lines, hard-capped under the tail window.
    // [run1, run2, builds_r1, builds_r2] per key, shortened under the
    // same dup guard as the queries maps — the attribution row
    val shortRuns = results.zip(prefixes).map { case ((full, _), p) =>
      (if (dup(p)) full else p) -> runsByKey(full)
    }
    val shortRunsMap = shortRuns.toMap
    // exec attribution under the same dup-aware shortening: per key
    // [stages_r1, tasks_r1, drops_r1, stages_r2, tasks_r2, drops_r2]
    val shortExecMap = results.zip(prefixes).map { case ((full, _), p) =>
      (if (dup(p)) full else p) -> execByKey(full)
    }.toMap
    // micro-batch rows under the same dup-aware shortening; only keys
    // that actually noted streaming progress appear
    val streamJ: String = results.zip(prefixes).flatMap { case ((full, _), p) =>
      streamByKey.get(full).map { v =>
        "\"" + (if (dup(p)) full else p) + "\":[" + v(0).toLong + "," + v(1) +
          "," + v(2).toLong + "," + v(3) + "]"
      }
    }.mkString("{", ",", "}")
    // queries_runs keeps its documented 4-element shape; the exec
    // numbers live ONCE, in queries_exec (full file) and in the watch
    // rows (printed line), via the 10-element watchJ below.
    def runsJ(keys: Iterable[String]): String = keys.flatMap { k =>
      shortRunsMap.get(k).map { case (t1, t2, b1, b2) =>
        "\"" + k + "\":[" + t1 + "," + t2 + "," + b1 + "," + b2 + "]" }
    }.mkString("{", ",", "}")
    def watchJ(keys: Iterable[String]): String = keys.flatMap { k =>
      shortRunsMap.get(k).map { case (t1, t2, b1, b2) =>
        val ex = shortExecMap.get(k).map(_.mkString(",")).getOrElse("")
        "\"" + k + "\":[" + t1 + "," + t2 + "," + b1 + "," + b2 +
          (if (ex.nonEmpty) "," + ex else "") + "]" }
    }.mkString("{", ",", "}")
    def execJ(keys: Iterable[String]): String = keys.flatMap { k =>
      shortExecMap.get(k).map(v => "\"" + k + "\":[" + v.mkString(",") + "]")
    }.mkString("{", ",", "}")
    val fullJson = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""runs":2,"n_queries":${results.size},"total_mean":$totalMean,""" +
      s"""$gcJit,$memoDiag,"queries":${jmap(short, _._1)},""" +
      s""""queries_mean":${jmap(short, _._2)},""" +
      s""""queries_runs":${runsJ(shortRuns.map(_._1))},""" +
      s""""queries_exec":${execJ(shortRuns.map(_._1))},""" +
      s""""queries_stream":$streamJ,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), fullJson + "\n")
    val bySlowest = short.sortBy(-_._2._1)
    // the printed line carries full run/build/exec attribution for the
    // driver-host watch keys — r10's unattributed lines (the evalRecs
    // consumers r17/r19/r20, r16's run-2 pathology, t36/t37) plus the
    // r9 set — PLUS whatever benched slowest THIS run, so a new
    // outlier attributes itself. Watch row shape:
    // [t_r1,t_r2,builds_r1,builds_r2,stages_r1,tasks_r1,drops_r1,
    //  stages_r2,tasks_r2,drops_r2].
    // s23/s24/d20/g01 joined round 12 (VERDICT r11 #3): the NN-descent
    // memo consumers drifted +31–33% in r11 with no code change — the
    // exec rows must cover them so eviction can be ruled in or out.
    // e37/e38/r13/g18/g22 joined round 14 (VERDICT r13 #2): the r13
    // driver run benched them 2-3x over the repo floor while its own
    // 8-core rerun reproduced the repo's numbers — the exec/build rows
    // must ship with the line so the next such outlier self-attributes
    // (same-work-slower-session vs a real plan change).
    val watch = (Seq("r09", "r06", "r16", "r17", "r19", "r20",
      "t36", "t37", "s23", "s24", "d20", "g01",
      "e37", "e38", "r13", "g18", "g22") ++ bySlowest.take(3).map(_._1))
      .distinct.filter(shortRunsMap.contains)
    def line(n: Int): String = {
      val kept = bySlowest.take(n)
      val others = r3(bySlowest.drop(n).map(_._2._1).sum)
      s"""{"metric":"total","value":$total,"unit":"sec","runs":2,""" +
        s""""n_queries":${results.size},"total_mean":$totalMean,$gcJit,""" +
        s"""$memoDiag,"watch":${watchJ(watch)},"stream":$streamJ,""" +
        s""""queries":${jmap(kept.sortBy(_._1), _._1)},""" +
        s""""others_sec":$others,"full":"BENCH_FULL.json","sf":"$sfDir"}"""
    }
    // 1800-byte budget: the driver's tail is 2000 bytes and sbt appends
    // a [success] line after us; shrink N until the line fits.
    val out = (60 to 10 by -10).view.map(line).find(_.length <= 1800)
      .getOrElse(line(5))
    println(out)
    spark.sparkContext.removeSparkListener(lst)
    spark.stop()
  }
}
