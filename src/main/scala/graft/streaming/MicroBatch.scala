package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Micro-batch ATTRIBUTION ledger for the streaming gate keys (round
  * 13 — VERDICT r12 #1: e16–e21 drifted 2.1–7.6× round-over-round
  * with bit-identical stage/task counts, i.e. session micro-batch
  * SCHEDULING latency, not plan change — and the bench line carried
  * nothing that could attribute it). Every gated streaming run notes
  * (key, batch count, summed trigger-execution ms) here from the
  * query's progress events; Bench drains the ledger per timed run and
  * ships per-key [batches, mean_batch_ms] in BENCH_FULL.json and the
  * printed line's "stream" object — so a drifting e-key decomposes
  * into "more batches" vs "slower batches" without a re-run.
  *
  * recentProgress is a ring buffer (default 100 entries); the gated
  * keys run ≤ a dozen micro-batches, so reading it after termination
  * sees every batch. e18's unbounded source keeps its own listener
  * (EventOps.e18) and notes through [[noteRaw]].
  */
object MicroBatch {
  private val log =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Double)]()

  /** Record a terminated query's batch count + total triggerExecution
    * ms under `key` (the gate key prefix, e.g. "e16"). */
  def note(key: String, q: StreamingQuery): Unit = {
    val ps = q.recentProgress
    val totalMs = ps.iterator.map { p =>
      Option(p.durationMs.get("triggerExecution")).map(_.toDouble).getOrElse(0.0)
    }.sum
    noteRaw(key, ps.length.toLong, totalMs)
  }

  def noteRaw(key: String, batches: Long, totalMs: Double): Unit = {
    log.add((key, batches, totalMs)): Unit
  }

  /** Drain and aggregate per key: (batches, total trigger ms) summed
    * over every run noted since the last drain. */
  def drain(): Map[String, (Long, Double)] = {
    val b = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Double)]
    var e = log.poll()
    while (e != null) {
      val (k, n, ms) = e
      val (pn, pms) = b.getOrElse(k, (0L, 0.0))
      b(k) = (pn + n, pms + ms)
      e = log.poll()
    }
    b.toMap
  }
}
