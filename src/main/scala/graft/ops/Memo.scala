package graft.ops

import scala.collection.concurrent.TrieMap

/** Registry over every per-(session, dataset) training-artifact memo
  * (ALS models, centroid arrays, checkpointed rating splits, ...).
  *
  * The memos exist so the @K eval family reuses one model fit instead
  * of five; but across a 330-query bench run the retained
  * DataFrames/localCheckpoints accumulate in the block manager, and on
  * a memory-pressured host that pressure cascades into
  * TorrentBroadcast store failures on UNRELATED queries (the round-7
  * driver bench printed a 50× phantom regression on q40 this way).
  * [[clearAll]] lets the bench drop every artifact at query-family
  * boundaries — families share artifacts internally, almost never
  * across the first-letter prefix — so each family starts with a
  * clean block manager and pays at most one rebuild.
  */
object Memo {
  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[MemoMap[_]]()

  /** Build ledger: every memo MISS (artifact actually built) appends
    * its key here. The bench drains it per timed run — min-of-2 only
    * measures the warm path if run 2's builds are ZERO, and the
    * round-8 driver host showed mean≈min on exactly the
    * memoized-artifact consumers (r16/r21/r22/r13), so the bench line
    * itself must distinguish "slow fit" from "memo miss". */
  private val buildLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  private[ops] def noteBuild(key: String): Unit = { buildLog.add(key): Unit }

  /** Drain and return the artifact keys built since the last drain. */
  def drainBuilds(): Seq[String] = {
    val b = Seq.newBuilder[String]
    var k = buildLog.poll()
    while (k != null) { b += k; k = buildLog.poll() }
    b.result()
  }

  private[ops] def register[V](m: TrieMap[String, V]): MemoMap[V] = {
    val w = new MemoMap[V](m)
    registry.add(w)
    w
  }

  /** Drop every memoized artifact reference. Callers should follow
    * with `spark.catalog.clearCache()` (for .cache()d frames) and let
    * the ContextCleaner collect the now-unreferenced checkpoint RDDs. */
  def clearAll(): Unit = registry.forEach(_.clear())
}

/** A TrieMap-backed memo that records every build (miss) in Memo's
  * ledger. Only the surface the ops modules actually use. */
final class MemoMap[V] private[ops] (m: TrieMap[String, V]) {
  def getOrElseUpdate(k: String, v: => V): V =
    m.getOrElseUpdate(k, { Memo.noteBuild(k); v })
  def keys: Iterable[String] = m.keys
  def remove(k: String): Option[V] = m.remove(k)
  private[ops] def clear(): Unit = m.clear()
}
