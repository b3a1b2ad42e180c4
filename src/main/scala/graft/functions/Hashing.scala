package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing built ONLY from built-in
  * (codegen-friendly) Spark SQL functions, chosen so the *identical*
  * arithmetic is expressible in ANSI/DuckDB SQL for the oracle:
  *
  *   hash56(s)  = CAST(conv(substr(md5(s),1,14),16,10) AS BIGINT)   -- 56-bit
  *   hash48(s)  = ... first 12 hex chars ...                        -- 48-bit
  *   perm_i(h)  = (a_i * (h % P) + b_i) % P        -- universal hashing
  *
  * P = 2^31-1 (prime). a_i,b_i are fixed constants from a seeded PRNG so
  * the Scala query side and the generated oracle SQL share literals.
  *
  * MinHash/SimHash are composed from these with higher-order functions
  * (`transform`/`aggregate`/`array_min`) — no UDFs, fully native
  * expressions, shuffle-free per-row computation that scales linearly.
  */
object Hashing {
  val P: Long = 2147483647L // 2^31 - 1, prime

  /** Fixed MinHash permutation constants (seeded, shared with oracle SQL). */
  def perms(k: Int): IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    IndexedSeq.fill(k)((1L + rnd.nextInt((P - 1).toInt).toLong, rnd.nextInt(P.toInt).toLong))
  }

  /** 56-bit stable string hash (md5 prefix). Same value as DuckDB's
    * CAST(concat('0x', substr(md5(s),1,14)) AS BIGINT) — computed by
    * the native [[Md5Prefix56]] expression (digest bytes → long, no
    * hex-string round trip). */
  def hash56(c: Column): Column = Md5Prefix56.md5Prefix56(c)

  /** 48-bit variant for SimHash bit votes (keeps 1<<b in positive range). */
  def hash48(c: Column): Column = Md5Prefix56.md5Prefix48(c)

  /** One universal-hash permutation applied to a (column of) hash values. */
  def perm(h: Column, a: Long, b: Long): Column =
    (lit(a) * (h % lit(P)) + lit(b)) % lit(P)

  /** MinHash signature (array<long> of length k) over an array of token
    * hashes. Per-row, no shuffle; fused native kernel — all k minima in
    * one pass over the array ([[MinHashSig]]); identical values to the
    * composed array_min(transform(...)) form (MinHashSigSpec). */
  def minhash(tokenHashes: Column, k: Int): Column =
    MinHashSig.minhashSig(tokenHashes, k)

  /** The composed higher-order-function form of [[minhash]] — kept as
    * the equivalence reference for MinHashSigSpec. */
  def minhashComposed(tokenHashes: Column, k: Int): Column = {
    val sig = perms(k).map { case (a, b) =>
      array_min(transform(tokenHashes, h => perm(h, a, b)))
    }
    array(sig: _*)
  }

  /** 48-bit SimHash over an array of token hashes: bit b of the result is
    * 1 iff sum over tokens of (+1 if bit b of hash48 set else -1) > 0.
    * Fused native kernel ([[SimHashSig]]): one pass with 48 int
    * counters; identical values to [[simhashComposed]] (pinned in
    * MinHashSigSpec). The oracle keeps the `h % 2p >= p` formulation. */
  def simhash48(tokenHashes: Column): Column =
    SimHashSig.simhashSig(tokenHashes)

  /** The composed higher-order-function form of [[simhash48]] — kept
    * as the equivalence reference for MinHashSigSpec. */
  def simhashComposed(tokenHashes: Column): Column = {
    val powers = array((0 until 48).map(b => lit(1L << b)): _*)
    val votes = aggregate(
      tokenHashes,
      array_repeat(lit(0L), 48),
      (acc, h) =>
        zip_with(acc, powers, (a, p) =>
          a + when(h % (p + p) >= p, lit(1L)).otherwise(lit(-1L))))
    aggregate(
      zip_with(votes, powers, (c, p) => when(c > 0, p).otherwise(lit(0L))),
      lit(0L),
      (a, v) => a + v)
  }

  // ---- Oracle-side SQL fragments (same math, DuckDB dialect) ----

  def sqlHash56(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 14)) AS BIGINT)"

  def sqlHash48(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 12)) AS BIGINT)"

  def sqlPerm(hExpr: String, a: Long, b: Long): String =
    s"($a * ($hExpr % $P) + $b) % $P"
}
