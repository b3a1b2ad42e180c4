package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature: all K permutation minima in ONE pass over
  * the token-hash array. Numerically identical to the composed form
  * `array(array_min(transform(hs, h -> (a_i*(h%P)+b_i)%P)), ...)` —
  * same constants from [[Hashing.perms]], same mod arithmetic — but
  * the composed form walks the array K times and allocates K
  * intermediate arrays per row; this walks it once with a K-long
  * accumulator on the stack. On the dedup hot path the input array is
  * one element per shingle, so the saving is K× array traversals per
  * document at 100 TB.
  *
  * Codegen emits a call to the static kernel — the loop body dominates
  * and stays free of interpreter dispatch, matching the house pattern
  * of [[Md5Prefix56]].
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"minhash_sig$k"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.sig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import Hashing.P

  // flat (a0,b0,a1,b1,...) constant tables per K, shared with the
  // composed form and the oracle SQL via Hashing.perms
  private val permCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def permsFor(k: Int): Array[Long] =
    permCache.computeIfAbsent(k, k2 => {
      val ps = Hashing.perms(k2)
      val flat = new Array[Long](k2 * 2)
      var j = 0
      while (j < k2) { flat(2 * j) = ps(j)._1; flat(2 * j + 1) = ps(j)._2; j += 1 }
      flat
    })

  /** Static kernel shared by interpreted + generated code. Returns
    * null for an empty array (the composed array_min form yields null
    * components there; callers filter empties out before this runs). */
  def sig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val ab = permsFor(k)
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i) % P
      var j = 0
      while (j < k) {
        val v = (ab(2 * j) * h + ab(2 * j + 1)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashes), k))
}
