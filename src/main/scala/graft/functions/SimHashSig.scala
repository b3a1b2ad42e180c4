package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Fused 48-bit SimHash: one pass over the token-hash array with 48
  * int counters, versus the composed form's per-token zip_with over a
  * 48-long vote array (48 allocations per token per row). Bit b of
  * the result is set iff the sum over tokens of (+1 if bit b of the
  * hash is set else -1) is positive — identical to
  * [[Hashing.simhashComposed]]'s `h % 2p >= p` arithmetic
  * (equivalence pinned in MinHashSigSpec).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_sig48"

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  private val BITS = 48

  /** Static kernel shared by interpreted + generated code. An empty
    * array yields all-negative votes → 0L, matching the composed form. */
  def sig(arr: ArrayData): Long = {
    val votes = new Array[Int](BITS)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < BITS) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < BITS) {
      if (votes(b) > 0) acc |= 1L << b
      b += 1
    }
    acc
  }

  def simhashSig(hashes: Column): Column =
    Bridge.column(SimHashSig(Bridge.expression(hashes)))
}
