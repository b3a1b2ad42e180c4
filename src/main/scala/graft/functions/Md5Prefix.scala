package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** First 56 bits of md5(input) as a non-negative long — numerically
  * IDENTICAL to `conv(substr(md5(x),1,14),16,10)` (14 hex chars = the
  * 7 leading digest bytes, big-endian) but without materializing the
  * hex string or parsing it back: digest bytes → long directly.
  * ~3× less allocation on the MinHash/SimHash hot paths where this
  * runs once per shingle.
  *
  * Codegen calls the static helper (the digest dominates; what matters
  * is staying inside the generated loop without interpreter dispatch).
  */
case class Md5Prefix56(child: Expression, nBytes: Int = 7) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"md5_prefix${nBytes * 8}"

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix56.hash(input.asInstanceOf[UTF8String], nBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix56.hash($c, $nBytes)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix56 =
    copy(child = newChild)
}

object Md5Prefix56 {
  private val digests = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Static entry shared by interpreted + generated code. */
  def hash(s: UTF8String, nBytes: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // nBytes leading bytes, big-endian == first 2·nBytes hex chars in base-16
    var acc = 0L
    var i = 0
    while (i < nBytes) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    acc
  }

  def md5Prefix56(c: Column): Column =
    Bridge.column(Md5Prefix56(Bridge.expression(c), 7))

  def md5Prefix48(c: Column): Column =
    Bridge.column(Md5Prefix56(Bridge.expression(c), 6))
}
