package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{lit, regexp_extract_all}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NFC unicode normalization as a codegen'd unary expression.
  *
  * Real crawls mix composed and decomposed forms of the same glyph
  * ("é" as U+00E9 vs e+U+0301); hashing/shingling without normalizing
  * first treats them as different tokens and silently misses
  * duplicates. NFC is the canonical-composition form — the right
  * pre-hash normalization — and DuckDB's nfc_normalize() gives the
  * oracle the identical transform.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry shared by interpreted + generated code. ASCII fast
    * path: NFC is the identity on ASCII, skip the String round-trip
    * (the common case for English-heavy corpora). */
  def normalize(s: UTF8String): UTF8String = {
    if (s.isFullAscii) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }
}

/** The engine-wide text tokenizer: NFC-normalize, then extract
  * letter/digit runs (`[\p{L}\p{N}]+` — identical semantics in Java
  * regex and DuckDB's RE2). Unlike split-on-space this survives
  * punctuation-rich and CJK-adjacent text instead of collapsing a
  * whole clause into one "token"; on already-clean space-separated
  * ASCII it produces the identical token stream. */
object TextNorm {
  def nfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))

  /** The one tokenizer pattern. Oracle SQL strings inline it as a
    * literal (triple-quoted and s-interpolated blocks escape
    * differently); MinHashSigSpec pins every inline copy equal to
    * this constant, so a pattern change that misses a copy fails the
    * suite instead of silently desynchronizing the engines. */
  val TOKEN_RE = "[\\p{L}\\p{N}]+"

  def tokens(c: Column): Column =
    regexp_extract_all(nfc(c), lit(TOKEN_RE), lit(0))

  /** The oracle-side twin of [[tokens]] over a SQL text expression. */
  def sqlTokens(t: String): String =
    s"regexp_extract_all(nfc_normalize($t), '$TOKEN_RE')"
}
