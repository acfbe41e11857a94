package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's portable 60-bit text hash
  * `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)` computed
  * without materializing the hex string — the first 15 hex characters
  * of an MD5 digest ARE its top 60 bits, so the value is the digest's
  * first 8 bytes assembled big-endian unsigned with the low nibble
  * dropped. Bit-identical to the composed form (and to the DuckDB
  * oracle's `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`) on
  * every input, NULL on NULL.
  *
  * Why it exists (r17 optimization round, guide §1.2 "per-task work"):
  * the composed form allocates a 32-char hex string per row, copies a
  * 15-char substring, and re-parses it via NumberConverter — pure
  * overhead on the window/bigram hashing paths, where phash runs once
  * per 8-word window (hundreds of millions of evaluations per corpus
  * scan at scale). The digest is computed on a per-thread reused
  * MessageDigest; the expression stays inside whole-stage codegen via
  * a static call, like [[NfcNormalize]].
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Static helper the generated code calls. UTF8String.getBytes is the
    * same UTF-8 byte stream the composed form's string→binary cast fed
    * to md5().
    */
  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // hex chars 1..15 of the digest = its top 60 bits: first 8 bytes
    // big-endian unsigned, low nibble dropped. 60 bits < 63, so the
    // unsigned shift keeps the value non-negative, exactly like conv().
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
