package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 32-bit hash: the
  * first 4 bytes of `md5(utf8(s))` as an unsigned long — semantically
  * identical to `conv(substring(md5(s), 1, 8), 16, 10)` (and to the DuckDB
  * oracle's `CAST('0x'||substr(md5(s),1,8) AS BIGINT)`), but evaluated in
  * one fused step: no 32-char hex string materialization, no substring,
  * no base-conversion parse. With `doGenCode` it stays inside whole-stage
  * codegen, so hash-heavy plans (split assignment, rank-picks, minhash,
  * fingerprints) keep a single generated loop.
  *
  * This is the one operator where a custom Expression genuinely beats
  * composing built-ins (SURVEY.md §4 conclusion): the composed form
  * allocates two strings per row on every hot path.
  */
case class PortableHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"portable_hash32 requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    PortableHash32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PortableHash32.getClass.getName.stripSuffix("$") + "$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.MODULE$$.hash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PortableHash32 =
    copy(child = newChild)

  override def prettyName: String = "portable_hash32"
}

object PortableHash32 {

  /** Thread-local digest: MessageDigest is not thread-safe and obtaining
    * one per row would dominate the hash itself. */
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val out = md.digest(s.getBytes)
    ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
      ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      PortableHash32(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
