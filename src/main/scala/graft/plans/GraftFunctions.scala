package graft.plans

import graft.core.Determinism
import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/** SQL surface for the engine: the native expressions plus the curation
  * functions, so `spark.sql("SELECT graft_quality_e6(text) ...")` works
  * the same as the Column API — analysts and SQL-only pipelines get the
  * exact operators (same expressions, same codegen, same oracle
  * portability) without touching Scala.
  *
  * Two registration paths:
  *   - [[GraftFunctions.register]] — on a live session (notebooks, tests);
  *   - [[GraftExtensions]] — cluster-conf time, via
  *     `spark.sql.extensions=graft.plans.GraftExtensions` (the standard
  *     `SparkSessionExtensions` injection point, applied to every session
  *     the cluster builds).
  */
object GraftFunctions {

  /** A SQL function whose body is the existing Column composition. The
    * composition is converted to ONE expression template against
    * placeholder attributes at registration time (a per-child
    * Column-bridge at call time would leave lazy ColumnNode wrappers the
    * SQL analyzer cannot resolve); each call substitutes the real child
    * expressions into the immutable template. No UDF anywhere — SQL calls
    * get the same codegen-friendly plans as the Column API. */
  private def columnFn(name: String, arity: Int)(f: Seq[Column] => Column):
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val template = GraftColumnBridge.eagerExpression(
      f((0 until arity).map(i => col(s"__graft_arg$i"))))
    (FunctionIdentifier(name),
      new ExpressionInfo(GraftFunctions.getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.size == arity, s"$name takes exactly $arity argument(s)")
        template.transformUp {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.nameParts.size == 1 && a.nameParts.head.startsWith("__graft_arg") =>
            children(a.nameParts.head.stripPrefix("__graft_arg").toInt)
        }
      })
  }

  private val builders: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("portable_hash32"),
        new ExpressionInfo(classOf[PortableHash32].getName, "portable_hash32"),
        (children: Seq[Expression]) => {
          require(children.size == 1, "portable_hash32 takes exactly one argument")
          PortableHash32(children.head)
        }),
      // seeded portable hash, hash("<seed>:<value>") — Determinism.seeded
      // with the seed as a first-class argument
      columnFn("graft_seeded", 2)(cs => Determinism.portableHash(
        concat(cs(0).cast("string"), lit(":"), cs(1).cast("string")))),
      columnFn("graft_normalize_ws", 1)(cs => TextFunctions.normalizeWs(cs(0))),
      columnFn("graft_tokens", 1)(cs => TextFunctions.tokens(cs(0))),
      columnFn("graft_token_count", 1)(cs => TextFunctions.tokenCount(cs(0))),
      columnFn("graft_quality_e6", 1)(cs => TextAnalysis.qualityE6(cs(0))),
      columnFn("graft_lang_id", 1)(cs =>
        TextAnalysis.langId(TextFunctions.tokens(cs(0)))),
      // exact scaled dot product over two array<float> columns — the
      // similarity kit's native expression, for SQL-only ANN/dedup lanes
      (FunctionIdentifier("graft_dot_e3"),
        new ExpressionInfo(classOf[DotE3].getName, "graft_dot_e3"),
        (children: Seq[Expression]) => {
          require(children.size == 2, "graft_dot_e3 takes exactly two arguments")
          DotE3(children(0), children(1))
        }))

  /** Register on an existing session (temp functions, session-scoped). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }

  private[plans] def inject(ext: SparkSessionExtensions): Unit =
    builders.foreach(ext.injectFunction)
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
