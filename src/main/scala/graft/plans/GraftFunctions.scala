package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT portable_hash32(col) ...")` works the same as the
  * Column API ([[PortableHash32.apply]]).
  *
  * Two registration paths:
  *   - [[GraftFunctions.register]] — on a live session (notebooks, tests);
  *   - [[GraftExtensions]] — cluster-conf time, via
  *     `spark.sql.extensions=graft.plans.GraftExtensions` (the standard
  *     `SparkSessionExtensions` injection point, applied to every session
  *     the cluster builds).
  */
object GraftFunctions {

  private val builders: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq((
      FunctionIdentifier("portable_hash32"),
      new ExpressionInfo(classOf[PortableHash32].getName, "portable_hash32"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "portable_hash32 takes exactly one argument")
        PortableHash32(children.head)
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
