package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator demonstration: a Spark query over the testdata
  * tables plus (when SQL-expressible) a DuckDB oracle computing the exact
  * same result. Column names must match between the two — the driver sorts
  * columns by name before hashing values.
  *
  * Oracle-portability rules used throughout (see core.Determinism):
  *   - sums over floating point are always pre-rounded to scaled BIGINTs so
  *     summation order can never change the result;
  *   - DuckDB aggregate sums are wrapped in CAST(... AS BIGINT) (DuckDB
  *     widens to HUGEINT, Spark stays at long);
  *   - every "random" choice is the portable md5-based hash.
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

trait QueryModule {
  def queries: Seq[QueryDef]
}
