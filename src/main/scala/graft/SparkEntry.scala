package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Each [[QueryModule]] contributes oracle-checked operator demonstrations;
  * `queries`/`oracleSql` are assembled from them so a new operator is one
  * `QueryDef` away from being correctness-gated.
  */
object SparkEntry {

  val modules: Seq[QueryModule] = Seq(
    RelationalQueries,
    SamplingQueries,
    DedupQueries,
    SimilarityQueries,
    TextQueries,
    TripletQueries,
    RecipeQueries,
    Bm25Queries,
    TemporalQueries,
    MetricsQueries,
    SourceQueries,
    IndexQueries,
    ComposedIndexQueries)

  lazy val all: Seq[QueryDef] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * a full train-split triplet batch. */
  def entry(spark: SparkSession): DataFrame =
    queries("q80_triplet_batch")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
