package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** BM25 scoring as a DataFrame job — the reference's one real index
  * operator (reference: src/sampler/backends/bm25_backend.rs), rebuilt the
  * Spark-first way (SURVEY.md §2.9 option (a)): term/document frequencies
  * are plain aggregations, scoring is a broadcast join + sum, top-k is a
  * rank window. No inverted-index data structure to maintain: at 100 TB the
  * "index" is just two shuffled aggregates with map-side combine, and the
  * query side is broadcast.
  *
  * Scoring detail: parameters are chosen binary-exact (k1=1.25, b=0.75) and
  * the reference-style Okapi idf is used in **rational** form
  * `(N - df + ½)/(df + ½)` (no log), with per-term contributions floored at
  * e6 integer scale before the final sum. That makes scores exact integers:
  * invariant under partitioning, summation order, and across engines — the
  * DuckDB oracle reproduces them bit-for-bit. (A log-idf variant would be
  * identical machinery; the rational form is our engine-defined contract so
  * determinism is provable, mirroring how the reference pins golden
  * sequence hashes rather than float tolerances.)
  *
  * Rotation: the reference rotates through the top-3 ranked negatives per
  * anchor with a mutable cursor (bm25_backend.rs:140-153,
  * BM25_HARD_NEGATIVE_ROTATION_TOP_K); here rotation is stateless —
  * `pick(draw) = ranked[draw mod min(3, pool)]`.
  */
object Bm25 {
  /** Exact-binary BM25 parameters (engine-defined; see scaladoc). */
  val K1 = 1.25
  val B = 0.75
  /** Query token cap (reference: BM25_QUERY_TOKEN_LIMIT, constants.rs:145-154). */
  val QueryTokenLimit = 64

  /** The (doc, term) frequency table — the whole "inverted index" in
    * relational form (see scaladoc): one tokenization pass, one map-side-
    * combined aggregate. [[Bm25Index]] persists exactly this frame. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))

  /** Per-doc token counts off the tf table (dl covers ALL of a doc's
    * terms, so it must be derived — or persisted — corpus-wide, never
    * from a query-restricted frame). */
  def docLengths(tf: DataFrame): DataFrame =
    tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

  /** Per-(qid, doc) integer BM25 scores for literal queries. */
  def scores(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Int, String)]): DataFrame = {
    // no cache: both consumers (dl and the query-restricted tf) sit on the
    // same (doc_id, term) aggregate, so its shuffle is shared via
    // ReusedExchange — nothing persists past the query, no unpersist leak
    val tf = termFrequencies(docs, idCol, textCol)
    scoreFrom(spark, tf, docLengths(tf), queries)
  }

  /** Scoring core over a prebuilt `(doc_id, term, tf)` table plus its
    * `(doc_id, dl)` lengths — shared by the from-text path ([[scores]])
    * and the persisted-index path ([[Bm25Index.scores]]) so both produce
    * bit-identical integers. With `dl` supplied from a persisted table,
    * the only touch of the full postings is the query-vocabulary
    * semi-join below — no corpus-wide aggregate remains on the score
    * path. */
  def scoreFrom(spark: SparkSession, tf: DataFrame, dl: DataFrame,
      queries: Seq[(Int, String)]): DataFrame = {
    import spark.implicits._
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val qterms = queries.flatMap { case (qid, q) =>
      q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.take(QueryTokenLimit).map(t => (qid, t))
    }.toDF("qid", "term")
    // only query-side terms ever need df: restrict tf to the query
    // vocabulary FIRST so the df broadcast is bounded by |queries| × 64
    // terms, never by corpus vocabulary (full-vocab broadcast would OOM
    // the driver at scale)
    val qvocab = qterms.select(col("term")).distinct()
    val tfq = tf.join(broadcast(qvocab), "term")
    val dfq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = broadcast(qterms)
      .join(tfq, "term")
      .join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("tfpart",
        (col("tf") * lit(K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .withColumn("term_e6", floor(lit(1000000.0) * col("idf") * col("tfpart")).cast("long"))
    scored.groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("term_e6")).as("score_e6"))
  }

  /** Top-k by (score desc, doc_id) with a rank column. */
  def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("score_e6").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  // ----------------------------------------------------------------- //

  def duckScoresCtes(queries: Seq[(Int, String)]): String = {
    val qvals = queries.flatMap { case (qid, q) =>
      q.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.take(QueryTokenLimit).map(t => s"($qid, '$t')")
    }.mkString(", ")
    s"""WITH toks AS (
        SELECT doc_id, ${TextFunctions.duckTokens("lower(text)")} AS tk FROM documents
      ), terms AS (
        SELECT doc_id, unnest(tk) AS term FROM toks
      ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM terms GROUP BY doc_id, term
      ), df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
      ), dl AS (
        -- empty docs carry no terms and are outside the corpus stats
        -- (mirrors the Spark side deriving dl from tf)
        SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl FROM toks WHERE len(tk) > 0
      ), stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
      ), qterms(qid, term) AS (VALUES $qvals),
      scored AS (
        SELECT q.qid, tf.doc_id,
          CAST(floor(1000000.0 *
            ((s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
            ((tf.tf * ${K1 + 1}) / (tf.tf + $K1 * (${1 - B} + $B * dl.dl / (CAST(s.sum_dl AS DOUBLE) / s.n_docs))))
          ) AS BIGINT) AS term_e6
        FROM qterms q JOIN tf ON q.term = tf.term
        JOIN df ON q.term = df.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats s
      ), agg AS (
        SELECT qid, doc_id, CAST(sum(term_e6) AS BIGINT) AS score_e6
        FROM scored GROUP BY qid, doc_id
      )"""
  }
}
