package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational coverage: scan/filter/projection pushdown, broadcast and
  * shuffle joins, aggregation, analytic windows, semi/anti joins, set ops,
  * sorts and top-k. These exercise the Catalyst paths every higher-level
  * operator (sampling, dedup, BM25) composes from.
  *
  * Scale notes (100 TB posture):
  *   - dimension joins (customer/supplier/nation/region) are explicitly
  *     `broadcast()` — at SF100k these dims are still ≤ a few GB while the
  *     fact tables shuffle-partition;
  *   - aggregates are pre-rounded to scaled BIGINTs per row, so map-side
  *     partial aggregation is exact and summation order is irrelevant;
  *   - top-k uses rank-filter over a window (per-group) or global
  *     sort+limit, both of which Spark executes with partial top-k.
  */
object RelationalQueries extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  // revenue cents-e4 per row: exact integer, order-independent to sum
  private def discE4 = round((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000).cast("long")
  private val duckDiscE4 = "CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)"

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q01_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
            sum(round(col("l_extendedprice") * 100).cast("long")).as("base_e2"),
            sum(discE4).as("disc_e4"),
            sum(round(((col("l_extendedprice") * (lit(1) - col("l_discount"))) * (lit(1) + col("l_tax"))) * 1000000).cast("long")).as("charge_e6"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS base_e2,
        CAST(sum(CAST(round((l_extendedprice * (1 - l_discount)) * 10000) AS BIGINT)) AS BIGINT) AS disc_e4,
        CAST(sum(CAST(round(((l_extendedprice * (1 - l_discount)) * (1 + l_tax)) * 1000000) AS BIGINT)) AS BIGINT) AS charge_e6,
        CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    QueryDef("q02_top_revenue_orders",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"))
          .agg(sum(discE4).as("revenue_e4"))
          .orderBy(col("revenue_e4").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, CAST(sum($duckDiscE4) AS BIGINT) AS revenue_e4
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""")),

    QueryDef("q03_nation_revenue",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val sup = t(s, dir, "supplier")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(discE4).as("revenue_e4"), count(lit(1)).as("n_items"))
      },
      Some(s"""SELECT r_name, n_name, CAST(sum($duckDiscE4) AS BIGINT) AS revenue_e4,
        CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    QueryDef("q04_window_topk_per_supplier",
      (s, dir) => {
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        t(s, dir, "lineitem")
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber").cast("long"),
            round(col("l_extendedprice") * 100).cast("long").as("price_e2"))
      },
      Some("""SELECT l_suppkey, CAST(rn AS BIGINT) AS rn, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, CAST(round(l_extendedprice * 100) AS BIGINT) AS price_e2
        FROM (SELECT *, row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
              FROM lineitem) WHERE rn <= 3""")),

    QueryDef("q05_window_running_sum",
      (s, dir) => {
        val order = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        t(s, dir, "lineitem")
          .withColumn("qty", round(col("l_quantity")).cast("long"))
          .withColumn("rn", row_number().over(order).cast("long"))
          .withColumn("running_qty", sum(col("qty")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .filter(col("rn") <= 5)
          .select(col("l_suppkey"), col("rn"), col("running_qty"))
      },
      Some("""SELECT l_suppkey, CAST(rn AS BIGINT) AS rn, CAST(running_qty AS BIGINT) AS running_qty FROM (
          SELECT l_suppkey,
            row_number() OVER w AS rn,
            sum(CAST(round(l_quantity) AS BIGINT)) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
          FROM lineitem
          WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        ) WHERE rn <= 5""")),

    QueryDef("q06_semi_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey"))
        val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("kind", lit("with_orders"))
        val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .withColumn("kind", lit("without_orders"))
        withOrders.unionByName(withoutOrders).select(col("c_mktsegment"), col("kind"), col("n"))
      },
      Some("""SELECT c_mktsegment, 'with_orders' AS kind, CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        UNION ALL
        SELECT c_mktsegment, 'without_orders' AS kind, CAST(count(*) AS BIGINT) AS n
        FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment""")),

    QueryDef("q07_union_entities",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).withColumn("entity", lit("customer"))
        val sup = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).withColumn("entity", lit("supplier"))
        val nat = t(s, dir, "nation")
        c.unionByName(sup)
          .join(broadcast(nat), col("nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("entity")).agg(count(lit(1)).as("n"))
      },
      Some("""SELECT n_name, entity, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT c_nationkey AS nationkey, 'customer' AS entity FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey, 'supplier' AS entity FROM supplier
        ) e JOIN nation ON nationkey = n_nationkey GROUP BY n_name, entity""")),

    QueryDef("q08_scan_pushdown_monthly",
      (s, dir) => {
        t(s, dir, "lineitem")
          .filter(col("l_quantity") > 25)
          .select(col("l_shipdate"), col("l_quantity"), col("l_extendedprice"))
          .groupBy(date_format(date_trunc("month", col("l_shipdate")), "yyyy-MM-dd").as("ship_month"))
          .agg(count(lit(1)).as("n"), sum(round(col("l_extendedprice") * 100).cast("long")).as("price_e2"))
      },
      Some("""SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS ship_month,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_e2
        FROM lineitem WHERE l_quantity > 25 GROUP BY 1""")),

    QueryDef("q16_salted_skew_join",
      // skew salting made concrete: `source` is a hot key (few sources,
      // thousands of docs each — at 100 TB a single source's rows would
      // land on one task and straggle). The fact side gets a salt from the
      // engine-internal fast hash, the dim side is exploded across all S
      // salts, and the join key becomes (source, salt) — the hot key
      // spreads over S tasks. Salting never changes results (each fact row
      // matches exactly one salted dim row), so the oracle is the plain
      // unsalted join. The merge hint forces the shuffle join this
      // technique exists for (a broadcast would dodge the demo at this
      // scale). PipelineSpec asserts the join keys carry the salt.
      (s, dir) => {
        val S = 8
        val docs = Tables.load(s, dir, "documents")
        val dim = docs.groupBy(col("source")).agg(count(lit(1)).as("src_docs"))
        val salted = docs.withColumn("salt",
          pmod(graft.core.Determinism.fastHash(7L, col("doc_id")), lit(S.toLong)).cast("int"))
        val dimSalted = dim
          .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
          .withColumn("salt", col("salt").cast("int"))
        salted.join(dimSalted.hint("merge"), Seq("source", "salt"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), max(col("src_docs")).as("src_docs"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(count(*) AS BIGINT) AS src_docs
        FROM documents GROUP BY source""")),

    QueryDef("q09_bucketed_join",
      // co-located join via bucketing — the 100 TB posture made concrete:
      // both tables written bucketBy(8, doc_id), so the sort-merge join
      // runs with NO shuffle exchange on either side (PipelineSpec asserts
      // it on the physical plan); the only exchange in the whole plan is
      // the final group-by. At scale this is the difference between
      // re-shuffling 100 TB per join and shuffling nothing. (Spark 3+
      // still inserts a per-bucket streaming Sort — scan-time sortBy
      // ordering is legacy-flagged off — but that is per-bucket CPU work,
      // not data movement.)
      (s, dir) => {
        val tag = dir.replaceAll("[^0-9a-zA-Z]", "_")
        // the in-memory catalog forgets tables across sessions while their
        // warehouse directories persist — clear both before the CTAS
        def reset(name: String): Unit = {
          s.sql(s"DROP TABLE IF EXISTS $name")
          // derive the cleanup root from the session's warehouse setting so
          // any caller (Bench/Verify/PlanDump/tests) cleans what it wrote.
          // Only a LOCAL warehouse can be cleaned this way: stripping the
          // scheme off hdfs://… or s3a://… would fabricate a bogus local
          // path and silently skip the stale-directory cleanup this guards
          // against — for remote schemes the DROP TABLE above is all the
          // local filesystem API can do.
          val wh = s.conf.get("spark.sql.warehouse.dir")
          val localRoot = scala.util.Try(new java.net.URI(wh)).toOption match {
            case Some(u) if u.getScheme == null => Some(wh)
            case Some(u) if u.getScheme == "file" => Some(u.getPath)
            case None => Some(wh) // unparseable as URI => plain local path
            case _ => None
          }
          localRoot.foreach { whPath =>
            val root = java.nio.file.Paths.get(whPath, name)
            if (java.nio.file.Files.exists(root)) {
              import scala.jdk.CollectionConverters._
              java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
                .foreach(java.nio.file.Files.deleteIfExists(_))
            }
          }
        }
        reset(s"docs_b$tag"); reset(s"emb_b$tag")
        // repartition on the bucket key with the bucket count: writer-task
        // hash == bucket hash, so each bucket lands in exactly ONE file —
        // the condition under which the scan's sortBy ordering survives and
        // the join needs neither an exchange NOR a sort
        Tables.load(s, dir, "documents")
          .repartition(8, col("doc_id"))
          .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
          .saveAsTable(s"docs_b$tag")
        Tables.load(s, dir, "embeddings").withColumnRenamed("vec_id", "doc_id")
          .repartition(8, col("doc_id"))
          .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
          .saveAsTable(s"emb_b$tag")
        s.table(s"docs_b$tag")
          .join(s.table(s"emb_b$tag").hint("merge"), "doc_id")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(size(col("embedding")).cast("long")).as("dim_sum"),
            sum(col("label").cast("long")).as("label_sum"))
      },
      Some("""SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(len(embedding)) AS BIGINT) AS dim_sum,
        CAST(sum(label) AS BIGINT) AS label_sum
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        GROUP BY source"""))
  )
}
