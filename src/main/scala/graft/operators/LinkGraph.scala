package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph quality priors for web-crawl curation. Common Crawl ranks
  * hosts by HARMONIC CENTRALITY (Boldi & Vigna 2014, "Axioms for
  * centrality" — the only classic centrality satisfying all three
  * axioms) and crawl pipelines use that ranking as a per-domain quality
  * prior before any content gate. The exact global measure needs
  * all-pairs distances; the standard scalable form is the BOUNDED-HOP
  * truncation
  *
  *   H_k(v) = Σ_{u ≠ v, d(u,v) ≤ k} 1 / d(u,v)
  *
  * (distances measured ALONG edge direction into v — an inbound prior,
  * like in-link PageRank), which captures the mass of the near
  * neighborhood that dominates the harmonic sum.
  *
  * Distributed shape (the q93 dedup-resolution doctrine): distance-k
  * pairs come from k-1 sparse self-joins over the DEDUPED edge list —
  * frontier_k = frontier_{k-1} ⋈ edges, minus already-reached pairs
  * (left_anti), minus self — with a `localCheckpoint` per hop so
  * lineage never doubles. Frames hold (src, dst) PAIRS within hop k
  * only; no paths materialize. At 100 TB-crawl scale (~10^8 hosts,
  * ~10^10 edges) every step is an equi-join keyed by node id and the
  * pair frames are bounded by the k-hop neighborhood mass — the same
  * shape the webgraph literature runs; contributions are exact e6
  * integers (floor(1e6/k)) so shard sums are associative.
  */
object LinkGraph {

  /** Bounded-hop harmonic centrality. `nodes` is one string column
    * `node` (the full vertex set — isolated vertices report zeros);
    * `edges` carries string columns `src`, `dst` (duplicates and
    * self-loops tolerated: deduped/dropped here). Returns one row per
    * node: `n1..n<maxHops>` (vertices at exactly that inbound
    * distance) and `h_e6` = Σ floor(1e6 / dist). */
  def boundedHarmonic(nodes: DataFrame, edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e1 = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = false)
    var reach = e1.withColumn("dist", lit(1L)).localCheckpoint(eager = false)
    var frontier = e1
    for (k <- 2 to maxHops) {
      val next = frontier.as("f")
        .join(e1.as("e"), col("f.dst") === col("e.src"))
        .select(col("f.src").as("src"), col("e.dst").as("dst"))
        .where(col("src") =!= col("dst")).distinct()
        .join(reach.select(col("src"), col("dst")), Seq("src", "dst"), "left_anti")
        .localCheckpoint(eager = false)
      reach = reach.unionByName(next.withColumn("dist", lit(k.toLong)))
        .localCheckpoint(eager = false)
      frontier = next
    }
    val hopCols: Seq[Column] = (1 to maxHops).map(k =>
      sum(when(col("dist") === k, 1L).otherwise(0L)).as(s"n$k"))
    val hCol = sum(floor(lit(1000000.0) / col("dist")).cast("long")).as("h_e6")
    val agg = reach.groupBy(col("dst").as("node")).agg(hopCols.head, (hopCols.tail :+ hCol): _*)
    val zeros = (1 to maxHops).map(k => coalesce(col(s"n$k"), lit(0L)).as(s"n$k")) :+
      coalesce(col("h_e6"), lit(0L)).as("h_e6")
    nodes.select(col("node")).distinct()
      .join(agg, Seq("node"), "left_outer")
      .select(col("node") +: zeros: _*)
  }

  /** DuckDB twin of [[boundedHarmonic]] (maxHops fixed at 3 — the q134
    * oracle's bound): emits CTE text computing reach from `(eSrc)` — a
    * relation with src/dst columns — and the final select against
    * `(nodesSrc)` — a relation with a `node` column. Mirrors the exact
    * hop algebra: per-hop EXCEPT of already-reached pairs, floor-e6
    * contributions. */
  def duckBoundedHarmonic3(eSrc: String, nodesSrc: String): String =
    s"""e1 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM $eSrc WHERE src <> dst
      ), r2 AS MATERIALIZED (
        SELECT a.src, b.dst FROM e1 a JOIN e1 b ON a.dst = b.src WHERE a.src <> b.dst
        EXCEPT SELECT src, dst FROM e1
      ), r3 AS MATERIALIZED (
        SELECT a.src, b.dst FROM r2 a JOIN e1 b ON a.dst = b.src WHERE a.src <> b.dst
        EXCEPT (SELECT src, dst FROM e1 UNION SELECT src, dst FROM r2)
      ), reach AS (
        SELECT src, dst, 1 AS dist FROM e1
        UNION ALL SELECT src, dst, 2 FROM r2
        UNION ALL SELECT src, dst, 3 FROM r3
      ), cagg AS (
        SELECT dst AS node,
          sum(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS n1,
          sum(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS n2,
          sum(CASE WHEN dist = 3 THEN 1 ELSE 0 END) AS n3,
          sum(CAST(floor(1000000.0 / dist) AS BIGINT)) AS h_e6
        FROM reach GROUP BY dst
      ), hfinal AS (
        SELECT n.node, CAST(coalesce(c.n1, 0) AS BIGINT) AS n1,
          CAST(coalesce(c.n2, 0) AS BIGINT) AS n2,
          CAST(coalesce(c.n3, 0) AS BIGINT) AS n3,
          CAST(coalesce(c.h_e6, 0) AS BIGINT) AS h_e6
        FROM (SELECT DISTINCT node FROM $nodesSrc) n
        LEFT JOIN cagg c ON c.node = n.node
      )"""
}
