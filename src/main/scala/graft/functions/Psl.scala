package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The REAL public-suffix list (publicsuffix.org, MPL-2.0 — embedded as
  * `src/main/resources/public_suffix_list.dat`, the Debian-packaged
  * copy) behind [[UrlFunctions]]'s registered-domain seam: full PSL
  * semantics — exact rules, `*.` wildcard rules, `!` exception rules,
  * longest match wins, exceptions prevail, implicit `*` fallback — so
  * `example.github.io`-class private-section domains and
  * `*.kawasaki.jp`-class wildcard/exception pairs resolve correctly
  * (reference: the curation layer the crawl pipelines cap/block on;
  * RefinedWeb §3.1, CCNet).
  *
  * Spark side is pure column algebra: rule sets are bucketed by label
  * depth and membership is `isInCollection` (Catalyst folds each to an
  * `InSet` hash probe inside whole-stage codegen — per-row cost is a
  * handful of set lookups, nothing corpus-scaled; the rule literals ship
  * once per executor inside the plan, ~9.9k strings ≈ 200 KB, the same
  * order as any broadcast dictionary). The DuckDB twin replays the SAME
  * parsed rules through a join against a VALUES table — one parser feeds
  * both engines, so a list update edits ONE file.
  */
object Psl {

  /** Rule sets bucketed by label depth. `wildBase` stores the part after
    * `*.` keyed by BASE depth (match depth = base + 1); `excep` stores
    * the rule minus `!` keyed by RULE depth (public-suffix depth =
    * rule depth − 1, per the PSL algorithm). */
  final case class Rules(
      exact: Map[Int, Set[String]],
      wildBase: Map[Int, Set[String]],
      excep: Map[Int, Set[String]],
      maxMatchDepth: Int)

  def parse(lines: Iterator[String]): Rules = {
    val rules = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      // the dat's rule token ends at the first whitespace (PSL format)
      .map(_.takeWhile(!_.isWhitespace)).toList
    def depth(r: String) = r.count(_ == '.') + 1
    val exact = rules.filter(r => !r.startsWith("*.") && !r.startsWith("!"))
      .groupBy(depth).map { case (d, rs) => d -> rs.toSet }
    val wild = rules.filter(_.startsWith("*.")).map(_.drop(2))
      .groupBy(depth).map { case (d, rs) => d -> rs.toSet }
    val exc = rules.filter(_.startsWith("!")).map(_.drop(1))
      .groupBy(depth).map { case (d, rs) => d -> rs.toSet }
    val maxMatch = (exact.keySet ++ wild.keySet.map(_ + 1) ++ exc.keySet)
      .foldLeft(1)(math.max)
    Rules(exact, wild, exc, maxMatch)
  }

  /** The full embedded list, parsed once per JVM. */
  lazy val full: Rules = {
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat resource missing")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Registered domain of a (lower-case) host under full PSL semantics.
    * A host that IS a public suffix (or empty) passes through unchanged —
    * the [[UrlFunctions.registeredDomain]] convention, so blocklists and
    * caps still key on SOMETHING stable. */
  def registeredDomain(host: Column, rules: Rules = full): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    // last k labels re-joined; only consulted under an n >= k guard
    def lastK(k: Column): Column = array_join(slice(labels, -k, k), ".")
    def inSet(c: Column, s: Set[String]): Column =
      if (s.isEmpty) lit(false) else c.isInCollection(s)
    // exception rules prevail over everything (PSL algorithm step 2):
    // public-suffix depth = rule depth − 1
    val excDepth: Column = rules.excep.keys.toSeq.sorted
      .foldLeft(lit(null).cast("int")) { (acc, k) =>
        when(n >= k && inSet(lastK(lit(k)), rules.excep(k)), lit(k - 1)).otherwise(acc)
      }
    // otherwise the longest matching rule wins; no match → implicit "*"
    // (depth 1). Ascending fold so the largest depth lands outermost.
    val matchDepths = (rules.exact.keySet ++ rules.wildBase.keySet.map(_ + 1)).toSeq.sorted
    val matchDepth: Column = matchDepths.foldLeft(lit(1): Column) { (acc, k) =>
      val ex = rules.exact.get(k).map(s => inSet(lastK(lit(k)), s)).getOrElse(lit(false))
      val wc = rules.wildBase.get(k - 1).map(s => inSet(lastK(lit(k - 1)), s))
        .getOrElse(lit(false))
      when(n >= k && (ex || wc), lit(k)).otherwise(acc)
    }
    val psd = coalesce(excDepth, matchDepth)
    when(n > psd, lastK(psd + lit(1))).otherwise(host)
  }

  // -------------------------------------------------------------------
  // DuckDB twin — the SAME parsed rules as a VALUES join (oracle SQL is
  // self-contained: no filesystem reads at oracle time).
  // -------------------------------------------------------------------

  /** VALUES body `('rule','typ',depth), …` — typ x(exact) / w(wildcard
    * base) / e(exception rule). */
  def duckRulesValues(rules: Rules = full): String = {
    def arm(m: Map[Int, Set[String]], typ: String) = m.toSeq.flatMap {
      case (d, rs) => rs.toSeq.sorted.map(r => s"('$r','$typ',$d)")
    }
    (arm(rules.exact, "x") ++ arm(rules.wildBase, "w") ++ arm(rules.excep, "e"))
      .mkString(",\n            ")
  }

  /** CTE chain computing `reg_domain` for relation `src(key, host)`
    * (host already lower-case). Terminal CTE: `pslr(key, reg_domain)` —
    * join it back on `key`. */
  def duckRegDomainCtes(src: String, key: String, host: String,
      rules: Rules = full): String = {
    val ks = (1 to rules.maxMatchDepth).mkString(",")
    s"""pslrules(rule, typ, depth) AS (VALUES ${duckRulesValues(rules)}),
          pslh AS (
            SELECT $key AS k, $host AS h, string_split($host, '.') AS ls,
              len(string_split($host, '.')) AS n
            FROM $src
          ),
          pslc AS (
            SELECT k, n, kk, array_to_string(list_slice(ls, n - kk + 1, n), '.') AS sfx
            FROM pslh, unnest([$ks]) AS t(kk) WHERE n >= kk
          ),
          pslm AS (
            SELECT c.k,
              max(CASE WHEN r.typ = 'x' AND r.depth = c.kk THEN c.kk
                       WHEN r.typ = 'w' AND r.depth = c.kk AND c.n >= c.kk + 1
                       THEN c.kk + 1 END) AS mdep,
              max(CASE WHEN r.typ = 'e' AND r.depth = c.kk THEN c.kk - 1 END) AS edep
            FROM pslc c JOIN pslrules r ON r.rule = c.sfx GROUP BY c.k
          ),
          pslr AS (
            SELECT h.k AS $key,
              CASE WHEN h.n > COALESCE(m.edep, m.mdep, 1)
                THEN array_to_string(
                  list_slice(h.ls, h.n - COALESCE(m.edep, m.mdep, 1), h.n), '.')
                ELSE h.h END AS reg_domain
            FROM pslh h LEFT JOIN pslm m ON m.k = h.k
          )"""
  }
}
