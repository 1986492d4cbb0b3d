package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL hygiene for web-crawl curation — the layer every web-scale
  * training pipeline runs before any content gate (C4 dedupes by
  * normalized URL; RefinedWeb/CCNet cap and block by registered
  * domain): normalization, registered-domain extraction against a
  * public-suffix-style rule set, and the column plumbing for blocklist
  * filters and per-domain frequency caps.
  *
  * Everything is pure column algebra (codegen'd string/array
  * expressions — no UDF), and every function has its DuckDB SQL twin
  * generator next to it (the house fragment-sharing rule: a formula
  * fix edits ONE place). At 100 TB the whole layer is scan-fused
  * narrow work; the only wide op a caller adds is the per-domain cap's
  * keyed window.
  *
  * Normalization contract (applied in this order):
  *   1. drop the `#fragment`;
  *   2. lower-case scheme and host;
  *   3. drop a DEFAULT port (`:80` for http, `:443` for https) — any
  *      other explicit port survives;
  *   4. strip trailing `/` runs from the path (the root path collapses
  *      to the bare authority);
  *   5. drop tracking query parameters (`utm_*`, `fbclid`, `gclid`),
  *      sort the survivors bytewise, and re-join — an empty survivor
  *      set drops the `?` entirely.
  *
  * Registered-domain rule: longest public suffix wins — if the last
  * TWO host labels are a listed two-level suffix (`co.uk`-style) the
  * registered domain is the last THREE labels; else if the last label
  * is a listed top-level suffix, the last TWO; else the whole host
  * (opaque/internal hosts pass through). The embedded lists here are a
  * deliberately small configurable subset of the public-suffix list —
  * [[Psl.registeredDomain]] is the FULL-list operator (exact + wildcard
  * + exception rules over the embedded ~9.9k-rule publicsuffix.org
  * list); this two-tier form stays for callers that want a fixed tiny
  * rule set.
  */
object UrlFunctions {

  /** Two-level public suffixes the default rule set recognizes. */
  val TwoLevelSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "org.uk", "com.au", "co.jp", "or.jp", "com.br", "co.in")

  /** Top-level public suffixes the default rule set recognizes. */
  val TopLevelSuffixes: Seq[String] =
    Seq("com", "org", "net", "io", "edu", "gov", "mil", "int", "info", "biz")

  /** Query-parameter names dropped as tracking noise (prefix match for
    * `utm_`, exact match otherwise). */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid")

  /** The host (lower-cased, port stripped) of a raw URL. */
  def hostOf(u: Column): Column = {
    val pre = substring_index(substring_index(u, "#", 1), "?", 1)
    val rest = substring_index(pre, "://", -1)
    lower(substring_index(substring_index(rest, "/", 1), ":", 1))
  }

  /** Normalized URL per the contract above. */
  def normalizeUrl(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
    val q = when(instr(noFrag, "?") > 0, substring_index(noFrag, "?", -1))
      .otherwise(lit(""))
    val pre = substring_index(noFrag, "?", 1)
    val scheme = lower(substring_index(pre, "://", 1))
    val rest = substring_index(pre, "://", -1)
    val hostport = substring_index(rest, "/", 1)
    val rawPath = regexp_replace(rest, "^[^/]*", "")
    val host = lower(substring_index(hostport, ":", 1))
    val port = when(instr(hostport, ":") > 0, substring_index(hostport, ":", -1))
      .otherwise(lit(""))
    val portNorm = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathNorm = regexp_replace(rawPath, "/+$", "")
    val kept = filter(split(q, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !substring_index(p, "=", 1).isInCollection(TrackingParams))
    val qNorm = when(size(kept) > 0,
      concat(lit("?"), array_join(array_sort(kept), "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, portNorm, pathNorm, qNorm)
  }

  /** Registered domain of a (lower-case) host per the longest-suffix
    * rule. Pass custom suffix lists to widen toward the full PSL. */
  def registeredDomain(host: Column,
      twoLevel: Seq[String] = TwoLevelSuffixes,
      topLevel: Seq[String] = TopLevelSuffixes): Column = {
    val last1 = regexp_extract(host, "([^.]+)$", 1)
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last3 =!= "" && last2.isInCollection(twoLevel), last3)
      .when(last2 =!= "" && last1.isInCollection(topLevel), last2)
      .otherwise(host)
  }

  // -------------------------------------------------------------------
  // DuckDB SQL twins — mirror the column expressions above so oracle
  // strings stay in lock-step with the Spark plans.
  // -------------------------------------------------------------------

  /** DuckDB twin of [[hostOf]]. */
  def duckHostOf(u: String): String =
    s"lower(split_part(split_part(string_split(split_part(split_part($u, '#', 1), '?', 1), '://')[-1], '/', 1), ':', 1))"

  /** DuckDB twin of [[normalizeUrl]]. */
  def duckNormalizeUrl(u: String): String = {
    val noFrag = s"split_part($u, '#', 1)"
    val q = s"(CASE WHEN instr($noFrag, '?') > 0 THEN string_split($noFrag, '?')[-1] ELSE '' END)"
    val pre = s"split_part($noFrag, '?', 1)"
    val scheme = s"lower(split_part($pre, '://', 1))"
    val rest = s"string_split($pre, '://')[-1]"
    val hostport = s"split_part($rest, '/', 1)"
    val rawPath = s"regexp_replace($rest, '^[^/]*', '')"
    val host = s"lower(split_part($hostport, ':', 1))"
    val port = s"(CASE WHEN instr($hostport, ':') > 0 THEN string_split($hostport, ':')[-1] ELSE '' END)"
    val portNorm = s"(CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80') " +
      s"OR ($scheme = 'https' AND $port = '443') THEN '' ELSE ':' || $port END)"
    val pathNorm = s"regexp_replace($rawPath, '/+$$', '')"
    val trk = TrackingParams.map(p => s"'$p'").mkString(", ")
    val kept = s"list_sort(list_filter(string_split($q, '&'), " +
      s"p -> p <> '' AND NOT starts_with(p, 'utm_') AND split_part(p, '=', 1) NOT IN ($trk)))"
    val qNorm = s"(CASE WHEN len($kept) > 0 THEN '?' || array_to_string($kept, '&') ELSE '' END)"
    s"($scheme || '://' || $host || $portNorm || $pathNorm || $qNorm)"
  }

  /** DuckDB twin of [[registeredDomain]]. */
  def duckRegisteredDomain(host: String,
      twoLevel: Seq[String] = TwoLevelSuffixes,
      topLevel: Seq[String] = TopLevelSuffixes): String = {
    val l1 = s"regexp_extract($host, '([^.]+)$$', 1)"
    val l2 = s"regexp_extract($host, '([^.]+\\.[^.]+)$$', 1)"
    val l3 = s"regexp_extract($host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)"
    val two = twoLevel.map(s => s"'$s'").mkString(", ")
    val top = topLevel.map(s => s"'$s'").mkString(", ")
    s"(CASE WHEN $l3 <> '' AND $l2 IN ($two) THEN $l3 " +
      s"WHEN $l2 <> '' AND $l1 IN ($top) THEN $l2 ELSE $host END)"
  }
}
