package graft.operators

import graft.core.{Determinism, RecordChunk}
import graft.functions.KvpPrefixSampler
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chunk decoration: prepend a sampled metadata prefix and enforce the
  * token budget, prefix winning over body
  * (reference: src/sampler/mod.rs:1470-1508, 1582-1620).
  */
object Decoration {

  /** Decorate one chunk for a given draw; pure. */
  def decorate(chunk: RecordChunk, sampler: Option[KvpPrefixSampler],
      draw: Long, maxWindowTokens: Int): RecordChunk = {
    sampler.flatMap(_.sample(s"${chunk.record_id}:$draw")) match {
      case None => chunk
      case Some(prefix) =>
        val prefixTokens = prefix.split("\\s+").count(_.nonEmpty)
        val bodyBudget = math.max(maxWindowTokens - prefixTokens, 0)
        val bodyToks = chunk.text.split("\\s+").filter(_.nonEmpty)
        val body = bodyToks.take(bodyBudget)
        val text = if (body.isEmpty) prefix else prefix + "\n" + body.mkString(" ")
        chunk.copy(text = text, tokens_estimate = prefixTokens + body.length)
    }
  }

  /** Column twin of [[decorate]] + [[KvpPrefixSampler.sample]]: the whole
    * dropout → variant → value → shuffle roll sequence as codegen'd column
    * expressions, so decoration runs distributed (and oracle-checkable)
    * instead of per-row on the driver. Returns a struct
    * `(decorated boolean, text string, est long)`.
    *
    * The roll stream is the same counter construction as [[graft.functions.Kvp.DetRng]]:
    * roll i = portable hash of `"<key>#<i>"`, so the column twin and the
    * driver-pure path produce byte-identical prefixes (pinned in SourcesSpec).
    *
    * Restrictions (the driver-pure path has none): every field present
    * (presence == 1), at most two fields per variant — the Fisher–Yates
    * shuffle beyond two elements would need a CASE per permutation.
    */
  def decorateColumn(sampler: KvpPrefixSampler, key: Column, bodyToks: Column,
      maxWindowTokens: Int): Column = {
    val s = sampler.normalized
    require(s.variants.nonEmpty && s.dropout > 0f, "inactive sampler has no column form")
    require(s.variants.forall(v => v.size <= 2 && v.forall(_.presence >= 1f)),
      "column twin: presence-1 fields, <=2 per variant")
    def roll(i: Int): Column = Determinism.portableHash(concat(key, lit(s"#$i")))
    val hasDropRoll = s.dropout < 1f
    val b = (if (hasDropRoll) 1 else 0) + 1 // counter after dropout+variant rolls
    val variant = pmod(roll(if (hasDropRoll) 1 else 0), lit(s.variants.size.toLong))
    val prefixByVariant = s.variants.map { fields =>
      val bodies = fields.zipWithIndex.map { case (f, j) =>
        concat(lit(f.key + "="), element_at(
          array(f.values.map(lit): _*),
          (pmod(roll(b + j), lit(f.values.size.toLong)) + 1).cast("int")))
      }
      val joined =
        if (bodies.size == 1) bodies.head
        else when(pmod(roll(b + bodies.size), lit(2L)) === 0,
            concat(bodies(1), lit(" | "), bodies(0)))
          .otherwise(concat(bodies(0), lit(" | "), bodies(1)))
      concat(lit("meta: "), joined)
    }
    val prefix = prefixByVariant.zipWithIndex.tail
      .foldLeft(when(variant === 0L, prefixByVariant.head)) {
        case (acc, (p, v)) => acc.when(variant === v.toLong, p)
      }
    val decorated =
      if (hasDropRoll) roll(0).cast("double") / lit(Determinism.HashSpace.toDouble) < lit(s.dropout.toDouble)
      else lit(true)
    // prefix renders with single spaces, so a space split counts its tokens
    val ptok = size(filter(split(prefix, " "), t => t =!= ""))
    val budget = greatest(lit(maxWindowTokens) - ptok, lit(0))
    val taken = least(budget, size(bodyToks))
    val decText = when(taken === 0, prefix)
      .otherwise(concat(prefix, lit("\n"), array_join(slice(bodyToks, lit(1), budget), " ")))
    struct(
      decorated.as("decorated"),
      when(decorated, decText).otherwise(array_join(bodyToks, " ")).as("text"),
      when(decorated, (ptok + taken).cast("long"))
        .otherwise(size(bodyToks).cast("long")).as("est"))
  }

  /** DuckDB mirror of [[decorateColumn]]'s prefix sampling: one expression
    * evaluating to the rendered prefix, or NULL on the dropout roll — the
    * caller's SQL derives text/est from it exactly as the column twin does.
    * Kept as a generator so the oracle SQL stays in lock-step with the
    * column expressions above. */
  def duckDecorateSql(sampler: KvpPrefixSampler, key: String): String = {
    val s = sampler.normalized
    require(s.variants.nonEmpty && s.dropout > 0f && s.dropout < 1f)
    def roll(i: Int): String = Determinism.duckHash(s"$key || '#$i'")
    val b = 2
    val variant = s"(${roll(1)} % ${s.variants.size})"
    val prefixCases = s.variants.zipWithIndex.map { case (fields, v) =>
      def value(j: Int): String = {
        val f = fields(j)
        val arr = f.values.map(x => s"'$x'").mkString("[", ", ", "]")
        s"'${f.key}=' || ($arr)[(${roll(b + j)} % ${f.values.size}) + 1]"
      }
      val joined =
        if (fields.size == 1) value(0)
        else s"""CASE WHEN ${roll(b + fields.size)} % 2 = 0
             THEN ${value(1)} || ' | ' || ${value(0)}
             ELSE ${value(0)} || ' | ' || ${value(1)} END"""
      s"WHEN $variant = $v THEN 'meta: ' || ($joined)"
    }.mkString("\n        ")
    s"""CASE WHEN ${roll(0)} / 4294967296.0 >= ${s.dropout.toDouble} THEN NULL
        $prefixCases END"""
  }

  /** DuckDB mirror of the budget-enforcement step of [[decorateColumn]]:
    * given a prefix column (NULL = undecorated, from [[duckDecorateSql]])
    * and the chunk text, emit the decorated text expression. */
  def duckDecoratedTextSql(prefixCol: String, textExpr: String, maxTok: Int): String = {
    val tk = s"string_split($textExpr, ' ')"
    val ptok = s"len(list_filter(string_split($prefixCol, ' '), t -> t <> ''))"
    s"""CASE WHEN $prefixCol IS NULL THEN $textExpr
       WHEN LEAST(GREATEST($maxTok - $ptok, 0), len($tk)) = 0 THEN $prefixCol
       ELSE $prefixCol || chr(10) || array_to_string(list_slice($tk, 1, GREATEST($maxTok - $ptok, 0)), ' ') END"""
  }
}
