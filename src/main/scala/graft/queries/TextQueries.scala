package graft.queries

import graft.{QueryDef, QueryModule}
import graft.core.{Determinism, Tables}
import graft.functions.TextFunctions
import graft.operators.{Bpe, Curation, Dedup, TextAnalysis, Unigram, WordPiece}
import org.apache.spark.sql.functions._

/** Text-analysis operator demonstrations over `documents`:
  * token/char statistics, quality scoring, language ID, fingerprints.
  * All narrow column pipelines (scan-fused, shuffle only for the final
  * aggregates where present).
  */
object TextQueries extends QueryModule {

  private val duckToks = TextFunctions.duckTokens("text")

  val queries: Seq[QueryDef] = Seq(

    QueryDef("q30_token_stats",
      (s, dir) => {
        val toks = TextFunctions.tokens(col("text"))
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("n_chars"),
          TextFunctions.alphaCount(col("text")).cast("long").as("n_alpha"),
          TextFunctions.digitCount(col("text")).cast("long").as("n_digit"),
          TextFunctions.sentenceMarkCount(col("text")).cast("long").as("n_sent_marks"),
          size(array_distinct(toks)).cast("long").as("n_unique_tokens"))
      },
      Some(s"""SELECT doc_id,
        CAST(${TextFunctions.duckTokenCount("text")} AS BIGINT) AS n_tokens,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(${TextFunctions.duckAlphaCount("text")} AS BIGINT) AS n_alpha,
        CAST(${TextFunctions.duckDigitCount("text")} AS BIGINT) AS n_digit,
        CAST(${TextFunctions.duckSentenceMarkCount("text")} AS BIGINT) AS n_sent_marks,
        CAST(len(list_distinct($duckToks)) AS BIGINT) AS n_unique_tokens
        FROM documents""")),

    QueryDef("q31_quality_score",
      (s, dir) => {
        val toks = TextFunctions.tokens(col("text"))
        val nTok = size(toks).cast("long")
        val nAlpha = TextFunctions.alphaCount(col("text")).cast("long")
        val nDigit = TextFunctions.digitCount(col("text")).cast("long")
        val stops = TextAnalysis.stopwordHits(toks, TextAnalysis.LangProfiles.head._2).cast("long")
        val uniq = size(array_distinct(toks)).cast("long")
        // quality components at e6 scale, all exact integer ratios
        val stopRatio = TextAnalysis.ratioE6(stops, nTok)
        val digitRatio = TextAnalysis.ratioE6(nDigit, nAlpha + nDigit)
        val uniqRatio = TextAnalysis.ratioE6(uniq, nTok)
        // composite: mean of (stopword presence, 1-digitiness, lexical
        // diversity) — the authoritative definition in TextAnalysis,
        // shared with the q94 curation funnel's quality gate
        val score = TextAnalysis.qualityE6(col("text"))
        Tables.load(s, dir, "documents").select(
          col("doc_id"), nTok.as("n_tokens"), stopRatio.as("stop_ratio_e6"),
          digitRatio.as("digit_ratio_e6"), uniqRatio.as("uniq_ratio_e6"),
          score.as("quality_e6"))
      },
      Some {
        val toks = duckToks
        val nTok = s"len($toks)"
        val nAlpha = TextFunctions.duckAlphaCount("text")
        val nDigit = TextFunctions.duckDigitCount("text")
        val stops = TextAnalysis.duckStopwordHits(toks, TextAnalysis.LangProfiles.head._2)
        val uniq = s"len(list_distinct($toks))"
        val stopRatio = TextAnalysis.duckRatioE6(stops, nTok)
        val digitRatio = TextAnalysis.duckRatioE6(nDigit, s"($nAlpha + $nDigit)")
        val uniqRatio = TextAnalysis.duckRatioE6(uniq, nTok)
        s"""SELECT doc_id, CAST($nTok AS BIGINT) AS n_tokens,
          $stopRatio AS stop_ratio_e6, $digitRatio AS digit_ratio_e6,
          $uniqRatio AS uniq_ratio_e6,
          ${TextAnalysis.duckQualityE6("text", toks)} AS quality_e6
          FROM documents"""
      }),

    QueryDef("q32_lang_id",
      (s, dir) => {
        val toks = TextFunctions.tokens(col("text"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang").as("labeled_lang"),
            TextAnalysis.langId(toks).as("pred_lang"))
      },
      Some(s"""SELECT doc_id, lang AS labeled_lang,
        ${TextAnalysis.duckLangId(duckToks)} AS pred_lang FROM documents""")),

    QueryDef("q33_fingerprints",
      (s, dir) => {
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.fingerprintFull(col("text")).as("fp_full"),
          TextAnalysis.fingerprintHead(col("text"), 16).as("fp_head16"))
      },
      Some(s"""SELECT doc_id,
        ${Determinism.duckHash(TextFunctions.duckNormalizeWs("text"))} AS fp_full,
        ${Determinism.duckHash(s"array_to_string(list_slice($duckToks, 1, 16), ' ')")} AS fp_head16
        FROM documents""")),

    QueryDef("q35_bpeish_tokens",
      // sub-word-style piece counting: letter runs, digit runs, and single
      // punctuation marks (the RE2-safe core of a BPE pre-tokenizer —
      // lookaheads are not portable to the oracle's regex engine). A
      // deterministic punctuation suffix makes all three classes fire on
      // every document; whitespace-token count rides along for the ratio.
      (s, dir) => {
        val noisy = concat(col("text"),
          lit(" x12,y34.z!"), col("doc_id").cast("string"))
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          size(regexp_extract_all(noisy, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
            .cast("long").as("n_pieces"),
          TextFunctions.tokenCount(noisy).cast("long").as("n_ws_tokens"),
          Determinism.portableHash(array_join(
            slice(regexp_extract_all(noisy, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)), 1, 12),
            " ")).as("head_pieces_hash"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id, text || ' x12,y34.z!' || CAST(doc_id AS VARCHAR) AS noisy
          FROM documents
        ), p AS (
          SELECT doc_id, noisy,
            regexp_extract_all(noisy, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') AS pieces
          FROM t
        )
        SELECT doc_id,
          CAST(len(pieces) AS BIGINT) AS n_pieces,
          ${TextFunctions.duckTokenCount("noisy")} AS n_ws_tokens,
          ${Determinism.duckHash("array_to_string(list_slice(pieces, 1, 12), ' ')")} AS head_pieces_hash
        FROM p""")),

    QueryDef("q49_lexical_similarity",
      // byte-level Jaccard + cosine between two strings (reference:
      // src/metrics.rs:135-192 lexical_similarity_scores, the
      // extended-metrics/BM25-test utility): occurrence-set Jaccard and
      // frequency-vector cosine over raw bytes, here between each doc's
      // anchor head (first 8 tokens) and its context remainder. "Byte"
      // is literal: both engines count UTF-8 bytes via hex() pairs
      // (hex(str) is byte-level hex in Spark AND DuckDB), so multi-byte
      // code points contribute one count per byte exactly like the
      // reference's &[u8] loop. Counts are exact integers; each score is
      // one deterministic double division floored at e6. Relational
      // shape: per-(doc, byte) counts + one full-outer self-merge — no
      // 256-wide vectors in the plan.
      (s, dir) => {
        val toks = TextFunctions.tokens(col("text"))
        val base = Tables.load(s, dir, "documents")
          .select(col("doc_id"), toks.as("tk"))
          .filter(size(col("tk")) > 8)
          .select(col("doc_id"),
            array_join(expr("slice(tk, 1, 8)"), " ").as("ltext"),
            array_join(expr("slice(tk, 9, size(tk) - 8)"), " ").as("rtext"))
        // ONE corpus pass for both sides: tag each side's byte stream and
        // count with a conditional aggregate keyed by (doc, byte). The
        // former shape ran the tokenize+hex+explode chain TWICE (once per
        // side) and full-outer-merged two per-byte tables — the single
        // (doc_id, ch) aggregate below produces the identical merged rows
        // (absent side = count 0, exactly what the old coalesce read from
        // the outer join's NULLs; `inter`/`uni` translate to >0 tests and
        // the group count). Guide §1.2/§2.4: one pass instead of two,
        // the join's exchange+sort deleted outright.
        val tagged = base
          .select(col("doc_id"), explode(array(
            struct(lit("l").as("side"), col("ltext").as("t")),
            struct(lit("r").as("side"), col("rtext").as("t")))).as("st"))
          .select(col("doc_id"), col("st.side").as("side"),
            explode(regexp_extract_all(hex(col("st.t")), lit(".."), lit(0))).as("ch"))
        val merged = tagged.groupBy(col("doc_id"), col("ch"))
          .agg(
            sum(when(col("side") === "l", 1L).otherwise(0L)).as("cnt_l"),
            sum(when(col("side") === "r", 1L).otherwise(0L)).as("cnt_r"))
        merged.groupBy(col("doc_id"))
          .agg(
            sum(col("cnt_l") * col("cnt_r")).as("dot"),
            sum(col("cnt_l") * col("cnt_l")).as("nl"),
            sum(col("cnt_r") * col("cnt_r")).as("nr"),
            sum(when(col("cnt_l") > 0L && col("cnt_r") > 0L, 1L).otherwise(0L)).as("inter"),
            count(lit(1)).as("uni"))
          .select(col("doc_id"),
            floor(lit(1000000.0) * col("inter") / col("uni")).cast("long").as("jaccard_e6"),
            floor(lit(1000000.0) * col("dot") /
              (sqrt(col("nl").cast("double")) * sqrt(col("nr").cast("double")))).cast("long").as("cosine_e6"))
      },
      Some(s"""WITH base AS (
          SELECT doc_id, ${TextFunctions.duckTokens("text")} AS tk FROM documents
        ), two AS (
          SELECT doc_id,
            array_to_string(list_slice(tk, 1, 8), ' ') AS ltext,
            array_to_string(list_slice(tk, 9, len(tk)), ' ') AS rtext
          FROM base WHERE len(tk) > 8
        ), lc AS (
          SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt_l FROM (
            SELECT doc_id, unnest(regexp_extract_all(hex(ltext), '..')) AS ch
            FROM two) GROUP BY doc_id, ch
        ), rc AS (
          SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS cnt_r FROM (
            SELECT doc_id, unnest(regexp_extract_all(hex(rtext), '..')) AS ch
            FROM two) GROUP BY doc_id, ch
        ), m AS (
          SELECT COALESCE(lc.doc_id, rc.doc_id) AS doc_id, lc.cnt_l, rc.cnt_r
          FROM lc FULL OUTER JOIN rc ON lc.doc_id = rc.doc_id AND lc.ch = rc.ch
        )
        SELECT doc_id,
          CAST(floor(1000000.0 * sum(CASE WHEN cnt_l IS NOT NULL AND cnt_r IS NOT NULL THEN 1 ELSE 0 END)
            / count(*)) AS BIGINT) AS jaccard_e6,
          CAST(floor(1000000.0 * sum(COALESCE(cnt_l, 0) * COALESCE(cnt_r, 0))
            / (sqrt(CAST(sum(COALESCE(cnt_l, 0) * COALESCE(cnt_l, 0)) AS DOUBLE))
               * sqrt(CAST(sum(COALESCE(cnt_r, 0) * COALESCE(cnt_r, 0)) AS DOUBLE)))) AS BIGINT) AS cosine_e6
        FROM m GROUP BY doc_id""")),

    QueryDef("q47_sentence_split",
      // the sentence splitter's FULL output (q30 oracles only the mark
      // counts) as a distributed prefix-sum plan — boundary flags from
      // lag/lead, running-sum sentence ids, per-sentence reassembly; the
      // appended tail exercises every guard: decimal middle (3.14), ticker
      // middle (A.B), ellipsis (..), !/? boundaries, and a blank-line
      // block break
      (s, dir) => {
        val noisy = Tables.load(s, dir, "documents")
          .withColumn("text", concat(col("text"),
            lit("\n\nTail pi is 3.14 and A.B holds.. wow! Done? End")))
        graft.functions.Sentences.sentenceRows(noisy, "doc_id", "text")
          .select(col("doc_id"), col("sent_idx"),
            Determinism.portableHash(col("sentence")).as("sent_hash"))
      },
      Some(s"""WITH d AS (
          SELECT doc_id,
            replace(replace(text || chr(10) || chr(10) ||
              'Tail pi is 3.14 and A.B holds.. wow! Done? End',
              chr(13) || chr(10), chr(10)), chr(13), chr(10)) AS nt
          FROM documents
        ), bl AS (
          SELECT doc_id, string_split(nt, chr(10) || chr(10)) AS bs FROM d
        ), blocks AS (
          SELECT doc_id, CAST(generate_subscripts(bs, 1) AS BIGINT) - 1 AS bidx,
            ${TextFunctions.duckNormalizeWs("unnest(bs)")} AS n
          FROM bl
        ), nb AS (
          SELECT * FROM blocks WHERE n <> ''
        ), cc AS (
          SELECT doc_id, bidx, CAST(unnest(generate_series(1, CAST(length(n) AS INT))) AS BIGINT) AS pos,
            n FROM nb
        ), ch AS (
          SELECT doc_id, bidx, pos, n[pos] AS c,
            CASE WHEN pos > 1 THEN n[pos - 1] END AS pc,
            CASE WHEN pos < length(n) THEN n[pos + 1] END AS nc
          FROM cc
        ), bb AS (
          SELECT *, (c IN ('!', '?') OR (c = '.'
            AND NOT (COALESCE(regexp_matches(pc, '^[0-9]$$'), FALSE) AND COALESCE(regexp_matches(nc, '^[0-9]$$'), FALSE))
            AND NOT (COALESCE(regexp_matches(pc, '^[A-Z0-9]$$'), FALSE) AND COALESCE(regexp_matches(nc, '^[A-Z0-9]$$'), FALSE))
            AND COALESCE(nc <> '.', TRUE))) AS bnd
          FROM ch
        ), sd AS (
          SELECT *, CAST(COALESCE(sum(CASE WHEN bnd THEN 1 ELSE 0 END) OVER (
            PARTITION BY doc_id, bidx ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS sid
          FROM bb
        ), sents AS (
          SELECT doc_id, bidx, sid, trim(string_agg(c, '' ORDER BY pos)) AS sent
          FROM sd GROUP BY doc_id, bidx, sid
        ), f AS (SELECT * FROM sents WHERE sent <> '')
        SELECT doc_id,
          CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bidx, sid) AS BIGINT) - 1 AS sent_idx,
          ${Determinism.duckHash("sent")} AS sent_hash
        FROM f""")),

    QueryDef("q39_pii_scrub",
      // PII redaction — a training-data pipeline staple: emails, phone
      // numbers, and IPv4 addresses replaced with typed placeholders, with
      // per-class match counts. Patterns stay in the RE2-compatible subset
      // so the oracle's regex engine agrees byte-for-byte. Deterministic
      // synthetic PII is appended per doc so every class fires. Narrow:
      // one scan, zero shuffles.
      (s, dir) => {
        val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phonePat = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
        val ipPat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val noisy = concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or 555-123-4567 at 10.0.0."),
          pmod(col("doc_id"), lit(256)).cast("string"))
        val redacted = regexp_replace(regexp_replace(regexp_replace(
          noisy, emailPat, "<EMAIL>"), phonePat, "<PHONE>"), ipPat, "<IP>")
        Tables.load(s, dir, "documents").select(
          col("doc_id"),
          size(regexp_extract_all(noisy, lit(emailPat), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all(noisy, lit(phonePat), lit(0))).cast("long").as("n_phones"),
          size(regexp_extract_all(noisy, lit(ipPat), lit(0))).cast("long").as("n_ips"),
          Determinism.portableHash(redacted).as("redacted_hash"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id,
            text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555-123-4567 at 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS noisy
          FROM documents
        )
        SELECT doc_id,
          CAST(len(regexp_extract_all(noisy, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
          CAST(len(regexp_extract_all(noisy, '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS BIGINT) AS n_phones,
          CAST(len(regexp_extract_all(noisy, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ips,
          ${Determinism.duckHash("""regexp_replace(regexp_replace(regexp_replace(noisy,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')""")} AS redacted_hash
        FROM t""")),

    QueryDef("q38_denoiser_rescue",
      // gate 3's wave expansion on the oracle path: a digit-heavy line is
      // built from each doc's first three alpha tokens + fixed digit runs,
      // the loop-carried rescue runs in the Scala preprocessor (the one
      // documented UDF exception — reference
      // denoiser_preprocessor.rs:221-268), and DuckDB REPLAYS the whole
      // wave iteration as a recursive CTE. Lines under the digit-ratio
      // threshold take the passthrough lane, mirroring the gate's caller.
      (s, dir) => {
        val rescue = udf((line: String) =>
          graft.functions.Denoiser.stripDigitTokens(line, 0.35))
        val base = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            filter(TextFunctions.tokens(col("text")), t => t.rlike("[A-Za-z]")).as("atoks"))
          .filter(size(col("atoks")) >= 3)
          .withColumn("line", concat_ws(" ",
            element_at(col("atoks"), 1), lit("1234"),
            element_at(col("atoks"), 2), lit("5678"), lit("9012"),
            element_at(col("atoks"), 3), lit("777")))
          .withColumn("d", length(col("line")) - length(regexp_replace(col("line"), "[^0-9]", "")))
          .withColumn("a", length(col("line")) - length(regexp_replace(col("line"), "[^A-Za-z]", "")))
          .withColumn("hot", col("d").cast("double") / (col("d") + col("a")) > lit(0.35))
          .withColumn("out", when(col("hot"), rescue(col("line"))).otherwise(col("line")))
        base.select(col("doc_id"),
          when(col("hot"), lit("rescued")).otherwise(lit("passthrough")).as("lane"),
          Determinism.portableHash(col("out")).as("out_hash"),
          size(filter(split(col("out"), " "), t => t =!= "")).cast("long").as("n_kept"))
      },
      Some(s"""WITH RECURSIVE d0 AS (
          SELECT doc_id, list_filter($duckToks, t -> regexp_matches(t, '[A-Za-z]')) AS atoks
          FROM documents
        ), mk AS (
          SELECT doc_id,
            atoks[1] || ' 1234 ' || atoks[2] || ' 5678 9012 ' || atoks[3] || ' 777' AS line
          FROM d0 WHERE len(atoks) >= 3
        ), s2 AS (
          SELECT doc_id, line, string_split(line, ' ') AS ltoks,
            CAST(len(string_split(line, ' ')) AS INT) AS n,
            list_transform(string_split(line, ' '), t -> CAST(length(regexp_replace(t, '[^0-9]', '', 'g')) AS BIGINT)) AS dcs,
            list_transform(string_split(line, ' '), t -> CAST(length(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS BIGINT)) AS acs,
            list_transform(string_split(line, ' '), t -> regexp_matches(t, '[A-Za-z]')) AS keep0
          FROM mk
        ), rec AS (
          SELECT doc_id, line, ltoks, n, dcs, acs, keep0 AS keep,
            CAST(COALESCE(list_sum(list_transform(generate_series(1, n), i -> CASE WHEN keep0[i] THEN dcs[i] ELSE 0 END)), 0) AS BIGINT) AS d,
            CAST(COALESCE(list_sum(list_transform(generate_series(1, n), i -> CASE WHEN keep0[i] THEN acs[i] ELSE 0 END)), 0) AS BIGINT) AS a,
            FALSE AS done
          FROM s2
          UNION ALL
          SELECT doc_id, line, ltoks, n, dcs, acs,
            CASE WHEN stop THEN keep ELSE list_transform(generate_series(1, n), i -> keep[i] OR list_contains(wave, CAST(i AS BIGINT))) END,
            CASE WHEN stop THEN d ELSE nd END,
            CASE WHEN stop THEN a ELSE na END,
            stop
          FROM (
            SELECT *,
              CAST(d + COALESCE(list_sum(list_transform(wave, i -> dcs[i])), 0) AS BIGINT) AS nd,
              CAST(a + COALESCE(list_sum(list_transform(wave, i -> acs[i])), 0) AS BIGINT) AS na,
              (len(wave) = 0 OR
               (CASE WHEN d + COALESCE(list_sum(list_transform(wave, i -> dcs[i])), 0)
                        + a + COALESCE(list_sum(list_transform(wave, i -> acs[i])), 0) = 0 THEN 0.0
                     ELSE CAST(d + COALESCE(list_sum(list_transform(wave, i -> dcs[i])), 0) AS DOUBLE)
                        / (d + COALESCE(list_sum(list_transform(wave, i -> dcs[i])), 0)
                           + a + COALESCE(list_sum(list_transform(wave, i -> acs[i])), 0)) END) > 0.35) AS stop
            FROM (
              SELECT *,
                list_filter(generate_series(1, n), i ->
                  NOT keep[i] AND ((i > 1 AND keep[i-1]) OR (i < n AND keep[i+1]))) AS wave
              FROM rec WHERE NOT done
            )
          )
        ), rescued AS (
          SELECT doc_id,
            COALESCE(array_to_string(list_transform(list_filter(generate_series(1, n), i -> keep[i]), i -> ltoks[i]), ' '), '') AS rtext
          FROM rec WHERE done
        ), lanes AS (
          SELECT m.doc_id, m.line, r.rtext,
            length(m.line) - length(regexp_replace(m.line, '[^0-9]', '', 'g')) AS dd,
            length(m.line) - length(regexp_replace(m.line, '[^A-Za-z]', '', 'g')) AS aa
          FROM mk m JOIN rescued r ON m.doc_id = r.doc_id
        )
        SELECT doc_id,
          CASE WHEN CAST(dd AS DOUBLE) / (dd + aa) > 0.35 THEN 'rescued' ELSE 'passthrough' END AS lane,
          ${Determinism.duckHash("CASE WHEN CAST(dd AS DOUBLE) / (dd + aa) > 0.35 THEN rtext ELSE line END")} AS out_hash,
          CAST(len(list_filter(string_split(CASE WHEN CAST(dd AS DOUBLE) / (dd + aa) > 0.35 THEN rtext ELSE line END, ' '), t -> t <> '')) AS BIGINT) AS n_kept
        FROM lanes""")),

    QueryDef("q34_denoiser_gates",
      // OCR-denoiser gates 1-2 as a pure column pipeline, oracle-replayed
      // (reference: denoiser_preprocessor.rs:221-268): GFM pipe-table
      // separator rows drop, table rows lose their pipes (cells joined by
      // single spaces), zero-alphabetic lines drop. Gate 3's wave rescue
      // is loop-carried → stays the spec-pinned Scala preprocessor
      // (DenoiserSpec); noisy lines are appended deterministically so
      // every gate fires on every document.
      (s, dir) => {
        val noisy = concat(col("text"),
          lit("\n| alpha | beta |\n| --- | :-: |\n| cellA | vB |\n987 654"))
        val lines = Tables.load(s, dir, "documents")
          .select(col("doc_id"), posexplode(split(noisy, "\n")))
          .toDF("doc_id", "line_idx", "line")
        val isTable = expr("startswith(ltrim(line), '|')") &&
          (length(col("line")) - length(expr("replace(line, '|', '')")) >= 2)
        val isSep = isTable &&
          (translate(trim(col("line")), "|-: \t", "") === "")
        val eff = when(isSep, lit(null))
          .when(isTable, expr(
            "array_join(filter(transform(split(line, '\\\\|'), x -> trim(x)), x -> x != ''), ' ')"))
          .otherwise(col("line"))
        lines.withColumn("eff", eff)
          .filter(col("eff").isNotNull && TextFunctions.alphaCount(col("eff")) > 0)
          .select(col("doc_id"), col("line_idx").cast("long").as("line_idx"),
            Determinism.portableHash(col("eff")).as("line_hash"))
      },
      Some(s"""WITH t AS (
          SELECT doc_id, text || chr(10) || '| alpha | beta |' || chr(10) || '| --- | :-: |'
            || chr(10) || '| cellA | vB |' || chr(10) || '987 654' AS noisy
          FROM documents
        ), sp AS (SELECT doc_id, string_split(noisy, chr(10)) AS ls FROM t),
        lines AS (
          SELECT doc_id, CAST(generate_subscripts(ls, 1) AS BIGINT) - 1 AS line_idx,
            unnest(ls) AS line
          FROM sp
        ), eff AS (
          SELECT doc_id, line_idx,
            CASE WHEN (starts_with(ltrim(line), '|') AND length(line) - length(replace(line, '|', '')) >= 2)
                      AND (translate(trim(line), '|-: ' || chr(9), '') = '') THEN NULL
                 WHEN (starts_with(ltrim(line), '|') AND length(line) - length(replace(line, '|', '')) >= 2)
                      THEN array_to_string(list_filter(list_transform(string_split(line, '|'), x -> trim(x)), x -> x <> ''), ' ')
                 ELSE line END AS eff
          FROM lines
        )
        SELECT doc_id, line_idx, ${Determinism.duckHash("eff")} AS line_hash
        FROM eff
        WHERE eff IS NOT NULL
          AND (length(eff) - length(regexp_replace(eff, '[A-Za-z]', '', 'g'))) > 0""")),

    QueryDef("q96_sql_surface_funnel",
      // the SQL surface end-to-end: per-source curation gates written in
      // PURE SQL against the registered graft_* functions (GraftFunctions /
      // GraftExtensions) — no Column API in the query body. The functions
      // expand to the exact expression trees the Column form builds (same
      // codegen, no UDFs), which is why this parses, optimizes, and
      // oracle-checks like any other query. This is the surface a SQL-only
      // pipeline or analyst uses.
      (s, dir) => {
        // idempotent; `spark.sql.extensions=graft.plans.GraftExtensions`
        // covers sessions built with the conf (Verify/Bench do), register()
        // covers any other live session
        graft.plans.GraftFunctions.register(s)
        Tables.load(s, dir, "documents").createOrReplaceTempView("graft_documents")
        s.sql("""
          SELECT source,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN graft_quality_e6(text) >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
            CAST(sum(CASE WHEN graft_lang_id(text) = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
            CAST(sum(graft_token_count(text)) AS BIGINT) AS n_tokens,
            CAST(sum(graft_seeded('cur', graft_normalize_ws(text))) AS BIGINT) AS checksum
          FROM graft_documents GROUP BY source""")
      },
      Some {
        val toks = duckToks
        s"""SELECT source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(CASE WHEN ${TextAnalysis.duckQualityE6("text", toks)} >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
          CAST(sum(CASE WHEN ${TextAnalysis.duckLangId(toks)} = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_lang_ok,
          CAST(sum(len($toks)) AS BIGINT) AS n_tokens,
          CAST(sum(${Determinism.duckHash(s"'cur:' || ${TextFunctions.duckNormalizeWs("text")}")}) AS BIGINT) AS checksum
          FROM documents GROUP BY source"""
      }),

    QueryDef("q98_repetition_filters",
      // Gopher-style REPETITION quality gates: share of the most frequent
      // token / token-bigram and the duplicate-trigram fraction, e6-exact,
      // plus the composite `repetitive` flag (see Curation thresholds).
      // Two map-side-combinable keyed aggregations — no self-join, no
      // window — so the profile is a linear scan at any corpus size.
      (s, dir) => Curation.repetitionProfile(
        Tables.load(s, dir, "documents"), "doc_id", "text"),
      Some {
        val b2 = Dedup.duckShingles("toks", 2)
        val b3 = Dedup.duckShingles("toks", 3)
        s"""WITH t AS (SELECT doc_id, $duckToks AS toks FROM documents),
          g AS (
            SELECT doc_id, 'u' AS kind, unnest(toks) AS g FROM t WHERE len(toks) > 0
            UNION ALL
            SELECT doc_id, 'b' AS kind, unnest($b2) AS g FROM t WHERE len(toks) > 0
            UNION ALL
            SELECT doc_id, 't' AS kind, unnest($b3) AS g FROM t WHERE len(toks) > 0),
          c AS (SELECT doc_id, kind, g, count(*) AS c FROM g GROUP BY 1, 2, 3),
          sk AS (SELECT doc_id, kind, max(c) AS mx, sum(c) AS tot, count(*) AS nd
            FROM c GROUP BY 1, 2),
          w AS (SELECT doc_id,
            max(CASE WHEN kind = 'u' THEN mx END) AS u_mx,
            max(CASE WHEN kind = 'u' THEN tot END) AS u_tot,
            max(CASE WHEN kind = 'b' THEN mx END) AS b_mx,
            max(CASE WHEN kind = 'b' THEN tot END) AS b_tot,
            max(CASE WHEN kind = 't' THEN nd END) AS t_nd,
            max(CASE WHEN kind = 't' THEN tot END) AS t_tot
            FROM sk GROUP BY 1),
          f AS (SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tok,
            ${TextAnalysis.duckRatioE6("coalesce(u_mx, 0)", "coalesce(u_tot, 0)")} AS top_tok_e6,
            ${TextAnalysis.duckRatioE6("coalesce(b_mx, 0)", "coalesce(b_tot, 0)")} AS top_bigram_e6,
            ${TextAnalysis.duckRatioE6("coalesce(t_tot, 0) - coalesce(t_nd, 0)", "coalesce(t_tot, 0)")} AS dup_trigram_e6
            FROM t LEFT JOIN w ON t.doc_id = w.doc_id)
          SELECT doc_id, n_tok, top_tok_e6, top_bigram_e6, dup_trigram_e6,
            CAST(CASE WHEN n_tok >= ${Curation.MinRepToks}
              AND (top_tok_e6 > ${Curation.TopTokMaxE6}
                OR dup_trigram_e6 > ${Curation.DupTrigramMaxE6})
              THEN 1 ELSE 0 END AS BIGINT) AS repetitive
          FROM f"""
      }),

    QueryDef("q55_bpe_word_counts",
      // the corpus-scale half of BPE training: one explode + map-side-
      // combined aggregate, capped at the top-N words by the
      // DETERMINISTIC total order (count DESC, word ASC) — the cap is
      // what bounds the driver-side trainer at 100 TB
      (s, dir) => Bpe.wordCounts(Tables.load(s, dir, "documents"),
        maxWords = 300),
      Some(s"""WITH words AS (
          SELECT unnest(${TextFunctions.duckTokens("lower(text)")}) AS word
          FROM documents
        )
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM words
        GROUP BY word ORDER BY cnt DESC, word LIMIT 300""")),

    QueryDef("q54_bpe_piece_counts",
      // distributed BPE ENCODE under the pinned merge table: broadcast
      // ranks + one narrow mapPartitions with a per-partition word memo.
      // The oracle replays the exact greedy rule — merge the LEFTMOST
      // occurrence of the lowest-rank adjacent pair until none matches —
      // as a DuckDB recursive CTE over symbol lists, so the per-doc piece
      // counts hash-match only if both engines segment every word
      // identically.
      (s, dir) => Bpe.pieceCounts(s, Tables.load(s, dir, "documents"),
        Bpe.PinnedMerges),
      Some(s"""$duckBpeCtes, per_doc AS (
          SELECT o.doc_id, count(*) AS n_words, sum(f.np) AS n_pieces
          FROM occurrences o JOIN fin f ON o.w = f.w
          GROUP BY o.doc_id
        )
        SELECT d.doc_id,
          CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
          CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id""")),

    QueryDef("q56_bpe_segmentation",
      // pins the actual SEGMENTATION, not just its length: the hash of
      // each doc's first 12 pieces (word order preserved via ordered
      // flatten) matches only if both engines produce identical piece
      // STRINGS in identical order
      (s, dir) => Bpe.segmentation(s, Tables.load(s, dir, "documents"),
        Bpe.PinnedMerges),
      Some(s"""$duckBpeCtes, flat AS (
          SELECT o.doc_id, flatten(array_agg(f.syms ORDER BY o.idx)) AS pieces
          FROM occurrences o JOIN fin f ON o.w = f.w
          GROUP BY o.doc_id
        )
        SELECT d.doc_id,
          CAST(coalesce(len(p.pieces), 0) AS BIGINT) AS n_pieces,
          ${Determinism.duckHash(
            "array_to_string(list_slice(coalesce(p.pieces, []), 1, 12), ' ')")}
            AS head_pieces_hash
        FROM documents d LEFT JOIN flat p ON d.doc_id = p.doc_id""")),

    QueryDef("q120_wordpiece_vocab",
      // the WordPiece vocabulary (operators.WordPiece): candidate pieces
      // are every ≤8-char substring of the CAPPED word table (initial
      // plain, internal ##-prefixed), count-weighted; vocab = all
      // single-char pieces + top-200 multi-char by (count DESC, piece).
      // The corpus-scale work is q55's one capped aggregate — this adds
      // one explode over ≤300 rows.
      (s, dir) => WordPiece.vocabTable(
        Bpe.wordCounts(Tables.load(s, dir, "documents"), maxWords = 300),
        maxPieceLen = 8, topMulti = 200),
      Some(s"""WITH ${WordPiece.duckVocabCtes(300, 8, 200)}
        SELECT piece, mlen, pcnt FROM wp_vocab""")),

    QueryDef("q121_wordpiece_segmentation",
      // the real BERT inference rule, distributed: greedy
      // longest-match-first per word under the q120 vocabulary (broadcast
      // after a bounded collect), whole-word [UNK] on any unmatchable
      // position. The oracle replays the greedy march — longest matching
      // piece at every position of every distinct word — as a recursive
      // CTE over the SAME SQL-derived vocabulary, and the head-pieces
      // hash pins the piece STRINGS in order (the q56 convention).
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vocab = WordPiece.vocabTable(
            Bpe.wordCounts(docs, maxWords = 300), maxPieceLen = 8, topMulti = 200)
          .select(col("piece"), col("mlen"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        WordPiece.segment(s, docs, vocab, maxPieceLen = 8)
      },
      Some(s"""WITH RECURSIVE ${WordPiece.duckVocabCtes(300, 8, 200)},
        ${WordPiece.duckEncodeCtes(8)}, wp_flat AS (
          SELECT o.doc_id, flatten(array_agg(f.pieces ORDER BY o.idx)) AS pieces,
            CAST(count(*) AS BIGINT) AS n_words,
            CAST(sum(f.np) AS BIGINT) AS n_pieces,
            CAST(sum(f.unk) AS BIGINT) AS n_unk_words
          FROM wp_occ o JOIN wp_fin f ON o.w = f.w GROUP BY o.doc_id
        )
        SELECT d.doc_id,
          CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
          CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces,
          CAST(coalesce(p.n_unk_words, 0) AS BIGINT) AS n_unk_words,
          ${Determinism.duckHash(
            "array_to_string(list_slice(coalesce(p.pieces, []), 1, 12), ' ')")}
            AS head_pieces_hash
        FROM documents d LEFT JOIN wp_flat p ON d.doc_id = p.doc_id""")),

    QueryDef("q123_unigram_segmentation",
      // the third production tokenizer: Unigram-LM (SentencePiece's
      // model) — segmentation is the GLOBALLY optimal Viterbi path under
      // pinned integer ln-costs (trained by hard EM on the capped word
      // table; Unigram.PinnedVocab, retrain-asserted). The oracle replays
      // the exact forward DP (per-prefix best-cost lists, longer-piece
      // tie-break) plus the backtrace as recursive CTEs under the same
      // pinned cost map; the head hash pins piece STRINGS in order.
      (s, dir) => Unigram.segment(s, Tables.load(s, dir, "documents"),
        Unigram.PinnedVocab),
      Some(s"""WITH RECURSIVE ${Unigram.duckEncodeCtes(Unigram.PinnedVocab, 6)},
        ug_flat AS (
          SELECT o.doc_id, flatten(array_agg(f.pieces ORDER BY o.idx)) AS pieces,
            CAST(count(*) AS BIGINT) AS n_words,
            CAST(sum(f.np) AS BIGINT) AS n_pieces,
            CAST(sum(f.unk) AS BIGINT) AS n_unk_words
          FROM ug_occ o JOIN ug_fin f ON o.w = f.w GROUP BY o.doc_id
        )
        SELECT d.doc_id,
          CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
          CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces,
          CAST(coalesce(p.n_unk_words, 0) AS BIGINT) AS n_unk_words,
          ${Determinism.duckHash(
            "array_to_string(list_slice(coalesce(p.pieces, []), 1, 12), ' ')")}
            AS head_pieces_hash
        FROM documents d LEFT JOIN ug_flat p ON d.doc_id = p.doc_id""")),

    QueryDef("q131_unigram_soft_segmentation",
      // the SOFT-EM-trained Unigram model (Unigram.trainSoft — full
      // SentencePiece EM: forward-backward expected counts over ALL
      // segmentations + likelihood-loss pruning; Unigram.PinnedSoftVocab,
      // retrain-asserted): inference is the same integer-cost Viterbi
      // (SentencePiece's default decode), so the oracle replays the exact
      // DP + backtrace under the soft-trained pinned cost map — the
      // training algorithms differ (q123 is hard-EM), the decode
      // contract is shared, and the two lanes' head hashes provably
      // differ (UnigramSpec pins vocab divergence).
      (s, dir) => Unigram.segment(s, Tables.load(s, dir, "documents"),
        Unigram.PinnedSoftVocab),
      Some(s"""WITH RECURSIVE ${Unigram.duckEncodeCtes(Unigram.PinnedSoftVocab, 6)},
        ug_flat AS (
          SELECT o.doc_id, flatten(array_agg(f.pieces ORDER BY o.idx)) AS pieces,
            CAST(count(*) AS BIGINT) AS n_words,
            CAST(sum(f.np) AS BIGINT) AS n_pieces,
            CAST(sum(f.unk) AS BIGINT) AS n_unk_words
          FROM ug_occ o JOIN ug_fin f ON o.w = f.w GROUP BY o.doc_id
        )
        SELECT d.doc_id,
          CAST(coalesce(p.n_words, 0) AS BIGINT) AS n_words,
          CAST(coalesce(p.n_pieces, 0) AS BIGINT) AS n_pieces,
          CAST(coalesce(p.n_unk_words, 0) AS BIGINT) AS n_unk_words,
          ${Determinism.duckHash(
            "array_to_string(list_slice(coalesce(p.pieces, []), 1, 12), ' ')")}
            AS head_pieces_hash
        FROM documents d LEFT JOIN ug_flat p ON d.doc_id = p.doc_id""")),

    QueryDef("q107_lm_quality",
      // CCNet-style LM quality gate (operators.NgramLm): an add-one
      // bigram model trained on the in-domain slice (source = src0)
      // scores every doc's cross-entropy; per-bigram costs are e6-floored
      // BEFORE summation so scores are exact longs. The model tables
      // broadcast (the KenLM-artifact analogue) — the candidate scan's
      // only shuffle is its per-doc aggregate.
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val (bg, ctx, vocab) = graft.operators.NgramLm.train(
          docs.filter(col("source") === "src0"), "text")
        graft.operators.NgramLm.score(docs, "doc_id", "text", bg, ctx, vocab)
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, source, $duckToks AS t FROM documents),
        ${graft.operators.NgramLm.duckLmCtes("toks", "t", "source = 'src0'")}
        SELECT d.doc_id,
          coalesce(a.n_bigrams, 0) AS n_bigrams,
          coalesce(a.cost_e6, 0) AS cost_e6,
          CASE WHEN coalesce(a.n_bigrams, 0) > 0
            THEN coalesce(a.cost_e6, 0) // a.n_bigrams ELSE 0 END
            AS avg_cost_e6
        FROM documents d LEFT JOIN lmagg a ON d.doc_id = a.doc_id""")),

    QueryDef("q141_ccnet_buckets",
      // CCNet's selection step by name (Wenzek et al. 2020 §3): docs
      // bucket into head / middle / tail by LM-perplexity TERCILES
      // within each source (lower cross-entropy = head; CCNet keeps
      // head+middle for pretraining). Reuses the q107 model: e6-exact
      // per-doc avg costs, then ONE (source)-keyed rank window and
      // integer tercile tests (brank·3 ≤ n / ≤ 2n) — no percentile
      // approximation, bit-stable cross-engine. At 100 TB the only wide
      // ops are the score aggregate and the per-source window.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.load(s, dir, "documents")
        val (bg, ctx, vocab) = graft.operators.NgramLm.train(
          docs.filter(col("source") === "src0"), "text")
        val scored = graft.operators.NgramLm
          .score(docs, "doc_id", "text", bg, ctx, vocab)
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
        val w = Window.partitionBy(col("source"))
          .orderBy(col("avg_cost_e6"), col("doc_id"))
        scored
          .withColumn("brank", row_number().over(w).cast("long"))
          .withColumn("nsrc",
            count(lit(1)).over(Window.partitionBy(col("source"))).cast("long"))
          .withColumn("bucket",
            when(col("brank") * 3 <= col("nsrc"), lit("head"))
              .when(col("brank") * 3 <= col("nsrc") * 2, lit("middle"))
              .otherwise(lit("tail")))
          .withColumn("kept", (col("bucket") =!= "tail").cast("long"))
          .select(col("doc_id"), col("source"), col("avg_cost_e6"),
            col("brank"), col("bucket"), col("kept"))
      },
      Some(s"""WITH toks AS (
          SELECT doc_id, source, $duckToks AS t FROM documents),
        ${graft.operators.NgramLm.duckLmCtes("toks", "t", "source = 'src0'")},
        sc AS (
          SELECT d.doc_id, d.source,
            CASE WHEN coalesce(a.n_bigrams, 0) > 0
              THEN coalesce(a.cost_e6, 0) // a.n_bigrams ELSE 0 END AS avg_cost_e6
          FROM documents d LEFT JOIN lmagg a ON d.doc_id = a.doc_id
        ), r AS (
          SELECT *,
            row_number() OVER (PARTITION BY source ORDER BY avg_cost_e6, doc_id) AS brank,
            count(*) OVER (PARTITION BY source) AS nsrc
          FROM sc
        )
        SELECT doc_id, source, CAST(avg_cost_e6 AS BIGINT) AS avg_cost_e6,
          CAST(brank AS BIGINT) AS brank,
          CASE WHEN brank * 3 <= nsrc THEN 'head'
            WHEN brank * 3 <= nsrc * 2 THEN 'middle' ELSE 'tail' END AS bucket,
          CAST(CASE WHEN brank * 3 <= nsrc * 2 THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM r""")),

    QueryDef("q113_hll_distinct",
      // the portable-HLL sketch (operators.Sketches): per-source distinct
      // tokens AND distinct trigrams, each estimated by a 64-register
      // HyperLogLog whose registers are md5-derived — so the DuckDB
      // oracle reproduces the ESTIMATE bit-for-bit, not just its error
      // bound (built-in approx_count_distinct can never be
      // oracle-checked). Tokens exercise the small-range linear-counting
      // lane, trigrams the raw harmonic lane; exact distinct counts ride
      // along so the artifact shows the sketch error directly.
      (s, dir) => {
        import graft.operators.Sketches
        val toksed = Tables.load(s, dir, "documents")
          .select(col("source"), TextFunctions.tokens(col("text")).as("t"))
        val tokP = toksed.select(col("source").as("group"), explode(col("t")).as("elem"))
        val triP = toksed.filter(size(col("t")) >= 3)
          .select(col("source").as("group"),
            explode(Dedup.shingles(col("t"), 3)).as("elem"))
        val tokE = tokP.groupBy(col("group"))
          .agg(countDistinct(col("elem")).as("tok_exact"))
        val triE = triP.groupBy(col("group"))
          .agg(countDistinct(col("elem")).as("tri_exact"))
        tokE
          .join(Sketches.hllDistinct(tokP, "group", "elem")
            .withColumnRenamed("hll_est", "tok_hll"), "group")
          .join(triE, "group")
          .join(Sketches.hllDistinct(triP, "group", "elem")
            .withColumnRenamed("hll_est", "tri_hll"), "group")
          .withColumnRenamed("group", "source")
      },
      Some {
        import graft.operators.Sketches
        s"""WITH t AS (SELECT source, $duckToks AS toks FROM documents),
          tokp AS (SELECT source AS grp, unnest(toks) AS elem FROM t),
          trip AS (SELECT source AS grp,
              list_aggregate(list_slice(toks, i, i + 2), 'string_agg', ' ') AS elem
            FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
            WHERE len(toks) >= 3),
          tokh AS ${Sketches.duckHllDistinct("tokp")},
          trih AS ${Sketches.duckHllDistinct("trip")},
          toke AS (SELECT grp, CAST(count(DISTINCT elem) AS BIGINT) AS tok_exact
            FROM tokp GROUP BY grp),
          trie AS (SELECT grp, CAST(count(DISTINCT elem) AS BIGINT) AS tri_exact
            FROM trip GROUP BY grp)
          SELECT toke.grp AS source, toke.tok_exact, tokh.hll_est AS tok_hll,
            trie.tri_exact, trih.hll_est AS tri_hll
          FROM toke JOIN tokh ON toke.grp = tokh.grp
            JOIN trie ON toke.grp = trie.grp
            JOIN trih ON toke.grp = trih.grp"""
      }),

    QueryDef("q115_cms_heavy_hitters",
      // heavy-hitter token frequencies through a COUNT-MIN sketch
      // (operators.Sketches): the counter table is d·w = 2048 BIGINTs (16
      // KB) at ANY corpus size, rows merge across shards by plain addition
      // (the aggregate IS the merge — pinned in SketchesSpec), and
      // estimates are one-sided (`cms_est ≥ exact`, overshoot ≤ εN). The
      // md5-derived cells make the ESTIMATES bit-identical cross-engine,
      // so the oracle checks the sketch itself, not a tolerance band.
      // Exact counts for the true top-15 ride along so the artifact shows
      // the overshoot directly.
      (s, dir) => {
        import graft.operators.Sketches
        val tok = Tables.load(s, dir, "documents")
          .select(explode(TextFunctions.tokens(col("text"))).as("elem"))
        val sketch = Sketches.cmsBuild(tok, "elem")
        val top = tok.groupBy(col("elem"))
          .agg(count(lit(1)).as("exact_cnt"))
          .orderBy(col("exact_cnt").desc, col("elem")).limit(15)
        top.join(Sketches.cmsEstimate(top.select(col("elem")), sketch, "elem"), "elem")
          .select(col("elem").as("term"), col("exact_cnt"), col("cms_est"))
      },
      Some {
        import graft.operators.Sketches
        s"""WITH t AS (SELECT $duckToks AS toks FROM documents),
          tok AS MATERIALIZED (SELECT unnest(toks) AS elem FROM t),
          sk AS MATERIALIZED ${Sketches.duckCmsBuild("tok")},
          ex AS MATERIALIZED (SELECT elem AS q, CAST(count(*) AS BIGINT) AS exact_cnt
            FROM tok GROUP BY 1 ORDER BY exact_cnt DESC, q LIMIT 15),
          est AS ${Sketches.duckCmsEstimate("ex", "sk")}
          SELECT ex.q AS term, ex.exact_cnt, est.cms_est
          FROM ex JOIN est ON ex.q = est.q"""
      }),

    QueryDef("q133_url_curation",
      // the URL hygiene layer of a web-crawl pipeline (C4 dedupes by
      // normalized URL; RefinedWeb caps and blocks by registered
      // domain), over hash-synthesized crawl URLs exercising every
      // normalization rule: mixed-case hosts, default ports, trailing
      // slashes, tracking params (utm_*/fbclid) in shuffled order,
      // fragments, and the FULL public-suffix list (functions.Psl — the
      // real ~9.9k-rule publicsuffix.org list embedded as a resource):
      // exact rules (com, co.uk), private-section rules (github.io),
      // wildcard rules (*.kawasaki.jp) and exception rules
      // (!city.kawasaki.jp) all fire in-corpus. normalizeUrl / the PSL
      // matcher are pure column algebra (codegen'd string/array/InSet
      // expressions, no UDF); the blocklist is an isin literal and the
      // per-domain frequency cap (keep 3 seeded-rank docs per registered
      // domain) is the one keyed window. DuckDB recomputes the whole
      // layer through the operators' own SQL twins — the SAME parsed
      // rule set replayed as a VALUES join, so a list update edits ONE
      // file.
      (s, dir) => {
        import graft.functions.{Psl, UrlFunctions}
        import org.apache.spark.sql.expressions.Window
        def draw(st: String, m: Int) =
          pmod(Determinism.seeded(st, col("doc_id")), lit(m.toLong))
        val scheme = when(draw("us", 2) === 0, lit("https")).otherwise(lit("http"))
        val sub = element_at(array(lit(""), lit("www."), lit("WWW."), lit("cdn.")),
          (draw("uc", 4) + 1).cast("int"))
        val sfx = element_at(
          array(lit("com"), lit("org"), lit("co.uk"), lit("io"), lit("ac.uk"),
            lit("github.io"), lit("kawasaki.jp"), lit("city.kawasaki.jp")),
          (draw("ux", 8) + 1).cast("int"))
        val port = when(draw("up", 4) === 0,
          when(scheme === "https", lit(":443")).otherwise(lit(":80"))).otherwise(lit(""))
        val qs = element_at(array(lit(""), lit("?utm_source=tw&b=2&a=1"),
          lit("?b=2&a=1"), lit("?a=1&utm_campaign=z&fbclid=x1")),
          (draw("uq", 4) + 1).cast("int"))
        val raw = concat(scheme, lit("://"), sub, lit("site"), draw("ub", 40),
          lit("."), sfx, port, lit("/p"), draw("ua", 50),
          when(draw("ut", 3) === 0, lit("/")).otherwise(lit("")), qs,
          when(draw("uf", 5) === 0, lit("#sec2")).otherwise(lit("")))
        val blocked = Seq("site7.com", "site13.co.uk", "site21.org")
        val w = Window.partitionBy(col("reg_domain"))
          .orderBy(Determinism.seeded("ucap", col("doc_id")), col("doc_id"))
        Tables.load(s, dir, "documents").select(col("doc_id"))
          .withColumn("raw_url", raw)
          .withColumn("norm_url", UrlFunctions.normalizeUrl(col("raw_url")))
          .withColumn("reg_domain",
            Psl.registeredDomain(UrlFunctions.hostOf(col("raw_url"))))
          .withColumn("blocked", col("reg_domain").isInCollection(blocked).cast("long"))
          .withColumn("drank", row_number().over(w).cast("long"))
          .withColumn("kept",
            (col("blocked") === 0 && col("drank") <= 3).cast("long"))
      },
      Some {
        import graft.functions.{Psl, UrlFunctions}
        def d(st: String) = Determinism.duckSeeded(st, "doc_id")
        s"""WITH d AS (
          SELECT doc_id,
            CASE WHEN ${d("us")} % 2 = 0 THEN 'https' ELSE 'http' END AS scheme,
            (['', 'www.', 'WWW.', 'cdn.'])[CAST(${d("uc")} % 4 AS INT) + 1] AS sub,
            (['com', 'org', 'co.uk', 'io', 'ac.uk',
              'github.io', 'kawasaki.jp', 'city.kawasaki.jp'])[CAST(${d("ux")} % 8 AS INT) + 1] AS sfx,
            ${d("up")} % 4 AS updraw,
            CAST(${d("ub")} % 40 AS VARCHAR) AS ub,
            CAST(${d("ua")} % 50 AS VARCHAR) AS ua,
            ${d("ut")} % 3 AS utdraw,
            (['', '?utm_source=tw&b=2&a=1', '?b=2&a=1',
              '?a=1&utm_campaign=z&fbclid=x1'])[CAST(${d("uq")} % 4 AS INT) + 1] AS qs,
            ${d("uf")} % 5 AS ufdraw
          FROM documents
        ), r AS (
          SELECT doc_id,
            scheme || '://' || sub || 'site' || ub || '.' || sfx ||
            (CASE WHEN updraw = 0 THEN
              (CASE WHEN scheme = 'https' THEN ':443' ELSE ':80' END) ELSE '' END) ||
            '/p' || ua || (CASE WHEN utdraw = 0 THEN '/' ELSE '' END) || qs ||
            (CASE WHEN ufdraw = 0 THEN '#sec2' ELSE '' END) AS raw_url
          FROM d
        ), n0 AS (
          SELECT doc_id, raw_url,
            ${UrlFunctions.duckNormalizeUrl("raw_url")} AS norm_url,
            ${UrlFunctions.duckHostOf("raw_url")} AS host
          FROM r
        ), ${Psl.duckRegDomainCtes("n0", "doc_id", "host")}, n AS (
          SELECT n0.doc_id, n0.raw_url, n0.norm_url, pslr.reg_domain
          FROM n0 JOIN pslr USING (doc_id)
        ), f AS (
          SELECT doc_id, raw_url, norm_url, reg_domain,
            CASE WHEN reg_domain IN ('site7.com', 'site13.co.uk', 'site21.org')
              THEN 1 ELSE 0 END AS blocked,
            row_number() OVER (PARTITION BY reg_domain
              ORDER BY ${d("ucap")}, doc_id) AS drank
          FROM n
        )
        SELECT doc_id, raw_url, norm_url, reg_domain,
          CAST(blocked AS BIGINT) AS blocked, CAST(drank AS BIGINT) AS drank,
          CAST(CASE WHEN blocked = 0 AND drank <= 3 THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM f"""
      }),

    QueryDef("q140_gopher_rules",
      // the named GOPHER quality rule set (Rae et al. 2021 A1.1 — the
      // gate most web-scale pipelines start from), every metric an exact
      // integer: word-count bounds, mean word length, #/ellipsis
      // symbol-to-word ratio, bullet-line and ellipsis-line fractions,
      // alphabetic-word fraction, required-stopword presence, and the
      // combined pass flag. A hash-picked suffix plants each defect
      // class (bullet lines / trailing ellipses / hash spam) so every
      // rule branch fires in-corpus; DuckDB recomputes all eight fields
      // through the operator's own SQL twin.
      (s, dir) => {
        import graft.operators.TextAnalysis
        val variant = pmod(Determinism.seeded("gop", col("doc_id")), lit(4L))
        val planted = concat(col("text"),
          when(variant === 1,
            lit("\n• bullet one\n• bullet two\n- third bullet"))
          .when(variant === 2,
            lit("\nthis line trails off...\nand this one too...\nplain line"))
          .when(variant === 3, lit(" ### ## #"))
          // variant 0 is the WELL-FORMED class: enough words and the
          // required stop words, so the pass branch fires in-corpus too
          .otherwise(lit(" the be to of and that have with" + " word" * 45)))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), TextAnalysis.gopherMetrics(planted).as("g"))
          .select(col("doc_id"), col("g.*"))
      },
      Some {
        import graft.operators.TextAnalysis
        s"""WITH g AS (
          SELECT doc_id, text || CASE ${Determinism.duckSeeded("gop", "doc_id")} % 4
            WHEN 1 THEN chr(10) || '• bullet one' || chr(10) || '• bullet two' || chr(10) || '- third bullet'
            WHEN 2 THEN chr(10) || 'this line trails off...' || chr(10) || 'and this one too...' || chr(10) || 'plain line'
            WHEN 3 THEN ' ### ## #'
            ELSE ' the be to of and that have with' || repeat(' word', 45) END AS gtext
          FROM documents
        ), t AS (
          SELECT doc_id, gtext, ${TextFunctions.duckTokens("gtext")} AS toks FROM g
        )
        SELECT doc_id, ${TextAnalysis.duckGopherFields("gtext", "toks")} FROM t"""
      }),

    QueryDef("q134_domain_centrality",
      // link-graph quality prior (operators.LinkGraph): bounded-hop
      // harmonic centrality over the q133 corpus's DOMAIN graph — the
      // ranking Common Crawl publishes per host and crawl pipelines use
      // as a per-domain prior. The graph: 10% of documents are "linking
      // pages", each emitting 2 edges from its registered domain to the
      // domain of a hash-picked target document (the q133-STYLE ub/ux
      // domain streams — q133 itself has since widened to the full-PSL
      // 8-suffix corpus; this lane keeps the 5-suffix variant as its own
      // self-consistent graph). Distance-k
      // pairs come from k-1 sparse self-joins with per-hop left_anti +
      // checkpoint cuts (the q93 shape); contributions are exact
      // floor(1e6/k) integers. DuckDB replays the hop algebra through
      // the operator's own CTE twin.
      (s, dir) => {
        import graft.operators.LinkGraph
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
        val nDocs = docs.count()
        val domCol = concat(lit("site"),
          pmod(Determinism.seeded("ub", col("doc_id")), lit(40L)), lit("."),
          element_at(array(lit("com"), lit("org"), lit("co.uk"), lit("io"), lit("ac.uk")),
            (pmod(Determinism.seeded("ux", col("doc_id")), lit(5L)) + 1).cast("int")))
        val dom = docs.withColumn("d", domCol)
        val tgt = docs
          .filter(pmod(Determinism.seeded("lnksel", col("doc_id")), lit(10L)) === 0)
          .select(col("doc_id"), explode(array(lit(0L), lit(1L))).as("k"))
          .withColumn("t", pmod(Determinism.portableHash(
            concat(lit("lnk"), col("k").cast("string"), lit(":"),
              col("doc_id").cast("string"))), lit(nDocs)))
        val edges = tgt
          .join(dom.select(col("doc_id"), col("d").as("src")), "doc_id")
          .join(dom.select(col("doc_id").as("t"), col("d").as("dst")), "t")
          .select(col("src"), col("dst"))
        LinkGraph.boundedHarmonic(dom.select(col("d").as("node")), edges, 3)
          .withColumnRenamed("node", "domain")
      },
      Some {
        import graft.operators.LinkGraph
        def d(st: String) = Determinism.duckSeeded(st, "doc_id")
        s"""WITH dom AS MATERIALIZED (
          SELECT doc_id,
            'site' || CAST(${d("ub")} % 40 AS VARCHAR) || '.' ||
            (['com', 'org', 'co.uk', 'io', 'ac.uk'])[CAST(${d("ux")} % 5 AS INT) + 1] AS dm
          FROM documents
        ), tgt AS (
          SELECT doc_id, k.k,
            ${Determinism.duckHash(
              "'lnk' || CAST(k.k AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} %
              (SELECT count(*) FROM documents) AS t
          FROM documents, (SELECT unnest([0, 1]) AS k) k
          WHERE ${d("lnksel")} % 10 = 0
        ), edges0 AS (
          SELECT d1.dm AS src, d2.dm AS dst
          FROM tgt JOIN dom d1 ON d1.doc_id = tgt.doc_id
          JOIN dom d2 ON d2.doc_id = tgt.t
        ), ${LinkGraph.duckBoundedHarmonic3("edges0", "(SELECT dm AS node FROM dom)")}
        SELECT node AS domain, n1, n2, n3, h_e6 FROM hfinal"""
      }),

    QueryDef("q151_boilerplate_removal",
      // line-level boilerplate removal (the jusText/boilerpipe-class
      // extraction step between raw page text and every quality gate):
      // each doc becomes a "page" — its tokens grouped into 10-token
      // content lines with hash-planted nav ("Home | About | Contact"),
      // cookie-banner, and © footer lines spliced at their structural
      // positions — and a pure-string line classifier (separator
      // density ≥ 2 pipes, © marker, short-and-stopwordless) drops
      // boilerplate. The whole pass is array algebra on the lines
      // ARRAY (transform/filter lambdas — order-preserving, no explode
      // + collect_list order hazard, no shuffle at all); the cleaned
      // document round-trips as one portable hash so ANY line-level
      // drift fails loudly. DuckDB rebuilds the same pages from the
      // same draws and replays the classifier lambda for lambda.
      (s, dir) => {
        def dh(st: String) = pmod(Determinism.seeded(st, col("doc_id")), lit(100L))
        val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
        def boiler(l: org.apache.spark.sql.Column) = {
          val pipes = length(l) - length(regexp_replace(l, "\\|", ""))
          val ltoks = filter(split(l, " "), t => t =!= "")
          val nstop = size(filter(ltoks, t => t.isInCollection(stops)))
          pipes >= 2 || l.contains("©") || (size(ltoks) <= 4 && nstop === 0)
        }
        val pages = Tables.load(s, dir, "documents")
          .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
          .withColumn("content",
            // blank docs yield NO content lines (a descending sequence(0,-1)
            // would otherwise fabricate two)
            when(size(col("toks")) > 0,
              transform(sequence(lit(0), floor((size(col("toks")) - 1) / 10).cast("int")),
                g => concat_ws(" ", slice(col("toks"), g * 10 + 1, lit(10)))))
              .otherwise(array().cast("array<string>")))
          .withColumn("lines", concat(
            when(dh("bnav") % 2 === 0,
              array(lit("Home | About | Contact"))).otherwise(array().cast("array<string>")),
            col("content"),
            when(dh("bck") % 4 === 0,
              array(lit("Cookie settings | Privacy policy")))
              .otherwise(array().cast("array<string>")),
            when(dh("bft") % 3 > 0,
              array(concat(lit("© 2024 site"), (dh("bdm") % 40).cast("string"),
                lit(".example All rights reserved"))))
              .otherwise(array().cast("array<string>"))))
        pages.select(col("doc_id"),
          size(col("lines")).cast("long").as("n_lines"),
          (size(col("lines")) - size(filter(col("lines"), l => !boiler(l))))
            .cast("long").as("n_boiler"),
          Determinism.portableHash(
            array_join(filter(col("lines"), l => !boiler(l)), "\n")).as("clean_hash"))
      },
      Some {
        def dh(st: String) = s"(${Determinism.duckSeeded(st, "doc_id")} % 100)"
        val stopsIn = "('the','be','to','of','and','that','have','with')"
        val boiler = s"(length(l) - length(replace(l, '|', '')) >= 2 " +
          s"OR instr(l, '©') > 0 " +
          s"OR (len(list_filter(string_split(l, ' '), t -> t <> '')) <= 4 " +
          s"AND len(list_filter(string_split(l, ' '), t -> t IN $stopsIn)) = 0))"
        s"""WITH t AS (
          SELECT doc_id, $duckToks AS toks FROM documents
        ),
        pg AS (
          SELECT doc_id,
            (CASE WHEN ${dh("bnav")} % 2 = 0
              THEN ['Home | About | Contact'] ELSE [] END) ||
            list_transform(range(0, (len(toks) - 1) // 10 + 1),
              g -> array_to_string(list_slice(toks, g * 10 + 1, g * 10 + 10), ' ')) ||
            (CASE WHEN ${dh("bck")} % 4 = 0
              THEN ['Cookie settings | Privacy policy'] ELSE [] END) ||
            (CASE WHEN ${dh("bft")} % 3 > 0
              THEN ['© 2024 site' || CAST(${dh("bdm")} % 40 AS VARCHAR) ||
                '.example All rights reserved'] ELSE [] END) AS lines
          FROM t
        )
        SELECT doc_id,
          CAST(len(lines) AS BIGINT) AS n_lines,
          CAST(len(lines) - len(list_filter(lines, l -> NOT $boiler)) AS BIGINT)
            AS n_boiler,
          ${Determinism.duckHash(
            "array_to_string(list_filter(lines, l -> NOT " + boiler + "), chr(10))")}
            AS clean_hash
        FROM pg"""
      }),

    QueryDef("q147_dsir_importance_resampling",
      // DSIR — Data Selection via Importance Resampling (Xie et al.
      // 2023 by name, operators.Dsir): hashed unigram+bigram
      // bag-of-n-grams importance weights (target sample = every 10th
      // doc, raw = the whole corpus, B=512 buckets, add-1 smoothing)
      // and Gumbel top-k resampling (key = logw + G — the streaming
      // form of sampling-without-replacement ∝ w). Every per-bucket
      // log-ratio is an e6-floored integer BEFORE summation and the
      // Gumbel noise is hash-derived, so DuckDB replays weight, noise,
      // rank, and the kept set bit-for-bit. The global rank window is
      // demonstration-sized; at 100 TB the same key feeds an
      // orderBy-limit top-k or a quantile threshold.
      (s, dir) => {
        import graft.operators.Dsir
        import org.apache.spark.sql.expressions.Window
        val B = 512
        val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
        val isT = pmod(col("doc_id"), lit(10L)) === 0
        val feat = Dsir.hashedFeatures(docs, col("text"), B)
          .localCheckpoint(eager = false) // consumed by counts AND scores
        val score = feat.join(broadcast(Dsir.logRatioTable(feat, isT, B)), "b")
          .groupBy(col("doc_id")).agg(sum(col("r_e6")).cast("long").as("logw_e6"))
        val w = Window.orderBy(col("key_e6").desc, col("doc_id"))
        docs.select(col("doc_id"))
          .join(score, Seq("doc_id"), "left")
          .withColumn("logw_e6", coalesce(col("logw_e6"), lit(0L)))
          .withColumn("is_target", isT.cast("long"))
          .withColumn("g_e6", Dsir.gumbelE6(col("doc_id")))
          .withColumn("key_e6", col("logw_e6") + col("g_e6"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .withColumn("kept", (col("rnk") <= 100).cast("long"))
      },
      Some {
        import graft.operators.Dsir
        s"""WITH t AS MATERIALIZED (
          SELECT doc_id, $duckToks AS toks FROM documents
        ), ${Dsir.duckScoreCtes(512, "doc_id % 10 = 0")},
        f0 AS (
          SELECT d.doc_id,
            CAST(CASE WHEN d.doc_id % 10 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_target,
            CAST(COALESCE(s.logw_e6, 0) AS BIGINT) AS logw_e6,
            ${Dsir.duckGumbelE6("d.doc_id")} AS g_e6
          FROM documents d LEFT JOIN dsirscore s ON s.doc_id = d.doc_id
        )
        SELECT doc_id, is_target, logw_e6, g_e6,
          CAST(logw_e6 + g_e6 AS BIGINT) AS key_e6,
          CAST(row_number() OVER (ORDER BY logw_e6 + g_e6 DESC, doc_id) AS BIGINT) AS rnk,
          CAST(CASE WHEN row_number() OVER (ORDER BY logw_e6 + g_e6 DESC, doc_id) <= 100
            THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM f0"""
      })
  )

  /** Shared oracle scaffold for the BPE lanes: tokenize → distinct words
    * → RECURSIVE greedy encode (leftmost lowest-rank pair per step, the
    * exact [[Bpe.encodeWord]] rule) → `fin(w, syms, np)`. */
  private lazy val duckBpeCtes: String = {
    val rankMap = Bpe.duckRankMap(Bpe.PinnedMerges)
    val bestExpr = s"""list_sort(list_filter(
          list_transform(range(1, len(syms)),
            p -> [coalesce(($rankMap[syms[p] || ' ' || syms[p+1]])[1],
                   999999), p]),
          x -> x[1] < 999999))[1]"""
    s"""WITH RECURSIVE occurrences AS (
        SELECT doc_id, generate_subscripts(toks, 1) AS idx, unnest(toks) AS w
        FROM (SELECT doc_id,
          ${TextFunctions.duckTokens("lower(text)")} AS toks FROM documents)
      ), dw AS (
        SELECT DISTINCT w FROM occurrences
      ), enc(w, syms) AS (
        SELECT w, list_append(string_split_regex(w, ''), '${Bpe.Eow}')
        FROM dw
        UNION ALL
        SELECT w,
          list_concat(list_concat(
            list_slice(syms, 1, best[2] - 1),
            [syms[best[2]] || syms[best[2] + 1]]),
            list_slice(syms, best[2] + 2, len(syms)))
        FROM (SELECT w, syms, $bestExpr AS best FROM enc)
        WHERE best IS NOT NULL
      ), fin AS (
        SELECT w, syms, len(syms) AS np
        FROM (SELECT w, syms, $bestExpr AS best FROM enc)
        WHERE best IS NULL
      )"""
  }
}
