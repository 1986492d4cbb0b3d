import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

object PlanDump extends App {
  val spark = SparkSession.builder().master("local[8]")
    .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false")
    .config("spark.sql.adaptive.enabled","false") // static plans read better
    // q09's managed bucketed tables must land where reset() cleans up
    // (Bench/Verify/TestSpark use the same warehouse root)
    .config("spark.sql.warehouse.dir","/tmp/graft_warehouse")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.01"
  val notes = Map(
    "q01_pricing_summary" -> "one scan, partial agg before the single exchange; sums are pre-rounded BIGINTs so map-side combine is exact",
    "q03_nation_revenue" -> "all three dims broadcast; the fact table never shuffles for the joins (one exchange for the final agg)",
    "q08_scan_pushdown_monthly" -> "quantity filter pushed into the parquet scan (PushedFilters), 3-column ReadSchema",
    "q22_lsh_candidate_pairs" -> "signatures = explode + one hash-agg (map-side combined); band self-join shuffles only (doc_id, band, key)",
    "q25_ann_bruteforce" -> "query side broadcast, corpus never shuffles; per-query top-k via rank window over 8 partitions",
    "q28_simhash_neardup_pairs" -> "2-band OR-blocking: the self-join is bucketed on (band, key); every hamming<=1 pair collides on at least one band, so recall is structural, not probabilistic",
    "q45_pad_with_reuse" -> "pool-covers-batch path: TakeOrderedAndProject (per-partition top-k + merge) — no global window, no pool-sized broadcast; the cycling join only runs when pool < batch",
    "q46_epoch_reconcile" -> "consumed flag is a left join; the only unpartitioned window runs on <=60 rows (bounded by the pos filter), the corpus-wide order stays a (consumed, pos) sort KEY",
    "q50_bm25_topk" -> "tf/df are restricted to the query vocabulary BEFORE the broadcasts — both broadcast sides bounded by |queries| x 64 terms, never corpus vocabulary",
    "q60_asof_join" -> "union + single window pass per user: one shuffle, no range-join blowup",
    "q80_triplet_batch" -> "rank-pick negative join: window over (source, split) then equi-join; no theta join anywhere",
    "q83_triplet_fallback_lane" -> "cross-source fallback is a two-level split->source->record rank-pick: source ranks live on source-cardinality rows (broadcast), record ranks inside one (source, split) pool — no record-grained window keyed only by split",
    "q86_triplet_date_preference" -> "three preference lanes (same-date, any-date, cross-source), each a keyed rank-pick + equi-join; lane membership is a filter on per-pool counts, never a second pass",
    "q87_recipe_scheduled_selectors" -> "the 12-draw recipe schedule is broadcast onto the chunk table; each selector slot is ONE (draw, record_id)-keyed window — not a window per draw",
    "q29_ann_ivf_probe" -> "IVF: codebook broadcast onto the corpus for an n x K narrow assignment (argmin = min-of-struct aggregate, no window); the search joins only probed cells",
    "q36_winnowing_fingerprints" -> "gram hashes exploded to rows (Generate = lambda-inlining barrier), window mins via ONE frame-bounded keyed window, fingerprint set in ONE aggregate",
    "q37_kvp_decoration" -> "whole roll stream (dropout/variant/value/shuffle) + budget enforcement as codegen'd expressions on ONE scan: zero exchanges in the plan",
    "q38_denoiser_rescue" -> "gate 3: line construction and ratio lanes are narrow column work on one scan; only the rescue itself is the documented loop-carried UDF (BatchEvalPython-free - it is a Scala UDF inside the same stage)",
    "q89_auto_pair_stages" -> "stages B+C: one (draw, record_id)-keyed window for ranks, Stage-B filter on the keyed count, distinct pair via skip-the-anchor arithmetic, one keyed aggregation - no self-join",
    "q90_triplet_decorated" -> "decoration composes onto the base triplet join as pure post-join column work - same exchanges as q80, zero added shuffles; roll streams are codegen'd hash expressions",
    "q91_triplet_negative_anchor" -> "negativeSelector=RoleAnchor reuses the same pool/rank exchanges; only the negative-side projection narrows (atext instead of the ctoks array)",
    "q09_bucketed_join" -> "both scans show Bucketed: true, SelectedBucketsCount 8/8; NO exchange feeds the SortMergeJoin - the plan's only exchange is the final group-by",
    "q16_salted_skew_join" -> "the SortMergeJoin keys on (source, salt): the hot source key spreads over 8 salt partitions; dim side exploded x8 before its exchange",
    "q47_sentence_split" -> "per-character scan as ONE (doc, block)-keyed window pass (lag/lead flags + running sum share the same sort), then one keyed aggregation reassembles sentences - no UDF, no loop",
    "q85_triplet_bm25_negative" -> "BM25 negative backend: dl rides the tf aggregation, df is a keyed window over tf (no groupBy+rejoin), pool stats broadcast; the anchor x candidate product passes through ONE join",
    "q93_dedup_clusters" -> "cluster resolution: min-label propagation on the EDGE-INDUCED SUBGRAPH (frames sized by candidate pairs, not corpus), each round one keyed agg + one left join over the checkpointed symmetrized edge list; every round ends in localCheckpoint — an uncut lineage doubles per round (the round-6 OOM lesson); the final plan left-joins converged labels onto the corpus (absent = own cluster)",
    "q24_ngram_jaccard_pairs" -> "two-phase exact Jaccard: LSH bands propose candidates (q22's bucketed self-join — no n² pair space), then each candidate verifies EXACTLY via array_intersect of the two docs' distinct shingle-hash sets; the pair side is tiny so both verification joins broadcast it",
    "q94_corpus_curation" -> "the composed funnel: quality + language gates are scan-fused column expressions (no exchange of their own); the only shuffles belong to the dedup keep-list machinery (band keys, edge longs) and the #sources-sized final aggregate",
    "q95_embedding_dedup_clusters" -> "embedding near-dup resolution: bucketed cosine self-join proposes edges (coarser buckets than the ANN lane — recall over latency), then the same cached-edge min-label propagation as q93 resolves clusters",
    "q96_sql_surface_funnel" -> "SQL surface: the graft_* functions expand to the library's own expression trees at parse time, so the plan is identical to the Column-API form — scan-fused quality/language gates, one #sources-sized aggregate, and NO UDF nodes anywhere (look for the absence of BatchEvalPython/ScalaUDF)",
    "q97_decontamination" -> "decontamination: both sides reduce to distinct (doc, shingle-hash) LONGS before the overlap join; the eval side is the BroadcastExchange (benchmark suites are MBs) so the train scan reaches the hit aggregate with no shuffle of its own — at 100 TB the only wide ops are the two distincts, keyed by (doc, hash)",
    "q98_repetition_filters" -> "repetition gates: one Generate (3 gram kinds in a single explode), then two map-side-combined hash aggregates (doc,kind,gram) -> (doc,kind) -> doc pivot; no self-join, no window — linear in corpus size",
    "q99_sequence_packing" -> "sequence packing: ONE keyed window per shard (running token sum in seeded order); parallelism = shard count, sequences never cross shards; everything above the window is scan-fused narrow column work",
    "q48_stratified_sample" -> "stratified sample: the largest-remainder allocation runs on a #strata-sized frame (the only unpartitioned window) and comes back as a BroadcastExchange; the pick is one (stratum)-keyed rank window + broadcast join — no global ordering at corpus width",
    "q65_ivf_lloyd_refine" -> "Lloyd step: codebook broadcast onto the corpus for the n x K argmin (min-of-struct aggregate), recompute = one Generate to (cell, dim) rows + map-side-combined aggregation; centroids stay K x dim rows end to end",
    "q67_sequence_packing_split" -> "boundary-splitting packing: identical shard-keyed running-sum window as q99, then ONE Generate explodes each doc into the sequences it touches — slice arithmetic is scan-fused column work, so the zero-waste layout costs exactly one window + one explode",
    "q68_incremental_dedup" -> "incremental dedup: the join's LEFT side is only the NEW docs' band keys (filter above the Generate), the right side the full band table — candidate generation scales with the shard x collisions; old-old pairs never exist in the plan",
    "q53_temperature_allocation" -> "temperature mixing: the whole plan runs on a #sources-sized frame after the first aggregate — the sqrt weight is a scalar projection, the allocation the same bounded global window as q43",
    "q66_mixed_strategy_batch" -> "composed batch with per-recipe negative dispatch: each strategy lane (WrongArticle / WrongDate / QA) is a keyed rank-pick over only ITS slots, unioned by name; slot and negative frames are localCheckpoint()ed so the visible plan is batch-sized — the corpus-scale work (chunk derivation) happened once behind the isin pushdown, which is why the top shows LocalTableScan/Scan ExistingRDD rather than a corpus scan",
    "q69_multimodal_png_decode" -> "the real-codec lane is a NARROW object pipeline: DeserializeToObject -> MapPartitions (encode+inflate+de-filter per payload) -> SerializeFromObject with zero Exchange nodes — media bytes never shuffle; at 100 TB the decode cost is embarrassingly parallel and the only wide op would belong to a downstream consumer",
    "q55_bpe_word_counts" -> "BPE training's corpus-scale half: one Generate (explode to words) into a map-side-combined hash aggregate, then the deterministic top-N cap via TakeOrderedAndProject (per-partition top-k + merge, NO global sort) — the 300-row cap is what keeps the driver-side merge trainer corpus-independent",
    "q54_bpe_piece_counts" -> "distributed BPE encode: merge ranks ride ONE broadcast; the encode is a narrow mapPartitions (per-partition word memo, so each distinct word is segmented once per partition) and the per-doc counts are produced inline in the same pass — ZERO Exchange nodes; corpus text never shuffles",
    "q57_temporal_composed_batch" -> "TemporalOffset in the composed driver: the as-of neighbor join is a UNION of two equi-joins (source arm + taxonomy arm — never a theta join) with the left side semi-joined down to the batch's records via broadcast; the neighbor argmin is one keyed min_by aggregate; like every composed lane the visible top plan is batch-sized behind the checkpoint cuts",
    "q58_bm25_composed_batch" -> "BM25 negative backend in the composed driver: candidates/tf/stats semi-join to the BATCH's anchor sources (broadcast source list), df rides a keyed window over tf, the anchor x candidate product passes through ONE (source, term) join (the q85 shape), rotation is a rank filter — the scored subtree is checkpointed ONCE and feeds both the hit join and the fallback anti-join",
    "q59_fallback_composed_batch" -> "composed pool staging: same-date tier / same-source tier / cross-split fallback are three keyed rank-pick lanes unioned by name — lane membership is a filter on per-pool counts (dgs/nsrc/dcnt) joined from keyed windows, the fallback's source pick runs on a #sources-sized broadcast frame, and the suffixed recipe name is a projection",
    "q17_pair_composed_batch" -> "composed pair batch: the triplet core is derived ONCE (checkpointed), the pair explosion is one Generate over batch-sized rows — labels/reasons are projections, no second pass over the corpus",
    "q18_text_composed_batch" -> "composed text batch: text-recipe ticket schedule broadcast onto the epoch order; ONE selector pick window over the isin-restricted chunk table; seen-set dedup is a keyed row_number over batch-sized rows",
    "q100_file_corpus_index" -> "persisted-index page read: the page's index set comes from the exact affine permutation computed on the DRIVER (O(limit) work, indices only), then ONE parquet scan with the isin pushdown (PushedFilters: In(idx, ...)) joined to the broadcast serve order — a refresh never re-lists or re-sorts the corpus, and record bytes would be read by a page-bounded wholetext scan downstream",
    "q101_grouped_corpus_order" -> "grouped serve order: per-group item ranks are ONE (group)-keyed window; the window take-plan is a pure fold over the #DIRECTORIES-sized stats frame (driver, then broadcast) — the corpus-wide order materializes as rank arithmetic against that broadcast plan, no global window, no driver loop over items",
    "q102_grouped_refresh_pick" -> "capped grouped refresh: the wraparound walk is a projection ((pos - start) % total), per-group caps ONE keyed row_number, the serve cut a second row_number over the TAKEN rows only (bounded by groups x cap ≈ limit) — the only unpartitioned window runs on a batch-sized set",
    "q103_record_cache" -> "bounded record cache closed form: latest-per-id is a keyed window (the only corpus-wide shuffle, on the id key); the top-cap cut plans as TakeOrderedAndProject (per-partition top-cap + driver merge, NO global sort); the final rank window runs over <= cap rows",
    "q104_multimodal_gif_decode" -> "GIF lane: same narrow object pipeline as PNG — encode + LZW decode + palette lookup inside ONE mapPartitions, zero Exchange nodes; the variable-width bit unpacking is per-payload CPU work, embarrassingly parallel at any corpus size",
    "q105_multimodal_mp3_meta" -> "MP3 metadata lane: frame-header walk per payload in the same narrow mapPartitions shape — the parse cost is O(frames) pointer hops, no inflation, no shuffle; duration/rate/channels come out as plain columns for downstream relational filters",
    "q106_duplicate_spans" -> "exact substring dedup: ONE Generate per doc emits a 60-bit hash per token position (span text never leaves the scan), dup set = map-side-combined count over longs, occurrences come back via a hash-keyed semi join, and the union coverage is a (doc)-keyed running-max window — no suffix array, no n² pair space; shuffle mass ≈ one long per corpus token",
    "q107_lm_quality" -> "CCNet-style LM gate: the bigram model is two map-side-combined aggregates over the SMALL in-domain slice, then rides TWO BroadcastExchanges onto the candidate bigram stream (the KenLM-artifact analogue) — the 100 TB candidate scan's only wide op is its per-doc aggregate; per-bigram e6 floors make map-side partial sums exact",
    "q108_budget_selection" -> "token-budget selection: the global quality-ranked prefix rule WITHOUT a global window — a ≤101-row band histogram (broadcast) decides whole bands, and the single boundary band runs the only windowed pass; the narrow stats exchange decouples output parallelism from the scan's split count",
    "q109_incremental_span_dedup" -> "incremental substring dedup: the NEW shard's span hashes aggregate and LEFT-join the standing span index (an index a deployment maintains as a table); per-refresh cost ∝ |new| × collisions — the old corpus contributes one index derivation here and nothing at steady state, and old-old duplication never enters the plan",
    "q110_cluster_balanced_sample" -> "cluster-balanced selection: IVF argmin assignment against the BROADCAST codebook (min-of-struct aggregate, no window), then the largest-remainder allocation on a #cells-sized frame broadcast back over ONE per-cell rank window — the sample can't collapse onto a dense semantic region and nothing global ever sorts",
    "q111_pretraining_pipeline" -> "the whole pipeline as one plan: quality/language gates scan-fused, content-hash dedup one keyed window, span/decontamination/LM lanes each their audited shape (q106/q97/q107), selection the q108 histogram cutoff — the funnel aggregate at the top is #sources-sized; this is the plan a user gets when they chain the ML-facade stages",
    "q112_corpus_stats_report" -> "stats report: ONE keyed window per source (rank and count share the sort) feeding a conditional aggregate that pivots the three order-statistic quantiles — exact percentiles with no global ordering and no sketch",
    "q113_hll_distinct" -> "portable HLL: bucket/ρ are scan-fused integer projections of the portable hash (bin() string length — no float log near registers), the register table ONE map-side-combined max keyed by (source, bucket) — 64 rows per source at ANY corpus size — and the estimate a #sources-sized projection; exact countDistinct lanes ride alongside for the error report",
    "q114_bloom_decontamination" -> "Bloom-filtered decontamination: the filter build is one explode + ONE bit_or aggregate keyed by word index (≤128 rows at ANY eval-suite size — that bounded table is the BroadcastExchange, where q97 broadcasts the whole distinct shingle set); the probe is the train scan joined to the broadcast words, all-k-bits verdicts one keyed aggregate — one-sided error by construction, exact verdicts ride along",
    "q115_cms_heavy_hitters" -> "Count-Min estimates: the counter build is one explode (d cells per element) into a map-side-combined count keyed by (row, pos) — ≤2048 rows regardless of corpus size; estimation joins the 15 probed terms' cells against the BROADCAST sketch and takes one keyed min; rows merge across shards by plain addition, so a sharded deployment unions counter tables instead of re-scanning",
    "q116_bm25_index_refresh" -> "persisted BM25 postings + refresh: the index is TWO append-only relations — (doc, term, tf) postings and the #docs-sized doc lengths (dl covers all of a doc's terms, so it is persisted, never derived from a restricted frame); refresh is a UNION of the new shard's one-pass aggregates. Scoring restricts postings to the broadcast query vocabulary FIRST (tf semi-join), df derives from the restricted frame and the corpus stats from one map-side-combined aggregate over the lengths table — no corpus-wide aggregate remains on the score path, and the plan is identical to the from-text path above the tf/dl leaves, which is why a refreshed index hash-matches the full-corpus oracle",
    "q117_sample_quantiles" -> "bottom-k hash-sample quantiles: the sample cut is ONE keyed rank window + filter (per-partition top-k then merge) where the exact lane needs the full per-group sort; everything after the cut runs on ≤ k rows per group — the value-rank window, the quantile filters, and the est↔exact join are all sample-sized; at 100 TB only the hash-rank window sees the corpus, and it carries (group, id-hash) pairs, never the text")
  val out = new StringBuilder
  out ++= "# PLANS — formatted physical plans of representative queries\n\n"
  out ++= "Generated by PlanDump (AQE off for readability). What to look for\nin each plan is noted inline; regenerate with `sbt \"runMain PlanDump\"`.\n"
  for ((name, note) <- notes.toSeq.sortBy(_._1)) {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    out ++= s"\n## $name\n\n$note\n\n```\n"
    // keep the operator tree section, trim the verbose per-node detail;
    // cap the tree at 120 lines (cached-plan nodes re-print their whole
    // child tree, which buries the shape the note points at)
    val tree = plan.split("\n\n").head.linesIterator.toSeq
    out ++= (if (tree.size <= 120) tree
             else tree.take(120) :+ s"   … (${tree.size - 120} more lines)").mkString("\n")
    out ++= "\n```\n"
  }
  Files.writeString(Paths.get("/root/repo/PLANS.md"), out.toString)
  println("PLANS.md written")
  spark.stop()
}
