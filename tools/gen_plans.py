"""Generate PLANS.md: formatted physical plans of headline queries with
scale commentary."""
import sys
sys.path.insert(0, "/root/repo")
from scache_spark.registry import REGISTRY, _ensure_loaded
from scache_spark.session import get_session
from scache_spark import plans
_ensure_loaded()
spark = get_session("plans")
sf = "/root/testdata/sf0.1"

COMMENT = {
    "flagship_revenue_by_region": "One shuffle join (lineitem⋈orders, co-partitioned by AQE) + BroadcastHashJoins for the dims (nation/region hard-hinted as bounded dims; customer's BHJ is AQE's threshold choice at this SF — at 100 TB it degrades to SMJ instead of OOMing) + single-exchange aggregate. Date filter pushed to the orders scan.",
    "pricing_summary": "Partial HashAggregate map-side → one tiny Exchange on the 6-value key → final aggregate. PushedFilters carries the shipdate bound into the parquet reader.",
    "broadcast_join_parts": "Filtered part picked as the broadcast side by AQE (no hard hint — part grows with SF); the fact side is never shuffled for the join at this scale — one Exchange total (final aggregate).",
    "dedup_minhash_pairs": "Shingle+signature subtree computed once (InMemoryTableScan on reuse), band-key self-join produces candidates, exact Jaccard verified only on candidates.",
    "bloom_filter_join_prune": "Semi-join whose fact side is pre-pruned by a Catalyst-injected runtime bloom filter under shuffle-join conditions (see tests/test_plans.py).",
    "kmeans_two_rounds": "Nearest-centroid assignment is a min-struct HashAggregate (partial_min map-side): the shuffle carries n rows, not K·n as a windowed argmin would. Centroid update is one explode + (cell,pos) aggregate — K×DIM rows of state regardless of corpus size.",
    "lpt_schedule": "Distributed partial aggregation squeezes the fact table to R predicted task sizes; the LPT min-heap greedy runs in ONE grouped-map pandas task over those R rows — scheduling state never touches the driver and never scales with input size.",
    "dedup_embedding_lsh": "Hyperplane buckets computed in-projection (no shuffle), bucket-key self-join bounds the candidate pair space, cosine verified on candidates only — the unlabeled-corpus scale path for embedding near-dup.",
    "event_log_parse": "Render→parse is narrow (per-line get_json_object/regexp/from_json+explode inside one WholeStageCodegen span); the only exchanges are the per-task regroup and the final small (stage,host) aggregate.",
    "tpch_q18_large_volume_orders": "HAVING pre-aggregates lineitem by orderkey FIRST (partial_sum map-side), the surviving ~1% of keys broadcast into orders and customer, top-20 is TakeOrderedAndProject — the fact table shuffles once, as one row per order.",
    "tpch_q17_small_quantity_revenue": "The correlated per-part average is a groupBy(partkey) aggregate re-joined BROADCAST (brand filter bounds it): one scan of the fact, no self-shuffle, threshold compared against the 4dp-rounded average.",
    "bucketed_join_revenue": "Both sides written bucketed+sorted on the join key: SortMergeJoin with ZERO Exchange on either input — the write-time layout is the shuffle, paid once; only the final 5-group aggregate exchanges.",
    "pagerank_event_graph": "One windowed pass builds the edge list (the sessionization shuffle); all three iterations are BroadcastHashJoins + partial aggregates over ≤|types|² rows — no sort-merge join anywhere in the unrolled loop.",
    "range_bucket_join": "A non-equi interval join with NO equi key — executed as an equi-join on 4h epoch buckets (windows explode to every bucket they span, events map to one) with the range predicate as a residual filter: no BroadcastNestedLoopJoin, no cross product, shuffle key uniformly distributed.",
    "tpch_q19_disjunctive_revenue": "Catalyst splits the 3-branch brand/size/quantity disjunction: the brand IN-set prunes part before broadcast AND the OR-of-quantity-ranges is pushed into the lineitem parquet scan (PushedFilters shows the extracted Or) — one broadcast join, one exchange.",
    "tpch_q21_waiting_suppliers": "The EXISTS / NOT-EXISTS pair is an exact rewrite to one per-order aggregate (distinct suppliers vs distinct LATE suppliers) re-joined on orderkey — two shuffles of (orderkey, suppkey, late) triples instead of two correlated self-joins of the fact table.",
    "inverted_index_postings": "Documents tokenize and dedup to (token, doc_id) pairs inside the map stage (partial_count + distinct combine): the text column never reaches an exchange; the posting-list sort+serialize happens per token group after one shuffle of integer pairs.",
    "training_corpus_e2e": "The whole ingestion funnel in one plan: gate signals + content hash in a single narrow projection (one corpus scan), survivor decision as a (hash, keep_id) aggregate, funnel counts as one more aggregate — two exchanges total and the text never shuffles.",
    "dedup_substring_pairs": "Exact duplicated-span detection: windows md5'd in-projection so only (16-byte hash, doc_id) pairs reach the exchange; the BETWEEN-2-AND-16 frequency cutoff bounds per-window fan-out before the pair self-join — the candidate space is per-bucket, never O(n²).",
    "setjoin_prefix_filter": "EXACT set-similarity join: the rank dictionary is a vocab-sized build; per-doc prefixes (rarest shingle ranks) are the zero-false-negative candidate filter, and the quadratic verify touches candidates only — int-rank arrays, no probability of a miss.",
    "bloom_bitmap_membership": "The 512-word filter is built by a bit_or aggregate (map-side combined) and BROADCAST for the probe: a 4 KB summary prunes the fact side in-map, the same ship-a-summary move as the reference's 1-byte MapStatus size vectors.",
    "embedding_int8_quantize": "Two map-side-combinable passes: a 64-row range table (broadcast back) then encode+audit in one aggregate — the vector corpus is scanned twice and shuffled never.",
    "join_size_histogram_estimate": "Predicts a shuffle join's output size WITHOUT running the join: per-key counts collapse map-side, the 16-row histograms are the only cross-side state — the SQL analog of pre-execution reduce-size prediction.",
    "sequence_packing_bins": "Shard-local next-fit-decreasing packing: one grouped-map pandas pass per source shard over (doc_id, token_count) pairs only; packing state never leaves the shard and the text never moves.",
    "weighted_priority_sample": "Weight-adaptive fixed-size sampling: top-(k+1) priorities via TakeOrderedAndProject per-partition heaps (no global sort), Horvitz-Thompson audit aggregates map-side combined.",
    "ann_lsh_multiprobe": "The query bucket plus its 8 Hamming-1 neighbors selected by one xor-in-set predicate against a 1-row broadcast — on a bucket-partitioned corpus this is 9 partition reads; no explode, no added shuffle over single-probe.",
    "leakage_safe_split": "Split key is a hash of the duplicate-cluster representative, so clusters move between splits as a unit; the leak counter is computed in the same plan and must be zero — one hash aggregate plus a broadcast-size cluster map.",
    "source_token_kl": "Token counting collapses map-side; the top-200 vocabulary is TakeOrdered then broadcast into both the per-source count join and the zero-completing grid — per-source state is |sources|×200 rows regardless of corpus size.",
    "cdc_snapshot_diff": "Two snapshots meet in ONE full-outer key join; unchanged rows are dropped inside the join's filter before any further movement — with both sides bucketed on the key the join itself needs no exchange.",
    "udtf_chunk_spans": "The Python table function expands rows inside the scan stage (BatchEvalPythonUDTF directly over the file scan) — one-to-many with zero shuffle.",
    "pareto_front_orders": "The quadratic NOT-EXISTS dominance query as ONE window pass: sort each group by price, keep rows beating the running best date — O(n log n) at any group size, no self-join anywhere.",
    "sequence_pattern_match": "Event history collapses to a per-user string in one grouped ordered-agg; behavioral patterns are regex counts in codegen — sequence mining with one shuffle and constant per-user state.",
    "content_defined_chunks": "Boundaries are a function of content (token hash ≡ 0 mod 16), so edits shift only the chunks they touch; one windowed boundary-cumsum plus one grouped ordered-hash.",
    "skew_diagnosis_report": "The pre-join skew report: per-key counts collapse map-side, per-side stats are a handful of rows — the MapStatus size vector at key granularity, deciding shuffle vs AQE-split vs salting.",
    "hll_sketch_union_bound": "Per-type HLL sketches union into a corpus estimate without touching raw data — the re-aggregatable sketch-table pattern; the bound verdict keeps the output engine-exact.",
    "time_decayed_engagement": "Closed-form exponential recency weighting: integer second ages, one exp per row, one map-side-combinable aggregate — the order-independent alternative to a recursive EMA.",
    "minhash_merge_property": "Per-part signatures merge by element-wise min into the whole-set signature — verified per doc; the law that lets new corpus shards be signed independently and unioned.",
    "pq_encode_codes": "PQ encode: the M×K codebook joins as a broadcast; the per-subvector argmin is a min(struct) hash aggregate (partial map-side — the shuffle carries one row per subvector, not K). At full scale the codebook folds into literal constants: no join, no shuffle.",
    "pq_adc_topk": "ADC scoring reads CODES only: the query expands to an 8×16 lookup table broadcast to every task; each corpus vector costs 8 table probes + one small-key aggregate — the float vectors are never touched at query time.",
    "retrieval_rerank_two_stage": "Two-stage serving: the query set broadcasts; stage-1 probe is an xor-in-set predicate (9/256 bucket rings, no explode); stage-2 exact cosine runs only on the shortlist; per-query top-3 is a bounded window over candidate counts.",
    "embedding_centroid_outliers": "Centroid build is one partial-aggregated (label, dim) mean; the distance pass folds 64 dims in fixed order against the BROADCAST centroid arrays — the big side is scanned once, never exploded, never shuffled except the per-label stats rows.",
    "cooccurrence_brand_pairs": "A-priori shape: DISTINCT (order, brand) BEFORE the self-join bounds pairs by basket size²; both self-join sides share one shuffle partitioning (exchange reuse); marginals and the 1-row total come back as broadcasts for lift.",
    "gaps_islands_streaks": "The date-minus-row_number constant-group trick: one shuffle on user_id serves the window, the island aggregate, AND the per-user ranking — streaks of any length with zero self-joins.",
    "ewma_anomaly_flags": "14 lag columns with literal 0.7^k weights — the smoothing is pure projection after one window shuffle on event_type; daily totals round BEFORE smoothing so the flag compares bit-identical doubles across engines.",
    "lsh_design_curve": "Design-time tool: measured Jaccard deciles (bounded blocked sample) scored with the closed-form 1-(1-s^r)^b candidate curve for three (b,r) layouts — powers expanded to products, 11-row output, run BEFORE committing a 100 TB banding.",
    "stream_chained_window_agg": "Window-of-window in ONE streaming query: 5-min partials re-aggregate into hourly rollups via window_time(); the watermark propagates through both stateful stages so each drops state as its windows close.",
    "ann_ivf_pq_topk": "IVF-PQ composition: broadcast centroids pick the query's 2 cells (candidate set = 2/16 of the corpus, and on a cell-partitioned layout 2/16 of the SCAN); shortlisted codes score via the broadcast 8x16 ADC table — no float vector is touched at query time.",
    "text_bm25_topk": "BM25 serving plan: text tokenizes map-side to (doc, tok, tf) — the raw text never exchanges; N/avgdl ride a broadcast 1-row aggregate, the <=5 query terms broadcast into the postings join, and the top-20 on the ROUNDED score is TakeOrderedAndProject (per-partition heaps, no global sort).",
    "text_token_entropy": "Shannon entropy via ln(L) - sum(tf*ln tf)/L: TWO partial-aggregatable groupBys — (doc, tok) then doc — carry integer-sized rows; no per-token probability column, no window, nothing holistic.",
    "dedup_semantic_cells": "SemDeDup shape: broadcast-K min-struct assignment (the corpus never shuffles to find its cell), per-vector norms precomputed BEFORE the within-cell self-join so each candidate pair costs one dot product, canonical-min aggregate map-side combinable.",
    "blocktrace_source_agg": "A custom Python DataSource scan: partitions() plans 8 map-range InputPartitions, rows generate per-task (zero I/O, nothing through the driver), and the per-reducer rollup is an ordinary partial-agg exchange over the generated relation.",
    "lpt_schedule_locality_swap": "The full reference heuristic: one distributed aggregation collapses the fact table to RxK locality cells; LPT packing AND the coin-gated locality pull run in a single grouped-map task whose state is K host loads — the 100 TB never moves for scheduling.",
    "schedule_policy_compare": "Three scheduling policies race over ONE aggregated task-size frame: round-robin, LPT, and the ideal lower bound — K-host-sized comparison state, the simulator's evaluation loop as a query.",
    "compaction_plan_ffd": "OPTIMIZE planning: the file manifest (one row per FILE — a metadata scan at 100 TB, not a data scan) bin-packs first-fit-decreasing in one grouped-map task; output is the merge-group assignment a rewrite job executes.",
    "woe_iv_binning": "Supervised feature screen with NO global window: equal-width bins from a broadcast (min,max) 1-row aggregate make bin assignment map-side arithmetic; WOE/IV are one small groupBy plus a broadcast total.",
    "psi_drift_bins": "PSI = the window-free drift statistic: broadcast extrema -> map-side bin assignment -> one combined groupBy -> broadcast totals; contrast KS, whose ECDF needs an ordered global walk.",
    "multimodal_phash_neardup": "Image near-dup chain: blobs decode and hash inside mapInPandas (Arrow batches, constant memory) — 4 band ints per asset exchange, 2 KB payloads never do; banded equality bounds candidates, bit_count XOR verifies exactly.",
    "hybrid_rrf_retrieval": "Hybrid serving: both rank lists are TakeOrdered-bounded 20-row frames, the fusion is a full outer join of two tiny sides, and every rank is computed over ROUNDED scores with id tie-breaks — cross-engine-deterministic fusion, no full-corpus sort.",
    "dedup_incremental_batch": "Ingestion-shape dedup: the NEW batch's band keys broadcast against the corpus signature table (asymmetric join, never a union self-join); Jaccard verifies candidates only and each arrival resolves to its min-id corpus duplicate.",
    "blocklist_term_screen": "Safety screening: per-doc DISTINCT tokens meet the broadcast governance blocklist map-side; content never shuffles, one small per-doc aggregate emits the verdict.",
    "holt_linear_forecast": "Forecasting as aggregate-then-tiny-recursion: one partial-agg groupBy collapses the stream to ~30 daily rows (rounded BEFORE smoothing), the sequential Holt recursion runs in a single grouped-map task with (level, trend) state.",
    "welch_t_test": "Fully algebraic inference: one (n, mean, variance) pass per group — partial-aggregatable — then t and the Welch-Satterthwaite df are closed-form over six numbers.",
    "neyman_allocation": "Sampling design from one algebraic pass: per-stratum (count, stddev) plus a broadcast normalizer yield the minimum-variance allocation; the actual sample then applies deterministic per-stratum hash rates.",
    "multimodal_audio_energy": "Audio framing: blobs decode inside mapInPandas Arrow batches and fan out to fixed 64-sample RMS windows in-batch — one scan, no shuffle, integer-exact sums with only the final sqrt rounded.",
    "try_arithmetic_battery": "Error-safe semantics: try_divide/try_multiply/try_sum degrade poisoned rows to countable NULLs inside codegen — the oracle states the expected degradation as predicates, verifying the ANSI-safety contract itself.",
    "hll_rolling_distinct": "Windowed distinct without re-touching raw data: ONE (day,user) distinct feeds both paths; each row/sketch explodes map-side into its <=3 calendar windows (no day-spine self-join), daily HLL sketches re-union per window, and the exact rolling count rides the same frame for the in-query verdict — 6 exchanges, down from 13.",
    "variance_partial_merge": "Chan's merge over shard partials: each half reduces to (n, mean, M2) map-side; the merge is closed-form arithmetic on six numbers per group and must equal the full-scan variance — second-moment monitors update from per-shard state.",
    "retrieval_ndcg_at_k": "Index-quality scoring: both rankings are 10-row TakeOrdered frames over rounded cosines, relevance joins by id, and the discounted sum plus closed-form IDCG are constant-sized arithmetic.",
    "k_anonymity_audit": "Governance gate: one partial-aggregated groupBy to |classes| rows, audit math over that frame — at 100 TB the release decision costs one aggregation.",
    "dp_noisy_counts": "Private release: counts collapse map-side; the Laplace inverse-CDF draws from a seeded hash-uniform per group, so the release is testable bit-for-bit and swaps to a CSPRNG without touching the plan.",
    "zipf_slope_fit": "Corpus statistics at scale: token counts collapse map-side, the rank window runs on a TakeOrdered 500-row frame, and the fit is one algebraic regr_slope aggregate.",
    "heaps_law_fit": "Ten prefix points from ONE pass of conditional distinct aggregates; at 100 TB each exact distinct swaps for a per-prefix HLL sketch with the same plan shape; the fit is the same distributed OLS.",
    "interval_union_minutes": "One user-keyed shuffle serves the island-flag window, the cumulative island id, and both aggregates; all time math stays in integer microseconds until the final division.",
    "stream_stream_left_outer": "Watermark-finalized outer join: matches emit eagerly; unmatched purchases emit with sentinel nulls in the no-data batch once the watermark proves no click can still arrive — bounded state on an unbounded stream.",
    "training_shard_assignment": "Global random permutation without a global sort: md5 keys hash-shuffle docs uniformly across shards, per-shard windows number positions in parallel — re-runs and single-shard rebuilds reproduce byte-identical training order.",
    "token_budget_selection": "Global ordered selection as a DISTRIBUTED prefix sum: fixed-range buckets of the sort key cumsum in parallel, a tiny bucket-total table provides offsets — same exact integers as the naive single-partition global window the oracle runs.",
    "curriculum_interleave": "Round-robin curriculum via closed-form position arithmetic (rank-1)*n_sources+source_index: per-source windows only, source index and count broadcast — mixture ratios stay stable through the epoch with no global sort.",
    "attribution_linear_split": "Linear multi-touch attribution: equi-join on user with the 30-minute window as residual filter, per-purchase click count as a window over the SAME shuffle, credit aggregate on top — one exchange chain end to end.",
    "dedup_span_rewrite": "C4-style corpus REWRITE: one explode to (doc, span), one span-frequency aggregate (map-side combinable — state is distinct spans, never pairs), one shuffle join back on span, one per-doc aggregate. No pair space, no window, no driver state: the whole rewrite is two exchanges over integer-ish rows.",
    "dsir_importance_weights": "DSIR importance weighting: bucket counts collapse map-side to 256 rows; the log-ratio model BROADCASTS back onto the token stream (the corpus never shuffles for scoring); per-doc sums partial-aggregate and the top-20 is TakeOrderedAndProject.",
    "ann_ivf_nprobe_recall": "Index-quality evaluation with the real IVF search structure: per-(query, cell) shard top-10 heads first (each window partition = one shard scan), truth and every nprobe variant re-rank ONLY the bounded heads; probe cost comes from a 16-row size table, not a re-scan; reused subtrees (assignment, heads) materialize once via localCheckpoint.",
    "ccnet_perplexity_buckets": "CCNet quality bucketing with NO global sort: per-doc surprisal materializes once (vocab broadcast onto the token stream), tertile boundaries come from a 512-bin cumulative map (bounded window over the histogram), docs join the 64-row bin map broadcast — the equi_depth scan-assign shape at corpus scale.",
    "tokenizer_fertility_stats": "Tokenizer economics with ZERO token shuffle: subword and byte counts fold inside the token array with higher-order functions (one narrow projection); the only exchange is the |langs|-row final aggregate.",
    "bpe_merge_rounds": "Distributed BPE training: the corpus collapses ONCE to a (word,freq) vocabulary; each unrolled round counts symbol pairs map-side-combined over the vocab table, the 1-row winning merge broadcasts back, and the merge applies as two sentinel-padded replaces — per-round cost is vocabulary-sized, never corpus-sized.",
    "tseries_subsequence_topk": "Data-series search: the raw stream collapses map-side to per-(type,day) totals, so per-series state is the DAY count; every window and its moments fold inside the bounded array; the z-distance scoring joins the 1-row broadcast query pattern and the exact top-5 is TakeOrderedAndProject.",
    "sentiment_lexicon_score": "Lexicon sentiment with the lexicon folded INSIDE the token array as literal IN-sets — one narrow projection, one |sources|-row aggregate, zero token shuffle; a broadcast join replaces the literals when the lexicon outgrows the plan.",
    "task_host_utilization_align": "The trace-alignment tool as one plan: TaskStart/TaskEnd JSON parse into per-task spans (one groupBy), monitor samples bucket to 60s epochs, and the span overlap is an equi-join on (host, bucket) with BETWEEN as residual — interval alignment with no BroadcastNestedLoopJoin at any scale.",
    "deletion_plan_partitions": "Delete planning: the subject-key request batch joins BROADCAST, hit counting partial-aggregates per partition key, and the output is one metadata-scale row per partition carrying the skip / deletion-vector / rewrite decision.",
}

out = ["# PLANS — physical plans of headline queries (sf0.1, local[32])",
       "",
       "Generated by `python tools/gen_plans.py`; regenerate after plan-affecting changes.",
       "Each plan is the one the engine was *designed* to produce — the",
       "commentary states why it survives a 100× scale-up.", ""]
for name in COMMENT:
    df = REGISTRY[name].fn(spark, sf)
    p = plans.formatted_plan(df)
    # keep the tree + scan details, drop verbose node I/O lists
    lines = p.splitlines()
    tree_end = next((i for i, l in enumerate(lines) if l.strip() == "" and i > 3), len(lines))
    tree = "\n".join(lines[:tree_end])
    details = "\n".join(l for l in lines if "PushedFilters" in l or "ReadSchema" in l)
    out += [f"## {name}", "", COMMENT[name], "", "```", tree, "", details, "```", ""]
open("/root/repo/PLANS.md", "w").write("\n".join(out))
print("written", len("\n".join(out)), "chars")
