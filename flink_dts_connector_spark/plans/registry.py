"""Query registry: the single source of truth for the engine's query battery.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` and the pytest oracle
harness both iterate this registry, so the local tests exercise exactly the
same contract the driver's correctness gate does.

Determinism contract (why the oracle hash-match holds under parallelism):
sums over DOUBLE columns are order-sensitive in the last ulp, and Spark's
partition order is not deterministic. Every aggregate over money/quantity
therefore routes through *exact decimal arithmetic* — cast inputs to bounded
DECIMALs, multiply/sum exactly, cast the final result to DOUBLE — in BOTH the
Spark plan and the oracle SQL. Exact rational arithmetic is order-insensitive,
so both engines produce bit-identical doubles.

Magnitude constraint (measured): DuckDB's DECIMAL(38,6)→DOUBLE conversion is
only correctly rounded while the scaled numerator stays under 2^53, i.e.
absolute values < ~9.0e9 (Spark's BigDecimal path is always correct). Every
aggregate here peaks ≤ ~2.3e9 at the driver's sf0.01 gate (≈4× margin). A
future query summing larger magnitudes must reduce the final scale (e.g.
DECIMAL(38,2)) in BOTH engines before the double cast.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None for rows-only checked ops
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the battery."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name, fn, oracle, tuple(tags), doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import flink_dts_connector_spark.plans.advanced  # noqa: F401
    import flink_dts_connector_spark.plans.cdc_queries  # noqa: F401
    import flink_dts_connector_spark.plans.ext_queries  # noqa: F401
    import flink_dts_connector_spark.plans.functions  # noqa: F401
    import flink_dts_connector_spark.plans.ml_queries  # noqa: F401
    import flink_dts_connector_spark.plans.relational  # noqa: F401
    import flink_dts_connector_spark.plans.streaming_queries  # noqa: F401


# Explicit front-of-registry ordering. The first N names here lead the
# queries() dict so that a capped correctness run still covers every operator
# family (TPC-H core, CDC/changelog, windows, joins, events, and the full
# dedup/ANN/text/curation/multimodal/streaming surface) rather than whatever
# module import order happens to produce. Composition is one representative
# per plan shape; the remaining registry entries follow in registration order
# and are exercised by tools/sweep.py and the pytest oracle harness.
GATE_PRIORITY: tuple[str, ...] = (
    # TPC-H core shapes: agg, join+topk. r7 rotation: q6 (scan-filter-agg —
    # the bench sentinel, sweep-green) and q18 (agg-having-semijoin,
    # sweep-green) hand their slots to the r6/r7 flagship families below.
    # r12 rotation (per the r11 verdict: "displace redundant relational
    # twins — q1/q3 style rows have years of green history"): q1 and q3
    # rotate to sweep coverage; their shapes stay gated (agg-over-scan via
    # events_seasonal_decompose + sketch_hll_time_cube, join+topk via
    # win_topk_orders_per_customer + join_anti_customers_without_orders,
    # and every TPC-H query stays sweep- and bench-covered). The two slots
    # fund the r11-new bitstream parsers the r11 verdict asked gated:
    # Layer III side-info on the MIXED mono+stereo corpus (17/32-byte
    # layouts, scfsi, granule window-switching — the stronger variant) and
    # AVC SPS/PPS exp-Golomb headers (Annex-B start codes,
    # emulation-prevention de-escape, PPS→SPS cross-check)
    # r13 rotation (mid-round): the MIXED-CHANNEL spectrum tier SUBSUMES
    # the r11 side-info-mixed row — mp3_spectrum_mixed_features runs the
    # identical 17/32-byte side-info parse (per-channel scfsi, granule
    # window-switching, both layouts) before decoding the part2+part3
    # payload the side-info tier stops short of; the displaced
    # multimodal_mp3_sideinfo_mixed (gated since r12) stays sweep-green
    "multimodal_mp3_spectrum_mixed",
    # r13 rotation (mid-round): the AVC slice-header tier SUBSUMES the
    # r11 SPS/PPS config row — avc_slice_features runs the full §7.3.2
    # config parse (incl. the PPS→SPS cross-check and emulation
    # de-escape) before the §7.3.3 slice grammar, so the displaced
    # multimodal_avc_headers (sweep-green since r11) keeps its shape
    # gated through this row
    "multimodal_avc_slice_headers",
    # aggregation batteries
    "events_incremental_window_maintenance",  # r4 cont.: MV maintenance == full recompute (grouping sets stays sweep-green)
    # r9 rotation: the seasonal decomposition (integer-exact moments over a
    # day-grain pair frame, r8-new) takes the KMV slot — KMV stays
    # sweep-green and the mergeable-sketch family keeps two gated members
    # (hll_time_cube, histogram_quantiles) plus the streaming drift monitor
    "events_seasonal_decompose",
    # r7: the per-day HLL register time-cube (mergeable-sketch family
    # flagship — arbitrary date ranges answered by register max-merge)
    # takes the range-frame window slot (win_range_frame_and_navigation
    # stays sweep-green; navigation/frame shapes also live inside the
    # gated win_topk + events MV slots)
    "sketch_hll_time_cube",
    # windows
    "win_topk_orders_per_customer",
    # joins (anti; range-bucketized stays sweep-green via
    # range_join_purchase_views). r12 rotation: asof_purchase_last_view
    # rotates to sweep coverage — its bucketized-interval as-of machinery
    # stays gated via cdc_scd2_asof (the AS-OF time-travel read) and
    # stream_stream_interval_join (watermark-bounded interval state); the
    # slot funds the r12 streaming labelprop maintenance twin (the r11
    # verdict's item 3: delta ≡ rebuild over affected components only)
    "join_anti_customers_without_orders",
    "stream_labelprop_maintenance",
    # events — r12 rotation: events_sessionize rotates to sweep coverage
    # (its gaps-and-islands sessionization is the same machinery gated via
    # stream_funnel_stages' stateful CEP sequencer and text_rake_keywords'
    # stopword-gap islands); the slot funds the GROUP_OFFSETS startup mode
    # (r11 verdict item 8: commit-on-checkpoint → checkpoint loss → exact
    # broker-side resume, n_redelivered = 0 — the reference's second
    # startup mode, previously pytest-only)
    "stream_group_offsets_resume",
    # r10 rotation: binary-segmentation changepoint detection (r9-new:
    # exact SSE split scan via prefix sums) takes the Theil–Sen slot — the
    # day-grain pair-frame machinery Theil–Sen exercises is the same frame
    # binseg scans, and theilsen stays sweep-green
    "events_binseg_changepoint",
    # r11 rotation: events_robust_outlier_days rotates to sweep coverage
    # (its day-grain MAD frame is the same pair-frame machinery gated via
    # events_binseg_changepoint); the slot funds the r10-continuation
    # additions below
    # r4 cont. 2: bloom semi-join reduction takes the JSON-struct slot
    # (scalar/JSON rendering stays gated via cdc_value_zoo_render and
    # sweep-green via events_json_struct/extract)
    "join_bloom_prefilter",
    # CDC / changelog — r4 wave 2: all-or-none txn apply supersedes the
    # boundary-grouping gate slot (it consumes BEGIN..COMMIT batches, so
    # its oracle exercises the grouping too; boundaries stays sweep-green)
    "cdc_typed_changelog",
    # r4 cont. 2: the signed incremental checksum subsumes the signed-agg
    # slot (same +1/−1 retraction shape, now maintaining count + cents +
    # md5 drift checksum; signed_agg_revenue stays sweep-green)
    "cdc_incremental_checksum",
    "cdc_scd2_asof",  # r4 cont.: AS-OF subsumes the SCD2 build + time-travel read
    # r10 continuation rotation: the programmatic ingest router (r10-new:
    # choose_ingest_path picks Python-fused / JVM-typed / store-serve from
    # the declared schema + worker availability + reuse count, then runs
    # the chosen tier end-to-end) takes the value-zoo slot; the 13-kind
    # value render stays sweep-green via cdc_value_zoo_render and the same
    # shared render is inside the gated cdc_jvm_typed_changelog
    "cdc_routed_ingest",
    "cdc_txn_atomic_apply",
    # r7: the JVM varint-header decode + filter (the reference's lazy-parse
    # contract executed with zero Python, formats/jvmheader.py)
    "cdc_header_jvm_filter",
    # r9 rotation: the two JVM typed VALUE decodes (declared-schema, zero
    # Python — formats/jvmvalue.py, r8-new) take the fixed-wire-roundtrip
    # and store-signed-agg slots: they are the strongest members of the same
    # zero-Python codec family (fixed_wire stays sweep-green; the signed
    # store agg's +1/−1 retraction shape remains gated via
    # cdc_incremental_checksum and the store family via cdc_ingest_once)
    "cdc_jvm_typed_changelog",
    # r10 rotation: the WKB→WKT geometry changelog (r9-new: both byte
    # orders, EWKB SRID, JDK-4511638 shortest-ordinate repair — the hardest
    # member of the zero-Python jvmvalue family) takes the doc-changelog
    # slot; cdc_jvm_doc_changelog stays sweep-green and its declared-schema
    # string/array decode path is also inside cdc_jvm_typed_changelog
    "cdc_jvm_geom_changelog",
    # r11 rotation: the Hilbert-vs-Morton layout study (r10-new: 24-step
    # integer-CASE xy2d shared verbatim by both engines, measured shard
    # pruning under the same 2-D predicate) takes the z-order store-probe
    # slot — it is the stronger member of the same space-filling-curve
    # layout family; cdc_store_zorder_probe stays sweep-green and the
    # store-serving scan remains gated via cdc_ingest_once
    "layout_hilbert_vs_zorder",
    # deduplication family — r4 wave 2: directional containment joins; the
    # xxhash LSH twin and embedding-components rotate to sweep coverage
    # (md5 LSH + probe and cosine-pairs + text-components keep both shapes)
    # r9 rotation: shared_spans and containment rotate to sweep coverage —
    # their prefix-filter candidate machinery is the same as the gated
    # neardup_jaccard_pairs, and the gate keeps four dedup slots
    "dedup_exact_groups",
    # r13 rotation (per the r12 verdict item 6): neardup_jaccard_pairs
    # rotates to sweep coverage — its exact n-gram-Jaccard scoring is
    # re-executed verbatim inside the gated dedup_minhash_probe's verify
    # stage (every LSH candidate is re-scored with the full shingle sets),
    # so the shape stays gated; the slot funds the r12-new streaming
    # MinHash maintenance twin (delta ≡ rebuild over the band index,
    # O(corpus) state, the third member of the streaming-dedup trio)
    "stream_minhash_maintenance",
    # r11 rotation: deterministic label propagation (r10-new: synchronous
    # neighbor-label-mode rounds with a total tie-break, init = own id)
    # takes the connected-components slot — the finer-grained member of
    # the same iterative pair-graph family; dedup_components stays
    # sweep-green and its small-star rounds are the same
    # shuffle-on-the-pair-graph shape labelprop gates
    "graph_labelprop_communities",
    "dedup_minhash_probe",
    # similarity / ANN — r4 wave 2: product quantization replaces the
    # trained-IVF slot (same trained-codebook cascade, finer scorer;
    # trained IVF stays sweep-green)
    # r11 rotation: SemDeDup (r10-new: k-means clusters AS the dedup
    # blocking key → quantized-cosine pairs within clusters → keep the
    # member nearer its centroid) takes the k-means slot — it executes the
    # full integer-exact Lloyd's rounds INSIDE its blocking step, so the
    # iterative-clustering machinery stays gated; embed_kmeans_clusters
    # stays sweep-green
    "curate_semdedup",
    # r10 rotation: the grid-cell blocked spatial distance join (r9-new:
    # cell = radius, 3×3 candidate block, exact int64 verify — the engine's
    # spatial family) takes two slots: the histogram-quantile sketch slot
    # (quantiles stay sweep-green; see events_robust_outlier_days note) and
    # the IVF-PQ slot (the trained-codebook ADC cascade is also evaluated
    # inside the gated ann_recall_report; ann_topk_ivfpq stays sweep-green)
    # r11 rotation: the SALTED grid-blocked spatial join (r10-new: hot
    # cells split into sub-keys, bit-identical to the unsalted plan by
    # committed test) takes both spatial slots — it is the scale-hardened
    # variant of the same cell=radius blocking; events_spatial_neighbor_
    # pairs/stats stay sweep-green and the agg-over-pairs shape remains
    # inside the salted query's own aggregation
    "events_spatial_neighbor_pairs_salted",
    # r11 rotation: the day-grain robust-outlier MAD detector hands its
    # slot to RAKE below (see text family) — binseg keeps the day-grain
    # pair-frame family gated; events_robust_outlier_days stays sweep-green
    "ann_recall_report",  # r4 cont.: one slot evaluates all four ANN indexes vs brute force
    # r9 rotation: ann_topk_filtered rotates to sweep coverage (its IVF
    # index is also evaluated inside the gated ann_recall_report); its slot
    # goes to the RAG retrieval composition below
    # text analysis — r4 wave 2: the rare-bigram LM-style filter joins;
    # per-source token stats rotate out (the same explode+agg shape backs
    # bpe stats and the top-terms sweep entries)
    # r4 cont. 2: the Gopher-rule census builds on quality_metrics' exact
    # counts and adds the unpivoted per-rule verdict agg — it subsumes the
    # quality-scores slot (scores stay sweep-green)
    "text_quality_rules",
    # r11 rotation: RAKE keyword extraction (r10-new: gaps-and-islands
    # stopword-free runs, degree/frequency word scores, BIGINT phrase
    # scores) takes the slot freed by events_spatial_neighbor_stats — the
    # phrase-mining member of the text family joins the gate beside the
    # Gopher-rule census
    "text_rake_keywords",
    # r10 rotation: text_langid rotates to sweep coverage (its trigram
    # profile-join + per-doc argmax shape is the same vocab-join + re-agg
    # machinery gated via ml_nb_source_confusion); the slot goes to the
    # priority-sample curation flagship below
    # r5: the trained NB classifier subsumes the self-trained-LM-filter
    # slot (same explode + vocab-join + per-doc re-agg shape, plus the
    # cross-class argmin; rare_bigram_fraction stays sweep-green)
    "ml_nb_source_confusion",
    # r8: the privacy audit→repair ladder (k-anonymity generalization repair,
    # the analytics-family flagship of wave 3) takes the unigram-surprisal
    # slot — surprisal stays sweep-green and its explode+vocab-join+re-agg
    # shape remains gated via ml_nb_source_confusion
    "privacy_generalization_repair",
    # curation — r4 wave 2: chunking joins the gate
    "curate_leakage_repaired_split",  # r4 cont.: audit->repair loop (stratified stays sweep-green)
    "curate_pack_sequences",
    "curate_token_budget",
    # r9 rotation: mixture_resample rotates to sweep coverage (water-filling
    # budget cut shape also gated via curate_token_budget); slot goes to the
    # fuzzy-term SymSpell search below
    "curate_incremental_pipeline",
    # r6: the decode-once store flagship took the provenance-manifest slot.
    # r13 rotation (per the r12 verdict item 6): cdc_ingest_once — gated
    # since r6 — rotates to sweep coverage: its ingest-once ≡ re-decode
    # store scan is re-executed inside the gated cdc_routed_ingest (the
    # router's store-serve tier runs the same decode-once store end to
    # end) and the z-order store layout stays gated via
    # layout_hilbert_vs_zorder; the slot funds the r12-new MP3
    # scale-factor tier (ISO 11172-3 §2.4.2.7: slen table, per-block-type
    # band structures, scfsi granule-1 reuse — the bitstream step past the
    # gated side-info row)
    "multimodal_mp3_scalefactors",
    # r10 rotation: deterministic priority sampling (r9-new: key-seeded
    # exponential-race weights, exact integer tie-break — the
    # weighted-sampling member of the curation family) takes the
    # chunk-windows slot; curate_chunk_windows stays sweep-green and its
    # sequence-window machinery is also inside curate_pack_sequences
    "curate_priority_sample",
    # search (new family, r4 wave 2). r10 continuation rotation: the
    # reciprocal-rank-fusion hybrid retriever (r10-new) takes the BM25
    # slot — it runs the full integer-exact BM25 ranking INSIDE its fusion
    # (plus the idf-free tf retriever and the 1e6 div (60+rank) combiner),
    # so the BM25 shape stays gated; search_bm25_topk stays sweep-green
    "search_rrf_fusion",
    # r9 rotation (both r8-new): the RAG retrieval composition (ANN top-k →
    # hydrate → gate → re-rank, all joins keyed) and the SymSpell
    # deletion-neighborhood fuzzy match take the ann_topk_filtered and
    # curate_mixture_resample slots
    "search_rag_hydrated_topk",
    # r11 rotation: the trigram-indexed exact substring search (r10-new:
    # rarest-K probe with complete candidate set + contains() verify — the
    # pg_trgm/Zoekt design) takes the SymSpell fuzzy-terms slot; both are
    # probe-then-verify index shapes and search_fuzzy_terms stays
    # sweep-green with its deletion-neighborhood machinery pinned by pytest
    "search_trigram_substring",
    # multimodal — r6 gated BMP, r8 PNG, r9 GIF. r10 continuation rotation:
    # baseline JPEG (r10-new: DHT canonical Huffman, DC prediction, ZRL/EOB
    # runs, byte de-stuffing, zigzag, dequantize, float IDCT — strictly the
    # hardest decode machinery in the codec family) takes the PNG slot
    # (PNG stays sweep-green; its chunk-CRC walk is structurally the same
    # checked-container discipline the gated mp4 box walk carries).
    # r12 rotation: the COLOR baseline JPEG (r12-new: YCbCr 4:2:0 MCU
    # interleave, per-component table routing, three DC chains, fixed-point
    # color conversion) supersedes the grayscale slot — it executes the
    # full grayscale machinery (canonical DHT, entropy decode, de-stuff,
    # zigzag, dequantize, IDCT) as a strict subset of its own decode;
    # multimodal_jpeg_features stays sweep- and bench-green
    "multimodal_jpeg_color_features",
    # r11 rotation: the GENERAL sample-table demux (r10-continuation-new:
    # multi-entry stts runs, run-length stsc chunk map, stco offsets
    # verified to tile mdat against cumulative stsz) supersedes the strict
    # fixture box walk in the gate — it runs the same recursive box
    # grammar PLUS the chunking math every real demuxer needs;
    # multimodal_mp4_boxes stays sweep-green
    "multimodal_mp4_demux",
    # r11 rotation: REAL ID3v2.3 tag-frame parsing (r10-continuation-new:
    # TIT2/TPE1/TRCK frame grammar, ISO-8859-1 encoding byte, padding
    # discipline, loud v2.4/overrun rejection) takes the funnel-stages
    # slot vacated by events_robust_outlier_days above — the metadata half
    # of the MP3 container tier joins the gate beside the JPEG decode
    "multimodal_id3_metadata",
    # streaming (availableNow-bounded, rerun-safe) — r4: corpus ingestion
    # replaces stream_dedup_exactly_once (dropDuplicatesWithinWatermark is
    # inside it, plus the dts source + gate + manifest composition)
    "stream_funnel_stages",  # r4 cont.: stateful CEP sequence machine (hourly windows stays sweep-green)
    # r12 rotation: the streaming SemDeDup maintenance twin (r11-new,
    # named by the r11 verdict for gating: static k-means model, per-batch
    # delta pairs only, monotone order-independent loser folds, converged
    # survivors ≡ the batch rebuild bit-exactly) takes the incremental-
    # curate slot — the strongest member of the same incremental
    # CDC→curation family; stream_incremental_curate stays sweep-green and
    # its gate→manifest composition remains gated via stream_corpus_ingest
    # machinery inside stream_scd2_maintenance + curate_incremental_pipeline
    "stream_semdedup_maintenance",
    "stream_scd2_maintenance",  # r4 cont.: live SCD2 merges == batch closed form (corpus_ingest stays sweep-green; incremental_curate keeps the CDC->curation shape gated)
    "stream_stream_interval_join",
    "stream_partition_watermarks",
    # r10 continuation rotation: the wire-level Kafka failover drill
    # (r10-new: in-process broker, start-by-timestamp, cluster-switch →
    # restart → re-seek with the no-gaps contract — the highest-risk gap
    # the r9 verdict named) takes the late-data slot; stream_late_data_gate
    # stays sweep-green and watermark-driven late-row handling remains
    # gated via stream_partition_watermarks + stream_stream_interval_join
    # (state eviction) + stream_drift_monitor (watermarked fold)
    "stream_failover_reseek",
    # r6 gated the streaming sketch-maintenance family via CMS convergence;
    # r8 rotates the slot to the wave-3 flagship of the same family — the
    # streaming TV-distance drift monitor (O(cells) state folded across
    # micro-batches vs the batch closed form; CMS convergence stays
    # sweep-green and the turnstile CMS shape is also inside the gated
    # cdc_incremental_checksum's signed maintenance)
    "stream_drift_monitor",
)


def all_queries() -> dict[str, Query]:
    _load_all()
    missing = [n for n in GATE_PRIORITY if n not in _REGISTRY]
    if missing:
        raise KeyError(f"GATE_PRIORITY names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in GATE_PRIORITY}
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def get_query(name: str) -> Query:
    _load_all()
    return _REGISTRY[name]
