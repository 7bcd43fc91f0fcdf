"""Driver-facing correctness suite.

Each entry maps one operator/query shape from SURVEY.md §2 onto the
driver's synthetic TPC-H-ish testdata (TESTDATA.md), as:

- a PySpark implementation ``(spark, sf_dir) -> DataFrame``, and
- (where SQL-expressible) a DuckDB oracle SQL twin run on the same
  parquet files.

Column names are aliased identically on both sides; numeric discipline
(see ``suite.common``) keeps value-hashes engine-independent.

Registration order is significant: external graders walk ``SUITE`` in
insertion order and may only grade a prefix of it, so the dict is
rebuilt below into an explicit priority order — the reference-parity
queries (q*/etl_*/v_*), the LLM-data-pipeline operators (ext_*), the
UDF/streaming surface, and the scale-relevant relational operators
first; simple single-operator capability rows (each also covered by
pytest differential tests and ``tools/diffcheck.py``) take the tail.
"""

from marketing_etl_analytics_spark.suite.registry import SUITE, SuiteEntry, register

# Importing the modules populates SUITE via their register() calls.
from marketing_etl_analytics_spark.suite import core  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import etl_builds  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import views  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import relational  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import ext  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import ext_scale  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import ext_pipeline  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import udf  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import timeseries  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import funnels  # noqa: E402,F401
from marketing_etl_analytics_spark.suite import graphs  # noqa: E402,F401

# Priority prefix (everything registered but not listed here keeps its
# module registration order after the prefix). Window policy for the
# r4 driver grading (the driver grades a 50-slot prefix; r3 graded the
# previous 50-slot prefix, CORRECTNESS_r03 — all green):
#
# Round-4 consolidation (VERDICT r3 #8): 25 single-assertion rows were
# merged into 9 wide rows or retired outright, shrinking the suite
# from 114 to 98 entries so that EVERY entry is driver-graded in
# r3 ∪ r4 — no two-round-stale rows remain. The 50-slot r4 window
# holds, in order:
#   (a) the 8 standalone never-driver-graded entries (VERDICT r3 #1;
#       5 more of the original 13 were absorbed into the merged rows
#       below, which are themselves in-window),
#   (b) the 9 merged consolidation rows plus rel_window_frames (which
#       absorbed the RANGE-interval columns) — new names, never
#       graded,
#   (c) the 2 r3-green entries whose code changed this round
#       (ext_semantic_dedup: k-means||-style seeding; stream_cdc_apply:
#       deterministic winner tiebreak),
#   (d) the 18 reference-parity core entries last graded in r2
#       (q0-q5/q8-q11, the 5 ETL builds, the 3 views — all golden-
#       tested against the reference's own CSV outputs, code
#       unchanged, but two-round-stale without an r4 row),
#   (e) the 12 remaining entries last graded in r2/r1 with unchanged
#       code.
# The 48 entries past the window are exactly the r3-green rows whose
# code is unchanged since CORRECTNESS_r03 — every one of them carries
# a current driver hash-exact row. stream_sessionize stays the
# contract-allowed rows-only entry (pytest-equal to its oracled batch
# twin; stream_session_window is its fully-oracled sibling).
_PRIORITY = [
    # (a) never-driver-graded standalone entries
    "stream_sketch_hll", "ext_graph_label_propagation", "stream_topk_trending",
    "ext_rolling_median", "stream_sketch_countmin", "stream_dedup_ingest",
    "ext_rarity_score", "ext_bpe_merge_round",
    # (b) round-4 merged consolidation rows (never graded under these
    # names; each absorbs 2-3 retired r1/r2-green rows)
    "rel_window_frames", "rel_rank_suite", "rel_join_variants",
    "rel_semistructured", "rel_pivot_unpivot", "rel_grouping_lattice",
    "rel_stats_suite", "rel_pandas_suite", "ext_text_stats",
    "ext_doc_filters",
    # (c) r3-green entries with code changed this round
    "ext_semantic_dedup", "stream_cdc_apply",
    # (d) reference-parity core, last graded r2 (golden-tested,
    # unchanged, but two-round-stale without an r4 row)
    "q0_pnl_summary", "q1_top_sellers", "q2_top_profit",
    "q3_margin_having", "q4_channel_kpis", "q5_repeat_drivers",
    "q8_spend_waste", "q9_retention",
    "q10_demographics", "q11_frequency_segments",
    "etl_dim_product", "etl_dim_date", "etl_dim_campaign_parse",
    "etl_fact_sales", "etl_upsert_dedup",
    "v_channel_daily", "v_kpi_channel", "v_kpi_campaign",
    # (e) remaining r2/r1-graded entries, code unchanged
    "rel_setops_all", "rel_asof_join", "rel_range_join",
    "ext_dedup_exact", "ext_sessionize", "ext_curation_pipeline",
    "ext_sample_stratified", "ext_multimodal_meta",
    "stream_sessionize", "stream_enrich_join",
    "rel_scalar_subquery", "rel_time_rollup",
    # --- 50-slot grading window ends here ---
    # tail: every entry below is r3-green (CORRECTNESS_r03 hash-exact)
    # with code unchanged this round
    "q6_category_performance", "q7_product_quadrant", "stream_dedup",
    "ext_dedup_eval", "ext_graph_pagerank", "stream_session_window",
    "ext_dedup_minhash_lsh", "ext_dedup_ngram_jaccard",
    "ext_dedup_simhash", "ext_dedup_embedding_cosine", "ext_dedup_cluster",
    "ext_dedup_incremental", "ext_ann_ivf", "ext_ann_ivf_kmeans",
    "ext_ann_cosine_topk", "ext_ann_lsh_bucketed", "ext_ann_recall",
    "ext_ann_pq_adc",
    "ext_data_quality", "ext_sketch_kmv_setops", "stream_attribution_outer",
    "ext_sample_reservoir", "rel_map_in_arrow", "ext_inverted_index",
    "rel_udtf", "ext_funnel", "ext_cohort_retention", "ext_rfm",
    "rel_setops",
    "ext_dedup_containment", "rel_salted_join",
    "ext_text_profile", "rel_scalar_funcs",
    "ext_attribution_multitouch", "ext_dedup_paragraph", "ext_rolling_dau",
    "ext_bm25_search", "ext_anomaly_zscore", "ext_session_window_native",
    "ext_fuzzy_linkage", "v_channel_daily_incremental",
    "ext_sketch_hll", "ext_sketch_countmin", "ext_graph_triangles",
    "ext_chunk_documents", "ext_domain_balance", "ext_sample_temperature",
    "etl_scd2",
]

_missing = [n for n in _PRIORITY if n not in SUITE]
assert not _missing, f"priority list names unknown entries: {_missing}"
_ordered = {n: SUITE[n] for n in _PRIORITY}
_ordered.update({n: e for n, e in SUITE.items() if n not in _ordered})
SUITE.clear()
SUITE.update(_ordered)

__all__ = ["SUITE", "SuiteEntry", "register"]
