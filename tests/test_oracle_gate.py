"""Driver-contract parity: run a representative subset of
__spark_entry__.queries() against their DuckDB oracles at sf0.001.
(The full registry-wide gate runs at sf0.01 via scripts/run_gate.py / the driver.)
"""

import pytest

import oracle_harness

SUBSET = [
    "q1_pricing_summary",
    "masked_sum",
    "group_first_last",
    "margins_sum",
    "crosstab_pivot",
    "cumsum",
    "sessionize",
    "pretty_cut_bins",
    "dedup_exact",
    "doc_token_stats",
    "knn_cosine",
    "multimodal_image_meta",
    # round-5 second wave
    "quality_classifier",
    "bigram_ppl",
    "source_cap",
    "global_sample",
    "asof_nearest",
    "semantic_contamination",
    "dedup_exact_canonical",
    "containment_pairs",
    "pack_gate",
    "bloom_dedup",
    "duplicated_spans",
    "span_excision",
    # round-7 code-change gates: bucketed rollup-first join + reattach,
    # corpus-sized ref-index Bloom, candidate-pruned verify shingling
    "segment_revenue_bucketed",
    "minhash_gate",
    # round-7 close additions (new queries; rotate into the r8 driver
    # window head): grouped-cumsum token budgets, percentile calibration,
    # dup-cluster-aware splits
    # round-9 gates: decimal-exact float-shipping re-verifications, the
    # PSL domain swap, 6-container image decode, the crawl front door
    "group_rolling_scale",
    "group_expanding_scale",
    "group_rolling_time_scale",
    "url_normalize",
    "crawl_domain_stats",
    "crawl_curation_pipeline",
    "image_header_meta",
    "boilerplate_removal",
    "snapshot_diff",
    "image_phash_dedup",
    "token_budget",
    "quantile_calibration",
    "leakage_split",
    "leakage_split_lsh",
    "filter_groups",
    "group_idxminmax",
    "pct_change",
    "cumprod",
    "group_prod_any_all",
    "group_sem",
    "group_skew_kurt",
    "ngroup",
    "group_fill",
    "group_ohlc",
    "group_describe",
    "group_nlargest",
    "resample_agg",
    "expanding_stats",
    "ewm_mean",
    "qcut_deciles",
    "pivot_table_mean",
    "group_rank_methods",
    "group_take",
    "corrwith",
    "duplicated_flags",
    "group_ffill_scale",
    "group_take_scale",
    "ewm_var_std",
    "group_bfill_scale",
    "streaming_ewm",
    "group_rolling_scale",
    "group_shift_scale",
    "group_expanding_scale",
    "group_cumminmax_scale",
    "group_rank_scale",
    "group_rolling_time_scale",
    # round-8 additions: real WAV/MP4 container-header decode through the
    # multimodal mapInPandas seam; WARC crawl ingestion (record grammar,
    # gzip members, HTTP split, tag-strip text)
    "media_meta",
    "warc_ingest",
    "url_normalize",
    "crawl_domain_stats",
    # round-10 consolidation: the compound gates (each value-checks every
    # folded operator) + the folded incremental_dedup (all three index
    # forms in one tag-unioned frame)
    "value_counts",
    "audio_pcm_features",
    "video_frame_sample",
    "scatter_fit",
    "rolling_gate",
    "cumulative_gate",
    "incremental_dedup",
]


@pytest.fixture(scope="module")
def gate_results(spark):
    return oracle_harness.run_gate(spark, "/root/testdata/sf0.001", only=SUBSET)


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(gate_results, name):
    assert gate_results[name].startswith("OK"), gate_results[name]


def test_entry_smoke(spark):
    import __spark_entry__
    df = __spark_entry__.entry(spark)
    assert df.count() > 0


def test_every_query_has_callable(spark):
    import __spark_entry__
    qs = __spark_entry__.queries()
    sqls = __spark_entry__.oracle_sql()
    assert len(qs) >= 40
    assert set(sqls) <= set(qs)


def test_rotation_cadence_invariant():
    """The registry-rotation cadence (scripts/check_rotation.py): every
    entry gets a driver CORRECTNESS row at least every ceil(N/50) rounds,
    never-verified entries sit inside the upcoming window, the greedy
    forward schedule is feasible, and rows-only twins stay adjacent."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "check_rotation.py"
    spec = importlib.util.spec_from_file_location("check_rotation", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.check() == []
