"""Oracle-parity harness mirroring the driver's correctness gate: run
each `queries()` entry on Spark and its `oracle_sql()` on DuckDB over the
same sf0.01 parquet, compare row count + column names + order-insensitive
values (floats bit-exact thanks to the decimal-exact convention)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


def test_all_queries_have_impls():
    assert len(QUERIES) >= 25
    assert set(ORACLES) <= set(QUERIES)
    # the correctness gate should cover the bulk of the surface
    assert len(ORACLES) >= 20


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.sql(ORACLES[name])
    d_cols = [c for c in res.columns]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column mismatch"
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} != {len(d_rows)}"
    assert _normalize(s_rows, s_cols) == _normalize(d_rows, d_cols), (
        f"{name}: value mismatch"
    )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 4
    assert set(df.columns) == {"check_name", "n_violations"}


def test_driver_window_is_oracle_backed_and_covers_new_operators():
    """The driver adjudicates the first 50 queries() entries: all 50 must
    be oracle-backed (static or lazy), match DRIVER_WINDOW exactly, and
    include the operators promoted in rounds 4-5 (VERDICT r3 items 1, 4,
    5; VERDICT r4 item 2: the unigram-drift / snapshot-diff / SemDeDup
    rotation)."""
    from ensembl_datacheck_spark.plans.entry_queries import LAZY_ORACLES

    names = list(QUERIES)
    win = names[:50]
    assert win == entry_mod.DRIVER_WINDOW
    backed = set(ORACLES) | set(LAZY_ORACLES)
    assert all(n in backed for n in win)
    promoted = {
        "hash_split_documents", "contamination_eval_vs_train",
        "stratified_sample_documents", "normalized_documents",
        "corpus_prep_pipeline", "incremental_dedup_documents",
        "repetition_signals_documents", "hot_keys_orders",
        "quantile_drift_halves", "ann_ivf_topk",
        "token_minhash_candidates_portable",
        # round-5 rotation (VERDICT r4 next-round item 2)
        "token_unigram_drift_halves", "token_snapshot_diff_documents",
        "semantic_dedup_embeddings",
        # final round-5 rotation: the training-mix operators
        "source_budget_mix_documents", "source_budget_trim_documents",
        "leakage_safe_split_documents", "upsample_sources_documents",
        # late round-5 swap: payload-axis decontamination
        "token_contamination_eval_vs_train",
        # session-2 rotation: LM quality bucketing + DSIR selection
        "lm_perplexity_buckets_documents", "dsir_topk_documents",
    }
    # thin shape-duplicates rotated out during round 5 — their window
    # twins are noted in __spark_entry__.py; all stay oracle-backed
    # (parity-tested above)
    demoted = {
        "hash_split_documents", "rolling_fingerprints_portable",
        "minhash_candidates_portable",
        # replaced by the training-mix rotation
        "stratified_sample_documents", "normalized_documents",
        "pii_summary_documents", "session_stats_events",
        # word-shingle twin of token_contamination_eval_vs_train
        "contamination_eval_vs_train",
        # scoring-join twin of lm_perplexity_buckets_documents and
        # two-profile twin of token_unigram_drift_halves / dsir_topk
        "token_rarity_documents", "source_unigram_divergence_documents",
    }
    promoted -= demoted
    assert promoted <= set(win)
    assert demoted <= set(names[50:])
    assert demoted <= backed
    for n in names[50:]:
        assert n in QUERIES


def test_lazy_oracle_failure_degrades_loudly_and_keeps_window_stable(monkeypatch):
    """LAZY_ORACLES contract (data-dependent oracles, e.g. ann_ivf_topk's
    trained-centroid SQL): a generator that cannot read its parquet must
    (a) warn, (b) drop only its own oracle entry (rows-only fallback),
    and (c) NOT shift the adjudicated 50-query prefix — window
    membership is a static fact, independent of generator success."""
    import warnings

    from ensembl_datacheck_spark.plans import entry_queries as EQ

    def boom():
        raise FileNotFoundError("embeddings.parquet unavailable")

    monkeypatch.setitem(EQ.LAZY_ORACLES, "ann_ivf_topk", boom)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        oracles = entry_mod.oracle_sql()
    assert "ann_ivf_topk" not in oracles
    assert any("ann_ivf_topk" in str(w.message) for w in caught)
    # static window unchanged: queries() still leads with DRIVER_WINDOW
    assert list(entry_mod.queries())[:50] == entry_mod.DRIVER_WINDOW
