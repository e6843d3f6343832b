"""Multi-database fan-out (DbFactory analogue) tests."""

from __future__ import annotations

import ensembl_datacheck_spark.checks  # noqa: F401
from ensembl_datacheck_spark.plans.checkpoint import CheckpointStore
from ensembl_datacheck_spark.plans.fleet import DbTarget, run_fleet
from ensembl_datacheck_spark.registry import registry
from ensembl_datacheck_spark.sources import synth
from ensembl_datacheck_spark.sources.io import Catalog
from ensembl_datacheck_spark.verdict import Status


def test_fleet_runs_per_db_and_resumes(spark, seq_fixture, tmp_path):
    sources = seq_fixture["sources"]
    targets = [
        DbTarget("db_dirty", {"sequences": seq_fixture["sequences"],
                              "sources": sources}, lineage="v1"),
        DbTarget("db_clean", {"sequences": seq_fixture["sequences_clean"],
                              "sources": sources}, lineage="v1"),
    ]
    specs = registry.select(names=["DocIdUnique", "SequencesCompleteness",
                                  "SourceReferential"])
    store = CheckpointStore(Catalog(spark, tmp_path / "fleet_wh"))
    fleet = run_fleet(spark, targets, specs, n_buckets=8,
                      checkpoint_store=store, max_parallel_dbs=2)
    assert not fleet.by_db["db_dirty"].all_passed
    assert fleet.by_db["db_clean"].all_passed
    assert not fleet.all_passed
    d = fleet.to_dict()
    assert set(d) == {"db_dirty", "db_clean"}

    # resume: clean db skips everything; dirty db re-runs failures only
    fleet2 = run_fleet(spark, targets, specs, n_buckets=8,
                       checkpoint_store=store)
    clean2 = fleet2.by_db["db_clean"]
    assert all(r.status == Status.SKIP for r in clean2.results)
    dirty2 = fleet2.by_db["db_dirty"]
    assert any(r.status == Status.FAIL for r in dirty2.results)
