"""Row-level snapshot comparison on the token payload — the north
rule's per-row invariant ("matched via token-array equality") as a
first-class operator.

Reference kin: the ComparePreviousVersion* family
(ComparePreviousVersionProbes.pm:51-60, CompareMetaKeys.pm) diffs a
live database against the previous release; the reference compares
aggregate counts because per-row payloads (sequences) are too wide for
Perl/DBI row loops.  Spark removes that constraint: this operator
diffs the actual token arrays row-by-row, distributed.

Scale: one sort-merge join keyed by doc_id — both sides shuffle once
on the key.  For a standing snapshot this is the case bucketed layout
exists for: write both tables with ``sources.io.write_bucketed`` on
doc_id and the join plans with ZERO Exchange (pinned in
tests/test_plans.py::test_bucketed_join_has_no_exchange).  The equality
predicate itself (``functions.arrays.token_arrays_equal``) is a codegen
binary-comparison on the array bytes — no per-element loop in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ensembl_datacheck_spark.functions.arrays import token_arrays_equal

#: diff_kind values, in severity order
CHANGED = "changed"
MISSING_IN_CURRENT = "missing_in_current"
NEW_IN_CURRENT = "new_in_current"


def token_snapshot_diff(
    current: DataFrame,
    snapshot: DataFrame,
    key_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Full-outer diff of two token tables keyed by ``key_col``:
    one row per key whose payload violates the invariant, classed

    * ``changed``            — key on both sides, token arrays differ
      (null-safe: NULL vs non-NULL is a change, NULL vs NULL is not);
    * ``missing_in_current`` — key only in the snapshot;
    * ``new_in_current``     — key only in current (growth — usually
      benign; the caller decides severity).

    Output: (key, diff_kind, n_tok_cur, n_tok_snap).  Keys equal on
    both sides produce no row, so the result is violation-sized, not
    table-sized.  Duplicate keys fan out through the join — key
    uniqueness is DocIdUnique's concern, not this operator's.
    """
    cur = current.select(
        F.col(key_col).alias("key"),
        F.col(tokens_col).alias("__cur_toks"),
        F.lit(True).alias("__cur_present"),
    )
    snap = snapshot.select(
        F.col(key_col).alias("key"),
        F.col(tokens_col).alias("__snap_toks"),
        F.lit(True).alias("__snap_present"),
    )
    j = cur.join(snap, "key", "full_outer")
    kind = (
        F.when(F.col("__snap_present").isNull(), F.lit(NEW_IN_CURRENT))
        .when(F.col("__cur_present").isNull(), F.lit(MISSING_IN_CURRENT))
        .when(
            ~token_arrays_equal(F.col("__cur_toks"), F.col("__snap_toks")),
            F.lit(CHANGED),
        )
    )
    return (
        j.select(
            F.col("key").alias(key_col),
            kind.alias("diff_kind"),
            F.size("__cur_toks").alias("n_tok_cur"),
            F.size("__snap_toks").alias("n_tok_snap"),
        )
        .filter(F.col("diff_kind").isNotNull())
    )
