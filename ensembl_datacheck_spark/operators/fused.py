"""Fused per-row validation pass.

The reference issues one SQL statement per assertion (every check body in
lib/.../Checks/*); at 10^12 rows that multiplies full scans.  Here every
*row-local* predicate (completeness, token-length invariant, token domain,
broadcast-dimension membership) is evaluated in **one scan**:

* per-(bucket, assertion) violation **counts** come from a single
  `groupBy(bucket)` with one `sum(when(pred, 1))` counter per assertion —
  map-side partial aggregation, shuffle payload = n_buckets × n_assertions
  longs;
* violation **rows** come from a second filter-only scan over
  `any(pred)` — predicate-pushdown prunes to the violating rows, and the
  scan reads only the columns the predicates and diagnostics need.

Dimension membership is fused via a broadcast left join producing a match
flag, so referential integrity rides the same scan (map-side hash probe,
zero shuffle of the fact table).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowPredicate:
    """A named row-level violation predicate (true == violating row)."""

    assertion: str
    predicate: Column
    diag_cols: tuple[str, ...] = ()


def with_dim_flag(
    fact: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
    flag: str,
) -> DataFrame:
    """Broadcast left join adding a `<flag>` column that is non-null iff
    the FK matches — lets an anti-join ride a fused row pass."""
    keys = F.broadcast(
        dim.select(F.col(pk_col).alias("__dim_key"))
        .distinct()
        .withColumn(flag, F.lit(1))
    )
    return fact.join(
        keys, on=fact[fk_col] == keys["__dim_key"], how="left"
    ).drop("__dim_key")


def fused_violation_counts(
    df: DataFrame,
    predicates: list[RowPredicate],
    bucket: Column,
) -> DataFrame:
    """Per-bucket counts for every assertion in one aggregation.
    Output: (partition_id, n_rows, `<assertion>` count ...)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(p.predicate.cast("long")).alias(p.assertion) for p in predicates
    ]
    return df.groupBy(bucket.alias("partition_id")).agg(*aggs)


def fused_violation_rows(
    df: DataFrame,
    predicates: list[RowPredicate],
    bucket: Column,
    key_col: str,
) -> DataFrame:
    """Violating rows tagged with the assertions they fail — one
    filter+project scan.  Output: (assertion, partition_id, key, detail)."""
    tags = F.array_compact(
        F.array(
            *[F.when(p.predicate, F.lit(p.assertion)) for p in predicates]
        )
    )
    diag_cols = sorted({c for p in predicates for c in p.diag_cols})
    detail = (
        F.to_json(F.struct(*[F.col(c) for c in diag_cols]))
        if diag_cols
        else F.lit(None).cast("string")
    )
    any_pred = predicates[0].predicate
    for p in predicates[1:]:
        any_pred = any_pred | p.predicate
    return (
        df.filter(any_pred)
        .select(
            F.explode(tags).alias("assertion"),
            bucket.alias("partition_id"),
            F.col(key_col).cast("string").alias("key"),
            detail.alias("detail"),
        )
    )
