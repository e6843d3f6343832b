"""Referential-integrity family (SURVEY.md §2.6 family 3).

Reference: the `fk` primitive builds `LEFT JOIN ... WHERE right IS NULL`
(Test/DataCheck.pm:395-419); ForeignKeys.pm applies it across a DDL-driven
relationship list, including constrained FKs (rows scoped by a predicate,
ForeignKeys.pm:82-89) and reverse FKs (every parent must have a child).

Physical plan at 10^12 fact rows: the dimension is broadcast
(deterministic `F.broadcast`, not size-estimate dependent — SURVEY.md §4
item 2) so orphan detection is a map-side hash anti-join: zero shuffle of
the fact table, violations emitted inline with the scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FkSpec:
    """Declarative relationship (the engine-side replacement for the
    reference's SQL-DDL parsing, Utils.pm:116-173)."""

    table: str
    column: str
    ref_table: str
    ref_column: str
    constraint: str | None = None  # SQL predicate over the fact side


def run_fk(spec: FkSpec, tables: dict[str, DataFrame]) -> DataFrame:
    """Execute a declarative FkSpec against a table dict: violation rows
    from the broadcast anti-join, with the spec's SQL constraint string
    bridged to a Column via F.expr (ForeignKeys.pm constrained-FK
    semantics, 82-89)."""
    constraint = F.expr(spec.constraint) if spec.constraint else None
    return orphan_rows(
        tables[spec.table], spec.column,
        tables[spec.ref_table], spec.ref_column,
        constraint=constraint,
    )


def orphan_rows(
    fact: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
    constraint: Column | None = None,
) -> DataFrame:
    """Fact rows whose non-null FK value has no match in the dimension —
    broadcast hash left-anti join."""
    left = fact.filter(F.col(fk_col).isNotNull())
    if constraint is not None:
        left = left.filter(constraint)
    keys = F.broadcast(dim.select(F.col(pk_col).alias("__pk")).distinct())
    return left.join(keys, on=F.col(fk_col) == F.col("__pk"), how="left_anti")


def childless_parents(
    dim: DataFrame,
    pk_col: str,
    fact: DataFrame,
    fk_col: str,
) -> DataFrame:
    """Reverse FK (ForeignKeys.pm:91-98): parents with no referencing fact
    row.  The distinct FK set of the fact is the shuffled side (bounded by
    dimension cardinality after dedup); the dimension stays small."""
    used = fact.select(F.col(fk_col).alias("__fk")).distinct()
    return dim.join(used, on=F.col(pk_col) == F.col("__fk"), how="left_anti")


def inactive_with_rows(
    dim: DataFrame,
    pk_col: str,
    active_col: str,
    fact: DataFrame,
    fk_col: str,
) -> DataFrame:
    """Constrained FK analogue: inactive dimension members must have zero
    fact rows (FIXTURES.md §2 `active`).  Violations are the fact rows
    referencing an inactive member — map-side broadcast semi join."""
    # NULL active is treated as INACTIVE for this check: an
    # ambiguous-state member with live fact rows is worth surfacing, and
    # a bare ~col drops NULLs silently (NULL-flag members would escape
    # the check entirely)
    inactive = F.broadcast(
        dim.filter(F.col(active_col).isNull() | ~F.col(active_col)).select(
            F.col(pk_col).alias("__pk")
        )
    )
    return fact.join(inactive, on=F.col(fk_col) == F.col("__pk"), how="left_semi")
