"""Schema-contract validation (SURVEY.md S20).

Reference: CompareSchema.pm:40-192 normalizes `CREATE TABLE` text from a
versioned DDL file and deep-compares it against the live database schema.
Spark-first restatement: the contract is a DDL string (`"a INT, b STRING
NOT NULL"`); the live side is `df.schema` (StructType).  The diff reports
missing columns, unexpected columns, type mismatches, and nullability
tightenings — no SQL parsing beyond Spark's own DDL parser.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass
class SchemaDiff:
    missing: list[str] = field(default_factory=list)       # in contract, not live
    unexpected: list[str] = field(default_factory=list)    # live, not in contract
    type_mismatch: list[tuple[str, str, str]] = field(default_factory=list)
    nullability: list[str] = field(default_factory=list)   # contract NOT NULL, live nullable

    @property
    def ok(self) -> bool:
        return not (self.missing or self.unexpected or self.type_mismatch
                    or self.nullability)

    def describe(self) -> list[str]:
        out = []
        out += [f"missing column: {c}" for c in self.missing]
        out += [f"unexpected column: {c}" for c in self.unexpected]
        out += [f"type mismatch: {c} expected {e} got {g}"
                for c, e, g in self.type_mismatch]
        out += [f"nullability: {c} must be NOT NULL" for c in self.nullability]
        return out


def parse_contract(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


def compare_schema(
    live: T.StructType | DataFrame,
    contract: str | T.StructType,
    ignore_extra: bool = False,
) -> SchemaDiff:
    """Order-insensitive field comparison (the reference normalizes away
    ordering and formatting, CompareSchema.pm:86-192)."""
    if isinstance(live, DataFrame):
        live = live.schema
    if isinstance(contract, str):
        contract = parse_contract(contract)
    live_by = {f.name: f for f in live.fields}
    want_by = {f.name: f for f in contract.fields}
    diff = SchemaDiff()
    for name, want in want_by.items():
        got = live_by.get(name)
        if got is None:
            diff.missing.append(name)
            continue
        if got.dataType.simpleString() != want.dataType.simpleString():
            diff.type_mismatch.append(
                (name, want.dataType.simpleString(), got.dataType.simpleString())
            )
        if not want.nullable and got.nullable:
            diff.nullability.append(name)
    if not ignore_extra:
        diff.unexpected = sorted(set(live_by) - set(want_by))
    return diff


SEQUENCES_CONTRACT = (
    "doc_id STRING, tokens ARRAY<INT>, n_tok INT, source STRING"
)
