"""Named checks over the filesystem-reconciliation and schema-contract
operator families (the two families VERDICT r2 found implemented but
unreachable from ``--groups``).

* ``DataFilesExist`` — DataFilesExist.pm:125-190 semantics: every
  registered file path exists on disk, and (reverse direction,
  DataFilesExist.pm:167-184 kin) no file on disk is unregistered.  The
  reference gates on a defined data_file_path and SKIPS when the
  configuration is absent (the ``ok($self->data_file_path, ...)`` guard);
  here the gate is the ``data_files_root`` config key plus a
  ``data_files`` table.  Declared ``force=True`` like the reference
  (DataFilesExist.pm:37) — filesystem state can change under an
  unchanged table, so a checkpoint must never skip it.

* ``SchemaContract`` — CompareSchema.pm:40-192 semantics: normalize the
  expected DDL and deep-compare against the live schema, reporting
  missing / unexpected columns, type mismatches, and nullability
  tightenings.  Contracts come from the ``schema_contracts`` config dict
  ``{table: ddl}``, defaulting to the north-rule sequences contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ensembl_datacheck_spark import assertions as A
from ensembl_datacheck_spark.operators.files import (
    listing_df,
    missing_files,
    unregistered_files,
)
from ensembl_datacheck_spark.operators.schema_check import (
    SEQUENCES_CONTRACT,
    compare_schema,
)
from ensembl_datacheck_spark.registry import register
from ensembl_datacheck_spark.verdict import AssertionResult, Status


@register(
    "DataFilesExist",
    "Every path registered in the data_files table exists on disk, and "
    "every file on disk is registered (filesystem reconciliation, both "
    "directions: DataFilesExist.pm:125-165 forward, 167-184 reverse; "
    "S26).  Skips unless config['data_files_root'] names the directory "
    "the table's relative paths resolve against.",
    groups=("files",),
    tables=("data_files",),
    force=True,  # filesystem can change under an unchanged table (DataFilesExist.pm:37)
)
def data_files_exist(ctx):
    root = ctx.config.get("data_files_root")
    if not root:
        ctx.skip("config['data_files_root'] not set (data_file_path gate, "
                 "DataFilesExist.pm:131-133)")
    import os

    if not os.path.isdir(root):
        ctx.skip(f"data_files_root {root!r} does not exist "
                 "(DataFilesExist.pm:132 '-e' gate)")
    table = ctx.table("data_files")
    path_col = ctx.config.get("data_files_path_col", "file_path")
    listing = listing_df(ctx.spark, root)
    ctx.record(
        A.is_rows_zero(
            missing_files(table, path_col, listing), "files_missing_on_disk"
        ),
        key_col=path_col,
    )
    ctx.record(
        A.is_rows_zero(
            unregistered_files(table, path_col, listing), "files_unregistered"
        ),
        key_col="path",
    )


@register(
    "SchemaContract",
    "Live table schemas match their versioned DDL contracts: missing "
    "columns, unexpected columns, type mismatches, nullability "
    "tightenings (CompareSchema.pm:40-192; S20).  Contracts from "
    "config['schema_contracts'] ({table: ddl}), default the sequences "
    "north-rule contract.",
    groups=("sequences", "schema"),
    tables=("sequences",),
)
def schema_contract(ctx):
    contracts = ctx.config.get(
        "schema_contracts", {"sequences": SEQUENCES_CONTRACT}
    )
    ignore_extra = ctx.config.get("schema_ignore_extra", False)
    for table_name, ddl in sorted(contracts.items()):
        diff = compare_schema(ctx.table(table_name), ddl, ignore_extra)
        lines = diff.describe()
        ctx.result.assertions.append(
            AssertionResult(
                f"schema_{table_name}",
                Status.OK if diff.ok else Status.FAIL,
                expected=ddl,
                got=len(lines),
                diag=lines[:10],
            )
        )


# --- synthetic data_files fixture -----------------------------------------


def gen_data_files(spark, root, n_files: int = 6, n_missing: int = 2,
                   n_unregistered: int = 1):
    """Write ``n_files`` real files under ``root`` plus ``n_unregistered``
    extra ones, and return a `data_files` DataFrame registering the real
    files plus ``n_missing`` paths that do NOT exist — the golden
    pass+fail fixture for DataFilesExist (mirrors the t/ suite's
    known-defect fixtures)."""
    import os

    os.makedirs(root, exist_ok=True)
    rows = []
    for i in range(n_files):
        rel = f"track_{i:03d}.bb"
        with open(os.path.join(root, rel), "w") as fh:
            fh.write(f"payload {i}\n")
        rows.append((rel, "BIGBED"))
    for i in range(n_missing):
        rows.append((f"missing_{i:03d}.bw", "BIGWIG"))
    for i in range(n_unregistered):
        with open(os.path.join(root, f"stray_{i:03d}.bb"), "w") as fh:
            fh.write("stray\n")
    return spark.createDataFrame(rows, "file_path string, file_type string")
