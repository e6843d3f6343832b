"""ensembl_datacheck_spark — a from-scratch PySpark-native data-validation
engine with the capabilities of Ensembl/ensembl-datacheck.

The reference (Perl, ~267 check modules over MySQL; see SURVEY.md) is a
declarative check registry + execution harness.  This package re-expresses
that model Spark-first:

* a check is a :class:`~ensembl_datacheck_spark.registry.CheckSpec` whose
  body builds **DataFrame plans** (never SQL strings shipped to a server),
* assertion primitives (`is_rows`, `is_rows_zero`, `fk`, `row_subtotals`,
  ...; reference lib/Bio/EnsEMBL/DataCheck/Test/DataCheck.pm) become
  functions over DataFrames returning (verdict, violations-DataFrame),
* the eHive fan-out (reference Pipeline/*) becomes a single SparkSession
  running each check as one distributed action with per-partition verdicts,
* the JSON history file (reference Manager.pm:377-481) becomes a
  checkpoint table keyed (check_name, partition_id) enabling resume.

Nothing is ported from the reference's code; only its observable
semantics are reproduced (file:line citations in docstrings).
"""

__version__ = "0.1.0"

from ensembl_datacheck_spark.registry import CheckSpec, register, registry  # noqa: F401
from ensembl_datacheck_spark.verdict import (  # noqa: F401
    AssertionResult,
    CheckResult,
    Status,
)
