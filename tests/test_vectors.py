"""operators/vectors.py — embedding-column hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_datacheck_spark.operators import vectors as V

NAN = float("nan")
INF = float("inf")


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (1, [0.6, 0.8]),            # clean unit vector
        (2, None),                  # vec_null
        (3, []),                    # vec_empty
        (4, [1.0, NAN]),            # has_nan
        (5, [INF, 0.0]),            # has_inf (positive)
        (6, [0.0, 0.0]),            # zero_vector (+ norm band)
        (7, [1.0, 2.0, 2.0]),       # dim_mismatch vs 2 (+ norm band)
        (8, [3.0, 4.0]),            # norm 5 -> out of band
        (9, [-INF, 1.0]),           # has_inf (negative)
        (10, [0.0, 1.0]),           # clean: zero ELEMENT is not a zero vector
        (11, [1e-30, 0.0]),         # denormal-ish, NOT zero_vector (band breach)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


class TestEmbeddingViolations:
    def _kinds(self, df):
        out: dict[int, set[str]] = {}
        for r in df.collect():
            out.setdefault(r["id"], set()).add(r["violation"])
        return out

    def test_classification(self, vec_df):
        got = self._kinds(
            V.embedding_violations(
                vec_df, expected_dim=2, norm_band=(0.9, 1.1)
            )
        )
        assert got == {
            2: {"vec_null"},
            3: {"vec_empty"},
            4: {"has_nan"},
            5: {"has_inf"},
            6: {"zero_vector", "norm_out_of_band"},
            7: {"dim_mismatch", "norm_out_of_band"},
            8: {"norm_out_of_band"},
            9: {"has_inf"},
            11: {"norm_out_of_band"},
        }

    def test_optional_rules_absent_by_default(self, vec_df):
        """No expected_dim -> no dim_mismatch; no band -> no norm rule."""
        got = self._kinds(V.embedding_violations(vec_df))
        assert got == {
            2: {"vec_null"},
            3: {"vec_empty"},
            4: {"has_nan"},
            5: {"has_inf"},
            6: {"zero_vector"},
            9: {"has_inf"},
        }

    def test_dim_column(self, vec_df):
        rows = {
            r["id"]: r["dim"]
            for r in V.embedding_violations(vec_df, expected_dim=2).collect()
        }
        assert rows[2] is None  # NULL vec -> NULL dim
        assert rows[3] == 0
        assert rows[7] == 3

    def test_nan_inf_rows_skip_norm_band(self, vec_df):
        """A NaN/Inf row must not ALSO fire the band rule (NaN compare)."""
        got = self._kinds(V.embedding_violations(vec_df, norm_band=(0.9, 1.1)))
        assert got[4] == {"has_nan"}
        assert got[5] == {"has_inf"}
        assert got[9] == {"has_inf"}

    def test_plan_is_shuffle_free_and_jvm_only(self, vec_df):
        plan = (
            V.embedding_violations(vec_df, expected_dim=2, norm_band=(0.9, 1.1))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestEmbeddingProfile:
    def test_profile_counts(self, vec_df, spark):
        row = V.embedding_profile(vec_df).collect()[0].asDict()
        assert row == {
            "n_rows": 11,
            "n_null": 1,
            "n_empty": 1,
            "n_nan": 1,
            "n_inf": 2,
            "n_zero_vec": 1,
            "n_dims": 2,       # dims 2 and 3
            "modal_dim": 2,
            "modal_dim_rows": 8,
        }

    def test_modal_tie_breaks_to_smallest_dim(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
            "vec_id long, embedding array<float>",
        )
        row = V.embedding_profile(df).collect()[0]
        assert row["modal_dim"] == 2
        assert row["modal_dim_rows"] == 1

    def test_empty_table(self, spark):
        df = spark.createDataFrame([], "vec_id long, embedding array<float>")
        row = V.embedding_profile(df).collect()[0]
        assert row["n_rows"] == 0
        assert row["modal_dim"] is None
        assert row["modal_dim_rows"] is None

    def test_single_scan(self, vec_df):
        """One table read: the per-dim partial aggregate carries every
        flag count, so the plan contains exactly one scan subtree."""
        plan = (
            V.embedding_profile(vec_df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("InMemoryTableScan") == 1
