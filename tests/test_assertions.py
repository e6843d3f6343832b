"""Assertion-primitive golden tests — pass and fail mode for every
primitive, mirroring the reference's t/TestDataCheck.t known-answer
strategy (e.g. t/TestDataCheck.t:54-58, 135-139)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ensembl_datacheck_spark import assertions as A
from ensembl_datacheck_spark.verdict import Status


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_is_rows(spark):
    df = spark.range(10)
    ar, _ = A.is_rows(df, 10, "exact")
    assert ar.status == Status.OK
    ar, _ = A.is_rows(df, 9, "wrong")
    assert ar.status == Status.FAIL and ar.got == 10


def test_cmp_rows(spark):
    df = spark.range(10)
    assert A.cmp_rows(df, "<", 11, "lt")[0].status == Status.OK
    assert A.cmp_rows(df, ">", 11, "gt")[0].status == Status.FAIL
    assert A.cmp_rows(df, "!=", 9, "ne")[0].status == Status.OK


def test_is_rows_zero_pass_and_fail(spark):
    empty = spark.range(10).filter("id < 0")
    ar, viol = A.is_rows_zero(empty, "clean")
    assert ar.status == Status.OK and viol is None

    bad = spark.range(25)
    ar, viol = A.is_rows_zero(bad, "dirty")
    assert ar.status == Status.FAIL
    assert ar.got == 25
    # diag capped at 10 + overflow note (Test/DataCheck.pm:47,163-178)
    assert len(ar.diag) == 11
    assert viol is not None and viol.count() == 25


def test_is_rows_nonzero(spark):
    assert A.is_rows_nonzero(spark.range(1), "ok")[0].status == Status.OK
    empty = spark.range(1).filter("id < 0")
    assert A.is_rows_nonzero(empty, "bad")[0].status == Status.FAIL


def test_row_totals_tolerance(spark):
    cur, base = spark.range(95), spark.range(100)
    assert A.row_totals(cur, base, "p95", min_proportion=0.95)[0].status == Status.OK
    assert A.row_totals(cur, base, "p100")[0].status == Status.FAIL
    # auto-pass below minimum_count (Test/DataCheck.pm:269-273)
    small_c, small_b = spark.range(2), spark.range(4)
    assert (
        A.row_totals(small_c, small_b, "min", min_proportion=1.0, minimum_count=10)[0].status
        == Status.OK
    )


def test_row_subtotals_directionality(spark):
    cur = _df(spark, [("a", 100), ("b", 50), ("d", 7)], "category string, count long")
    base = _df(spark, [("a", 100), ("b", 100), ("c", 5)], "category string, count long")
    # b shrank to 50% and c vanished -> both violate at 0.75
    ar, viol = A.row_subtotals(cur, base, "category", "sub", min_proportion=0.75)
    assert ar.status == Status.FAIL
    cats = {r["category"] for r in viol.collect()}
    assert cats == {"b", "c"}
    # 'd' present only in current is ignored (Test/DataCheck.pm:332-335);
    # 'c' (both sides tiny) exempted via minimum_count
    ar, _ = A.row_subtotals(
        cur, base, "category", "sub", min_proportion=0.4, minimum_count=10
    )
    assert ar.status == Status.OK


def test_fk_and_denormalized(spark):
    fact = _df(spark, [(1, "x"), (2, "y"), (3, "z"), (None, "w")], "k int, v string")
    dim = _df(spark, [(1,), (2,)], "k int")
    ar, viol = A.fk(fact, "k", dim, "k", "fk")
    assert ar.status == Status.FAIL and ar.got == 1  # null FK ignored
    assert [r["k"] for r in viol.collect()] == [3]

    t1 = _df(spark, [(1, "a"), (2, "b")], "k int, name string")
    t2 = _df(spark, [(1, "a"), (2, "DIFFERENT")], "k int, name string")
    ar, viol = A.denormalized(t1, "k", "name", t2, "k", "name", "sync")
    assert ar.status == Status.FAIL and ar.got == 1


def test_has_data_and_one_to_many(spark):
    df = _df(
        spark,
        [(1, "ok"), (2, None), (3, ""), (4, "NULL"), (5, "fine")],
        "id int, v string",
    )
    ar, viol = A.has_data(df, "v", "id", "hd")
    assert ar.status == Status.FAIL and ar.got == 3

    o2m = _df(spark, [(1,), (1,), (2,), (3,), (3,)], "k int")
    ar, viol = A.is_one_to_many(o2m, "k", "o2m")
    assert ar.status == Status.FAIL
    assert [r["k"] for r in viol.collect()] == [2]


def test_has_tags_and_cmp_tag_and_id_range(spark):
    et = _df(
        spark,
        [("e1", "a"), ("e1", "b"), ("e2", "a")],
        "entity string, tag string",
    )
    ar, viol = A.has_tags(et, "entity", "tag", ["a", "b"], "tags")
    assert ar.status == Status.FAIL
    rows = viol.collect()
    assert rows[0]["entity"] == "e2" and rows[0]["missing_tags"] == ["b"]

    tags = _df(spark, [("t", 5.0), ("t", 0.5)], "k string, value double")
    assert A.cmp_tag(tags, "value", ">", 0.0, "pos")[0].status == Status.OK
    assert A.cmp_tag(tags, "value", ">", 1.0, "gt1")[0].status == Status.FAIL

    ids = _df(
        spark,
        [("g1", 11001), ("g1", 11002), ("g2", 12001), ("g2", 13001)],
        "grp string, id long",
    )
    ar, viol = A.check_id_range(ids, "grp", "id", 2, "prefix")
    assert ar.status == Status.FAIL
    assert [r["grp"] for r in viol.collect()] == ["g2"]


def test_same_scalar(spark):
    cur = spark.range(10)
    base = spark.range(10)
    assert A.same_scalar(cur, base, F.max("id"), "max_id")[0].status == Status.OK
    base2 = spark.range(12)
    ar, _ = A.same_scalar(cur, base2, F.max("id"), "max_id")
    assert ar.status == Status.FAIL and ar.expected == 11 and ar.got == 9


def test_array_and_hash_diff(spark):
    a = _df(spark, [("x",), ("y",)], "v string")
    b = _df(spark, [("y",), ("z",)], "v string")
    d = {(r["value"], r["only_in"]) for r in A.array_diff(a, b, "v").collect()}
    assert d == {("x", "left"), ("z", "right")}

    h1 = _df(spark, [("k1", "a"), ("k2", "b")], "k string, v string")
    h2 = _df(spark, [("k1", "a"), ("k3", "c")], "k string, v string")
    keys = {r["key"] for r in A.hash_diff(h1, h2, "k", "v").collect()}
    assert keys == {"k2", "k3"}


def test_run_fk_declarative_spec(spark):
    """FkSpec executes through run_fk: constrained orphan detection with
    the SQL constraint string bridged via F.expr."""
    from ensembl_datacheck_spark.operators.referential import FkSpec, run_fk

    fact = spark.createDataFrame(
        [(1, "s1", "live"), (2, "s9", "live"), (3, "s9", "archived")],
        "id long, src string, state string",
    )
    dim = spark.createDataFrame([("s1",), ("s2",)], "src string")
    spec = FkSpec(table="fact", column="src", ref_table="dims",
                  ref_column="src", constraint="state = 'live'")
    viol = run_fk(spec, {"fact": fact, "dims": dim})
    assert [r["id"] for r in viol.collect()] == [2]  # archived orphan exempt
    # unconstrained: both orphans
    spec2 = FkSpec(table="fact", column="src", ref_table="dims", ref_column="src")
    assert run_fk(spec2, {"fact": fact, "dims": dim}).count() == 2
