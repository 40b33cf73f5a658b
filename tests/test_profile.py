"""Column profiling (operators/profile.py column_profile)."""

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import profile


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("profile-tests", master="local[4]",
                    shuffle_partitions=8)


ROWS = [(1, "en", 10), (2, "de", None), (3, None, 30),
        (4, "en", 30), (5, None, None)]
SCHEMA = "id bigint, lang string, n bigint"


def test_planted_profile(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {r.column: r for r in profile.column_profile(
        df, ["id", "lang", "n"]).collect()}
    assert out["id"].n_rows == 5 and out["id"].n_null == 0
    assert out["id"].n_distinct == 5
    assert (out["id"].min_value, out["id"].max_value) == ("1", "5")
    # nulls excluded from distinct (SQL COUNT(DISTINCT) convention)
    assert out["lang"].n_null == 2 and out["lang"].n_distinct == 2
    # string extremes are lexicographic on the native type
    assert (out["lang"].min_value, out["lang"].max_value) == ("de", "en")
    # numeric extremes are numeric, not lexicographic ("10" < "30"
    # both ways here, but 9 vs 30 would differ — pin it)
    df2 = spark.createDataFrame([(1, "x", 9), (2, "y", 30)], SCHEMA)
    p2 = {r.column: r for r in profile.column_profile(
        df2, ["n"]).collect()}
    assert (p2["n"].min_value, p2["n"].max_value) == ("9", "30")


def test_all_null_column(spark):
    df = spark.createDataFrame([(1, None, None), (2, None, None)], SCHEMA)
    out = {r.column: r for r in profile.column_profile(
        df, ["lang"]).collect()}
    assert out["lang"].n_null == 2 and out["lang"].n_distinct == 0
    assert out["lang"].min_value is None and out["lang"].max_value is None


def test_single_scan_plan(spark):
    """All columns profile in ONE aggregate over one scan — the plan
    must contain exactly one FileScan-equivalent source and no join."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    plan = profile.column_profile(df, ["id", "lang", "n"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan ExistingRDD") == 1


def test_empty_cols_validated(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError):
        profile.column_profile(df, [])


def test_duckdb_twin_matches(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = sorted(map(tuple, profile.column_profile(
        df, ["id", "lang", "n"]).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, lang VARCHAR, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?,?)", ROWS)
    want = sorted(map(tuple, con.execute(
        profile.column_profile_sql("t", ["id", "lang", "n"])).fetchall()))
    assert got == want
