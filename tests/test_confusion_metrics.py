"""Per-class precision/recall/F1 (evaluation.confusion_metrics) —
hand-computed matrices, invented-class and missed-class NULLs, the
one-division F1 identity, and DuckDB twin parity on random
matrices."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import evaluation


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("confusion-tests", master="local[4]",
                    shuffle_partitions=8)


def _py(matrix):
    labels = sorted(
        {t for t, _, _ in matrix} | {p for _, p, _ in matrix}
    )
    out = {}
    for k in labels:
        tp = sum(n for t, p, n in matrix if t == k and p == k)
        fp = sum(n for t, p, n in matrix if t != k and p == k)
        fn = sum(n for t, p, n in matrix if t == k and p != k)
        prec = None if tp + fp == 0 else tp * 1_000_000 // (tp + fp)
        rec = None if tp + fn == 0 else tp * 1_000_000 // (tp + fn)
        f1 = (
            None
            if 2 * tp + fp + fn == 0
            else 2 * tp * 1_000_000 // (2 * tp + fp + fn)
        )
        out[k] = (tp, fp, fn, prec, rec, f1)
    return out


def _spark(spark, matrix):
    df = spark.createDataFrame(matrix, "truth string, pred string, n bigint")
    got = evaluation.confusion_metrics(df).collect()
    return {
        r["label"]: (r["tp"], r["fp"], r["fn"], r["precision_ppm"],
                     r["recall_ppm"], r["f1_ppm"])
        for r in got
    }


def test_hand_matrix(spark):
    matrix = [
        ("en", "en", 80), ("en", "de", 20),
        ("de", "de", 30), ("de", "en", 10),
    ]
    got = _spark(spark, matrix)
    assert got["en"] == (80, 10, 20, 888_888, 800_000,
                         2 * 80 * 1_000_000 // (160 + 10 + 20))
    assert got == _py(matrix)


def test_invented_class_null_recall(spark):
    # model predicts 'und' which never appears as truth
    matrix = [("en", "en", 5), ("en", "und", 3)]
    got = _spark(spark, matrix)
    assert got["und"] == (0, 3, 0, 0, None, 0)


def test_missed_class_null_precision(spark):
    # truth class 'fr' never predicted
    matrix = [("fr", "en", 4), ("en", "en", 6)]
    got = _spark(spark, matrix)
    assert got["fr"] == (0, 0, 4, None, 0, 0)


def test_random_vs_python_and_duckdb(spark):
    rng = random.Random(123)
    langs = ["en", "de", "fr", "es", "und"]
    matrix = [
        (t, p, rng.randrange(1, 50))
        for t in langs[:4]
        for p in langs
        if rng.random() < 0.7
    ]
    want = _py(matrix)
    assert _spark(spark, matrix) == want

    con = duckdb.connect()
    con.execute("CREATE TABLE m (truth VARCHAR, pred VARCHAR, n BIGINT)")
    con.executemany("INSERT INTO m VALUES (?, ?, ?)", matrix)
    got = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            evaluation.confusion_metrics_sql("m")
        ).fetchall()
    }
    assert got == want
