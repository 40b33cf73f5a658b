"""Centroid silhouette (evaluation.silhouette_centroid), reliability
bins (evaluation.calibration_bins), and Poisson-bootstrap replicate
means (evaluation.bootstrap_means) — planted geometry, hand-binned
cases, deterministic-weight Python mirror, loud guards on both
engines, DuckDB twin parity."""

import random

import duckdb
import pandas as pd
import pytest

from openstreetmap_license_change_spark.operators import evaluation as ev
from openstreetmap_license_change_spark.operators.sketches import (
    _KMV_MULT,
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("silcalboot-tests", master="local[4]",
                    shuffle_partitions=8)


def _canon(rows):
    return sorted(tuple("∅" if v is None else v for v in r) for r in rows)


def _con(rows, cols, name="t"):
    con = duckdb.connect()
    con.register(name, con.from_df(pd.DataFrame(rows, columns=cols)))
    return con


# ------------------------------------------------------------ silhouette
def test_silhouette_separated_and_mislabeled(spark):
    # cluster 0 at x≈0, cluster 1 at x≈10; point 99 sits AT cluster 1
    # but carries label 0 -> negative silhouette
    rows = [(i, [0.0 + i * 0.001, 0.0], 0) for i in range(5)]
    rows += [(10 + i, [10.0 + i * 0.001, 0.0], 1) for i in range(5)]
    rows.append((99, [10.0, 0.0], 0))
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    got = {r.vec_id: r for r in ev.silhouette_centroid(df).collect()}
    for i in range(5):
        assert got[i].sil_ppm > 900_000          # tight, well separated
        assert got[10 + i].sil_ppm > 900_000
    assert got[99].sil_ppm < -500_000            # mislabeled
    assert got[99].a_q > got[99].b_q


def test_silhouette_single_label_null(spark):
    rows = [(i, [float(i), 1.0], 7) for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    for r in ev.silhouette_centroid(df).collect():
        assert r.b_q is None and r.sil_ppm is None


def test_silhouette_twin_random(spark):
    rng = random.Random(4417)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)], rng.randrange(3))
        for i in range(80)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    got = _canon(ev.silhouette_centroid(df).collect())
    con = _con(rows, ["vec_id", "embedding", "label"], "emb")
    twin = _canon(
        con.execute(ev.silhouette_centroid_sql("emb")).fetchall()
    )
    assert got == twin


# ----------------------------------------------------------- calibration
def test_calibration_hand_bins(spark):
    rows = [
        (0, 50_000, False),     # bin 0
        (1, 99_999, True),      # bin 0
        (2, 100_000, False),    # bin 1 (left-closed)
        (3, 1_000_000, True),   # clamps into bin 9
        (4, 950_000, True),     # bin 9
    ]
    df = spark.createDataFrame(rows, "id bigint, score bigint, y boolean")
    got = {r.bin: r for r in
           ev.calibration_bins(df, "score", "y").collect()}
    assert len(got) == 10
    assert (got[0].n, got[0].observed_ppm) == (2, 500_000)
    assert got[0].mean_score_ppm == (50_000 + 99_999) // 2
    assert (got[1].n, got[1].observed_ppm) == (1, 0)
    assert (got[9].n, got[9].observed_ppm) == (2, 1_000_000)
    assert got[5].n == 0 and got[5].mean_score_ppm is None
    assert got[3].lo_ppm == 300_000


def test_calibration_guard_fires_both_engines(spark):
    rows = [(0, 1_000_001, True)]
    df = spark.createDataFrame(rows, "id bigint, score bigint, y boolean")
    with pytest.raises(Exception, match="calibration_bins"):
        ev.calibration_bins(df, "score", "y").collect()
    con = _con(rows, ["id", "score", "y"])
    with pytest.raises(Exception, match="calibration_bins"):
        con.execute(ev.calibration_bins_sql("t", "score", "y")).fetchall()


def test_calibration_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        ev.calibration_bins(df, "id", "id", n_bins=0)


def test_calibration_twin_random(spark):
    rng = random.Random(4418)
    rows = [(i, rng.randrange(0, 1_000_001), rng.random() < 0.3)
            for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, score bigint, y boolean")
    got = _canon(ev.calibration_bins(df, "score", "y", n_bins=7).collect())
    con = _con(rows, ["id", "score", "y"])
    twin = _canon(con.execute(
        ev.calibration_bins_sql("t", "score", "y", n_bins=7)
    ).fetchall())
    assert got == twin


# ------------------------------------------------------------- bootstrap
def _py_weight(doc_id, rep):
    v = doc_id * 1009 + rep
    h = ((v % 2**31) * _KMV_MULT) % 2**32
    h = (h ^ (h >> 16)) % 2**32
    r = h % 1_000_000
    for i, thr in enumerate(ev.POISSON1_CDF_PPM):
        if r < thr:
            return i
    return len(ev.POISSON1_CDF_PPM)


def _py_bootstrap(rows, n_reps):
    out = []
    for rep in range(n_reps):
        ws = [(_py_weight(i, rep), x) for i, x in rows]
        n_eff = sum(w for w, _ in ws)
        swx = sum(w * x for w, x in ws)
        out.append((rep, len(rows), n_eff, swx,
                    None if n_eff == 0 else swx * 10**6 // n_eff))
    return sorted(out)


def test_bootstrap_mirror_and_twin(spark):
    rng = random.Random(4419)
    rows = [(i, rng.randrange(10, 500)) for i in range(250)]
    df = spark.createDataFrame(rows, "id bigint, x bigint")
    got = _canon(ev.bootstrap_means(df, "id", "x", n_reps=12).collect())
    assert got == _canon(_py_bootstrap(rows, 12))
    con = _con(rows, ["id", "x"])
    twin = _canon(con.execute(
        ev.bootstrap_means_sql("t", "id", "x", n_reps=12)
    ).fetchall())
    assert got == twin


def test_bootstrap_replicates_differ_and_center(spark):
    rows = [(i, 100) for i in range(500)]  # constant metric
    df = spark.createDataFrame(rows, "id bigint, x bigint")
    got = ev.bootstrap_means(df, "id", "x", n_reps=8).collect()
    effs = [r.n_eff for r in got]
    # Poisson(1): replicate sizes vary but center on n
    assert len(set(effs)) > 1
    for r in got:
        assert abs(r.n_eff - 500) < 120
        assert r.mean_ppm == 100 * 10**6  # constant metric is exact


def test_bootstrap_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        ev.bootstrap_means(df, "id", "id", n_reps=0)
