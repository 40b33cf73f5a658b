"""IPF / RAS balancing (spatial.ipf_balance) — one-round exact fixed
point, floor-ladder convergence toward both margins, structural
zeros, missing-target rows empty, random ≡ mirror ≡ twin."""

import random

import duckdb
import pytest

from openstreetmap_license_change_spark.operators import spatial


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("ipf-tests", master="local[4]",
                    shuffle_partitions=8)


SEED = "cell_from long, cell_to long, n_flows long"
TGT_R = "cell_from long, target long"
TGT_C = "cell_to long, target long"


def _run(spark, seed, rt, ct, rounds=6):
    out = spatial.ipf_balance(
        spark.createDataFrame(seed, SEED),
        spark.createDataFrame(rt, TGT_R),
        spark.createDataFrame(ct, TGT_C),
        rounds=rounds,
    ).collect()
    return {(r.cell_from, r.cell_to): r.w_ppm for r in out}


def _mirror(seed, rt, ct, rounds=6, scale=10**6):
    w = {(a, b): n * scale for a, b, n in seed}
    rt = dict((a, t) for a, t in rt)
    ct = dict((b, t) for b, t in ct)
    for _ in range(rounds):
        rs = {}
        for (a, _), v in w.items():
            rs[a] = rs.get(a, 0) + v
        for k in list(w):
            a = k[0]
            w[k] = (0 if rs[a] == 0 or a not in rt
                    else (w[k] * rt[a] * scale) // rs[a])
        cs = {}
        for (_, b), v in w.items():
            cs[b] = cs.get(b, 0) + v
        for k in list(w):
            b = k[1]
            w[k] = (0 if cs[b] == 0 or b not in ct
                    else (w[k] * ct[b] * scale) // cs[b])
    return w


def test_one_round_exact_fixed_point(spark):
    # uniform 2×2 seed, row targets (3,1), col targets (2,2): the
    # row step lands exactly on the column margins — a fixed point
    seed = [(0, 0, 1), (0, 1, 1), (1, 0, 1), (1, 1, 1)]
    rt = [(0, 3), (1, 1)]
    ct = [(0, 2), (1, 2)]
    got = _run(spark, seed, rt, ct, rounds=4)
    assert got == {(0, 0): 1_500_000, (0, 1): 1_500_000,
                   (1, 0): 500_000, (1, 1): 500_000}


def test_converges_to_both_margins(spark):
    seed = [(0, 0, 5), (0, 1, 1), (1, 0, 1), (1, 1, 5)]
    rt = [(0, 10), (1, 10)]
    ct = [(0, 4), (1, 16)]
    got = _run(spark, seed, rt, ct, rounds=8)
    assert got == _mirror(seed, rt, ct, rounds=8)
    col0 = got[(0, 0)] + got[(1, 0)]
    col1 = got[(0, 1)] + got[(1, 1)]
    # the final half-round is a column step: column margins exact
    # up to the per-cell floor
    assert abs(col0 - 4_000_000) <= 2 and abs(col1 - 16_000_000) <= 2
    row0 = got[(0, 0)] + got[(0, 1)]
    assert abs(row0 - 10_000_000) < 50_000   # rows approach theirs


def test_structural_zero_stays_zero(spark):
    seed = [(0, 0, 2), (1, 1, 2)]   # no (0,1)/(1,0) cells at all
    rt = [(0, 4), (1, 4)]
    ct = [(0, 4), (1, 4)]
    got = _run(spark, seed, rt, ct)
    assert set(got) == {(0, 0), (1, 1)}
    assert got[(0, 0)] == 4_000_000 and got[(1, 1)] == 4_000_000


def test_missing_target_empties(spark):
    seed = [(0, 0, 2), (1, 0, 2)]
    rt = [(0, 2)]                   # row 1 has no target
    ct = [(0, 2)]
    got = _run(spark, seed, rt, ct, rounds=2)
    assert got[(1, 0)] == 0
    assert got[(0, 0)] == 2_000_000
    assert got == _mirror(seed, rt, ct, rounds=2)


def test_validation(spark):
    with pytest.raises(ValueError, match="rounds"):
        _run(spark, [(0, 0, 1)], [(0, 1)], [(0, 1)], rounds=0)


def test_random_vs_mirror_and_twin(spark):
    rng = random.Random(9090)
    cells = list(range(6))
    seed = [
        (a, b, rng.randrange(1, 20))
        for a in cells for b in cells if rng.random() < 0.6
    ]
    rt = [(a, rng.randrange(5, 80)) for a in cells]
    ct = [(b, rng.randrange(5, 80)) for b in cells]
    got = _run(spark, seed, rt, ct, rounds=5)
    assert got == _mirror(seed, rt, ct, rounds=5)
    con = duckdb.connect()
    con.execute("CREATE TABLE s(cell_from BIGINT, cell_to BIGINT, "
                "n_flows BIGINT)")
    con.execute("CREATE TABLE r(cell_from BIGINT, target BIGINT)")
    con.execute("CREATE TABLE c(cell_to BIGINT, target BIGINT)")
    con.executemany("INSERT INTO s VALUES (?, ?, ?)", seed)
    con.executemany("INSERT INTO r VALUES (?, ?)", rt)
    con.executemany("INSERT INTO c VALUES (?, ?)", ct)
    out = con.execute(spatial.ipf_balance_sql(
        "s", "r", "c", rounds=5
    )).fetchall()
    assert {(r[0], r[1]): r[2] for r in out} == got
