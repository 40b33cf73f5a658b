"""Hybrid fold A/B: the native window fast path must produce exactly
the Python fold's actions on every history shape, with varying-tag /
ε-close / odbl / flagged histories routing to Python."""

import json

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pytest-hybrid", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


FOLD_COLS = (
    "url string, element_type string, version int, visible boolean, "
    "accepted boolean, whitelisted boolean, blacklisted boolean, "
    "tags_json string, lon double, lat double, nodes array<bigint>, "
    "members_json string"
)


def _gen_histories():
    """Deterministic sweep over history shapes: n_versions 1-5, every
    visibility/acceptance bit pattern sampled arithmetically, constant
    vs varying tags, ε-close position pairs, empty tags."""
    rows = []
    uid = 0
    for n in range(1, 6):
        for pat in range(2 ** (2 * n)):
            uid += 1
            if uid % 3 == 0 and n > 2:
                continue  # thin the sweep, keep diversity
            url = f"h{uid}"
            vary_tags = pat % 7 == 0
            empty_tags = pat % 5 == 0
            close_pair = pat % 11 == 0
            for v in range(1, n + 1):
                visible = bool((pat >> (v - 1)) & 1) or v == 1
                accepted = bool((pat >> (n + v - 1)) & 1)
                if empty_tags:
                    tags = {}
                elif vary_tags:
                    tags = {"text": f"t{v}"}
                else:
                    tags = {"text": f"const{uid}"}
                lon = float(uid % 300) + v * 0.01
                lat = float(uid % 150) - v * 0.02
                if close_pair and v == n and n >= 2:
                    lon = float(uid % 300) + (v - 1) * 0.01 + 1e-8
                    lat = float(uid % 150) - (v - 1) * 0.02
                rows.append(
                    (url, "node", v, visible, accepted, False, False,
                     json.dumps(tags), lon, lat, None, None)
                )
    return rows


def _action_set(df):
    return {
        (
            r.url, r.action, r.version, r.mode,
            tuple(sorted(json.loads(r.new_tags_json).items()))
            if r.new_tags_json else None,
            round(r.new_lon, 9) if r.new_lon is not None else None,
            round(r.new_lat, 9) if r.new_lat is not None else None,
        )
        for r in df.collect()
    }


def test_hybrid_matches_python_fold(spark):
    from openstreetmap_license_change_spark.operators import fold

    df = spark.createDataFrame(_gen_histories(), FOLD_COLS)
    hybrid = _action_set(fold.classify_histories(df, native_fast_path=True))
    python = _action_set(fold.classify_histories_python(df))
    assert hybrid == python


def test_fast_path_has_no_python_for_eligible(spark):
    from openstreetmap_license_change_spark.operators import fold

    rows = [
        ("u1", "node", v, True, v % 2 == 0, False, False,
         '{"text": "same"}', 1.0 + v, 2.0 + v, None, None)
        for v in range(1, 4)
    ]
    df = spark.createDataFrame(rows, FOLD_COLS)
    fast = df.join(
        fold._fast_eligibility(fold._normalize_input(df))
        .where("eligible").select("url"),
        "url", "left_semi",
    )
    native = fold._classify_nodes_native(fold._normalize_input(fast))
    plan = native._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_eligibility_routing(spark):
    from openstreetmap_license_change_spark.operators import fold

    rows = [
        # constant tags, separated positions -> eligible
        ("ok", "node", 1, True, True, False, False, '{"a": "b"}',
         1.0, 1.0, None, None),
        ("ok", "node", 2, True, False, False, False, '{"a": "b"}',
         2.0, 2.0, None, None),
        # varying tags -> python
        ("vary", "node", 1, True, True, False, False, '{"a": "b"}',
         1.0, 1.0, None, None),
        ("vary", "node", 2, True, True, False, False, '{"a": "c"}',
         2.0, 2.0, None, None),
        # eps-close pair -> python
        ("close", "node", 1, True, True, False, False, '{"a": "b"}',
         1.0, 1.0, None, None),
        ("close", "node", 2, True, True, False, False, '{"a": "b"}',
         1.0 + 1e-8, 1.0, None, None),
        # odbl marker -> python
        ("odbl", "node", 1, True, True, False, False,
         '{"a": "b", "odbl": "clean"}', 1.0, 1.0, None, None),
        # created_by -> python
        ("auto", "node", 1, True, True, False, False,
         '{"created_by": "x"}', 1.0, 1.0, None, None),
    ]
    df = fold._normalize_input(spark.createDataFrame(rows, FOLD_COLS))
    flags = {r.url: r.eligible for r in fold._fast_eligibility(df).collect()}
    assert flags == {
        "ok": True, "vary": False, "close": False,
        "odbl": False, "auto": False,
    }
