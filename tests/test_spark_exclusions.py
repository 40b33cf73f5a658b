"""Spark-path exclusion (P3) + list-file ingestion (S6/P7/S5) tests:
the test_exceptions.rb:33-66 world run through the *Spark* operators
(broadcast semi/anti split + native redact fan-out), not the core."""

import json

import pytest

from openstreetmap_license_change_spark.operators import exclusions
from openstreetmap_license_change_spark.sources import lists


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pytest-exclusions", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def _history_rows(node_id, n_versions=3):
    # all versions in accepted changeset 1 → fold yields no actions
    return [
        (
            f"node/{node_id}",
            "node",
            v,
            True,
            True,
            False,
            False,
            json.dumps({"foo": "bar"}),
            float(v),
            0.0,
        )
        for v in range(1, n_versions + 1)
    ]


HIST_SCHEMA = (
    "url string, element_type string, version int, visible boolean, "
    "accepted boolean, whitelisted boolean, blacklisted boolean, "
    "tags_json string, lon double, lat double"
)


def test_spark_exclusion_split(spark):  # test_exceptions.rb:33-66
    rows = []
    for nid in (1, 2, 3, 4, 5):
        rows.extend(_history_rows(nid))
    hist = spark.createDataFrame(rows, HIST_SCHEMA)
    exc = spark.createDataFrame(
        [("node", "node/1"), ("node", "node/2"), ("node", "node/4")],
        "element_type string, url string",
    )

    out = exclusions.classify_with_exclusions(hist, exc).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r.url, []).append(r)

    # clean non-excluded histories produce nothing
    assert "node/3" not in by_url and "node/5" not in by_url
    # excluded: one delete + hidden redact per version
    # (change_bot.rb:214-218)
    for nid in (1, 2, 4):
        acts = by_url[f"node/{nid}"]
        deletes = [r for r in acts if r.action == "delete"]
        redacts = sorted(
            (r.version, r.mode) for r in acts if r.action == "redact"
        )
        assert len(deletes) == 1 and deletes[0].version is None
        assert redacts == [(1, "hidden"), (2, "hidden"), (3, "hidden")]
        assert len(acts) == 4


def test_spark_exclusion_skips_python_fold(spark):
    """Excluded elements must not pass through the Python fold: the
    excluded-action plan contains no Python evaluation node."""
    hist = spark.createDataFrame(_history_rows(1), HIST_SCHEMA)
    exc = spark.createDataFrame([("node", "node/1")],
                                "element_type string, url string")
    excluded_actions, remainder = exclusions.split_exclusions(hist, exc)
    plan = excluded_actions._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
    assert remainder.count() == 0


def test_load_id_list_comment_filter(spark, tmp_path):  # P7
    p = tmp_path / "agreed.txt"
    p.write_text(
        "# header comment\n"
        "123\n"
        "   # indented comment\n"
        "456 trailing words\n"
        "789\n"
    )
    ids = sorted(r.id for r in lists.load_id_list(spark, str(p)).collect())
    assert ids == [123, 456, 789]


def test_membership_flag_with_uid_limit(spark, tmp_path):  # S5, J6
    p = tmp_path / "users.txt"
    p.write_text("10\n20\n")
    users = lists.load_id_list(spark, str(p))
    df = spark.createDataFrame(
        [(10,), (15,), (20,), (286581,), (286582,), (400000,)], "uid bigint"
    )
    out = lists.membership_flag(
        df, users, "uid", "agreed", limit=lists.DEFAULT_USER_LIMIT
    )
    got = {r.uid: r.agreed for r in out.collect()}
    # list members agreed; uid >= limit agreed by construction
    # (check_history.rb:94-96)
    assert got == {
        10: True, 15: False, 20: True,
        286581: False, 286582: True, 400000: True,
    }
    # broadcast join, df itself not shuffled
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
