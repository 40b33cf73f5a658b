"""Fold UDF over way/relation histories (sequence-diff algebra inside
Spark) + hot-cell salting + streaming smoke."""

import json

import pytest

pyspark = pytest.importorskip("pyspark")


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("fold-geom-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


FOLD_COLS = (
    "url string, element_type string, version int, visible boolean, "
    "accepted boolean, whitelisted boolean, blacklisted boolean, "
    "tags_json string, lon double, lat double, nodes array<bigint>, "
    "members_json string"
)


def test_fold_way_history(spark):
    """test_way.rb:71-81 world through the Spark fold."""
    from openstreetmap_license_change_spark.operators import fold

    rows = [
        ("w1", "way", 1, True, True, False, False,
         json.dumps({"highway": "trunk"}), None, None, [1, 2, 3], None),
        ("w1", "way", 2, True, False, False, False,
         json.dumps({"highway": "trunk"}), None, None, [4, 5, 1, 2, 3], None),
        ("w1", "way", 3, True, True, False, False,
         json.dumps({"highway": "primary"}), None, None, [4, 5, 1, 2, 3], None),
    ]
    out = fold.classify_histories(spark.createDataFrame(rows, FOLD_COLS)).collect()
    by_action = {(r.action, r.version): r for r in out}
    edit = by_action[("edit", 3)]
    assert edit.new_nodes == [1, 2, 3]
    assert json.loads(edit.new_tags_json) == {"highway": "primary"}
    assert by_action[("redact", 2)].mode == "hidden"
    assert by_action[("redact", 3)].mode == "visible"
    assert len(out) == 3


def test_fold_relation_history(spark):
    """test_relation.rb:44-55 world through the Spark fold."""
    from openstreetmap_license_change_spark.operators import fold

    def members(ms):
        return json.dumps([list(m) for m in ms])

    rows = [
        ("r1", "relation", 1, True, False, False, False,
         json.dumps({"type": "route"}), None, None, None,
         members([("way", 1, ""), ("way", 2, "")])),
        ("r1", "relation", 2, True, True, False, False,
         json.dumps({"type": "route"}), None, None, None,
         members([("way", 1, ""), ("way", 4, ""), ("way", 2, "")])),
        ("r1", "relation", 3, True, True, False, False,
         json.dumps({"type": "route"}), None, None, None,
         members([("way", 1, ""), ("way", 4, ""), ("way", 2, ""),
                  ("way", 3, "")])),
    ]
    out = fold.classify_histories(spark.createDataFrame(rows, FOLD_COLS)).collect()
    edits = [r for r in out if r.action == "edit"]
    assert len(edits) == 1
    assert json.loads(edits[0].new_members_json) == [
        ["way", 4, ""], ["way", 3, ""],
    ]
    redacts = {(r.version, r.mode) for r in out if r.action == "redact"}
    assert redacts == {(1, "hidden"), (2, "visible"), (3, "visible")}


def test_salt_hot_cells(spark):
    from pyspark.sql import functions as F

    from openstreetmap_license_change_spark.operators import spatial

    df = spark.createDataFrame(
        [(f"u{i}", 7 if i < 90 else i) for i in range(100)],
        "url string, cell bigint",
    )
    salted = spatial.salt_hot_cells(df, hot_cells=[7], buckets=4)
    groups = (
        salted.groupBy("cell_salted").count().collect()
    )
    hot_groups = [g for g in groups if g.cell_salted.startswith("7#")]
    cold_groups = [g for g in groups if "#" not in g.cell_salted]
    assert 2 <= len(hot_groups) <= 4  # hot cell split into salted buckets
    assert sum(g["count"] for g in hot_groups) == 90
    assert all(g["count"] == 1 for g in cold_groups)


def test_streaming_rollup_smoke(spark, tmp_path_factory):
    """readStream → watermark window rollup → memory sink, one trigger."""
    import time

    from openstreetmap_license_change_spark.sources import pages as pages_src
    from openstreetmap_license_change_spark.streaming import incremental

    src_dir = str(tmp_path_factory.mktemp("stream_src"))
    pages = pages_src.pages_from_documents(spark, "/root/testdata/sf0.001")
    pages.select(
        "url", "version", "warc_epoch", "text", "lang",
        "changeset_id", "uid", "lon", "lat", "visible",
    ).coalesce(1).write.mode("overwrite").parquet(src_dir)

    stream = incremental.stream_pages(spark, src_dir)
    rollup = incremental.streaming_tile_rollup(stream, window="60 minutes")
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_smoke")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only watermark-closed windows; the plan itself
    # executing end-to-end (source → watermark → windowed agg → sink)
    # is the contract here
    assert q.lastProgress is not None
    rows = spark.sql("select * from rollup_smoke").collect()
    assert isinstance(rows, list)


def test_fold_randomized_differential_vs_core(spark):
    """120 seeded random node histories (mixed accept/visible/odbl/
    whitelist/blacklist, incl. fully-accepted ones) through the Spark
    batched fold must equal the core fold history-by-history — guards
    the Arrow batching, the carry-across-batches, and the vectorized
    clean-history prune."""
    import random

    from openstreetmap_license_change_spark.core.history import (
        AgreementDB, element_actions,
    )
    from openstreetmap_license_change_spark.core.model import Element
    from openstreetmap_license_change_spark.operators import fold

    rng = random.Random(20260817)
    rows, expected = [], set()
    for h in range(120):
        url = f"n{h}"
        n_v = rng.randint(1, 6)
        versions, accepted = [], {}
        for v in range(1, n_v + 1):
            acc = rng.random() < 0.5
            vis = rng.random() > 0.15
            tags = {}
            if rng.random() < 0.8:
                tags["name"] = f"t{rng.randint(0, 3)}"
            if rng.random() < 0.1:
                tags["odbl"] = "clean"
            lon = round(rng.uniform(-10, 10), 4)
            lat = round(rng.uniform(-10, 10), 4)
            cs = h * 10 + v
            accepted[cs] = acc
            versions.append(
                Element("node", h, v, changeset_id=cs, visible=vis,
                        tags=tags if vis else {},
                        geom=[lon, lat] if vis else None)
            )
            rows.append(
                (url, "node", v, vis, acc, False, False,
                 json.dumps(tags if vis else {}),
                 lon if vis else None, lat if vis else None, None, None)
            )
        db = AgreementDB(changesets=accepted, edit_whitelist=set(),
                         edit_blacklist=set())
        for act in element_actions(versions, db):
            kind = type(act).__name__
            if kind == "RedactAct":
                expected.add((url, "redact", act.version, act.mode))
            elif kind == "DeleteAct":
                expected.add((url, "delete", None, None))
            else:
                expected.add((url, "edit", act.obj.version, None))

    out = fold.classify_histories(
        spark.createDataFrame(rows, FOLD_COLS).repartition(7)
    ).collect()
    got = {(r.url, r.action, r.version, r.mode) for r in out}
    assert got == expected
