"""Spark-side integration tests: the grouped fold UDF and the cascade
joins must reproduce the pure-Python core (which itself is golden-tested
against the reference suites)."""

import json

import pytest

from openstreetmap_license_change_spark.core.history import (
    AgreementDB,
    ChangeBot,
    HistoryStore,
)
from openstreetmap_license_change_spark.core.model import (
    NODE,
    RELATION,
    WAY,
    DeleteAct,
    EditAct,
    node,
    relation,
    way,
)

pyspark = pytest.importorskip("pyspark")


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pytest", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


CS = {1: True, 2: True, 3: False}


# ---------------------------------------------------------------------------
# fold UDF vs core
# ---------------------------------------------------------------------------

def _history_rows(histories):
    """histories: list of (url, [Element,...]) node histories →
    long-form fold input rows."""
    rows = []
    for url, versions in histories:
        for v in versions:
            rows.append(
                (
                    url, "node", v.version, v.visible, CS[v.changeset_id],
                    False, False, json.dumps(v.tags),
                    float(v.geom[0]), float(v.geom[1]), None, None,
                )
            )
    return rows


FOLD_COLS = (
    "url string, element_type string, version int, visible boolean, "
    "accepted boolean, whitelisted boolean, blacklisted boolean, "
    "tags_json string, lon double, lat double, nodes array<bigint>, "
    "members_json string"
)


def test_fold_matches_core_on_node_scenarios(spark):
    from openstreetmap_license_change_spark.core.history import element_actions
    from openstreetmap_license_change_spark.core.model import RedactAct
    from openstreetmap_license_change_spark.operators import fold

    histories = [
        ("n1", [node(1, 1, [0, 0], changeset_id=1),
                node(1, 2, [0, 0], changeset_id=2)]),
        ("n2", [node(2, 1, [0, 0], changeset_id=3)]),
        ("n3", [node(3, 1, [0, 0], changeset_id=3, tags={"foo": "bar"}),
                node(3, 2, [1, 1], changeset_id=1,
                     tags={"foo": "bar", "fee": "fie"})]),
        ("n4", [node(4, 1, [0, 0], changeset_id=1, tags={"foo": "bar"}),
                node(4, 2, [0, 0], changeset_id=3, tags={"foo": "blah"}),
                node(4, 3, [0, 0], changeset_id=2,
                     tags={"foo": "blah", "bar": "blah"})]),
        ("n5", [node(5, 1, [0, 0], changeset_id=1),
                node(5, 2, [0, 0], changeset_id=3, visible=False),
                node(5, 3, [2, 2], changeset_id=2, tags={"a": "b"})]),
    ]

    df = spark.createDataFrame(_history_rows(histories), FOLD_COLS)
    got = {
        (r.url, r.action, r.version, r.mode)
        for r in fold.classify_histories(df).collect()
    }

    expected = set()
    db = AgreementDB(changesets=CS)
    for url, versions in histories:
        for act in element_actions(versions, db):
            if isinstance(act, RedactAct):
                expected.add((url, "redact", act.version, act.mode))
            elif isinstance(act, DeleteAct):
                expected.add((url, "delete", None, None))
            else:
                expected.add((url, "edit", act.obj.version, None))
    assert got == expected


def test_fold_edit_payload_roundtrip(spark):
    from openstreetmap_license_change_spark.operators import fold

    histories = [
        ("e1", [node(1, 1, [0, 0], changeset_id=1, tags={"foo": "bar"}),
                node(1, 2, [0, 0], changeset_id=3, tags={"foo": "blah"})]),
    ]
    df = spark.createDataFrame(_history_rows(histories), FOLD_COLS)
    rows = fold.classify_histories(df).collect()
    edits = [r for r in rows if r.action == "edit"]
    assert len(edits) == 1
    assert json.loads(edits[0].new_tags_json) == {"foo": "bar"}
    assert (edits[0].new_lon, edits[0].new_lat) == (0.0, 0.0)


# ---------------------------------------------------------------------------
# cascade joins vs core ChangeBot
# ---------------------------------------------------------------------------

def _spark_cascade(spark, nodes, ways, relations):
    """Run the full core fold + Spark cascade over an in-memory world;
    return ({way edits}, {relation edits}, {deletes})."""
    import time

    from openstreetmap_license_change_spark.operators import cascade as casc

    _t0 = time.monotonic()

    store = HistoryStore(nodes=nodes, ways=ways, relations=relations)
    db = AgreementDB(changesets=CS)
    bot = ChangeBot(store, db)
    bot.process_all()

    # split the per-element fold output (pre-cascade)
    nd = [(d.element_id,) for d in bot.pending_deletes if d.etype == NODE]
    wd = [(d.element_id,) for d in bot.pending_deletes if d.etype == WAY]
    rd = [(d.element_id,) for d in bot.pending_deletes if d.etype == RELATION]
    we = [
        (e.obj.element_id, e.obj.version, json.dumps(e.obj.tags),
         [int(n) for n in e.obj.geom])
        for e in bot.pending_edits if e.obj.etype == WAY
    ]
    re_ = [
        (e.obj.element_id, e.obj.version, json.dumps(e.obj.tags),
         [(m[0], int(m[1]), m[2]) for m in e.obj.geom])
        for e in bot.pending_edits if e.obj.etype == RELATION
    ]
    cw = [
        (wid, vs[-1].version, json.dumps(vs[-1].tags),
         [int(n) for n in vs[-1].geom])
        for wid, vs in (ways or {}).items()
    ]
    cr = [
        (rid, vs[-1].version, json.dumps(vs[-1].tags),
         [(m[0], int(m[1]), m[2]) for m in vs[-1].geom])
        for rid, vs in (relations or {}).items()
    ]

    del_schema = "element_id bigint"
    way_schema = (
        "element_id bigint, version int, tags_json string, nodes array<bigint>"
    )
    rel_schema = (
        "element_id bigint, version int, tags_json string, "
        "members array<struct<mtype:string, ref:bigint, role:string>>"
    )
    mk = spark.createDataFrame
    way_state, rel_state, deletes = casc.cascade(
        mk(nd or [], del_schema), mk(wd or [], del_schema),
        mk(rd or [], del_schema),
        mk(we or [], way_schema), mk(re_ or [], rel_schema),
        mk(cw or [], way_schema), mk(cr or [], rel_schema),
    )

    got_deletes = {(r.etype, r.element_id) for r in deletes.collect()}
    got_way_edits = {
        (r.element_id, tuple(r.nodes))
        for r in way_state.where("is_edit").collect()
        if (("way", r.element_id) not in got_deletes)
    }
    got_rel_edits = {
        (r.element_id, tuple((m.mtype, m.ref, m.role) for m in r.members))
        for r in rel_state.where("is_edit").collect()
        if (("relation", r.element_id) not in got_deletes)
    }
    # untouched planned edits still count as edits
    for r in way_state.where("had_plan AND NOT is_edit AND NOT killed").collect():
        got_way_edits.add((r.element_id, tuple(r.nodes)))
    for r in rel_state.where("had_plan AND NOT is_edit").collect():
        got_rel_edits.add(
            (r.element_id, tuple((m.mtype, m.ref, m.role) for m in r.members))
        )

    # core oracle
    expected_changeset = bot.as_changeset()
    exp_deletes = {
        (d.etype, d.element_id)
        for d in expected_changeset if isinstance(d, DeleteAct)
    }
    exp_way_edits = {
        (e.obj.element_id, tuple(e.obj.geom))
        for e in expected_changeset
        if isinstance(e, EditAct) and e.obj.etype == WAY
    }
    exp_rel_edits = {
        (e.obj.element_id, tuple(e.obj.geom))
        for e in expected_changeset
        if isinstance(e, EditAct) and e.obj.etype == RELATION
    }
    assert got_deletes == exp_deletes
    assert got_way_edits == exp_way_edits
    assert got_rel_edits == exp_rel_edits
    # wall-clock budget: a lineage-truncation regression shows up as
    # combinatorial Catalyst analysis (round-1 hang) — fail, don't hang
    assert time.monotonic() - _t0 < 90, "cascade exceeded wall-clock budget"
    return got_deletes, got_way_edits, got_rel_edits, rel_state.collect()


def test_cascade_way_deletion(spark):  # test_references.rb:18-42 world
    _spark_cascade(
        spark,
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2], changeset_id=2)]},
        relations={},
    )


def test_cascade_remove_node_from_way(spark):  # test_references.rb:49-75
    _spark_cascade(
        spark,
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
            3: [node(3, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2, 3], changeset_id=2)]},
        relations={},
    )


def test_cascade_relation_chain(spark):  # test_references.rb:349-372
    _spark_cascade(
        spark,
        nodes={1: [node(1, 1, [0, 0], changeset_id=3)]},
        ways={},
        relations={
            1: [relation(1, 1, [(NODE, 1, "first")], changeset_id=2)],
            2: [relation(2, 1, [(RELATION, 1, "first")], changeset_id=2)],
        },
    )


def test_cascade_relation_of_relation_snapshot_quirk(spark):
    """GOLDEN for the reference's per-pass SNAPSHOT semantics
    (change_bot.rb:296-298, mirrored at operators/cascade.py:151-154):
    each type's delete pass iterates a snapshot of the pending-delete
    list taken at pass start, so a relation emptied BY the relation
    pass is deleted but its own referencers are never re-processed.

    World: node 1 (unaccepted) → deleted; R1=[node 1] is emptied by
    the node pass → its delete IS in the relation pass's snapshot;
    R2=[R1] is emptied DURING the relation pass → killed, but —
    the quirk — R3=[R2, node 50] is NOT re-processed: R3 keeps its
    dangling R2 member, and is neither edited nor deleted.  A
    well-meaning \"fixpoint fix\" that reprocesses R2 would remove R2
    from R3 and diverge from reference parity; this test pins the
    reference's exact (quirky) output so it can't slip in silently."""
    got_deletes, got_way_edits, got_rel_edits, rel_rows = _spark_cascade(
        spark,
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            50: [node(50, 1, [1, 1], changeset_id=1)],
        },
        ways={},
        relations={
            1: [relation(1, 1, [(NODE, 1, "")], changeset_id=2)],
            2: [relation(2, 1, [(RELATION, 1, "")], changeset_id=2)],
            3: [
                relation(
                    3, 1,
                    [(RELATION, 2, ""), (NODE, 50, "")],
                    changeset_id=2,
                )
            ],
        },
    )
    # hard-coded reference output, beyond the core-parity check above
    assert got_deletes == {
        ("node", 1), ("relation", 1), ("relation", 2)
    }
    assert got_way_edits == set()
    assert got_rel_edits == set()  # R3 untouched — the quirk
    r3 = next(r for r in rel_rows if r.element_id == 3)
    assert [(m.mtype, m.ref) for m in r3.members] == [
        ("relation", 2), ("node", 50)
    ], "R3 must keep its dangling R2 member (reference parity)"
    assert not r3.is_edit and not r3.killed


def test_cascade_mixed_world(spark):  # test_references.rb:315-344
    _spark_cascade(
        spark,
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=1)],
        },
        ways={1: [way(1, 1, [1, 2], changeset_id=2)]},
        relations={
            1: [
                relation(
                    1, 1,
                    [(NODE, 1, "first"), (NODE, 2, "second"), (WAY, 1, "third")],
                    changeset_id=2,
                )
            ]
        },
    )


def test_cascade_empty_relation(spark):  # test_references.rb:248-273
    _spark_cascade(
        spark,
        nodes={
            1: [node(1, 1, [0, 0], changeset_id=3)],
            2: [node(2, 1, [1, 1], changeset_id=3)],
            3: [node(3, 1, [1, 1], changeset_id=3)],
        },
        ways={},
        relations={
            1: [
                relation(
                    1, 1,
                    [(NODE, 1, "first"), (NODE, 2, "second"), (NODE, 3, "third")],
                    changeset_id=2,
                )
            ]
        },
    )


# ---------------------------------------------------------------------------
# spatial kernels
# ---------------------------------------------------------------------------

def _py_quad_tile(lon, lat):
    """Reference Morton interleave in plain Python (mirrors
    extract_loader.rb:111-131)."""
    x = max(0, min(65535, int((lon + 180.0) * 65536.0 / 360.0)))
    y = max(0, min(65535, int((lat + 90.0) * 65536.0 / 180.0)))
    tile = 0
    for i in range(16):
        tile |= ((x >> i) & 1) << (2 * i)
        tile |= ((y >> i) & 1) << (2 * i + 1)
    return tile


def test_quad_tile_matches_bitwise_reference(spark):
    from pyspark.sql import functions as F

    from openstreetmap_license_change_spark.operators import spatial

    pts = [
        (0.0, 0.0), (-179.9999, -89.9999), (179.9999, 89.9999),
        (13.3777, 52.5162), (-0.1276, 51.5072), (151.2093, -33.8688),
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    rows = df.withColumn(
        "tile", spatial.quad_tile(F.col("lon"), F.col("lat"))
    ).collect()
    for r in rows:
        assert r.tile == _py_quad_tile(r.lon, r.lat), (r.lon, r.lat)


def test_pip_polygons_ray_cast(spark):
    from openstreetmap_license_change_spark.operators import spatial

    # a triangle and a square
    polys = [
        (1, [(0.0, 0.0), (10.0, 0.0), (5.0, 10.0), (0.0, 0.0)]),
        (2, [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0),
             (20.0, 20.0)]),
    ]
    pts = [
        (5.0, 2.0, 1),     # inside triangle
        (25.0, 25.0, 2),   # inside square
        (15.0, 15.0, None),  # outside both
        (-50.0, -50.0, None),  # outside union bbox (native prefilter)
    ]
    df = spark.createDataFrame(
        [(lon, lat) for lon, lat, _ in pts], "lon double, lat double"
    )
    got = {
        (r.lon, r.lat): r.polygon_id
        for r in spatial.pip_join_polygons(df, polys).collect()
    }
    for lon, lat, want in pts:
        assert got[(lon, lat)] == want, (lon, lat)


def test_pip_polygons_prefiltered_equivalence(spark):
    """Cell-prefiltered polygon PIP returns exactly the sequential-scan
    result, including first-match precedence on overlap, on a grid of
    points spanning in/out/edge/bbox-miss cases."""
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.operators import spatial

    polys = [
        (7, [(0.0, 0.0), (10.0, 0.0), (5.0, 10.0), (0.0, 0.0)]),      # triangle
        (3, [(4.0, 1.0), (12.0, 1.0), (12.0, 9.0), (4.0, 9.0),
             (4.0, 1.0)]),                                            # overlaps it
        (2, [(20.0, 20.0), (30.0, 20.0), (30.0, 30.0), (20.0, 30.0),
             (20.0, 20.0)]),
    ]
    pts = spark.range(0, 400).select(
        F.concat(F.lit("p"), F.col("id")).alias("url"),
        ((F.col("id") % 20) * 2.0 - 4.0).alias("lon"),
        ((F.col("id") / 20).cast("int") * 2.0 - 4.0).alias("lat"),
    )
    seq = {
        r.url: r.polygon_id
        for r in spatial.pip_join_polygons(pts, polys).collect()
    }
    pre = {
        r.url: r.polygon_id
        for r in spatial.pip_join_polygons_prefiltered(
            pts, polys, res_deg=4.0
        ).collect()
    }
    assert seq == pre
    assert any(v == 7 for v in seq.values())  # overlap resolved to first
    assert any(v == 3 for v in seq.values())
    assert any(v == 2 for v in seq.values())


def test_ngram_jaccard_doc_freq_cap(spark):
    """With a permissive cap (1.0) the capped candidate path returns the
    exact uncapped result; an aggressive cap returns a subset whose
    jaccard values are still exact."""
    from openstreetmap_license_change_spark.operators import dedup
    from openstreetmap_license_change_spark.sources import pages

    docs = pages.documents(spark, "/root/testdata/sf0.001")
    base = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()
    }
    capped_loose = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_doc_freq=1.0
        ).collect()
    }
    assert capped_loose == base
    capped_tight = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_doc_freq=0.02
        ).collect()
    }
    assert set(capped_tight) <= set(base)
    for pair, j in capped_tight.items():
        assert j == base[pair]  # jaccard stays exact for generated pairs


def test_lsh_pairs_mega_bucket_cap_and_overflow_metrics(spark):
    """A planted mega-bucket (60 identical docs — the Common-Crawl
    boilerplate shape) must emit NO pairs under the cap, while distinct
    near-dup pairs below the cap survive; the SAME job records the
    overflow in an Observation (no silent caps, no extra pass)."""
    from pyspark.sql import Observation
    from openstreetmap_license_change_spark.operators import dedup

    boiler = [(i, "the same boilerplate page text repeated verbatim")
              for i in range(60)]
    # a small true near-dup pair, distinct from the boilerplate
    pair = [
        (100, "completely different article about spark partitioning"),
        (101, "completely different article about spark partitioning"),
    ]
    singles = [(200 + i, f"unique document number {i} with its own words {i*7}")
               for i in range(5)]
    docs = spark.createDataFrame(
        boiler + pair + singles, "doc_id bigint, text string"
    )

    # uncapped: the mega-bucket alone emits 60·59/2 = 1770 pairs
    uncapped = dedup.minhash_lsh_pairs(docs).count()
    assert uncapped >= 1770

    obs = Observation("lsh_overflow")
    capped = dedup.minhash_lsh_pairs(
        docs, max_bucket_size=16, observation=obs
    )
    got = {(r.doc_a, r.doc_b) for r in capped.collect()}
    # identical docs agree on EVERY band → all their buckets overflow
    assert not any(a < 60 and b < 60 for a, b in got), got
    # the small near-dup pair still pairs (its buckets are size 2)
    assert (100, 101) in got
    m = obs.get
    assert m["overflow_buckets"] >= 1
    assert m["overflow_docs"] >= 60
    assert m["total_buckets"] > m["overflow_buckets"]


def test_lsh_clusters_consistent_with_pairs(spark):
    """Cluster labels must be exactly the connected components of the
    LSH pair graph: paired docs share a label; the label is the
    component min; docs in no pair are singletons."""
    from openstreetmap_license_change_spark.operators import dedup
    from openstreetmap_license_change_spark.sources import pages

    docs = pages.documents(spark, "/root/testdata/sf0.001")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs).collect()
    ]
    labels = {
        r.doc_id: r.cluster_id
        for r in dedup.minhash_lsh_clusters(docs).collect()
    }
    # union-find ground truth from the pair list
    parent = {d: d for d in labels}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {d: find(d) for d in labels}
    assert labels == expected


def test_lsh_pairs_uncapped_plan_has_no_pair_dedup(spark):
    """The uncapped pair path dedups via the first-matching-band
    residual, NOT a distinct(): the executed plan must contain no
    aggregate keyed on (doc_a, doc_b), and the output must still be
    duplicate-free on a corpus whose docs agree on EVERY band."""
    from openstreetmap_license_change_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, "exactly the same text in every document") for i in range(6)]
        + [(100, "another strain of words"), (101, "another strain of words")],
        "doc_id bigint, text string",
    )
    out = dedup.minhash_lsh_pairs(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "keys=[doc_a" not in plan, plan
    got = [(r.doc_a, r.doc_b) for r in out.collect()]
    assert len(got) == len(set(got))
    assert set(got) >= {(0, 1), (4, 5), (100, 101)}


def test_asof_join_ties_and_missing(spark):
    """Exact-timestamp ties match (>= convention); rows before any
    right row get null."""
    import datetime as dt

    from openstreetmap_license_change_spark.operators import temporal

    def t(m):
        return dt.datetime(2024, 1, 1, 0, m)

    left = spark.createDataFrame(
        [(1, 100, t(0)), (1, 101, t(5)), (1, 102, t(10)), (2, 200, t(3))],
        "user_id bigint, event_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t(5), 7.0), (1, t(9), 9.0)],
        "user_id bigint, ts timestamp, v double",
    )
    out = {
        r.event_id: r.asof_v
        for r in temporal.asof_join(
            left, right, "user_id", "ts", "ts", ["v"]
        ).collect()
    }
    assert out == {100: None, 101: 7.0, 102: 9.0, 200: None}


def test_asof_join_randomized_vs_bruteforce(spark):
    """300 random left rows × 100 random right rows across 20 keys:
    the window form must equal the brute-force 'latest right <= ts'
    scan, including duplicate left timestamps and keys with no right
    rows at all."""
    import datetime as dt
    import random

    from openstreetmap_license_change_spark.operators import temporal

    rng = random.Random(7)
    base = dt.datetime(2024, 3, 1)

    def t(mins):
        return base + dt.timedelta(minutes=mins)

    lrows = [
        (rng.randint(0, 19), i, t(rng.randint(0, 500)))
        for i in range(300)
    ]
    # right rows only for keys 0..14, unique (key, ts)
    seen = set()
    rrows = []
    while len(rrows) < 100:
        k, m = rng.randint(0, 14), rng.randint(0, 500)
        if (k, m) not in seen:
            seen.add((k, m))
            rrows.append((k, t(m), float(len(rrows))))
    left = spark.createDataFrame(
        lrows, "user_id bigint, event_id bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        rrows, "user_id bigint, ts timestamp, v double"
    )
    got = {
        r.event_id: r.asof_v
        for r in temporal.asof_join(
            left, right, "user_id", "ts", "ts", ["v"]
        ).collect()
    }
    for k, eid, ts in lrows:
        cands = [(rts, v) for rk, rts, v in rrows if rk == k and rts <= ts]
        want = max(cands)[1] if cands else None
        assert got[eid] == want, (k, eid, ts)


# ---------------------------------------------------------------------------
# "no silent caps": lsh cluster convergence signal + fold hot-key cap
# ---------------------------------------------------------------------------

def _chain_membership(spark, n):
    """Hand-built doc–bucket CHAIN: bucket i = {doc i, doc i+1}.  Label
    propagation moves the component min one chain-hop per iteration, so
    an n-doc chain needs ~n iterations — the adversarial shape for the
    max_iters exhaustion signal."""
    rows = []
    for i in range(n - 1):
        rows.append((i, f"b{i}"))
        rows.append((i + 1, f"b{i}"))
    return spark.createDataFrame(rows, "doc_id bigint, bk string")


def test_lsh_clusters_nonconvergence_warns(spark, monkeypatch):
    """A pair-graph diameter beyond max_iters must NOT silently return
    wrong cluster ids — the RuntimeWarning signal fires (SURVEY §4)."""
    from openstreetmap_license_change_spark.operators import dedup

    n = 30
    monkeypatch.setattr(
        dedup, "_lsh_buckets", lambda df, id_col="doc_id": _chain_membership(spark, n)
    )
    docs = spark.createDataFrame(
        [(i, "x") for i in range(n)], "doc_id bigint, text string"
    )
    with pytest.warns(RuntimeWarning, match="did NOT converge"):
        labels = {
            r.doc_id: r.cluster_id
            for r in dedup.minhash_lsh_clusters(docs, max_iters=3).collect()
        }
    # and the result really is split (docs far down the chain haven't
    # seen label 0 yet) — the condition the signal exists to expose
    assert labels[n - 1] != 0


def test_lsh_clusters_chain_converges_with_enough_iters(spark, monkeypatch):
    """Same chain, enough iterations: single component, no warning."""
    import warnings as _w

    from openstreetmap_license_change_spark.operators import dedup

    n = 12
    monkeypatch.setattr(
        dedup, "_lsh_buckets", lambda df, id_col="doc_id": _chain_membership(spark, n)
    )
    docs = spark.createDataFrame(
        [(i, "x") for i in range(n)], "doc_id bigint, text string"
    )
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        labels = {
            r.doc_id: r.cluster_id
            for r in dedup.minhash_lsh_clusters(docs, max_iters=n + 2).collect()
        }
    assert labels == {i: 0 for i in range(n)}


def _mega_history_rows(url, n, dirty):
    """n-version node history; dirty=True rejects the last changeset."""
    rows = []
    for v in range(1, n + 1):
        accepted = not (dirty and v == n)
        rows.append(
            (url, "node", v, True, accepted, False, False,
             "{}", 0.0, 0.0, None, None)
        )
    return rows


def test_fold_clean_mega_history_consistent_across_paths(spark):
    """A >MAX_VERSIONS all-accepted history yields NO actions on BOTH
    A/B paths (the clean short-circuit precedes the hot-key cap), and a
    dirty mega-history caps to delete+redact-all on both, counted in
    the capped accumulator."""
    from openstreetmap_license_change_spark.operators import fold

    n = fold.MAX_VERSIONS_PER_ELEMENT + 50
    rows = _mega_history_rows("clean_mega", n, dirty=False) + \
        _mega_history_rows("dirty_mega", n, dirty=True)
    df = spark.createDataFrame(rows, FOLD_COLS)

    for path in (fold.classify_histories_python, fold.classify_histories_grouped):
        acc = spark.sparkContext.accumulator(0)
        got = path(df, capped_acc=acc).collect()
        by_url = {}
        for r in got:
            by_url.setdefault(r.url, []).append(r)
        assert "clean_mega" not in by_url, path.__name__
        dirty = by_url["dirty_mega"]
        assert sum(1 for r in dirty if r.action == "delete") == 1
        assert sum(1 for r in dirty if r.action == "redact") == n
        assert all(r.mode == "hidden" for r in dirty if r.action == "redact")
        # exactly the one dirty group hit the cap; the clean one did not
        assert acc.value == 1, path.__name__
