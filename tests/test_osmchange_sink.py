"""osmChange XML sink (S9) golden test: exact document text for a
mixed changeset, mirroring osm_print.rb:35-123 semantics (attribute
set/order, from_delete rendering, self-closing empties, escaping)."""

import pytest


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pytest-osmchange", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SCHEMA = (
    "etype string, element_id bigint, action string, version int, "
    "tags map<string,string>, lon double, lat double, "
    "nodes array<bigint>, "
    "members array<struct<mtype:string,ref:bigint,role:string>>"
)

EXPECTED = """<osmChange version="0.6" generator="Redaction bot">
  <modify>
    <relation id="2" changeset="-1" user="Redaction bot" uid="0" visible="true" timestamp="2012-04-01T00:00:00Z" version="1">
      <member type="node" ref="1" role="outer"/>
      <member type="way" ref="3" role=""/>
    </relation>
  </modify>
  <modify>
    <way id="3" changeset="-1" user="Redaction bot" uid="0" visible="true" timestamp="2012-04-01T00:00:00Z" version="2">
      <nd ref="1"/>
      <nd ref="2"/>
    </way>
  </modify>
  <modify>
    <node id="5" changeset="-1" user="Redaction bot" uid="0" visible="true" timestamp="2012-04-01T00:00:00Z" version="3" lat="-2.25" lon="1.5">
      <tag k="name" v="Foo &amp; &quot;Bar&quot;"/>
    </node>
  </modify>
  <delete>
    <relation id="9" changeset="-1" user="Redaction bot" uid="0" visible="false" timestamp="2012-04-01T00:00:00Z" version="4"/>
  </delete>
  <delete>
    <node id="7" changeset="-1" user="Redaction bot" uid="0" visible="false" timestamp="2012-04-01T00:00:00Z" version="2" lat="0" lon="0"/>
  </delete>
</osmChange>
"""


def test_osmchange_golden(spark):
    from openstreetmap_license_change_spark.plans import osmchange

    rows = [
        # deliberately out of emission order: the sink must order
        # edits rel→way→node, then deletes rel→way→node
        ("node", 7, "delete", 2, None, None, None, None, None),
        ("node", 5, "edit", 3, {"name": 'Foo & "Bar"'}, 1.5, -2.25,
         None, None),
        ("way", 3, "edit", 2, None, None, None, [1, 2], None),
        ("relation", 9, "delete", 4, None, None, None, None, None),
        ("relation", 2, "edit", 1, None, None, None, None,
         [("node", 1, "outer"), ("way", 3, "")]),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    assert osmchange.osmchange_doc(df) == EXPECTED


def test_osmchange_fragments_native_plan(spark):
    """Fragment rendering must stay JVM-side — no Python in the plan."""
    from openstreetmap_license_change_spark.plans import osmchange

    df = spark.createDataFrame(
        [("node", 1, "edit", 1, None, 0.5, 0.5, None, None)], SCHEMA
    )
    frags = osmchange.osmchange_fragments(df)
    plan = frags._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_osmchange_empty_node_selfcloses(spark):
    from openstreetmap_license_change_spark.plans import osmchange

    df = spark.createDataFrame(
        [("node", 1, "edit", 1, None, 0.5, 0.25, None, None)], SCHEMA
    )
    doc = osmchange.osmchange_doc(df)
    assert '<node id="1"' in doc and 'lat="0.25" lon="0.5"/>' in doc


def test_actions_to_osmchange_input_bridge(spark):
    """Fold ACTION_SCHEMA rows flow into the sink: redactions drop,
    delete versions join from the latest snapshot, members/tags parse
    from their JSON wire form."""
    from openstreetmap_license_change_spark.operators.fold import ACTION_SCHEMA
    from openstreetmap_license_change_spark.plans import osmchange

    actions = spark.createDataFrame(
        [
            ("a", "node", "edit", 3, None, '{"k": "v"}', 1.5, -2.25,
             None, None),
            ("a", "node", "redact", 1, "hidden", None, None, None,
             None, None),
            ("b", "way", "delete", None, None, None, None, None,
             None, None),
            ("c", "relation", "edit", 2, None, "{}", None, None,
             None, '[["node", 4, "stop"], ["way", 9, ""]]'),
        ],
        ACTION_SCHEMA,
    )
    latest = spark.createDataFrame(
        [("a", 3), ("b", 7), ("c", 2)], "url string, version int"
    )
    out = osmchange.actions_to_osmchange_input(actions, latest)
    rows = {r.etype: r for r in out.collect()}
    assert set(rows) == {"node", "way", "relation"}  # redact filtered
    assert rows["way"].action == "delete" and rows["way"].version == 7
    assert rows["node"].tags == {"k": "v"} and rows["node"].lon == 1.5
    mem = rows["relation"].members
    assert [(m.mtype, m.ref, m.role) for m in mem] == [
        ("node", 4, "stop"), ("way", 9, "")]

    doc = osmchange.osmchange_doc(out)
    assert '<nd ' not in doc                       # deletes carry no children
    assert '<member type="node" ref="4" role="stop"/>' in doc
    assert 'visible="false"' in doc and '<tag k="k" v="v"/>' in doc
    # emission order: edits relation->way->node before deletes
    assert doc.index("<modify>") < doc.index("<delete>")


def test_pipeline_emits_osmchange_shards(spark, tmp_path):
    from pyspark.sql import functions as F
    from openstreetmap_license_change_spark.plans.pipeline import run_pipeline

    oc_dir = str(tmp_path / "osc")
    run_pipeline(
        spark, "/root/testdata/sf0.001", str(tmp_path / "work"),
        osmchange_dir=oc_dir,
    )
    body = spark.read.text(f"{oc_dir}/body")
    n_frag_lines = body.count()
    assert n_frag_lines > 0
    header = spark.read.text(f"{oc_dir}/_header").collect()[0].value
    assert header.startswith("<osmChange")

    # the sink commits as an audited stage: rows = fragment count from
    # the write job's own Observation, bytes from the shard walk
    import json as _json
    import os as _os

    audit = _json.load(open(str(tmp_path / "work" / "_audit.json")))
    assert audit["osmchange"]["rows"] > 0
    assert audit["osmchange"]["bytes"] > 0

    # resume skips a committed export: body mtimes unchanged on re-run
    body_dir = f"{oc_dir}/body"
    before = {
        f: _os.path.getmtime(_os.path.join(body_dir, f))
        for f in _os.listdir(body_dir)
    }
    run_pipeline(
        spark, "/root/testdata/sf0.001", str(tmp_path / "work"),
        osmchange_dir=oc_dir,
    )
    after = {
        f: _os.path.getmtime(_os.path.join(body_dir, f))
        for f in _os.listdir(body_dir)
    }
    assert after == before
