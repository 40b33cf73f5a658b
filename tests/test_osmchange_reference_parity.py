"""Byte-level parity of the osmChange sink against the reference
printer's exact output format.

`tests/fixtures/osmchange_reference_expected.xml` is hand-derived,
byte for byte, from osm_print.rb's rendering rules (no Ruby runtime in
this environment to generate it mechanically):

* document wrap + per-action <modify>/<delete> blocks —
  osm_print.rb:36-52 (`print_osmchange`)
* element open tag: attributes id, changeset, user "Redaction bot",
  uid 0, visible, timestamp 2012-04-01T00:00:00Z, version, then
  lat/lon for nodes, via bare Ruby interpolation `" k=\"v\""` —
  osm_print.rb:66-99 (`print`); booleans render true/false, floats via
  Float#to_s (1.5 → "1.5")
* deletes render the CURRENT version, visible="false", no
  tags/children, integer-0 lat/lon (position [] → `: 0`) —
  osm_print.rb:54-62 (`from_delete`) + :80-81
* no tags and no children → self-closing "/>" — osm_print.rb:100-104
* tag / nd / member child lines via libxml XML::Node#to_s, which
  escapes & < > " in attribute values — osm_print.rb:106-121
* emission order: edits Relation→Way→Node then deletes
  Relation→Way→Node — change_bot.rb:303-317

Divergence exercised deliberately: none — the fixture's tag maps are
single-entry, so the sink's sorted-key tag order (documented in
COVERAGE.md) coincides with Ruby insertion order.
"""

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.plans import osmchange

FIXTURE = "tests/fixtures/osmchange_reference_expected.xml"

ACTIONS_DDL = (
    "etype string, element_id bigint, action string, version int, "
    "tags map<string,string>, lon double, lat double, "
    "nodes array<bigint>, "
    "members array<struct<mtype:string,ref:bigint,role:string>>"
)


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("osmchange-parity", master="local[2]", shuffle_partitions=4)
    yield s
    s.stop()


def _actions(spark):
    rows = [
        # node edit with escaping in the tag value
        ("node", 1, "edit", 2, {"foo": 'b&a"r'}, 1.5, 2.0, None, None),
        # tagless node edit -> self-closing
        ("node", 2, "edit", 3, {}, -179.5, -0.25, None, None),
        # node delete (current version 6; lat/lon render integer 0)
        ("node", 3, "delete", 6, None, None, None, None, None),
        # way edit, empty tags, three nds
        ("way", 10, "edit", 4, {}, None, None, [1, 2, 3], None),
        # way delete
        ("way", 11, "delete", 7, None, None, None, None, None),
        # relation edit: one tag + members of all three types,
        # role escaping (& < > ")
        (
            "relation", 30, "edit", 2, {"type": "multipolygon"},
            None, None, None,
            [("node", 1, "a&b"), ("way", 10, ""), ("relation", 31, '<out>er"')],
        ),
        # relation delete
        ("relation", 32, "delete", 5, None, None, None, None, None),
    ]
    return spark.createDataFrame(rows, ACTIONS_DDL)


def test_osmchange_doc_byte_identical_to_reference_format(spark):
    got = osmchange.osmchange_doc(_actions(spark), changeset_id=3)
    want = open(FIXTURE, encoding="utf-8").read()
    if got != want:
        import difflib

        diff = "\n".join(
            difflib.unified_diff(
                want.splitlines(), got.splitlines(),
                fromfile="reference", tofile="spark", lineterm="",
            )
        )
        pytest.fail(f"osmChange byte diff:\n{diff}")


def test_osmchange_doc_via_fold_actions(spark):
    """End-to-end: a decliner-tainted node history through the real
    fold (operators.fold), its edit action rendered by the sink, still
    byte-faithful to the reference printer's element format."""
    from openstreetmap_license_change_spark.operators import fold
    from openstreetmap_license_change_spark.plans.osmchange import (
        actions_to_osmchange_input,
    )
    from openstreetmap_license_change_spark.operators.dedup import token_hash

    # v1 accepted, v2 decliner edit (moved + retagged) -> fold must
    # emit an edit restoring v1 content (plus redactions, not printed)
    hist_rows = [
        ("u1", "node", 1, True, True, False, False,
         '{"a": "b"}', 1.5, 2.0, None, None),
        ("u1", "node", 2, True, False, False, False,
         '{"a": "c"}', 3.0, 4.0, None, None),
    ]
    hist = spark.createDataFrame(
        hist_rows,
        "url string, element_type string, version int, visible boolean, "
        "accepted boolean, whitelisted boolean, blacklisted boolean, "
        "tags_json string, lon double, lat double, nodes array<bigint>, "
        "members_json string",
    )
    actions = fold.classify_histories(hist)
    latest = spark.createDataFrame([("u1", 2)], "url string, version int")
    sink_in = actions_to_osmchange_input(actions, latest)
    doc = osmchange.osmchange_doc(sink_in, changeset_id=3)

    eid = spark.range(1).select(
        token_hash(F.lit("u1")).alias("h")
    ).collect()[0].h
    want = (
        '<osmChange version="0.6" generator="Redaction bot">\n'
        "  <modify>\n"
        f'    <node id="{eid}" changeset="3" user="Redaction bot" uid="0"'
        ' visible="true" timestamp="2012-04-01T00:00:00Z" version="2"'
        ' lat="2.0" lon="1.5">\n'
        '      <tag k="a" v="b"/>\n'
        "    </node>\n"
        "  </modify>\n"
        "</osmChange>\n"
    )
    assert doc == want
