"""osmChange XML sink (S9) — the reference's output document
(osm_print.rb:35-123) rebuilt as native column expressions.

Each action row renders to one `<modify>`/`<delete>` fragment string
entirely JVM-side (concat/transform over the geometry arrays, no
Python), so fragment generation scales with the data; only the
constant header/footer wrap is driver-side.  Fidelity notes:

* attribute set + order per osm_print.rb:66-75 (id, changeset, user
  "Redaction bot", uid 0, visible, timestamp 2012-04-01T00:00:00Z,
  version, then lat/lon for nodes)
* deletes render the element with ``visible="false"``, the *current*
  version, no tags/children, and lat/lon 0 for nodes — mirroring
  ``from_delete`` (osm_print.rb:54-62, position ``[]`` → 0)
* no tags and no children → self-closing ``/>`` (osm_print.rb:100-104)
* tag/member/nd child lines mirror XML::Node rendering:
  ``<tag k=".." v=".."/>`` with &, <, >, " escaped
* one documented divergence: tag order is sorted by key (the Ruby hash
  preserves insertion order, which a relational pipeline does not
  carry); covered in COVERAGE.md divergences

At 100 TB the fragments are written sharded per changeset partition
(`fragments` is an ordinary DataFrame — point a writer at it); the
single-document assembly below is the test/golden-parity path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

USERNAME = "Redaction bot"
UID = 0
TIMESTAMP = "2012-04-01T00:00:00Z"
HEADER = '<osmChange version="0.6" generator="Redaction bot">'
FOOTER = "</osmChange>"


def _esc(col: Column) -> Column:
    """XML attribute-value escaping as libxml renders it (&, <, >, ")."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return F.replace(out, F.lit('"'), F.lit("&quot;"))


def _bool(col: Column) -> Column:
    return F.when(col, F.lit("true")).otherwise(F.lit("false"))


def _attrs(changeset_id: int, visible: Column, version: Column) -> Column:
    return F.concat(
        F.lit(' id="'), F.col("element_id").cast("string"),
        F.lit(f'" changeset="{changeset_id}" user="{USERNAME}"'
              f' uid="{UID}" visible="'),
        _bool(visible),
        F.lit(f'" timestamp="{TIMESTAMP}" version="'),
        version.cast("string"),
        F.lit('"'),
    )


def _children(etype_lit: str, is_delete: bool) -> Column:
    """Child lines at indent 3 (6 spaces): <nd>/<member> rows.
    Deletes carry no children (osm_print.rb:60-62)."""
    if is_delete:
        return F.lit("")
    if etype_lit == "way":
        return F.concat_ws(
            "",
            F.transform(
                F.coalesce(F.col("nodes"), F.array()),
                lambda n: F.concat(
                    F.lit('      <nd ref="'), n.cast("string"), F.lit('"/>\n')
                ),
            ),
        )
    if etype_lit == "relation":
        return F.concat_ws(
            "",
            F.transform(
                F.coalesce(
                    F.col("members"),
                    F.array().cast(
                        "array<struct<mtype:string,ref:bigint,role:string>>"
                    ),
                ),
                lambda m: F.concat(
                    F.lit('      <member type="'), m["mtype"],
                    F.lit('" ref="'), m["ref"].cast("string"),
                    F.lit('" role="'), _esc(m["role"]),
                    F.lit('"/>\n'),
                ),
            ),
        )
    return F.lit("")


def _tag_lines(is_delete: bool) -> Column:
    if is_delete:
        return F.lit("")
    entries = F.array_sort(F.map_entries(F.coalesce(
        F.col("tags"), F.create_map().cast("map<string,string>")
    )))
    return F.concat_ws(
        "",
        F.transform(
            entries,
            lambda e: F.concat(
                F.lit('      <tag k="'), _esc(e["key"]),
                F.lit('" v="'), _esc(e["value"]), F.lit('"/>\n')
            ),
        ),
    )


def _element(etype_lit: str, is_delete: bool, changeset_id: int) -> Column:
    """One rendered element at indent 2 (4 spaces)."""
    visible = F.lit(False) if is_delete else F.lit(True)
    attrs = _attrs(changeset_id, visible, F.col("version"))
    if etype_lit == "node":
        if is_delete:
            pos = F.lit(' lat="0" lon="0"')
        else:
            pos = F.concat(
                F.lit(' lat="'), F.col("lat").cast("string"),
                F.lit('" lon="'), F.col("lon").cast("string"), F.lit('"'),
            )
        attrs = F.concat(attrs, pos)
    body = F.concat(_tag_lines(is_delete), _children(etype_lit, is_delete))
    open_tag = F.concat(F.lit(f"    <{etype_lit}"), attrs)
    return F.when(
        F.length(body) == 0, F.concat(open_tag, F.lit("/>\n"))
    ).otherwise(
        F.concat(open_tag, F.lit(">\n"), body, F.lit(f"    </{etype_lit}>\n"))
    )


def osmchange_fragments(actions: DataFrame, changeset_id: int = -1) -> DataFrame:
    """action rows → (sort keys, fragment string).

    Input columns: etype, element_id, action ('edit'|'delete'),
    version (current version for deletes), tags map<string,string>,
    lon/lat (nodes), nodes array<bigint> (ways), members
    array<struct<mtype,ref,role>> (relations).

    Order matches the reference changeset emission
    (change_bot.rb:296-319 via ordered_changeset): edits
    relation→way→node before deletes relation→way→node, id ascending.
    """
    cols = set(actions.columns)
    df = actions
    for opt, typ in (
        ("tags", "map<string,string>"), ("lon", "double"), ("lat", "double"),
        ("nodes", "array<bigint>"),
        ("members", "array<struct<mtype:string,ref:bigint,role:string>>"),
    ):
        if opt not in cols:
            df = df.withColumn(opt, F.lit(None).cast(typ))

    frag = F.lit(None).cast("string")
    for etype in ("node", "way", "relation"):
        for action, wrapper in (("edit", "modify"), ("delete", "delete")):
            rendered = F.concat(
                F.lit(f"  <{wrapper}>\n"),
                _element(etype, action == "delete", changeset_id),
                F.lit(f"  </{wrapper}>\n"),
            )
            frag = F.when(
                (F.col("etype") == etype) & (F.col("action") == action),
                rendered,
            ).otherwise(frag)

    type_rank = (
        F.when(F.col("etype") == "relation", 0)
        .when(F.col("etype") == "way", 1)
        .otherwise(2)
    )
    action_rank = F.when(F.col("action") == "edit", 0).otherwise(1)
    return df.select(
        action_rank.alias("action_rank"),
        type_rank.alias("type_rank"),
        F.col("element_id"),
        frag.alias("fragment"),
    )


def actions_to_osmchange_input(
    actions: DataFrame, latest: DataFrame
) -> DataFrame:
    """Fold output (operators.fold.ACTION_SCHEMA rows) → sink input.

    Mirrors the reference's changeset emission (change_bot.rb:296-319):
    edits and deletes print as osmChange; redactions are API calls and
    are filtered out here.  Deletes carry no version in the action row
    (the reference fetches the current element at print time,
    osm_print.rb:54-62), so the current version joins in from
    ``latest`` (a latest_version snapshot keyed by url).  Numeric
    element ids derive from the url by the house rolling hash."""
    from ..operators.dedup import token_hash

    acts = actions.where(F.col("action").isin("edit", "delete"))
    cur = latest.select("url", F.col("version").alias("_cur_version"))
    df = acts.join(cur, "url", "left")
    members = F.transform(
        F.from_json("new_members_json", "array<array<string>>"),
        lambda m: F.struct(
            m[0].alias("mtype"),
            m[1].cast("bigint").alias("ref"),
            m[2].alias("role"),
        ),
    )
    return df.select(
        F.col("element_type").alias("etype"),
        token_hash(F.col("url")).alias("element_id"),
        "action",
        F.when(F.col("action") == "delete", F.col("_cur_version"))
        .otherwise(F.col("version"))
        .cast("int")
        .alias("version"),
        F.from_json("new_tags_json", "map<string,string>").alias("tags"),
        F.col("new_lon").alias("lon"),
        F.col("new_lat").alias("lat"),
        F.col("new_nodes").alias("nodes"),
        members.alias("members"),
    )


def osmchange_doc(actions: DataFrame, changeset_id: int = -1) -> str:
    """Assemble ONE osmChange document (test / golden-parity path;
    driver-side only for the final string concat — fragment rendering
    already ran distributed)."""
    frags = (
        osmchange_fragments(actions, changeset_id)
        .orderBy("action_rank", "type_rank", "element_id")
        .select("fragment")
        .collect()
    )
    return HEADER + "\n" + "".join(r.fragment for r in frags) + FOOTER + "\n"


def write_osmchange(actions: DataFrame, path: str, changeset_id: int = -1) -> int:
    """Scale path: fragments written as ordered text shards (header and
    footer live in sidecar part files, mirroring how multi-file
    osmChange exports are concatenated downstream).

    Returns the number of element fragments written, collected via an
    ``Observation`` attached to the write job itself — no second pass
    over the (globally range-sorted) fragment stream.  The sort keys
    (action_rank, type_rank, element_id) are a total order, so the
    concatenated body bytes are deterministic; only shard *boundaries*
    vary run-to-run (range partitioner sampling)."""
    from pyspark.sql import Observation

    spark = actions.sparkSession
    obs = Observation("osmchange_fragments")
    frags = (
        osmchange_fragments(actions, changeset_id)
        .orderBy("action_rank", "type_rank", "element_id")
        .select("fragment")
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    header = spark.createDataFrame([(HEADER,)], "fragment string")
    footer = spark.createDataFrame([(FOOTER,)], "fragment string")
    header.select("fragment").write.mode("overwrite").text(f"{path}/_header")
    frags.write.mode("overwrite").text(f"{path}/body")
    footer.select("fragment").write.mode("overwrite").text(f"{path}/_footer")
    return int(obs.get["n"])
