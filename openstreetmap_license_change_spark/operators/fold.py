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

Skew guard: DIRTY groups larger than ``MAX_VERSIONS_PER_ELEMENT`` fall
back to delete+redact-all (the reference special-cases its 720-version
mega-relation the same way, run_mega_relation.rb:8-47).  Clean
(all-accepted, never-blacklisted) histories short-circuit to zero
actions BEFORE the cap on both A/B paths, so a clean mega-history is
never conservatively deleted.  Cap occurrences are counted in the
optional ``capped_acc`` Spark accumulator (pass
``spark.sparkContext.accumulator(0)`` to either classify entry point)
rather than silently dropped.
"""

from __future__ import annotations

import json
import warnings
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window as W
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


_OUT_COLS = [
    "url", "element_type", "action", "version", "mode", "new_tags_json",
    "new_lon", "new_lat", "new_nodes", "new_members_json",
]


def _fold_rows(url: str, etype: str, rows: list, capped_acc=None) -> list[tuple]:
    """Fold one element's version rows (namedtuples, any order) into
    action tuples matching _OUT_COLS."""
    out: list[tuple] = []
    # Clean short-circuit FIRST (mirrors fold_body's vectorized drop):
    # an all-accepted, never-blacklisted history yields no actions —
    # including above the hot-key cap, so the grouped and python A/B
    # paths agree on clean mega-histories (the cap is a skew guard for
    # DIRTY hot keys, not a taint verdict on clean ones).
    if all(r.accepted for r in rows) and not any(
        getattr(r, "blacklisted", False) for r in rows
    ):
        return out
    if len(rows) > MAX_VERSIONS_PER_ELEMENT:
        # hot-key cap: conservative delete + redact-all ("no silent
        # caps" — occurrences counted when the caller passed an acc)
        if capped_acc is not None:
            capped_acc.add(1)
        out.append((url, etype, "delete", None, None, None, None, None, None, None))
        out.extend(
            (url, etype, "redact", int(r.version), "hidden",
             None, None, None, None, None)
            for r in rows
        )
        return out

    versions = []
    cs_map: dict[int, bool] = {}
    wl: set = set()
    bl: set = set()
    for row in rows:
        elt = _row_to_element(row, etype)
        versions.append(elt)
        cs_map[elt.changeset_id] = bool(row.accepted)
        if getattr(row, "whitelisted", False):
            wl.add((etype, 0, elt.version))
        if getattr(row, "blacklisted", False):
            bl.add((etype, 0, elt.version))

    db = AgreementDB(changesets=cs_map, edit_whitelist=wl, edit_blacklist=bl)
    for act in element_actions(versions, db):
        if isinstance(act, RedactAct):
            out.append((url, etype, "redact", int(act.version), act.mode,
                        None, None, None, None, None))
        elif isinstance(act, DeleteAct):
            out.append((url, etype, "delete", None, None,
                        None, None, None, None, None))
        elif isinstance(act, EditAct):
            obj = act.obj
            lon = lat = nodes = members = None
            if etype == NODE and obj.geom is not None:
                lon, lat = float(obj.geom[0]), float(obj.geom[1])
            elif etype == WAY:
                nodes = [int(n) for n in obj.geom]
            elif etype == RELATION:
                members = json.dumps([list(m) for m in obj.geom])
            out.append((url, etype, "edit", int(obj.version), None,
                        json.dumps(obj.tags, sort_keys=True),
                        lon, lat, nodes, members))
    return out


def _make_fold_group(capped_acc=None):
    """applyInPandas adapter factory: one group DataFrame → action
    DataFrame.  A factory (not a module function) so the optional cap
    accumulator rides the UDF closure to executors."""

    def _fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
        url = pdf["url"].iloc[0]
        etype = pdf["element_type"].iloc[0]
        rows = list(pdf.sort_values("version").itertuples(index=False))
        return pd.DataFrame(
            _fold_rows(url, etype, rows, capped_acc), columns=_OUT_COLS
        )

    return _fold_group


_fold_group = _make_fold_group()  # default adapter (no accumulator)


def _normalize_input(histories: DataFrame) -> DataFrame:
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
    return df


def classify_histories_python(
    histories: DataFrame, capped_acc=None, assume_partitioned: bool = False
) -> DataFrame:
    """Fold every element history → action rows (full Python path).

    Physical strategy: ``repartition(url) → sortWithinPartitions(url,
    version) → mapInPandas``.  Unlike ``applyInPandas`` (one Python
    call per group — ruinous for millions of small histories), this
    processes *whole Arrow batches* of many consecutive groups per
    call; groups never span partitions (hash repartition on url) but
    may span batch boundaries, so a remainder is carried between
    batches.  One shuffle total, Python invocation cost amortized
    ~1000× (measured 35s → ~6s on the sf0.1 bench).

    ``assume_partitioned=True`` skips the repartition — for inputs
    already co-located by url (a bucketed pages table,
    sources/bucketed.py): the fold then runs with ZERO exchanges.
    Caller's contract: every row of a url lives in one partition
    (bucketed scan guarantees it; order within the partition is
    re-established here either way)."""
    df = _normalize_input(histories)

    def fold_body(body: pd.DataFrame) -> list[tuple]:
        # vectorized short-circuit: a history whose versions are ALL
        # accepted with none blacklisted yields no actions (nothing is
        # tainted, every reconstruction matches, accepted deletes stay
        # deleted — change_bot.rb:91-105 with every status
        # acceptor_edit/odbl_clean).  Dropping those urls wholesale in
        # C-speed pandas keeps the Python OT machinery on the dirty
        # minority — at production accept rates that is most of the
        # table skipped.
        g = body.groupby("url", sort=False)
        clean = (
            g["accepted"].transform("all").to_numpy()
            & ~g["blacklisted"].transform("any").to_numpy()
        )
        if clean.any():
            body = body[~clean]
        recs: list[tuple] = []
        group: list = []
        cur_url = None
        cur_etype = None
        for row in body.itertuples(index=False):
            if row.url != cur_url:
                if group:
                    recs.extend(
                        _fold_rows(cur_url, cur_etype, group, capped_acc)
                    )
                group = []
                cur_url = row.url
                cur_etype = row.element_type
            group.append(row)
        if group:
            recs.extend(_fold_rows(cur_url, cur_etype, group, capped_acc))
        return recs

    def run_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            urls = pdf["url"].to_numpy()
            # everything up to the start of the last url is complete
            not_last = urls != urls[-1]
            cut = int(not_last.nonzero()[0][-1] + 1) if not_last.any() else 0
            carry = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield pd.DataFrame(fold_body(body), columns=_OUT_COLS)
        if carry is not None and len(carry):
            yield pd.DataFrame(fold_body(carry), columns=_OUT_COLS)

    if assume_partitioned:
        out = df.sortWithinPartitions("url", "version").mapInPandas(
            run_batches, schema=ACTION_SCHEMA
        )
        # Trust but verify: Spark's DisableUnnecessaryBucketedScan rule
        # (spark.sql.sources.bucketing.autoBucketedScan.enabled, ON by
        # default upstream) demotes a bucketed scan to a merged-file
        # scan under this very plan shape — mapInPandas declares no
        # distribution requirement Catalyst recognizes — and then urls
        # span partitions and histories fold fragment-wise.  get_spark
        # disables the rule, but callers with their own sessions may
        # not; planning (not executing) the composed query exposes the
        # demotion in the FileScan metadata, and we fall back to the
        # explicit shuffle rather than silently corrupt the fold.
        plan = out._jdf.queryExecution().executedPlan().toString()
        if "Bucketed: false (disabled by query planner)" not in plan:
            return out
        warnings.warn(
            "classify_histories(assume_partitioned=True): the bucketed "
            "scan was demoted by DisableUnnecessaryBucketedScan "
            "(set spark.sql.sources.bucketing.autoBucketedScan.enabled"
            "=false); repartitioning by url to preserve correctness",
            RuntimeWarning,
            stacklevel=2,
        )
    shuffled = df.repartition("url").sortWithinPartitions("url", "version")
    return shuffled.mapInPandas(run_batches, schema=ACTION_SCHEMA)


# ---------------------------------------------------------------------------
# native fast path: for node histories whose tags are constant across
# versions (with no odbl-ish keys, no white/blacklist flags, and no
# ε-close position pair), the sequential lattice collapses to window
# expressions — the same derivation as the classify_actions_nodes
# DuckDB oracle, generalized with the empty-tags case.  Everything
# else routes to the Python fold, so hybrid output == Python output
# by construction (A/B-tested).
# ---------------------------------------------------------------------------

_EPS2 = 0.0000002 * 0.0000002  # core.geom.EPSILON squared
_FAST_MAX_VERSIONS = 64  # pairwise ε-check is O(n²) per url


def _null_out_cols():
    return [
        F.lit(None).cast(t).alias(c)
        for c, t in (
            ("new_tags_json", "string"),
            ("new_lon", "double"),
            ("new_lat", "double"),
            ("new_nodes", "array<bigint>"),
            ("new_members_json", "string"),
        )
    ]


def _fast_eligibility(df: DataFrame) -> DataFrame:
    """Annotate every row with a per-url `eligible` flag — computed as
    window aggregates over the url partition (ONE shuffle shared with
    the downstream window cascade; no groupBy + join-back).
    Conservative: any doubt → Python path.

    ε-pair check: positions_close affects three fold branches (the
    'empty' status, unclean geom compare, final edit compare) whose
    native translation assumed strictly-separated positions; a url
    with ANY ε-close or equal pair of versions is simply ineligible.
    """
    wu = W.partitionBy("url")
    bad_row = (
        (F.col("element_type") != "node")
        | F.col("whitelisted")
        | F.col("blacklisted")
        | F.col("lon").isNull()
        | F.col("lat").isNull()
        | F.col("tags_json").isNull()
        # conservative content guards: odbl-ish keys flip the
        # lattice's clean branch; AUTO_KEYS (created_by) take a
        # separate patch path (auto_key_changes) — both → Python
        | F.lower("tags_json").contains("dbl")
        | F.lower("tags_json").contains("created_by")
    )
    ann = (
        df.withColumn("_bad", F.max(bad_row.cast("int")).over(wu))
        .withColumn("_ntags", F.size(F.collect_set("tags_json").over(wu)))
        .withColumn("_n", F.count(F.lit(1)).over(wu))
        .withColumn("_pts", F.collect_list(F.struct("lon", "lat")).over(wu))
    )
    idx = F.sequence(F.lit(0), F.col("_n") - 1)
    close_pair = F.exists(
        idx,
        lambda i: F.exists(
            idx,
            lambda j: (i < j)
            & (
                (F.element_at("_pts", (i + 1).cast("int"))["lon"]
                 - F.element_at("_pts", (j + 1).cast("int"))["lon"]) ** 2
                + (F.element_at("_pts", (i + 1).cast("int"))["lat"]
                   - F.element_at("_pts", (j + 1).cast("int"))["lat"]) ** 2
                < F.lit(_EPS2)
            ),
        ),
    )
    return ann.withColumn(
        "eligible",
        (F.col("_bad") == 0)
        & (F.col("_ntags") == 1)
        & (F.col("_n") <= _FAST_MAX_VERSIONS)
        & ~close_pair,
    ).drop("_bad", "_ntags", "_n", "_pts")


def _classify_nodes_native(df: DataFrame) -> DataFrame:
    """Window translation of the node fold for eligible histories.

    Rules (derivation documented on the classify_actions_nodes oracle,
    change_bot.rb:77-189): segments split at invisible versions; tags
    enter the reconstructed state only at an accepted segment-start; an
    unaccepted segment-start with non-empty tags taints them forever;
    unaccepted visible versions redact hidden; accepted versions redact
    visible iff tainted at-or-before; final: no accepted visible
    version in the last segment → delete (if last version visible),
    else edit iff tainted or the last version isn't the last accepted
    one."""
    ord_w = W.partitionBy("url").orderBy("version")
    wu = W.partitionBy("url")
    seg = df.withColumn(
        "seg_id",
        F.coalesce(
            F.sum((~F.col("visible")).cast("int")).over(
                ord_w.rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn("total_invis", F.sum((~F.col("visible")).cast("int")).over(wu))
    vis_start = F.col("visible") & (
        F.col("version")
        == F.min(F.when(F.col("visible"), F.col("version"))).over(
            W.partitionBy("url", "seg_id")
        )
    )
    ann = (
        seg.withColumn(
            "t_nonempty",
            F.size(F.from_json("tags_json", "map<string,string>")) > 0,
        )
        .withColumn("is_seg_start", vis_start)
        .withColumn(
            "taint_src",
            F.col("is_seg_start") & ~F.col("accepted") & F.col("t_nonempty"),
        )
        .withColumn(
            "tainted_upto",
            F.max(F.col("taint_src").cast("int")).over(
                ord_w.rowsBetween(W.unboundedPreceding, 0)
            )
            == 1,
        )
    )

    redacts = ann.where(
        F.col("visible") & (~F.col("accepted") | F.col("tainted_upto"))
    ).select(
        "url",
        F.lit("node").alias("element_type"),
        F.lit("redact").alias("action"),
        F.col("version").cast("int").alias("version"),
        F.when(~F.col("accepted"), F.lit("hidden"))
        .otherwise(F.lit("visible"))
        .alias("mode"),
        *_null_out_cols(),
    )

    # ONE aggregation pass: final-segment membership is a per-row
    # window column, so last_acc_vis/base position fold into the same
    # groupBy as the summary and taint flags
    in_final_acc = (
        F.col("visible")
        & F.col("accepted")
        & (F.col("seg_id") == F.col("total_invis"))
    )
    finals = ann.groupBy("url").agg(
        F.max("version").alias("n"),
        F.max_by("visible", "version").alias("last_visible"),
        F.first("tags_json").alias("t_json"),  # constant per eligibility
        F.max(F.col("taint_src").cast("int")).alias("_taint"),
        F.max(F.when(in_final_acc, F.col("version"))).alias("last_acc_vis"),
        F.max_by(
            "lon", F.when(in_final_acc, F.col("version"))
        ).alias("base_lon"),
        F.max_by(
            "lat", F.when(in_final_acc, F.col("version"))
        ).alias("base_lat"),
    ).withColumn("tainted_any", F.coalesce(F.col("_taint") == 1, F.lit(False)))

    deletes = finals.where(
        F.col("last_acc_vis").isNull() & F.col("last_visible")
    ).select(
        "url",
        F.lit("node").alias("element_type"),
        F.lit("delete").alias("action"),
        F.lit(None).cast("int").alias("version"),
        F.lit(None).cast("string").alias("mode"),
        *_null_out_cols(),
    )
    edits = finals.where(
        F.col("last_acc_vis").isNotNull()
        & (F.col("tainted_any") | (F.col("last_acc_vis") != F.col("n")))
    ).select(
        "url",
        F.lit("node").alias("element_type"),
        F.lit("edit").alias("action"),
        F.col("n").cast("int").alias("version"),
        F.lit(None).cast("string").alias("mode"),
        F.when(F.col("tainted_any"), F.lit("{}"))
        .otherwise(F.col("t_json"))
        .alias("new_tags_json"),
        F.col("base_lon").alias("new_lon"),
        F.col("base_lat").alias("new_lat"),
        F.lit(None).cast("array<bigint>").alias("new_nodes"),
        F.lit(None).cast("string").alias("new_members_json"),
    )
    return redacts.unionByName(deletes).unionByName(edits)


def classify_histories(
    histories: DataFrame,
    native_fast_path: bool = False,
    assume_partitioned: bool = False,
) -> DataFrame:
    """The fold.  Default: the Arrow-batched Python path — measured
    FASTER than the native window translation at every tested scale
    (102k pages: 3.9 s vs 6.1 s; 819k pages: 12.1 s vs 34.4 s at
    local[4]), because the window cascade buffers the full tags/text
    payload per row across 3+ window sorts while the Python path moves
    it through exactly one shuffle into Arrow batches.  A measured
    negative result: "native beats Python UDF" does not survive
    payload-heavy rows here.

    ``native_fast_path=True`` routes constant-tag node histories
    through the pure-window translation instead (zero Python; same
    output, A/B-tested — one cosmetic difference: edit rows echo the
    input's tags_json string rather than re-serializing it,
    parse-identical).  Kept for payload-light inputs and as the
    executable twin of the classify_actions_nodes oracle."""
    if not native_fast_path:
        return classify_histories_python(
            histories, assume_partitioned=assume_partitioned
        )
    df = _normalize_input(histories)
    # annotate eligibility in the SAME url-partitioned window pass the
    # native path reuses, then materialize once (localCheckpoint —
    # cluster analogue: stage commit): the three consumers below
    # (native actions, redact scan, Python remainder) each re-read the
    # materialized rows instead of re-deriving the input
    ann = _fast_eligibility(df).localCheckpoint(eager=True)
    fast = ann.where(F.col("eligible")).drop("eligible")
    slow = ann.where(~F.col("eligible")).drop("eligible")
    return _classify_nodes_native(fast).unionByName(
        classify_histories_python(slow)
    )


def classify_histories_grouped(
    histories: DataFrame, capped_acc=None
) -> DataFrame:
    """Reference implementation via ``applyInPandas`` (one call per
    group) — kept for A/B testing against the batched path."""
    df = _normalize_input(histories)
    return df.groupBy("url").applyInPandas(
        _make_fold_group(capped_acc), schema=ACTION_SCHEMA
    )


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
