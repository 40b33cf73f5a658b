"""Structured-Streaming facade over the batch engine.

The reference is a pure batch bot — its "incremental" behavior is the
region/candidate status state machine (run_regions.rb:20-23,
run_candidates.rb:26-34), which we re-express as snapshot-checkpointed
batch (plans/pipeline.py).  This module adds the optional streaming
entry points for users who want page captures as a stream:

* ``stream_pages``        — readStream source over a pages directory
                            (file source stands in for Kafka/Kinesis)
* ``streaming_tile_rollup`` — windowed per-cell rollup with a
                            watermark for late captures
* ``foreach_batch_classify`` — micro-batch bridge: each batch runs the
                            *batch* fold + merge, giving exactly-once
                            incremental classification without a custom
                            stateful operator (the per-element fold
                            needs the full history anyway, so
                            applyInPandasWithState would have to carry
                            whole histories as state — strictly worse
                            than re-reading the element's history
                            partition per affected url).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import spatial

PAGES_STREAM_SCHEMA = (
    "url string, version int, warc_epoch bigint, text string, lang string, "
    "changeset_id bigint, uid bigint, lon double, lat double, visible boolean"
)


def stream_pages(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
        .withColumn("warc_ts", F.timestamp_seconds(F.col("warc_epoch")))
    )


def streaming_tile_rollup(pages_stream: DataFrame, window: str = "10 minutes"):
    """Windowed taint/page rollup per cell with a 30-minute watermark
    for late captures; emits append-mode aggregates suitable for an
    Iceberg/parquet sink."""
    cells = pages_stream.withColumn(
        "cell", spatial.grid_cell(F.col("lon"), F.col("lat"))
    )
    return (
        cells.withWatermark("warc_ts", "30 minutes")
        .groupBy(F.window("warc_ts", window), F.col("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("url").alias("n_urls"),
        )
    )


def streaming_tile_rollup_multires(
    pages_stream: DataFrame,
    resolutions: list[int] | None = None,
    window: str = "10 minutes",
):
    """Multi-resolution streaming rollup: each capture explodes into
    one row per requested hierarchy resolution (`spatial.hier_cell`),
    then a single windowed aggregate keyed by (window, cell) — the
    resolution rides inside the cell id.

    Deliberately NOT the batch operator's hierarchical re-aggregation
    (tile_rollup_multires): a streaming aggregate cannot re-aggregate
    its own live state in a second pass, so the explode is the
    streaming-correct shape — state size is |occupied cells across
    levels| (geometric in resolution, dominated by the finest level,
    same as batch), and each event is touched once."""
    rs = sorted(set(resolutions or [5, 7, 9]))
    cells = pages_stream.withColumn(
        "cell",
        F.explode(
            F.array(
                *[
                    spatial.hier_cell(F.col("lon"), F.col("lat"), r)
                    for r in rs
                ]
            )
        ),
    )
    return (
        cells.withWatermark("warc_ts", "30 minutes")
        .groupBy(F.window("warc_ts", window), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            "window",
            spatial.cell_res(F.col("cell")).alias("res"),
            "cell",
            "n_pages",
        )
    )


def foreach_batch_classify(batch_df: DataFrame, batch_id: int, state_dir: str):
    """ForeachBatch bridge: union the micro-batch with stored history
    for the affected urls, re-run the batch fold for just those urls,
    and overwrite their action rows.  Incremental recompute scoped to
    touched elements — the streaming analogue of the reference's
    candidate re-processing.

    Exactly-once: foreachBatch only guarantees AT-LEAST-once for side
    effects — after a crash between the sink write and the checkpoint
    commit, the same ``batch_id`` is REPLAYED.  Both writes are
    therefore keyed by batch id and idempotent: history versions land
    in ``histories/batch=<id>`` (overwrite — a replay rewrites the
    same partition instead of appending duplicates) and the replayed
    batch's own partition is EXCLUDED from the history read (its rows
    re-enter via ``batch_df``, so a half-written first attempt can't
    double the fold's input).  ``tests/test_streaming.py`` kills and
    restarts against the checkpoint and replays a batch verbatim to
    assert no dup/no loss."""
    from ..operators import fold, lineage

    spark = batch_df.sparkSession
    affected = batch_df.select("url").distinct()
    hist_dir = f"{state_dir}/histories"

    try:
        history = (
            spark.read.parquet(hist_dir)
            .where(F.col("batch") != batch_id)
            .drop("batch")
        )
        full = history.join(affected, "url", "left_semi").unionByName(
            batch_df, allowMissingColumns=True
        )
    except Exception:
        full = batch_df

    # persist this batch's versions under its own partition (idempotent)
    batch_df.write.mode("overwrite").parquet(f"{hist_dir}/batch={batch_id}")

    hist = full.select(
        "url",
        F.lit("node").alias("element_type"),
        F.col("version").cast("int").alias("version"),
        "visible",
        F.coalesce(F.col("accepted"), F.lit(False)).alias("accepted")
        if "accepted" in full.columns
        else F.lit(True).alias("accepted"),
        F.to_json(F.create_map(F.lit("text"), F.col("text"))).alias("tags_json"),
        "lon", "lat",
    )
    actions = fold.classify_histories(hist)
    actions.write.mode("overwrite").parquet(
        f"{state_dir}/actions/batch={batch_id}"
    )


def foreach_batch_rollup(
    batch_df: DataFrame, batch_id: int, state_dir: str
):
    """ForeachBatch bridge maintaining a MATERIALIZED tile rollup via
    the mergeable-aggregate contract (spatial.tile_rollup_merge): each
    micro-batch writes its own per-batch DELTA rollup idempotently
    (overwrite of ``rollups/batch=<id>`` — a crash-replay rewrites the
    same partition, never double-counts), then publishes ``current``
    as the merge of all batch deltas.  Deltas are |cells|-row
    aggregates, so the publish step re-aggregates aggregate rows —
    corpus bytes are touched once, by the delta pass; a production
    deployment compacts old batch partitions with the same merge and
    the publish is an Iceberg snapshot commit.

    ``current`` is DERIVED state: a crash mid-publish leaves a stale
    copy that the next batch (or the replay) rebuilds from the
    authoritative per-batch deltas — the same recovery contract as the
    classify bridge's action partitions."""
    from ..operators import spatial

    spark = batch_df.sparkSession
    cells = spatial.assign_cells(batch_df).withColumn(
        "tainted", ~F.col("accepted")
    )
    delta = spatial.tile_rollup(cells)
    delta.write.mode("overwrite").parquet(
        f"{state_dir}/rollups/batch={batch_id}"
    )
    all_deltas = spark.read.parquet(f"{state_dir}/rollups").select(
        "cell", "n_pages", "n_tainted"
    )
    current = spatial.tile_rollup_merge(
        all_deltas, all_deltas.limit(0)
    )
    current.write.mode("overwrite").parquet(f"{state_dir}/rollup_current")


def foreach_batch_latest_state(
    batch_df: DataFrame, batch_id: int, state_dir: str
):
    """ForeachBatch bridge maintaining the corpus's CURRENT state (the
    reference's `current_*` tables / snapshots.snapshot_diff's as-of
    view) incrementally: latest-visible-capture per url is a MERGEABLE
    aggregate — max(struct(warc_epoch, …)) — so the bridge follows the
    foreach_batch_rollup contract exactly: each micro-batch writes its
    own per-url delta state idempotently (overwrite of
    ``states/batch=<id>``; a crash-replay rewrites the same
    partition), and ``current`` is published as the per-url max over
    all batch deltas.  Deltas are per-url 1-row aggregates, so the
    publish re-aggregates aggregate rows only.

    Together with snapshot_diff this gives the streaming side of the
    snapshot story: the batch operator answers "diff two historical
    cutoffs", this bridge keeps "now" materialized as captures arrive."""
    from pyspark.sql import functions as FF

    spark = batch_df.sparkSession
    fields = ["warc_epoch", "version", "lon", "lat", "visible"]
    delta = batch_df.groupBy("url").agg(
        FF.max(FF.struct(*fields)).alias("s")
    )
    delta.write.mode("overwrite").parquet(
        f"{state_dir}/states/batch={batch_id}"
    )
    all_deltas = spark.read.parquet(f"{state_dir}/states").select(
        "url", "s"
    )
    current = (
        all_deltas.groupBy("url")
        .agg(FF.max("s").alias("s"))
        .select("url", *[FF.col(f"s.{f}").alias(f) for f in fields])
    )
    current.write.mode("overwrite").parquet(f"{state_dir}/state_current")


def foreach_batch_bloom(
    batch_df: DataFrame, batch_id: int, state_dir: str,
    n_bits: int = 8192, k: int = 4,
):
    """ForeachBatch bridge maintaining a corpus Bloom membership
    sketch incrementally — the streaming face of the sketch family's
    merge contract (sketches.bloom_build words are bit_or-mergeable
    exactly like tile_rollup_merge's counters): each micro-batch
    writes its own per-batch word delta idempotently (overwrite of
    ``blooms/batch=<id>`` — a crash-replay rewrites the same
    partition; bit_or is idempotent anyway, the belt to that
    suspender), and ``current`` publishes the bit_or across all batch
    deltas.  The live sketch answers "have we ever crawled this
    token/url" without touching the corpus.

    Same recovery contract as the rollup/state bridges: ``current``
    is derived; a crash mid-publish is rebuilt from the
    authoritative deltas."""
    from pyspark.sql import functions as FF

    from ..operators import sketches

    spark = batch_df.sparkSession
    delta = sketches.bloom_build(batch_df, n_bits=n_bits, k=k)
    delta.write.mode("overwrite").parquet(
        f"{state_dir}/blooms/batch={batch_id}"
    )
    all_deltas = spark.read.parquet(f"{state_dir}/blooms").select(
        "word_idx", "bits"
    )
    current = all_deltas.groupBy("word_idx").agg(
        FF.bit_or("bits").alias("bits")
    )
    current.write.mode("overwrite").parquet(f"{state_dir}/bloom_current")


def foreach_batch_countmin(
    batch_df: DataFrame, batch_id: int, state_dir: str,
    depth: int = 4, width: int = 1024,
):
    """ForeachBatch bridge maintaining a corpus Count-Min frequency
    sketch incrementally — the heavy-hitter face of the streaming
    sketch family (:func:`foreach_batch_bloom` answers "seen?", this
    answers "roughly how often?" for any token without rescanning the
    corpus).

    Count-Min cells ADD across corpora (the tile_rollup_merge
    contract), but unlike Bloom's bit_or addition is NOT idempotent —
    a replayed micro-batch would double-count if deltas appended.
    Exactly-once therefore rests ENTIRELY on the per-batch partition
    OVERWRITE (``cms/batch=<id>`` — a crash replay rewrites the same
    partition byte-identically), which is the reason the layout is
    per-batch deltas + derived ``cms_current`` (per-(row, bucket) SUM
    across deltas) rather than read-modify-write of one live sketch:
    RMW under at-least-once replay is the classic silent
    double-count.  Same recovery contract as the rollup/state
    bridges: ``current`` is derived; a crash mid-publish rebuilds
    from the authoritative deltas."""
    from pyspark.sql import functions as FF

    from ..operators import sketches

    spark = batch_df.sparkSession
    delta = sketches.countmin_build(batch_df, depth=depth, width=width)
    delta.write.mode("overwrite").parquet(
        f"{state_dir}/cms/batch={batch_id}"
    )
    all_deltas = spark.read.parquet(f"{state_dir}/cms").select(
        "row", "bucket", "cnt"
    )
    current = all_deltas.groupBy("row", "bucket").agg(
        FF.sum("cnt").alias("cnt")
    )
    current.write.mode("overwrite").parquet(f"{state_dir}/cms_current")


def foreach_batch_hll(
    batch_df: DataFrame, batch_id: int, state_dir: str,
    group_col: str = "lang", text_col: str = "text",
):
    """ForeachBatch bridge maintaining per-group HyperLogLog
    registers incrementally — the distinct-cardinality face of the
    streaming sketch family (:func:`foreach_batch_bloom` answers
    "seen?", :func:`foreach_batch_countmin` "how often?", this "how
    many distinct?" — e.g. live per-lang vocabulary size while the
    crawl streams in).

    The batch tokenizes ``text_col`` to the house token hashes
    (the q_hll_token_distinct stream) grouped by ``group_col``.
    Registers merge with MAX on (group, idx)
    (sketches.hll_registers' contract), which is idempotent — a
    replayed micro-batch cannot move a register past its true max —
    so exactly-once has the same belt-and-suspender shape as Bloom:
    per-batch delta partitions written idempotently
    (``hlls/batch=<id>`` overwrite), ``hll_current`` derived as the
    MAX across deltas, rebuilt from the authoritative deltas after a
    crash mid-publish.  Estimates come from sketches.hll_estimate
    over ``hll_current`` — identical to batch-sketching the whole
    corpus (tested)."""
    from pyspark.sql import functions as FF

    from ..operators import sketches

    from ..operators import dedup

    spark = batch_df.sparkSession
    toks = batch_df.select(
        group_col,
        FF.explode(
            FF.filter(
                FF.split(FF.lower(FF.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("_tok"),
    ).select(
        group_col, dedup.token_hash(FF.col("_tok")).alias("_tok_h")
    )
    delta = sketches.hll_registers(toks, group_col, "_tok_h")
    delta.write.mode("overwrite").parquet(
        f"{state_dir}/hlls/batch={batch_id}"
    )
    all_deltas = spark.read.parquet(f"{state_dir}/hlls").select(
        group_col, "idx", "rho"
    )
    current = all_deltas.groupBy(group_col, "idx").agg(
        FF.max("rho").alias("rho")
    )
    current.write.mode("overwrite").parquet(
        f"{state_dir}/hll_current"
    )
