"""Structured-Streaming facade tests: windowed rollup over a file
stream and the foreachBatch incremental-classify bridge."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    s = get_spark("pytest-streaming", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _write_pages(spark, path, start_version):
    rows = [
        (f"u{i}", v, 1704067200 + i * 3600 + v * 60, f"text {i}", "en",
         (i * 31 + v * 7) % 997, i % 211,
         float(i % 360 - 180), float(i % 180 - 90), True)
        for i in range(20)
        for v in (start_version,)
    ]
    schema = (
        "url string, version int, warc_epoch bigint, text string, "
        "lang string, changeset_id bigint, uid bigint, lon double, "
        "lat double, visible boolean"
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_streaming_tile_rollup(spark, tmp_path):
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages")
    _write_pages(spark, src, 1)
    stream = incremental.stream_pages(spark, src)
    assert stream.isStreaming
    rollup = incremental.streaming_tile_rollup(stream)
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT SUM(n_pages) AS n FROM rollup_test").collect()
    assert out[0].n == 20


def test_foreach_batch_classify_accumulates(spark, tmp_path):
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages2")
    state = str(tmp_path / "state")
    _write_pages(spark, src, 1)

    def run_stream():
        stream = incremental.stream_pages(spark, src).withColumn(
            "accepted", F.col("changeset_id") % 2 == 0
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: incremental.foreach_batch_classify(
                    df, bid, state
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_stream()
    acts1 = spark.read.parquet(f"{state}/actions")
    assert acts1.count() > 0

    # second micro-batch: new versions for the same urls arrive; the
    # bridge must re-read stored history so the fold sees v1+v2
    _write_pages(spark, src, 2)
    run_stream()
    hist = spark.read.parquet(f"{state}/histories")
    assert hist.groupBy("url").count().agg(F.max("count")).collect()[0][0] == 2


def test_foreach_batch_classify_restart_exactly_once(spark, tmp_path):
    """Kill-and-restart against the same checkpoint dir, plus a
    verbatim batch REPLAY (the at-least-once crash window foreachBatch
    exposes): the final merged state must equal an uninterrupted batch
    run — no duplicated history rows, no lost versions, identical
    action rows.

    Run 1 sees only the v1 files and stops (= the kill between
    micro-batches).  More files arrive; run 2 restarts from the
    checkpoint and must process ONLY the new files.  Then the last
    batch is re-invoked verbatim with the same batch_id — the
    idempotent per-batch partitions must absorb it unchanged."""
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages_r")
    state = str(tmp_path / "state_r")
    ckpt = str(tmp_path / "ckpt_r")

    def run_stream():
        stream = incremental.stream_pages(spark, src).withColumn(
            "accepted", F.col("changeset_id") % 2 == 0
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: incremental.foreach_batch_classify(
                    df, bid, state
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_pages(spark, src, 1)
    run_stream()  # processes v1, then "dies"
    _write_pages(spark, src, 2)
    run_stream()  # restart from checkpoint: must pick up ONLY v2

    hist = spark.read.parquet(f"{state}/histories")
    # no dup/no loss: exactly one row per (url, version), both versions
    per_uv = hist.groupBy("url", "version").count()
    assert per_uv.where("count != 1").count() == 0
    assert hist.count() == 40 and hist.select("url").distinct().count() == 20

    # latest batch's actions = what an uninterrupted batch fold over
    # the full v1+v2 history produces
    batches = sorted(
        int(p.batch) for p in hist.select("batch").distinct().collect()
    )
    last = batches[-1]

    def action_rows():
        df = spark.read.parquet(f"{state}/actions/batch={last}")
        return sorted(
            (r.url, r.action, r.version, r.mode) for r in df.collect()
        )

    from openstreetmap_license_change_spark.operators import fold

    full = spark.read.parquet(src).withColumn(
        "accepted", F.col("changeset_id") % 2 == 0
    )
    expected = sorted(
        (r.url, r.action, r.version, r.mode)
        for r in fold.classify_histories(
            full.select(
                "url",
                F.lit("node").alias("element_type"),
                F.col("version").cast("int").alias("version"),
                "visible",
                "accepted",
                F.to_json(
                    F.create_map(F.lit("text"), F.col("text"))
                ).alias("tags_json"),
                "lon",
                "lat",
            )
        ).collect()
    )
    got1 = action_rows()
    assert got1 == expected

    # verbatim REPLAY of the last batch (same rows, same batch_id):
    # the crash-window case. State must be byte-for-byte stable.
    replay_df = spark.read.parquet(src).where(
        F.col("version") == 2
    ).withColumn("accepted", F.col("changeset_id") % 2 == 0)
    incremental.foreach_batch_classify(replay_df, last, state)

    hist2 = spark.read.parquet(f"{state}/histories")
    assert hist2.count() == 40
    assert hist2.groupBy("url", "version").count().where("count != 1").count() == 0
    assert action_rows() == expected


def _write_events(spark, path, rows):
    schema = "user_id bigint, event_id bigint, ts timestamp, value double"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: intra-batch gaps close
    sessions immediately; watermark progress times out open sessions."""
    import datetime as dt

    from openstreetmap_license_change_spark.streaming import sessionize

    def t(mins):
        return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=mins)

    src = str(tmp_path / "events")
    # file 1: user 1 has two sessions split by a >30min gap inside the
    # batch (second closes only by timeout); user 2 one open session
    _write_events(spark, src, [
        (1, 1, t(0), 1.5), (1, 2, t(10), 2.0),   # session A: 2 events
        (1, 3, t(50), 0.25),                     # session B (open)
        (2, 1, t(5), 4.0),                       # user 2 (open)
    ])
    # file 2: far-future event advances the watermark past all file-1
    # timeouts; file 3 gives the engine a batch in which to fire them
    _write_events(spark, src, [(9, 1, t(300), 1.0)])
    _write_events(spark, src, [(9, 2, t(301), 1.0)])

    stream = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize.sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start.minute + r.session_start.hour * 60,
         r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    # session A closed by the intra-batch gap OR timeout; session B and
    # user 2's session closed by watermark timeout
    assert (1, 0, 2, 3.5) in got
    assert (1, 50, 1, 0.25) in got
    assert (2, 5, 1, 4.0) in got
    # user 9's sessions stay open (watermark never passes them)
    assert not any(u == 9 for (u, _, _, _) in got)


def test_streaming_tile_rollup_multires(spark, tmp_path):
    """Multi-res streaming rollup: every capture counts once at every
    requested resolution, cells carry their resolution tag, and the
    per-level totals each equal the input size."""
    from openstreetmap_license_change_spark.operators import spatial
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages_mr")
    _write_pages(spark, src, 1)
    stream = incremental.stream_pages(spark, src)
    rollup = incremental.streaming_tile_rollup_multires(
        stream, resolutions=[3, 7]
    )
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_mr_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT res, SUM(n_pages) AS n FROM rollup_mr_test GROUP BY res"
    ).collect()
    assert {r.res: r.n for r in rows} == {3: 20, 7: 20}
    # batch-vs-stream agreement: same per-cell counts as the batch
    # hier_cell aggregation over the same files
    batch = (
        spark.read.parquet(src)
        .groupBy(
            spatial.hier_cell(F.col("lon"), F.col("lat"), 7).alias("cell")
        )
        .count()
    )
    want = {r.cell: r["count"] for r in batch.collect()}
    got = {
        r.cell: r.n
        for r in spark.sql(
            "SELECT cell, SUM(n_pages) AS n FROM rollup_mr_test "
            "WHERE res = 7 GROUP BY cell"
        ).collect()
    }
    assert got == want


def test_foreach_batch_rollup_merge_incremental(spark, tmp_path):
    """Streaming incremental rollup: two micro-batches maintained via
    per-batch delta rollups + merge publish, then a verbatim REPLAY of
    the last batch (the at-least-once crash window).  The final
    materialized rollup must equal the direct batch rollup over the
    full corpus — merge exactness + replay idempotence in one."""
    from openstreetmap_license_change_spark.operators import spatial
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages_r")
    state = str(tmp_path / "state_r")

    def run_stream():
        stream = incremental.stream_pages(spark, src).withColumn(
            "accepted", F.col("changeset_id") % 2 == 0
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: incremental.foreach_batch_rollup(
                    df, bid, state
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt_r"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_pages(spark, src, 1)
    run_stream()
    _write_pages(spark, src, 2)
    run_stream()

    # verbatim replay of the last batch id (crash-after-sink window):
    # rerun the bridge directly with the same id and the same rows
    import glob as _glob
    last = max(int(p.rsplit("=", 1)[1])
               for p in _glob.glob(f"{state}/rollups/batch=*"))
    replay = spark.read.parquet(src).where(F.col("version") == 2) \
        .withColumn("accepted", F.col("changeset_id") % 2 == 0)
    incremental.foreach_batch_rollup(replay, last, state)

    got = {r.cell: (r.n_pages, r.n_tainted) for r in
           spark.read.parquet(f"{state}/rollup_current").collect()}
    full = spark.read.parquet(src).withColumn(
        "accepted", F.col("changeset_id") % 2 == 0
    )
    cells = spatial.assign_cells(full).withColumn(
        "tainted", ~F.col("accepted"))
    want = {r.cell: (r.n_pages, r.n_tainted) for r in
            spatial.tile_rollup(cells).collect()}
    assert got == want


def test_foreach_batch_latest_state_incremental(spark, tmp_path):
    """Streaming current_* maintenance: two micro-batches + a verbatim
    batch REPLAY; the materialized state must equal the batch
    latest_version over the full corpus (same mergeable-delta contract
    as the rollup bridge)."""
    from openstreetmap_license_change_spark.operators import lineage
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages_s")
    state = str(tmp_path / "state_s")

    def run_stream():
        stream = incremental.stream_pages(spark, src)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: incremental.foreach_batch_latest_state(
                    df, bid, state
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt_s"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_pages(spark, src, 1)
    run_stream()
    _write_pages(spark, src, 2)
    run_stream()

    import glob as _glob
    last = max(int(p.rsplit("=", 1)[1])
               for p in _glob.glob(f"{state}/states/batch=*"))
    replay = spark.read.parquet(src).where(F.col("version") == 2)
    incremental.foreach_batch_latest_state(replay, last, state)

    got = {r.url: (r.version, r.lon, r.lat, r.visible) for r in
           spark.read.parquet(f"{state}/state_current").collect()}
    want = {r.url: (r.version, r.lon, r.lat, r.visible) for r in
            lineage.latest_version(
                spark.read.parquet(src),
                cols=["lon", "lat", "visible"],
            ).collect()}
    assert got == want


def test_diff_states_equals_batch_snapshot_diff(spark, tmp_path):
    """Streaming twin of snapshot_diff: maintain current-state via the
    foreachBatch bridge, capture the materialized state at cut A, keep
    streaming to cut B, then snapshots.diff_states(state_A, state_B)
    must equal the batch snapshot_diff over the full capture log —
    added / removed (tombstone) / changed / unchanged all exercised."""
    from openstreetmap_license_change_spark.operators import snapshots
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages_d")
    state = str(tmp_path / "state_d")
    schema = (
        "url string, version int, warc_epoch bigint, text string, "
        "lang string, changeset_id bigint, uid bigint, lon double, "
        "lat double, visible boolean"
    )
    e0 = 1704067200

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_stream():
        stream = incremental.stream_pages(spark, src)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: incremental.foreach_batch_latest_state(
                    df, bid, state
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt_d"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # epoch-A corpus: u0..u9 visible, u9 born deleted (tombstone)
    write([
        (f"u{i}", 1, e0 + i, f"t{i}", "en", i, i,
         float(i), float(-i), i != 9)
        for i in range(10)
    ])
    run_stream()
    epoch_a = e0 + 9
    # freeze the cut-A state (an Iceberg snapshot read in production)
    spark.read.parquet(f"{state}/state_current").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "state_a"))

    # epoch-B deltas: u0 moves, u1 edits in place, u2 deleted,
    # u9 re-added, u10 brand new
    write([
        ("u0", 2, epoch_a + 50, "t0", "en", 0, 0, 12.5, -3.0, True),
        ("u1", 2, epoch_a + 51, "t1b", "en", 1, 1, 1.0, -1.0, True),
        ("u2", 2, epoch_a + 52, "t2", "en", 2, 2, 2.0, -2.0, False),
        ("u9", 2, epoch_a + 53, "t9", "en", 9, 9, 9.0, -9.0, True),
        ("u10", 1, epoch_a + 54, "t10", "en", 10, 10, 10.0, -10.0, True),
    ])
    run_stream()

    got = sorted(
        tuple(r)
        for r in snapshots.diff_states(
            spark.read.parquet(str(tmp_path / "state_a")),
            spark.read.parquet(f"{state}/state_current"),
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in snapshots.snapshot_diff(
            spark.read.parquet(src), epoch_a, epoch_a + 60
        ).collect()
    )
    assert got == want
    statuses = {r[0]: r[1] for r in got}
    assert statuses["u0"] == "changed"
    assert statuses["u1"] == "unchanged"
    assert statuses["u2"] == "removed"
    assert statuses["u9"] == "added"
    assert statuses["u10"] == "added"
    assert "u9" != "unchanged"  # tombstone at A, present at B


def test_foreach_batch_bloom_incremental(spark, tmp_path):
    """Streaming Bloom maintenance: two micro-batches + a verbatim
    replay; the materialized sketch must equal the batch bloom_build
    over the full corpus, and membership checks against it must show
    no false negatives."""
    from openstreetmap_license_change_spark.operators import sketches
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages_b")
    state = str(tmp_path / "state_b")

    def run_stream():
        stream = incremental.stream_pages(spark, src)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: incremental.foreach_batch_bloom(
                    df, bid, state, n_bits=512, k=3
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt_b"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_pages(spark, src, 1)
    run_stream()
    _write_pages(spark, src, 2)
    run_stream()

    # verbatim replay of the last batch (at-least-once semantics)
    import glob as _glob
    last = max(int(p.rsplit("=", 1)[1])
               for p in _glob.glob(f"{state}/blooms/batch=*"))
    replay = spark.read.parquet(src).where(F.col("version") == 2)
    incremental.foreach_batch_bloom(replay, last, state, n_bits=512, k=3)

    got = {
        r.word_idx: r.bits
        for r in spark.read.parquet(f"{state}/bloom_current").collect()
    }
    want = {
        r.word_idx: r.bits
        for r in sketches.bloom_build(
            spark.read.parquet(src), n_bits=512, k=3
        ).collect()
    }
    assert got == want

    probes = (
        spark.read.parquet(src)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("token"))
        .where(F.col("token") != "")
        .distinct()
    )
    checked = sketches.bloom_check(
        spark.read.parquet(f"{state}/bloom_current"), probes,
        n_bits=512, k=3,
    ).collect()
    assert checked and all(r.in_bloom for r in checked)


def test_foreach_batch_countmin_incremental(spark, tmp_path):
    """Streaming Count-Min maintenance: two micro-batches + a verbatim
    replay of the LAST batch (at-least-once semantics — the additive
    sketch would double-count if the delta appended instead of
    overwrote); the materialized sketch must equal the batch
    countmin_build over the full corpus cell-for-cell, and point
    estimates from it must keep the one-sided est ≥ true guarantee."""
    from openstreetmap_license_change_spark.operators import sketches
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages_cm")
    state = str(tmp_path / "state_cm")
    depth, width = 3, 64

    def run_stream():
        stream = incremental.stream_pages(spark, src)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: incremental.foreach_batch_countmin(
                    df, bid, state, depth=depth, width=width
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt_cm"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_pages(spark, src, 1)
    run_stream()
    _write_pages(spark, src, 2)
    run_stream()

    # verbatim replay of the last batch: the overwrite (not append)
    # of cms/batch=<id> is what keeps the additive sketch exact
    import glob as _glob
    last = max(int(p.rsplit("=", 1)[1])
               for p in _glob.glob(f"{state}/cms/batch=*"))
    replay = spark.read.parquet(src).where(F.col("version") == 2)
    incremental.foreach_batch_countmin(
        replay, last, state, depth=depth, width=width
    )

    got = {
        (r.row, r.bucket): r.cnt
        for r in spark.read.parquet(f"{state}/cms_current").collect()
    }
    want = {
        (r.row, r.bucket): r.cnt
        for r in sketches.countmin_build(
            spark.read.parquet(src), depth=depth, width=width
        ).collect()
    }
    assert got == want

    # one-sided estimate guarantee against true counts
    docs = spark.read.parquet(src)
    true_counts = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                    .alias("token"))
        .where(F.col("token") != "")
        .groupBy("token").count()
    )
    est = sketches.countmin_estimate(
        spark.read.parquet(f"{state}/cms_current"),
        true_counts.select("token"),
        width=width,
    )
    joined = est.join(true_counts, "token").collect()
    assert joined and all(r["est_n"] >= r["count"] for r in joined)


def test_foreach_batch_hll_incremental(spark, tmp_path):
    """Streaming HLL maintenance: two micro-batches + a verbatim
    replay (MAX-merge is idempotent); the materialized registers must
    equal batch hll_registers over the full corpus, and the estimate
    folded from them must equal the batch hll_distinct estimate."""
    from openstreetmap_license_change_spark.operators import dedup, sketches
    from openstreetmap_license_change_spark.streaming import incremental

    src = str(tmp_path / "pages_h")
    state = str(tmp_path / "state_h")

    def run_stream():
        stream = incremental.stream_pages(spark, src)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: incremental.foreach_batch_hll(
                    df, bid, state
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt_h"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    _write_pages(spark, src, 1)
    run_stream()
    _write_pages(spark, src, 2)
    run_stream()

    import glob as _glob
    last = max(int(p.rsplit("=", 1)[1])
               for p in _glob.glob(f"{state}/hlls/batch=*"))
    replay = spark.read.parquet(src).where(F.col("version") == 2)
    incremental.foreach_batch_hll(replay, last, state)

    got_regs = {
        (r.lang, r.idx): r.rho
        for r in spark.read.parquet(f"{state}/hll_current").collect()
    }
    toks = (
        spark.read.parquet(src)
        .select(
            "lang",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .select("lang", dedup.token_hash(F.col("tok")).alias("th"))
    )
    want_regs = {
        (r.lang, r.idx): r.rho
        for r in sketches.hll_registers(toks, "lang", "th").collect()
    }
    assert got_regs == want_regs

    got_est = {
        r.lang: r.est_distinct
        for r in sketches.hll_estimate(
            spark.read.parquet(f"{state}/hll_current"), "lang"
        ).collect()
    }
    want_est = {
        r.lang: r.est_distinct
        for r in sketches.hll_distinct(toks, "lang", "th").collect()
    }
    assert got_est == want_est
