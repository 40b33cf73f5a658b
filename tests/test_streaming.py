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
