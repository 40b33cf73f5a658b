"""Data-mixture resampling (sampling.mixture_resample)."""

import duckdb
import pytest

from pyspark.sql import functions as F

from openstreetmap_license_change_spark.operators import sampling


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("mixture-tests", master="local[4]",
                    shuffle_partitions=8)


def _docs(spark, per_lang):
    rows = []
    i = 0
    for lang, (n_docs, toks_per) in per_lang.items():
        for _ in range(n_docs):
            rows.append((i, lang, " ".join("w" for _ in range(toks_per))))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_binding_stratum_kept_others_downsampled(spark):
    # en: 10k tokens, de: 10k tokens; weights 4:1 → de is 4× over-
    # represented relative to en: en binds (keeps ~all), de keeps ~25%
    docs = _docs(spark, {"en": (100, 100), "de": (100, 100)})
    out = sampling.mixture_resample(docs, {"en": 4, "de": 1})
    got = {r.lang: r for r in out.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.first("keep_thresh").alias("thr")).collect()}
    assert got["en"].thr == 10**6          # binding: keep everything
    assert got["de"].thr == 250_000        # exact integer quarter
    assert got["en"].n == 100
    # hash selection is approximate around 25 of 100
    assert 10 <= got["de"].n <= 40


def test_untargeted_stratum_dropped_and_validation(spark):
    docs = _docs(spark, {"en": (10, 10), "xx": (10, 10)})
    out = sampling.mixture_resample(docs, {"en": 1})
    assert out.where(F.col("lang") == "xx").count() == 0
    with pytest.raises(ValueError):
        sampling.mixture_resample(docs, {})
    with pytest.raises(ValueError):
        sampling.mixture_resample(docs, {"en": 0})


def test_duckdb_twin_matches(spark):
    import random
    rng = random.Random(5)
    rows = [(i, rng.choice(["en", "de", "fr"]),
             " ".join("t" for _ in range(rng.randrange(1, 80))))
            for i in range(600)]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string")
    targets = {"en": 3, "de": 2, "fr": 1}
    got = sorted(
        map(tuple, sampling.mixture_resample(docs, targets)
            .select("doc_id", "lang", "n_tokens", "keep_thresh")
            .collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents5(doc_id BIGINT, lang VARCHAR, "
                "text VARCHAR)")
    con.executemany("INSERT INTO documents5 VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        "SELECT doc_id, lang, n_tokens, keep_thresh FROM ("
        + sampling.mixture_resample_sql("documents5", targets) + ")"
    ).fetchall()))
    assert got == want


def test_scan_level_predicate_no_wide_shuffle(spark):
    """The fact-table filter must not shuffle the fact table: only the
    tiny per-stratum aggregates exchange; every fact-side join is
    broadcast."""
    docs = _docs(spark, {"en": (20, 10), "de": (20, 10)})
    plan = (
        sampling.mixture_resample(docs, {"en": 1, "de": 1})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
