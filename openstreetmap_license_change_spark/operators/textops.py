"""Text-analysis operators: quality scoring, language id, token stats,
fingerprints.

All native column expressions (regex + length arithmetic) — zero
Python in the hot path; the same formulas are expressible in ANSI SQL
for the oracle.  The significance kernel's native normalizations
(tags.rb:264-318 F1-F4/F8/F9) are exposed as columns here too.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small stopword lists per language for the n-gram/stopword language-id
# heuristic; deterministic and tiny (broadcast as literals)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "auf", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "dans"],
    "es": ["el", "la", "los", "las", "de", "que", "y", "en", "un", "es"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish proxy: words + punct runs)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return F.round(
        (F.length(text) - F.length(stripped))
        / F.greatest(F.length(text), F.lit(1)),
        6,
    )


def upper_ratio(text: Column) -> Column:
    no_upper = F.regexp_replace(text, r"[A-Z]", "")
    return F.round(
        (F.length(text) - F.length(no_upper))
        / F.greatest(F.length(text), F.lit(1)),
        6,
    )


def stopword_hits(text: Column, lang: str) -> Column:
    toks = F.split(F.lower(text), r"\s+")
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), words))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword quality features + a composite
    keep/drop heuristic for training-data filtering."""
    t = F.col(text_col)
    out = (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_chars_m", F.length(t))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("stop_hits_en", stopword_hits(t, "en"))
    )
    return out.withColumn(
        "quality_keep",
        (F.col("n_tokens") >= 5)
        & (F.col("punct_ratio") < 0.3)
        & (F.col("n_chars_m") >= 20),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language id: argmax over per-language hit counts
    with deterministic preference order on ties."""
    t = F.col(text_col)
    scored = df
    for lang in STOPWORDS:
        scored = scored.withColumn(f"_hits_{lang}", stopword_hits(t, lang))
    langs = list(STOPWORDS)
    # deterministic argmax: best score wins, ties broken by list order
    best = F.lit(langs[0])
    best_score = F.col(f"_hits_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"_hits_{lang}") > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, F.col(f"_hits_{lang}")).otherwise(best_score)
    out = scored.withColumn(
        "lang_pred", F.when(best_score > 0, best).otherwise(F.lit("und"))
    )
    return out.drop(*[f"_hits_{lang}" for lang in langs])


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    qs_m: Sequence[int] = (500_000, 900_000, 990_000),
) -> DataFrame:
    """EXACT nearest-rank quantiles of ``value_col`` per group —
    value at rank ⌈q·n⌉ under (value, …) ordering — instead of the
    interpolated/approximate variants whose float arithmetic differs
    across engines (percentile_approx is sketch-based; quantile_cont
    interpolates).  Quantile levels are integer millionths (``qs_m``)
    so rank arithmetic is pure int64: rank ⌈q_m·n / 10⁶⌉ computed as
    ``(q_m·n + 999999) DIV 1000000`` — identical in Spark and ANSI SQL.

    One shuffle: a rank window per group plus the group count as a
    window aggregate (no second groupBy-join), then a filter to the
    ≤ len(qs_m) selected ranks per group; output one row per
    (group, quantile).  At 100 TB this is the sort-based exact path —
    per-group sort of the value column only; for wide percentile
    sweeps over mega-groups, swap in an approx sketch and say so
    (no silent approximation here: this operator IS the exact one).

    Ties take the first row at the rank under deterministic
    (value) ordering — ranks are positional, so equal values at the
    boundary yield the same quantile value regardless of which tied
    row holds the rank."""
    from pyspark.sql import Window as W

    gcols = list(group_cols)
    w = W.partitionBy(*gcols).orderBy(F.col(value_col).asc())
    ranked = df.select(*gcols, value_col).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn(
        "_n", F.count(F.lit(1)).over(W.partitionBy(*gcols))
    )
    # one window execution: fan each ranked row out over the (tiny)
    # quantile list with a pipelined explode, then filter to the rank —
    # a union of per-q filters would re-run the window per quantile
    qlits = F.array(*[F.lit(int(q)).cast("bigint") for q in qs_m])
    return (
        ranked.withColumn("q_m", F.explode(qlits))
        .where(F.col("_rn") == F.expr("(q_m * _n + 999999) DIV 1000000"))
        .select(*gcols, "q_m", F.col(value_col).alias("quantile_value"))
    )


FINGERPRINT_BASE = 31
FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_PREFIX = 64


def repetition_stats(
    df: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition quality signals over word ``n``-grams:
    the share of n-gram occurrences claimed by the single most frequent
    gram (``top_share_m``) and by ALL grams occurring ≥2 times
    (``dup_share_m``), in exact integer millionths so the DuckDB twin
    hash-matches (no float ratios).  ``repetitive`` applies the
    published filter shape (Gopher drops docs whose top-2-gram share
    exceeds 0.20; the dup-occurrence bound 0.60 is the analogous
    all-duplicates guard).

    Plan: one explode of the per-row gram array → (doc, gram) count
    with map-side partial agg → per-doc re-aggregate of the already-
    unique (doc, gram) rows.  Both shuffles key on the doc (the second
    reuses nothing FROM the first only because gram is in the first
    key; at 100 TB both are ordinary hash aggs, no skew beyond doc
    size, no window, no collect)."""
    from .dedup import gram_array

    g = df.select(
        id_col,
        F.explode(gram_array(F.col(text_col), n)).alias("gram"),
    ).where(F.length("gram") > 0)
    counts = g.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("c"))
    agg = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.max("c").alias("top_ngram_count"),
        F.coalesce(
            F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)
        ).alias("dup_ngram_occurrences"),
    )
    top_share = F.expr("(top_ngram_count * 1000000) DIV n_ngrams")
    dup_share = F.expr("(dup_ngram_occurrences * 1000000) DIV n_ngrams")
    return agg.select(
        id_col,
        "n_ngrams",
        "top_ngram_count",
        "dup_ngram_occurrences",
        top_share.alias("top_share_m"),
        dup_share.alias("dup_share_m"),
        ((top_share > 200000) | (dup_share > 600000)).alias("repetitive"),
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` most characteristic terms per document by tf-idf with
    the *raw inverse document frequency* weighting (idf = 1/df, the
    exact-arithmetic member of the tf-idf family): score_m =
    (tf · 10⁶) DIV df, pure int64 in both engines, so the DuckDB twin
    hash-matches value-for-value — the log-idf variant changes only the
    weighting constant, not the plan shape, and would make the oracle
    float-fragile for near-tied terms.

    Plan shape (the part that matters at 100 TB): tf is one
    (doc, token) groupBy with map-side partial aggregation over the
    exploded token stream; df re-aggregates the ALREADY per-doc-unique
    tf rows (never the raw stream) keyed by token; the join back is
    token-keyed — stopword-skew there is AQE's skew-join case — and the
    final per-doc top-k is a rank window that Spark executes as
    WindowGroupLimit (partial top-k before the shuffle), the same shape
    plan-pinned for sampling.group_topk.

    Returns (id, token, tf, df, score_m, rank), rank 1..k, total order
    (ties broken by token, which is unique within a doc)."""
    from pyspark.sql import Window as W

    raw = df.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    tf = raw.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "token").withColumn(
        "score_m", F.expr("(tf * 1000000) DIV df")
    )
    w = W.partitionBy(id_col).orderBy(
        F.col("score_m").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "token", "tf", "df", "score_m", "rank")
    )


def rare_token_ratio(
    docs: DataFrame,
    max_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-calibrated vocabulary-rarity quality signal: per
    document, the fraction of its DISTINCT tokens whose corpus
    document frequency is ≤ ``max_df`` (default 1 = hapax legomena —
    tokens this document alone uses).  High ratios flag gibberish,
    OCR noise, and boilerplate-free spam; near-zero ratios flag
    templated text — the cross-document member of the quality-score
    family (quality_score is per-doc-local; this one prices each token
    against the whole corpus).

    Exact arithmetic: counts are int64 and the ratio ships as
    ``rare_ppm = (n_rare · 10⁶) DIV n_distinct`` (same discipline as
    tfidf_topk's score_m), so the DuckDB twin hash-matches.

    Plan shape at 100 TB: distinct (doc, token) pairs are one
    map-side-combinable shuffle of the exploded stream; document
    frequency re-aggregates those ALREADY-unique rows keyed by token
    (never the raw stream); the join back is token-keyed — the Zipf
    head ("the") is AQE's skew-join case, and the rare tail that
    decides the verdict is perfectly spread; the final per-doc rollup
    is a third partial-agg groupBy.  No collects, no windows.

    Returns (id, n_distinct, n_rare, rare_ppm)."""
    toks = (
        docs.select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
    )
    dfreq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(dfreq, "token")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum((F.col("df") <= max_df).cast("int"))
            .cast("bigint").alias("n_rare"),
        )
        .withColumn("rare_ppm", F.expr("(n_rare * 1000000) DIV n_distinct"))
    )


def collocations(
    docs: DataFrame,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus collocation mining: adjacent token pairs scored by the
    PMI-monotone integer statistic

        score_m = (c_ab · N · 10⁶) DIV (c_a · c_b)

    (c_ab bigram count, c_a/c_b unigram counts over the SAME stream,
    N total bigrams).  PMI itself is log(score_m/10⁶) — a monotone
    transform, so ranking and thresholding are unchanged while the
    score stays exactly reproducible (the tfidf_topk discipline: the
    log variant would be float-fragile on near-ties).  Pairs below
    ``min_count`` are dropped — the standard PMI small-sample guard
    (a hapax pair always looks maximally associated).

    The wide product c_ab·N·10⁶ runs in decimal(38,0) (HUGEINT in the
    twin): headroom to N ≈ 10¹⁵ bigrams before 10³⁸, and the DIV
    result is ≤ N·10⁶ — back inside int64 for the output.

    Plan: one posexplode + LEAD window keyed by doc (the token
    stream's only wide shuffle), then three map-side-combining
    groupBys (bigram, unigram, the 1-row total broadcast back) and two
    token-keyed joins — Zipf-head skew on the join is AQE's case.
    Output: (tok_a, tok_b, pair_n, score_m)."""
    from pyspark.sql import Window as W

    toks = docs.select(
        id_col,
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "token"),
    ).where(F.col("token") != "")
    w = W.partitionBy(id_col).orderBy("pos")
    bi = toks.select(
        F.col("token").alias("tok_a"),
        F.lead("token").over(w).alias("tok_b"),
    ).where(F.col("tok_b").isNotNull())
    pair_n = bi.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).alias("pair_n")
    )
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = bi.agg(F.count(F.lit(1)).alias("n_bigrams"))
    dec = "decimal(38,0)"
    return (
        pair_n.where(F.col("pair_n") >= min_count)
        .join(uni.select(F.col("token").alias("tok_a"),
                         F.col("cnt").alias("_ca")), "tok_a")
        .join(uni.select(F.col("token").alias("tok_b"),
                         F.col("cnt").alias("_cb")), "tok_b")
        .crossJoin(F.broadcast(total))
        .select(
            "tok_a", "tok_b", "pair_n",
            F.expr(
                f"CAST((CAST(pair_n AS {dec}) * n_bigrams * 1000000) "
                f"DIV (CAST(_ca AS {dec}) * _cb) AS BIGINT)"
            ).alias("score_m"),
        )
    )


def collocations_sql(
    src: str,
    min_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`collocations` (standalone statement)."""
    return f"""
        WITH col_split AS (
            SELECT {id_col},
                   string_split_regex(lower({text_col}), '\\s+') AS ws
            FROM {src}
        ),
        col_toks AS (
            SELECT {id_col}, u.i AS pos, ws[u.i] AS token
            FROM col_split,
                 LATERAL (SELECT UNNEST(range(1, len(ws) + 1)) AS i) u
            WHERE ws[u.i] <> ''
        ),
        col_bi AS (
            SELECT token AS tok_a,
                   LEAD(token) OVER (PARTITION BY {id_col}
                                     ORDER BY pos) AS tok_b
            FROM col_toks
        ),
        col_pairs AS (
            SELECT tok_a, tok_b, COUNT(*) AS pair_n
            FROM col_bi WHERE tok_b IS NOT NULL GROUP BY 1, 2
        ),
        col_uni AS (
            SELECT token, COUNT(*) AS cnt FROM col_toks GROUP BY 1
        ),
        col_tot AS (
            SELECT COUNT(*) AS n_bigrams FROM col_bi
            WHERE tok_b IS NOT NULL
        )
        SELECT p.tok_a, p.tok_b, p.pair_n,
               CAST((CAST(p.pair_n AS HUGEINT) * t.n_bigrams * 1000000)
                    // (CAST(a.cnt AS HUGEINT) * b.cnt)
                    AS BIGINT) AS score_m
        FROM col_pairs p
        JOIN col_uni a ON a.token = p.tok_a
        JOIN col_uni b ON b.token = p.tok_b
        CROSS JOIN col_tot t
        WHERE p.pair_n >= {min_count}
    """


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-window document chunking — the canonical pretraining prep
    step: split each document's token stream into ``chunk_tokens``-
    sized windows advancing by ``stride`` (default = chunk_tokens, i.e.
    non-overlapping; stride < chunk gives sliding overlap for
    retrieval corpora).  The final short window is KEPT (labs trim or
    pad downstream; dropping it here would silently lose tail text —
    the no-silent-caps rule).

    Whitespace tokenization (the engine's token_count convention).
    Everything is native array algebra: one split, one
    explode(sequence) over ceil(n/stride) chunk indices, one slice —
    no Python, no shuffle at all (chunking is embarrassingly row-
    local; the output inherits the input's partitioning).

    Returns (id, chunk_id, n_tokens, chunk_text); chunk_id 0-based,
    n_tokens = actual tokens in the chunk (≤ chunk_tokens)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be ≥ 1, got {chunk_tokens}")
    stride = chunk_tokens if stride is None else stride
    if not 1 <= stride <= chunk_tokens:
        raise ValueError(
            f"stride must be in [1, chunk_tokens], got {stride}"
        )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    # chunks start at i·stride for i in [0, ceil((n−chunk)/stride)]
    # (clamped ≥ 0), plus always at least one chunk for non-empty docs
    last_start = F.greatest(
        F.ceil(
            (F.size("_toks") - F.lit(chunk_tokens)) / F.lit(stride)
        ),
        F.lit(0),
    ).cast("int")
    return (
        docs.select(id_col, toks.alias("_toks"))
        .where(F.size("_toks") > 0)
        .select(
            id_col,
            "_toks",
            F.explode(F.sequence(F.lit(0), last_start)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                "_toks",
                F.col("chunk_id") * stride + 1,
                chunk_tokens,
            ).alias("_w"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("_w").alias("n_tokens"),
            F.array_join("_w", " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    src: str,
    chunk_tokens: int = 128,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (standalone)."""
    stride = chunk_tokens if stride is None else stride
    return f"""
        WITH ch_toks AS (
            SELECT {id_col},
                   list_filter(string_split_regex({text_col}, '\\s+'),
                               t -> t <> '') AS toks
            FROM {src}
        ),
        ch_idx AS (
            SELECT {id_col}, toks,
                   CAST(u.i AS INTEGER) AS chunk_id
            FROM ch_toks,
                 LATERAL (SELECT UNNEST(range(0,
                     GREATEST(CAST(CEIL((len(toks) - {chunk_tokens})
                                        / {stride}.0) AS BIGINT), 0)
                     + 1)) AS i) u
            WHERE len(toks) > 0
        )
        SELECT {id_col}, chunk_id,
               CAST(len(list_slice(toks, chunk_id * {stride} + 1,
                                   chunk_id * {stride} + {chunk_tokens}))
                    AS INTEGER) AS n_tokens,
               array_to_string(
                   list_slice(toks, chunk_id * {stride} + 1,
                              chunk_id * {stride} + {chunk_tokens}), ' ')
                   AS chunk_text
        FROM ch_idx
    """


def length_batches(
    docs: DataFrame,
    batch_size: int,
    n_groups: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Length-grouped batch construction with padding-waste
    accounting — the batching step after :func:`chunk_documents`:
    examples batched with similar lengths pad far less (the
    LengthGroupedSampler idea), and the operator MEASURES the waste it
    leaves (pad_waste = max_tokens·n_items − sum_tokens, the exact
    count of pad tokens a max-length-padded batch would carry) instead
    of asserting it.

    Deterministic and shuffle-bounded: documents hash into
    ``n_groups`` independent streams (id mod groups — deterministic at
    any parallelism), each stream sorts by (token count desc, id) in
    its OWN window partition and cuts contiguous ``batch_size`` runs.
    No global window (the single-partition scale bug bench.py treats
    as FAIL); parallelism = n_groups, user-sized to the cluster.
    Cross-group length mixing costs at most a per-group re-sort of
    ~|docs|/n_groups rows — the accepted trade for never serializing.

    Returns per batch: (grp, batch_id, n_items, max_tokens,
    sum_tokens, pad_waste)."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be ≥ 1, got {batch_size}")
    if n_groups < 1:
        raise ValueError(f"n_groups must be ≥ 1, got {n_groups}")
    from pyspark.sql import Window as W

    items = docs.select(
        F.col(id_col).alias("_id"),
        token_count(F.col(text_col)).alias("_n"),
    ).withColumn("grp", F.pmod(F.col("_id"), F.lit(n_groups)).cast("int"))
    w = W.partitionBy("grp").orderBy(F.col("_n").desc(), F.col("_id"))
    batched = items.withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / F.lit(batch_size))
        .cast("int"),
    )
    return batched.groupBy("grp", "batch_id").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.max("_n").alias("max_tokens"),
        F.sum("_n").cast("bigint").alias("sum_tokens"),
        (F.max("_n") * F.count(F.lit(1)) - F.sum("_n"))
        .cast("bigint").alias("pad_waste"),
    )


def length_batches_sql(
    src: str,
    batch_size: int,
    n_groups: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`length_batches` (standalone).  Token
    count mirrors textops.token_count (split on whitespace runs after
    trim; empty text = 0)."""
    ntok = (
        f"CASE WHEN trim({text_col}) = '' THEN 0 ELSE "
        f"len(string_split_regex(trim({text_col}), '\\s+')) END"
    )
    return f"""
        WITH lb_items AS (
            SELECT {id_col} AS _id, {ntok} AS _n,
                   CAST({id_col} % {n_groups} AS INTEGER) AS grp
            FROM {src}
        ),
        lb_ranked AS (
            SELECT grp, _id, _n,
                   CAST((ROW_NUMBER() OVER (PARTITION BY grp
                                            ORDER BY _n DESC, _id) - 1)
                        // {batch_size} AS INTEGER) AS batch_id
            FROM lb_items
        )
        SELECT grp, batch_id,
               COUNT(*) AS n_items,
               MAX(_n) AS max_tokens,
               CAST(SUM(_n) AS BIGINT) AS sum_tokens,
               CAST(MAX(_n) * COUNT(*) - SUM(_n) AS BIGINT) AS pad_waste
        FROM lb_ranked GROUP BY 1, 2
    """


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling-hash fingerprint over the first 64 chars,
    Horner form: acc = (acc·31 + codepoint) mod p at every step, so
    every intermediate stays < p·31 + 0x10FFFF ≪ 2^63 — no float pow,
    no int64 overflow, identical in the SQL twin below."""
    prefix = F.substring(text, 1, FINGERPRINT_PREFIX)
    chars = F.split(prefix, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (
            acc * FINGERPRINT_BASE + F.coalesce(F.ascii(ch), F.lit(0))
        )
        % FINGERPRINT_MOD,
    )


def rolling_fingerprint_sql(expr: str) -> str:
    """DuckDB twin of :func:`rolling_fingerprint` (same Horner fold;
    ``ord`` = codepoint, matching Spark's ``ascii``)."""
    return (
        "list_reduce("
        "list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substring({expr}, 1, "
        f"{FINGERPRINT_PREFIX}), ''), c -> CAST(ord(c) AS BIGINT))), "
        f"(acc, x) -> (acc * {FINGERPRINT_BASE} + x) % {FINGERPRINT_MOD})"
    )


# BPE-ish pre-tokenizer pattern (GPT-2 style, lookahead-free so the
# same pattern runs on Java regex and RE2/DuckDB): a token is an
# optionally-space-prefixed letter run, digit run, or punctuation run,
# else a whitespace run.
BPE_TOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def token_count_bpe(text: Column) -> Column:
    """Subword-style token count: number of BPE-ish pre-token matches.
    A closer proxy for LLM token budgets than whitespace splitting
    (counts punctuation runs and digit runs separately)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_PATTERN), 0))


def significance_normalize(text: Column) -> Column:
    """Native normalization pipeline of the significance kernel
    (tags.rb:266-279): case fold, apostrophe strip, ß→ss, punct/space
    runs → single space."""
    s = F.lower(text)
    s = F.regexp_replace(s, "[＇'ʼʹ]", "")
    s = F.regexp_replace(s, "ß", "ss")
    s = F.regexp_replace(s, r"[\W_]+", " ")
    return s


# ---------------------------------------------------------------------------
# passage-level dedup, PII scrubbing, domain rollups (webtext curation)
# ---------------------------------------------------------------------------

def passage_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 20,
) -> DataFrame:
    """Passage-level exact dedup (the C4/RefinedWeb move of dropping
    repeated boilerplate spans, adapted to unstructured text): each
    document splits into fixed ``window``-word passages, a passage
    survives only in its FIRST global occurrence (min (doc, ordinal)),
    and documents are reassembled from their surviving passages.

    Plan shape: passage generation is a narrow ``transform`` over the
    split array (no explode-then-groupBy round trip), the winner per
    passage is one window-min over ``md5(passage)`` — 16-byte shuffle
    keys instead of raw passage strings — and reassembly is one
    groupBy on the doc id.  Two shuffles total, both map-side
    combining; no join, no distinct.  At 100 TB the md5 keyspace makes
    hot passages (boilerplate repeated 10⁶×) the only skew source, and
    those groups carry 1 winner row + counters, not payloads — AQE
    splits them safely.

    Output: id, n_passages, n_kept, text_kept ('' when everything was
    seen earlier)."""
    from pyspark.sql import Window as W

    words = F.split(F.col(text_col), " ")
    n_chunks = F.floor((F.size(words) - 1) / F.lit(window)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks),
        lambda i: F.array_join(
            F.slice(words, i * F.lit(window) + 1, F.lit(window)), " "
        ),
    )
    p = docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk", "passage"))
    w = W.partitionBy(F.md5(F.col("passage")))
    winner = F.min(F.struct(id_col, "chunk")).over(w)
    p = p.withColumn(
        "_kept", F.struct(id_col, "chunk") == winner
    )
    return p.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.col("_kept").cast("int")).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_kept"), F.struct("chunk", "passage"))
                    )
                ),
                lambda s: s.passage,
            ),
            " ",
        ).alias("text_kept"),
    )


# Extraction pulls the single <p> body out of the crawl envelope
# (sources/pages.html_of) and inverts the entity escaping.  Unescape
# order is the exact inverse of the escape order (&lt;/&gt; first,
# &amp; LAST) — doing &amp; first would corrupt text that originally
# contained literal entities ('&amp;' escapes to '&amp;amp;'; undoing
# &amp; first yields '&amp;' → then &lt; does nothing → correct, but
# the other order turns it into '&' — one round-trip test per hostile
# case pins this).
BODY_PATTERN = r"(?s)<p>(.*)</p>"


def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """Arrow-batched text extraction from the ``html:binary`` column —
    the real-crawl stand-in for trafilatura/boilerpipe: select the
    body paragraph, drop the title/nav/footer chrome, unescape
    entities.  Per-row invariant vs the pages source:
    ``extract_text(html) == text`` byte-identically per url/version
    (asserted in tests and driver-hash-verified by the
    ``html_extract`` oracle).

    A vectorized pandas UDF (one Arrow batch per ~10k rows, zero
    per-row Python overhead beyond the regex itself) because real
    extractors are Python libraries — this is the documented seam
    where trafilatura would plug in.  Everything around it (envelope
    schema, batch shape, invariant check) is native."""
    import re as _re

    body_re = _re.compile(BODY_PATTERN)

    @F.pandas_udf("string")
    def _extract(html: pd.Series) -> pd.Series:
        def one(raw: bytes | None) -> str | None:
            if raw is None:
                return None
            s = bytes(raw).decode("utf-8")
            m = body_re.search(s)
            if m is None:
                return ""
            return (
                m.group(1)
                .replace("&lt;", "<")
                .replace("&gt;", ">")
                .replace("&amp;", "&")
            )

        return html.map(one)

    return df.withColumn(out_col, _extract(F.col(html_col)))


def extract_text_sql(html_expr: str) -> str:
    """DuckDB twin of :func:`extract_text`: decode the blob, take the
    body group, unescape in the same inverse order."""
    body = f"regexp_extract(decode({html_expr}), '{BODY_PATTERN}', 1)"
    return (
        "replace(replace(replace("
        f"{body}, '&lt;', '<'), '&gt;', '>'), '&amp;', '&')"
    )


# PII patterns: deliberately lookaround-free so the identical pattern
# runs on Java regex (Spark) and RE2 (DuckDB oracle) with the same
# matches.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}[- ]\d{4}\b"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing pass (emails, then phone numbers — fixed order,
    so counts are well-defined): native ``regexp_count`` +
    ``regexp_replace`` only, zero Python.  Adds n_emails, n_phones
    and ``scrubbed`` with matches replaced by <EMAIL>/<PHONE>."""
    t = F.col(text_col)
    return (
        df.withColumn(
            "n_emails",
            F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("bigint"),
        )
        .withColumn(
            "n_phones",
            F.regexp_count(t, F.lit(PHONE_PATTERN)).cast("bigint"),
        )
        .withColumn(
            "scrubbed",
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"),
                PHONE_PATTERN,
                "<PHONE>",
            ),
        )
    )


def boilerplate_strip(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    line_sep: str = "\n",
) -> DataFrame:
    """Cross-document boilerplate removal (the RefinedWeb/C4 line-level
    filter): a line is boilerplate when it appears in ≥ ``min_df``
    DISTINCT documents ("subscribe to our newsletter" on every page of
    a domain); boilerplate lines are dropped from every document, the
    survivors are reassembled in original order.

    Differs from :func:`passage_dedup` in policy: passage dedup keeps
    the FIRST occurrence; boilerplate strip drops ALL occurrences once
    the line crosses the document-frequency threshold — chrome isn't
    content anywhere.

    Plan shape (scale argument): the line df is
    ``distinct(line_hash, doc) → groupBy(line_hash).count()`` — both
    map-side combinable, 16-byte md5 shuffle keys, never a collected
    set (a 10⁶-page footer line carries one counter row, not 10⁶ doc
    ids).  The boilerplate verdict joins back on the hash; on web
    corpora the df≥threshold side is tiny (boilerplate is by
    definition few distinct strings), so AQE typically demotes this to
    a broadcast join at runtime — but correctness never depends on it.
    Reassembly is the same one-groupBy array-sort as passage dedup.

    Output: id, n_lines, n_kept, text_kept."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias(
            "lineno", "line"
        ),
    ).where(F.length(F.trim(F.col("line"))) > 0)
    dfreq = (
        lines.select(F.md5(F.col("line")).alias("h"), id_col)
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    verdict = lines.join(
        dfreq, F.md5(F.col("line")) == F.col("h"), "left"
    ).withColumn("_kept", F.coalesce(F.col("df"), F.lit(1)) < min_df)
    return verdict.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_kept").cast("int")).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_kept"), F.struct("lineno", "line"))
                    )
                ),
                lambda s: s.line,
            ),
            line_sep,
        ).alias("text_kept"),
    )


# tracking parameters stripped by canonical_url — the industry-standard
# crawl-dedup list (utm_* plus the big click ids)
TRACKING_PARAM_PATTERN = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def canonical_url(url: Column) -> Column:
    """Crawl-grade URL canonicalization, all native string/array ops
    (zero Python, one expression tree):

    1. drop the ``#fragment``
    2. lowercase scheme and host (path/query case is significant)
    3. strip a default ``:80``/``:443`` port
    4. drop tracking query params (``utm_*``, click ids), keep the rest
    5. sort surviving params byte-wise (param ORDER is almost never
       semantic; sorting makes ?a=1&b=2 ≡ ?b=2&a=1 for dedup)
    6. drop a trailing '?' when no params survive

    The same pipeline is expressible in ANSI SQL (see
    :func:`canonical_url_sql`), so canonicalized-url dedup is
    oracle-checkable end to end."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z0-9+.-]+)://", 1))
    host = F.lower(
        F.regexp_extract(no_frag, r"^[a-zA-Z0-9+.-]+://([^/?]+)", 1)
    )
    host = F.regexp_replace(host, r":(80|443)$", "")
    rest = F.regexp_extract(no_frag, r"^[a-zA-Z0-9+.-]+://[^/?]+([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (F.length(p) > 0)
                & ~p.rlike(TRACKING_PARAM_PATTERN),
            )
        ),
        "&",
    )
    return F.concat(
        scheme, F.lit("://"), host, rest,
        F.when(F.length(kept) > 0, F.concat(F.lit("?"), kept))
        .otherwise(F.lit("")),
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` (RE2 + list ops)."""
    no_frag = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({no_frag}, '^([a-zA-Z0-9+.-]+)://', 1))"
    host = (
        f"regexp_replace(lower(regexp_extract({no_frag}, "
        f"'^[a-zA-Z0-9+.-]+://([^/?]+)', 1)), ':(80|443)$', '')"
    )
    rest = (
        f"regexp_extract({no_frag}, "
        f"'^[a-zA-Z0-9+.-]+://[^/?]+([^?]*)', 1)"
    )
    query = f"regexp_extract({no_frag}, '\\?(.*)$', 1)"
    kept = (
        "array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), "
        f"p -> length(p) > 0 AND NOT regexp_matches(p, "
        f"'{TRACKING_PARAM_PATTERN}'))), '&')"
    )
    return (
        f"{scheme} || '://' || {host} || {rest} || "
        f"CASE WHEN length({kept}) > 0 THEN '?' || {kept} ELSE '' END"
    )


def domain_of(url: Column) -> Column:
    """Registrable host part of a url (scheme://host/...) — one native
    regexp_extract; '' when the url has no scheme-host shape."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/]+)/", 1)


def domain_rollup(
    pages: DataFrame,
    url_col: str = "url",
    taint_col: str | None = None,
) -> DataFrame:
    """Per-domain curation rollup (the crawl-side analogue of the
    per-cell tile rollup): page count, distinct url count, and
    optional taint count.  One hash aggregate on the extracted domain;
    count(distinct url) expands to the standard two-phase partial
    aggregate — no extra job."""
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct(F.col(url_col)).alias("n_urls"),
    ]
    if taint_col is not None:
        aggs.append(
            F.sum(F.col(taint_col).cast("int")).cast("bigint")
            .alias("n_tainted")
        )
    return pages.groupBy(
        domain_of(F.col(url_col)).alias("domain")
    ).agg(*aggs)


BM25_IDF_SCALE = 1000


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global BM25 top-``k`` retrieval for a fixed query-term set —
    the corpus-ranking half of the tf-idf story (tfidf_topk ranks
    terms within a doc; this ranks docs for a query), re-expressed in
    EXACT integer arithmetic so the DuckDB twin hash-matches.

    Okapi constants k1=1.2, b=0.75 enter as the exact rationals 6/5
    and 3/4; with avgdl pre-quantized to milli-tokens
    (``avgdl_m = 1000·L DIV N``) the per-term normalization clears
    denominators to

        tfnorm = 44·tf·avgdl_m / (20·tf·avgdl_m + 6·avgdl_m + 18000·dl)

    and the idf uses the log-free odds weighting quantized once,
    ``idf_m = (2N−2·df+1)·1000 DIV (2·df+1)`` — the monotone member
    of the BM25-idf family that stays in int64 (log-idf would make
    near-ties float-fragile across engines, the tfidf_topk lesson).
    score_m(doc) = Σ_t (idf_m·44·tf·avgdl_m) DIV denom — every factor
    bounded so the product stays < 2⁶³ through ~10⁶-token-average
    corpora of 10⁵ docs; beyond that drop BM25_IDF_SCALE (the quantum
    grows, the plan doesn't change).

    Plan shape (r06): ZERO wide shuffles — the query-term set is a
    small literal list, so per-doc term frequencies and doc length are
    array higher-order-function expressions on the scan (the
    gopher_filter move; the old explode → (doc,token) groupBy ran the
    token-stream shuffle once per consumer subtree, 3-4× per query,
    because broadcast builds share no exchanges with the main plan).
    The narrow (id, dl, tf…) projection is checkpointed once — ONE
    pass over the corpus text; the (N, L, df_t) corpus stats are a
    bounded 1-row collect baked into the scoring expression as
    integer literals (the pagerank dangling-mass pattern); the final
    global top-k is orderBy+limit, which Spark executes as
    TakeOrderedAndProject (per-partition heaps, no single-partition
    window, no full sort).  Ties break by ``id_col`` ascending.
    Per-doc cost is |Q| array scans, the right trade for the literal
    query lists this operator declares (|Q| ≲ dozens).

    Returns (id, score_m) for the top ``k`` docs, highest first."""
    qt = sorted({t.lower() for t in query_terms})
    t = F.col(text_col)
    toks = F.filter(
        F.split(F.lower(t), r"\s+"), lambda x: x != F.lit("")
    )
    def _eq(term):
        # single-arg lambda via closure: a 2-arg lambda would be read
        # by the HOF machinery as (element, index)
        lit = F.lit(term)
        return lambda x: x == lit

    tf_cols = [
        F.coalesce(
            F.size(F.filter(toks, _eq(w))).cast("bigint"),
            F.lit(0),
        ).alias(f"_tf_{i}")
        for i, w in enumerate(qt)
    ]
    per_doc = df.select(
        id_col,
        F.coalesce(F.size(toks).cast("bigint"), F.lit(0)).alias("dl"),
        *tf_cols,
    ).localCheckpoint(eager=True)
    stats = per_doc.agg(
        # docs with ≥1 token, exactly the old dl-table membership
        F.sum(F.when(F.col("dl") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs"),
        F.sum("dl").alias("total_len"),
        *[
            F.sum(F.when(F.col(f"_tf_{i}") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_df_{i}")
            for i in range(len(qt))
        ],
    ).collect()[0]
    n_docs = int(stats["n_docs"] or 0)
    total_len = int(stats["total_len"] or 0)
    if not qt or n_docs == 0:
        return (
            per_doc.where(F.lit(False))
            .select(id_col, F.lit(0).cast("bigint").alias("score_m"))
        )
    # all operands non-negative, so Python // == Spark/DuckDB trunc DIV
    avgdl_m = 1000 * total_len // n_docs
    term_scores = []
    matched = None
    for i in range(len(qt)):
        dfreq = int(stats[f"_df_{i}"] or 0)
        idf_m = (
            (2 * n_docs - 2 * dfreq + 1) * BM25_IDF_SCALE
            // (2 * dfreq + 1)
        )
        hit = F.col(f"_tf_{i}") > 0
        matched = hit if matched is None else (matched | hit)
        term_scores.append(
            F.when(
                hit,
                F.expr(
                    f"(CAST({idf_m} AS BIGINT) * 44 * _tf_{i} "
                    f"* CAST({avgdl_m} AS BIGINT)) DIV "
                    f"(20 * _tf_{i} * CAST({avgdl_m} AS BIGINT) "
                    f"+ 6 * CAST({avgdl_m} AS BIGINT) + 18000 * dl)"
                ),
            ).otherwise(F.lit(0).cast("bigint"))
        )
    score = term_scores[0]
    for ts in term_scores[1:]:
        score = score + ts
    totals = per_doc.where(matched).select(
        id_col, score.cast("bigint").alias("score_m")
    )
    return totals.orderBy(
        F.col("score_m").desc(), F.col(id_col).asc()
    ).limit(k)


def bm25_topk_sql(
    docs_src: str,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical integer formulas,
    generated from the same constants.  Returns (id, score_m)."""
    terms = ", ".join(
        "'" + t.lower().replace("'", "''") + "'" for t in query_terms
    )
    return f"""
        WITH bm_raw AS (
            SELECT {id_col},
                   unnest(string_split_regex(lower({text_col}), '\\s+'))
                       AS token
            FROM {docs_src}
        ),
        bm_tf AS (
            SELECT {id_col}, token, COUNT(*) AS tf
            FROM bm_raw WHERE token <> '' GROUP BY 1, 2
        ),
        bm_dl AS (
            SELECT {id_col}, SUM(tf) AS dl FROM bm_tf GROUP BY 1
        ),
        bm_stats AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len,
                   1000 * SUM(dl) // COUNT(*) AS avgdl_m
            FROM bm_dl
        ),
        bm_df AS (
            SELECT token, COUNT(*) AS df
            FROM bm_tf WHERE token IN ({terms}) GROUP BY 1
        ),
        bm_scored AS (
            SELECT t.{id_col},
                   ((2 * s.n_docs - 2 * d.df + 1) * {BM25_IDF_SCALE}
                        // (2 * d.df + 1))
                       * 44 * t.tf * s.avgdl_m
                   // (20 * t.tf * s.avgdl_m + 6 * s.avgdl_m
                        + 18000 * l.dl) AS term_score
            FROM bm_tf t
            JOIN bm_df d USING (token)
            JOIN bm_dl l USING ({id_col})
            CROSS JOIN bm_stats s
            WHERE t.token IN ({terms})
        )
        SELECT {id_col}, CAST(SUM(term_score) AS BIGINT) AS score_m
        FROM bm_scored
        GROUP BY {id_col}
        ORDER BY score_m DESC, {id_col} ASC
        LIMIT {k}
    """


GOPHER_FLAG_NAMES = (
    "too_short", "too_long", "word_len_out", "symbol_heavy",
    "no_stopwords", "top_token_dominant", "numeric_heavy",
)


def gopher_filter(
    df: DataFrame,
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_wordlen: int = 3,
    max_mean_wordlen: int = 10,
    max_symbol_pct: int = 10,
    min_stop_hits: int = 2,
    max_top_token_pct: int = 30,
    max_numeric_pct: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style composite document-quality filter — the rule
    battery a pretraining curation pipeline runs before dedup (word
    count bounds, mean word length window, symbol density, stopword
    evidence, single-token dominance, numeric density), emitted as a
    per-rule BITMASK so a 100-TB run can report *which* rule dropped
    each shard of the corpus, not just a keep count.

    Every ratio rule is an exact cross-multiplied integer inequality
    (mean word length ∈ [3,10] is ``3·n_words ≤ n_wchars ∧ n_wchars ≤
    10·n_words``; symbol/top-token/numeric percents likewise) — no
    division, no float, so the DuckDB twin (:func:`gopher_filter_sql`)
    hash-matches flag-for-flag.

    Plan shape (r06): ZERO shuffles — every token-level feature is a
    higher-order-function expression over the split-token array on the
    scan itself (guide §2.4/§4.1: built-in array HOFs remove the
    explode → (doc, token) partial-agg → per-doc re-agg → join-back
    pipeline, which cost two exchanges and re-keyed the whole token
    stream).  top_tf is the longest equal-run of the SORTED token
    array (identical to max term frequency); stop_hits is
    |array_intersect(distinct tokens, stopset)| (identical to the
    distinct-stopword hit count); numeric density is a filtered size.

    flags bit i = rule i violated (GOPHER_FLAG_NAMES order);
    keep = flags == 0.  Returns (id, n_words, n_wchars, top_tf,
    stop_hits, n_numeric, n_symbols, flags, keep)."""
    stopset = sorted({w for ws in STOPWORDS.values() for w in ws})
    t = F.col(text_col)
    toks = F.filter(
        F.split(F.lower(t), r"\s+"), lambda x: x != F.lit("")
    )
    # max term frequency == longest run of equal values in the sorted
    # token array (bigint state to match the old SUM/MAX output types)
    one = F.lit(1).cast("bigint")
    top_tf = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit(0).cast("bigint").alias("best"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(None).cast("string").alias("prev"),
        ),
        lambda acc, x: F.struct(
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(one),
            ).alias("best"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(one)
            .alias("run"),
            x.alias("prev"),
        ),
        lambda acc: acc["best"],
    )
    j = df.select(
        id_col,
        F.length(F.regexp_replace(t, r"\s", "")).alias("n_nospace"),
        (
            F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
        ).alias("n_symbols"),
        # coalesce(...) keeps the NULL-text contract of the old
        # left-join + na.fill path (token features 0, char features NULL)
        F.coalesce(F.size(toks).cast("bigint"), F.lit(0)).alias(
            "n_words"
        ),
        F.coalesce(top_tf, F.lit(0).cast("bigint")).alias("top_tf"),
        F.coalesce(
            F.size(
                F.array_intersect(
                    F.array_distinct(toks),
                    F.array(*[F.lit(w) for w in stopset]),
                )
            ).cast("bigint"),
            F.lit(0),
        ).alias("stop_hits"),
        F.coalesce(
            F.size(
                F.filter(toks, lambda x: x.rlike("^[0-9]+$"))
            ).cast("bigint"),
            F.lit(0),
        ).alias("n_numeric"),
    )
    # word chars = non-space chars minus symbol chars (mean word length
    # counts letters/digits/underscore, the \w class both engines share)
    j = j.withColumn("n_wchars", F.col("n_nospace") - F.col("n_symbols"))
    rules = [
        F.col("n_words") < min_words,
        F.col("n_words") > max_words,
        (F.col("n_wchars") < min_mean_wordlen * F.col("n_words"))
        | (F.col("n_wchars") > max_mean_wordlen * F.col("n_words")),
        F.col("n_symbols") * 100 > max_symbol_pct * F.col("n_nospace"),
        F.col("stop_hits") < min_stop_hits,
        F.col("top_tf") * 100 > max_top_token_pct * F.col("n_words"),
        F.col("n_numeric") * 100 > max_numeric_pct * F.col("n_words"),
    ]
    flags = None
    for i, r in enumerate(rules):
        bit = F.when(r, F.lit(1 << i)).otherwise(F.lit(0))
        flags = bit if flags is None else flags + bit
    return j.select(
        id_col, "n_words", "n_wchars", "top_tf", "stop_hits",
        "n_numeric", "n_symbols",
        flags.cast("bigint").alias("flags"),
        (flags == 0).alias("keep"),
    )


def gopher_filter_sql(
    docs_src: str,
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_wordlen: int = 3,
    max_mean_wordlen: int = 10,
    max_symbol_pct: int = 10,
    min_stop_hits: int = 2,
    max_top_token_pct: int = 30,
    max_numeric_pct: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`gopher_filter` — identical cross-
    multiplied rules generated from the same thresholds."""
    stopset = sorted({w for ws in STOPWORDS.values() for w in ws})
    stoplist = ", ".join(f"'{w}'" for w in stopset)
    rules = [
        f"(n_words < {min_words})",
        f"(n_words > {max_words})",
        f"(n_wchars < {min_mean_wordlen} * n_words "
        f"OR n_wchars > {max_mean_wordlen} * n_words)",
        f"(n_symbols * 100 > {max_symbol_pct} * n_nospace)",
        f"(stop_hits < {min_stop_hits})",
        f"(top_tf * 100 > {max_top_token_pct} * n_words)",
        f"(n_numeric * 100 > {max_numeric_pct} * n_words)",
    ]
    flags = " + ".join(
        f"CASE WHEN {r} THEN {1 << i} ELSE 0 END"
        for i, r in enumerate(rules)
    )
    return f"""
        WITH gf_base AS (
            SELECT {id_col},
                   length(regexp_replace({text_col}, '\\s', '', 'g'))
                       AS n_nospace,
                   length({text_col})
                   - length(regexp_replace({text_col}, '[^\\w\\s]', '', 'g'))
                       AS n_symbols
            FROM {docs_src}
        ),
        gf_tf AS (
            SELECT {id_col}, token, COUNT(*) AS tf
            FROM (
                SELECT {id_col},
                       unnest(string_split_regex(lower({text_col}),
                                                 '\\s+')) AS token
                FROM {docs_src}
            )
            WHERE token <> '' GROUP BY 1, 2
        ),
        gf_doc AS (
            SELECT {id_col},
                   CAST(SUM(tf) AS BIGINT) AS n_words,
                   MAX(tf) AS top_tf,
                   CAST(SUM(CASE WHEN token IN ({stoplist})
                            THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits,
                   CAST(SUM(CASE WHEN regexp_full_match(token, '[0-9]+')
                            THEN tf ELSE 0 END) AS BIGINT) AS n_numeric
            FROM gf_tf GROUP BY 1
        ),
        gf_j AS (
            SELECT b.{id_col}, b.n_nospace, b.n_symbols,
                   COALESCE(d.n_words, 0) AS n_words,
                   COALESCE(d.top_tf, 0) AS top_tf,
                   COALESCE(d.stop_hits, 0) AS stop_hits,
                   COALESCE(d.n_numeric, 0) AS n_numeric,
                   b.n_nospace - b.n_symbols AS n_wchars
            FROM gf_base b LEFT JOIN gf_doc d USING ({id_col})
        )
        SELECT {id_col}, n_words, n_wchars, top_tf, stop_hits,
               n_numeric, n_symbols,
               CAST({flags} AS BIGINT) AS flags,
               ({flags}) = 0 AS keep
        FROM gf_j
    """


def inverted_index(
    df: DataFrame,
    shard_size: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sharded inverted index with delta-encoded postings — the IR
    artifact behind :func:`bm25_topk` materialized as data: per
    (token, shard) one bounded posting-list row, postings rendered as
    ``"doc:tf"`` then ``"+gap:tf"`` (the classic doc-gap compression,
    exact integers so the rendering is engine-identical).

    Sharding is the scale contract: a stopword's posting list over
    10¹² docs cannot be one row; ``shard = doc_id DIV shard_size``
    caps every row at ``shard_size`` postings, keeps shard assignment
    a pure projection, and makes the index mergeable across corpus
    partitions (disjoint doc ranges → disjoint shards).

    Plan shape: one explode → (doc, token) tf partial-agg; the gap
    window and the final collect both key on (token, shard), so Spark
    reuses ONE hash partitioning for the lag window and the groupBy —
    two shuffles total; the posting order inside a row comes from
    ``array_sort`` over (doc_id, entry) structs, never from
    collect_list's arrival order (parallelism-independence).

    Output: (token, shard, n_docs, sum_tf, postings)."""
    from pyspark.sql import Window as W

    raw = df.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    tf = raw.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn(
        "shard", F.expr(f"{id_col} DIV {int(shard_size)}")
    )
    w = W.partitionBy("token", "shard").orderBy(id_col)
    entries = tf.withColumn("_prev", F.lag(id_col).over(w)).withColumn(
        "_entry",
        F.when(
            F.col("_prev").isNull(),
            F.concat_ws(":", F.col(id_col).cast("string"),
                        F.col("tf").cast("string")),
        ).otherwise(
            F.concat(
                F.lit("+"),
                (F.col(id_col) - F.col("_prev")).cast("string"),
                F.lit(":"),
                F.col("tf").cast("string"),
            )
        ),
    )
    return (
        entries.groupBy("token", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tf").alias("sum_tf"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(id_col), "_entry"))
                    ),
                    lambda s: s["_entry"],
                ),
                ",",
            ).alias("postings"),
        )
    )


def inverted_index_sql(
    docs_src: str,
    shard_size: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`inverted_index` — same tf/shard/gap
    pipeline, postings via ordered string_agg."""
    return f"""
        WITH ii_tf AS (
            SELECT {id_col}, token, COUNT(*) AS tf,
                   {id_col} // {int(shard_size)} AS shard
            FROM (
                SELECT {id_col},
                       unnest(string_split_regex(lower({text_col}),
                                                 '\\s+')) AS token
                FROM {docs_src}
            )
            WHERE token <> '' GROUP BY 1, 2
        ),
        ii_e AS (
            SELECT token, shard, {id_col}, tf,
                   CASE WHEN LAG({id_col}) OVER w IS NULL
                        THEN {id_col} || ':' || tf
                        ELSE '+' || ({id_col} - LAG({id_col}) OVER w)
                             || ':' || tf END AS entry
            FROM ii_tf
            WINDOW w AS (PARTITION BY token, shard ORDER BY {id_col})
        )
        SELECT token, shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(tf) AS BIGINT) AS sum_tf,
               string_agg(entry, ',' ORDER BY {id_col}) AS postings
        FROM ii_e GROUP BY 1, 2
    """


def concordance(
    df: DataFrame,
    term: str,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword-in-context (KWIC) concordance: every occurrence of
    ``term`` with its ±``window``-token context — the qualitative
    audit tool behind every corpus curation decision ("show me how
    this token is actually used before I filter on it"), and the
    row-local counterpoint to the shuffle-based text ops: the whole
    extraction is array algebra on the scan (split → indexed filter →
    slice → explode), ZERO shuffles, so it streams at I/O speed over
    any corpus size and composes with predicate pushdown on the id.

    Positions are 1-based token indices; context windows clamp at the
    document edges.  Returns (id, pos, context) — one row per
    occurrence, context as the space-joined token window (match
    included)."""
    t = term.lower()
    arr = F.split(F.lower(F.col(text_col)), r"\s+")
    hits = F.filter(
        F.transform(
            arr, lambda tok, i: F.struct(tok.alias("tok"),
                                         (i + 1).alias("pos"))
        ),
        lambda s: s["tok"] == F.lit(t),
    )
    w = int(window)
    out = df.select(
        id_col, arr.alias("_a"), F.explode(hits).alias("_h")
    )
    start = F.greatest(F.col("_h.pos") - w, F.lit(1))
    stop = F.least(F.col("_h.pos") + w, F.size("_a"))
    return out.select(
        id_col,
        F.col("_h.pos").alias("pos"),
        F.array_join(
            F.slice("_a", start, stop - start + 1), " "
        ).alias("context"),
    )


def concordance_sql(
    docs_src: str,
    term: str,
    window: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`concordance` (1-based positions, clamped
    list slice — DuckDB slices are inclusive like Spark's)."""
    t = term.lower().replace("'", "''")
    w = int(window)
    return f"""
        WITH kw_arr AS (
            SELECT {id_col},
                   string_split_regex(lower({text_col}), '\\s+') AS a
            FROM {docs_src}
        ),
        kw_tok AS (
            SELECT {id_col}, a,
                   unnest(a) AS tok,
                   generate_subscripts(a, 1) AS pos
            FROM kw_arr
        )
        SELECT {id_col}, CAST(pos AS INTEGER) AS pos,
               array_to_string(
                   a[GREATEST(pos - {w}, 1):LEAST(pos + {w}, len(a))],
                   ' ') AS context
        FROM kw_tok
        WHERE tok = '{t}'
    """


_VARINT_CUTS = tuple(1 << (7 * i) for i in range(1, 9))  # 2^7 … 2^56


def varint_bytes(v) -> Column:
    """LEB128 byte length of a non-negative int64 — 1 byte per started
    7-bit group, as a comparison CASE chain (no float log): exact and
    engine-identical, the costing primitive for posting-list budgets."""
    out = F.lit(9)
    for nbytes in range(8, 0, -1):
        out = F.when(v < F.lit(_VARINT_CUTS[nbytes - 1]), nbytes) \
            .otherwise(out)
    return out


def varint_bytes_sql(expr: str) -> str:
    """DuckDB twin of :func:`varint_bytes`."""
    whens = " ".join(
        f"WHEN ({expr}) < {_VARINT_CUTS[n - 1]} THEN {n}"
        for n in range(1, 9)
    )
    return f"(CASE {whens} ELSE 9 END)"


def postings_varint_cost(
    df: DataFrame,
    shard_size: int = 1024,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Index-size planner: per token, the exact byte cost of its
    posting lists under delta-gap + LEB128 varint encoding — the
    accounting a 10¹²-doc index build runs BEFORE materializing
    anything, because index storage is dominated by a handful of
    stopword-like tokens and the budget decision (stop list, tiering,
    bitmap vs varint) needs their true encoded sizes, not row counts.

    Costs the same wire format :func:`inverted_index` renders: per
    (token, shard) the first posting stores the absolute doc id, the
    rest store gaps; every doc id/gap and every tf is one varint.
    Gap sizes — and therefore total bytes — depend on doc-id LOCALITY,
    not just frequency: dense tokens cost ~1 byte/doc, sparse tokens
    pay for wide gaps.  ``ratio_ppm`` = varint_bytes·10⁶ DIV the
    fixed 16-byte (doc, tf) encoding — the compression the delta
    layout buys, per token, hash-verifiable in DuckDB.

    Plan: the inverted_index pipeline's first two stages (tf partial
    agg, gap lag-window on (token, shard)) followed by per-token
    map-side-combined rollup; the heavy-token filter (``min_docs``)
    rides the final aggregate.  Never materializes a posting string.

    Returns (token, n_docs, n_shards, sum_tf, varint_bytes,
    ratio_ppm)."""
    from pyspark.sql import Window as W

    if shard_size < 1:
        raise ValueError(f"shard_size must be ≥ 1, got {shard_size}")
    raw = df.select(
        id_col,
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).where(F.col("token") != "")
    tf = raw.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("shard", F.expr(f"{id_col} DIV {int(shard_size)}"))
    w = W.partitionBy("token", "shard").orderBy(id_col)
    costed = tf.withColumn("_prev", F.lag(id_col).over(w)).withColumn(
        "_bytes",
        varint_bytes(
            F.when(F.col("_prev").isNull(), F.col(id_col)).otherwise(
                F.col(id_col) - F.col("_prev")
            )
        )
        + varint_bytes(F.col("tf")),
    )
    return (
        costed.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("shard").alias("n_shards"),
            F.sum("tf").alias("sum_tf"),
            F.sum("_bytes").cast("bigint").alias("varint_bytes"),
        )
        .where(F.col("n_docs") >= min_docs)
        .select(
            "token",
            "n_docs",
            "n_shards",
            "sum_tf",
            "varint_bytes",
            F.expr("(varint_bytes * 1000000) DIV (n_docs * 16)")
            .alias("ratio_ppm"),
        )
    )


def postings_varint_cost_sql(
    docs_src: str,
    shard_size: int = 1024,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`postings_varint_cost` (pv_*-namespaced)."""
    gap = (
        f"CASE WHEN LAG({id_col}) OVER w IS NULL THEN {id_col} "
        f"ELSE {id_col} - LAG({id_col}) OVER w END"
    )
    return f"""
        WITH pv_tf AS (
            SELECT {id_col}, token, COUNT(*) AS tf,
                   {id_col} // {int(shard_size)} AS shard
            FROM (
                SELECT {id_col},
                       unnest(string_split_regex(lower({text_col}),
                                                 '\\s+')) AS token
                FROM {docs_src}
            )
            WHERE token <> '' GROUP BY 1, 2
        ),
        pv_cost AS (
            SELECT token, shard, tf,
                   {varint_bytes_sql(f"({gap})")}
                   + {varint_bytes_sql("tf")} AS bytes
            FROM pv_tf
            WINDOW w AS (PARTITION BY token, shard ORDER BY {id_col})
        )
        SELECT token,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
               CAST(SUM(tf) AS BIGINT) AS sum_tf,
               CAST(SUM(bytes) AS BIGINT) AS varint_bytes,
               (CAST(SUM(bytes) AS BIGINT) * 1000000)
                   // (COUNT(*) * 16) AS ratio_ppm
        FROM pv_cost GROUP BY token
        HAVING COUNT(*) >= {int(min_docs)}
    """


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    lo_m: int = 10_000,
    hi_m: int = 990_000,
) -> DataFrame:
    """Per-group winsorization audit at EXACT nearest-rank quantile
    cuts — the outlier-capping pass run before any mean-based corpus
    statistic (token budgets, mixture weights) so a handful of
    pathological documents can't own the average; reporting the
    rollup, not the mutated rows, because at 100 TB the decision
    artifact is "how much did capping move the sum" while the
    per-row clamp is a cheap map anyone can re-apply.

    Cuts reuse :func:`group_quantiles`'s integer-millionth rank
    arithmetic (rank ⌈q_m·n/10⁶⌉ — engine-identical, no
    interpolation); clamping is least/greatest; everything summed is
    int64.  Output per group: (…group, n, lo_cut, hi_cut,
    n_clamped_lo, n_clamped_hi, sum_raw, sum_winsorized).

    Plan: the quantile rank window and the final rollup share the
    group-key partitioning; the ≤1-row-per-group cut table broadcasts
    back onto the scan."""
    if not 0 <= lo_m <= hi_m <= 1_000_000:
        raise ValueError(f"need 0 ≤ lo_m ≤ hi_m ≤ 1e6: {lo_m}, {hi_m}")
    gcols = list(group_cols)
    qs = group_quantiles(df, value_col, gcols, (lo_m, hi_m))
    cuts = qs.groupBy(*gcols).agg(
        F.max(
            F.when(F.col("q_m") == lo_m, F.col("quantile_value"))
        ).alias("lo_cut"),
        F.max(
            F.when(F.col("q_m") == hi_m, F.col("quantile_value"))
        ).alias("hi_cut"),
    )
    v = F.col(value_col).cast("bigint")
    clamped = F.least(F.greatest(v, F.col("lo_cut")), F.col("hi_cut"))
    return (
        df.select(*gcols, value_col)
        .join(F.broadcast(cuts), gcols)
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("lo_cut").alias("lo_cut"),
            F.max("hi_cut").alias("hi_cut"),
            F.count_if(v < F.col("lo_cut")).alias("n_clamped_lo"),
            F.count_if(v > F.col("hi_cut")).alias("n_clamped_hi"),
            F.sum(v).alias("sum_raw"),
            F.sum(clamped).alias("sum_winsorized"),
        )
    )


def winsorize_sql(
    src: str,
    value_col: str,
    group_cols: Sequence[str],
    lo_m: int = 10_000,
    hi_m: int = 990_000,
) -> str:
    """DuckDB twin of :func:`winsorize` (wz_*-namespaced)."""
    g = ", ".join(group_cols)
    return f"""
        WITH wz_ranked AS (
            SELECT {g}, CAST({value_col} AS BIGINT) AS v,
                   ROW_NUMBER() OVER (PARTITION BY {g}
                                      ORDER BY {value_col}) AS rn,
                   COUNT(*) OVER (PARTITION BY {g}) AS n
            FROM {src}
        ),
        wz_cuts AS (
            SELECT {g},
                   MAX(CASE WHEN rn = ({lo_m} * n + 999999) // 1000000
                            THEN v END) AS lo_cut,
                   MAX(CASE WHEN rn = ({hi_m} * n + 999999) // 1000000
                            THEN v END) AS hi_cut
            FROM wz_ranked GROUP BY {g}
        )
        SELECT r.{g.replace(', ', ', r.')},
               CAST(COUNT(*) AS BIGINT) AS n,
               MAX(c.lo_cut) AS lo_cut,
               MAX(c.hi_cut) AS hi_cut,
               CAST(COUNT(*) FILTER (r.v < c.lo_cut) AS BIGINT)
                   AS n_clamped_lo,
               CAST(COUNT(*) FILTER (r.v > c.hi_cut) AS BIGINT)
                   AS n_clamped_hi,
               CAST(SUM(r.v) AS BIGINT) AS sum_raw,
               CAST(SUM(LEAST(GREATEST(r.v, c.lo_cut), c.hi_cut))
                    AS BIGINT) AS sum_winsorized
        FROM wz_ranked r
        JOIN wz_cuts c USING ({g})
        GROUP BY r.{g.replace(', ', ', r.')}
    """


def bpe_pair_counts(
    docs: DataFrame,
    top_k: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    mark_end: bool = True,
) -> DataFrame:
    """First BPE merge round (Sennrich & al. 2016, the subword-
    tokenizer induction step): adjacent-SYMBOL pair frequencies over
    the corpus, weighted by word frequency, top-``top_k`` by count —
    the pair a BPE learner would merge first is row one.  The
    reference has no tokenizer (Ruby string ops throughout); a
    training-data engine needs the vocabulary-induction primitive
    beside chunk_documents/length_batches, and the expensive part of
    EVERY merge round is exactly this count, so the one-round operator
    is the reusable unit (a learner loops it with a merge table).

    The Sennrich decomposition is the scale story: tokenize once and
    count WORDS (corpus-sized scan, map-side combining groupBy into
    vocabulary-sized output), then fan characters over the DISTINCT
    vocabulary only — Zipf makes |vocab| ≪ corpus, so the per-round
    cost after the first groupBy is independent of corpus size.
    Symbols here are single characters plus the classic '</w>'
    end-of-word marker (``mark_end``; length-1 words then still
    contribute their (char, '</w>') pair — nothing silently dropped).
    Counts are exact int64; top-k is a deterministic
    TakeOrderedAndProject under the (n DESC, sym_a, sym_b) total
    order — no global window, no shuffle sort.

    Tokenization: the engine's whitespace + lower convention
    (token_count/collocations).  Output: (sym_a, sym_b, pair_n)."""
    if top_k < 1:
        raise ValueError(f"bpe_pair_counts: top_k must be >= 1, got {top_k}")
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    intra = (
        words.where(F.length("w") >= 2)
        .select(
            "wc",
            F.explode(
                F.sequence(F.lit(1), F.length("w") - 1)
            ).alias("i"),
            F.col("w"),
        )
        .select(
            F.substring(F.col("w"), F.col("i").cast("int"), 1).alias("sym_a"),
            F.substring(
                F.col("w"), (F.col("i") + 1).cast("int"), 1
            ).alias("sym_b"),
            "wc",
        )
    )
    parts = [intra]
    if mark_end:
        parts.append(
            words.select(
                F.substring(F.col("w"), F.length("w").cast("int"), 1)
                .alias("sym_a"),
                F.lit("</w>").alias("sym_b"),
                "wc",
            )
        )
    fan = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    return (
        fan.groupBy("sym_a", "sym_b")
        .agg(F.sum("wc").alias("pair_n"))
        .orderBy(F.col("pair_n").desc(), "sym_a", "sym_b")
        .limit(top_k)
    )


def bpe_pair_counts_sql(
    src: str,
    top_k: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    mark_end: bool = True,
) -> str:
    """DuckDB twin of :func:`bpe_pair_counts`.  range(1, n) is
    end-exclusive (≡ Spark's inclusive sequence(1, n−1) guarded by
    length ≥ 2); substring is character-based in both engines."""
    end_part = f"""
            UNION ALL
            SELECT substring(w, CAST(length(w) AS INT), 1) AS sym_a,
                   '</w>' AS sym_b, wc
            FROM bpe_wc
    """ if mark_end else ""
    return f"""
        WITH bpe_words AS (
            SELECT unnest(string_split_regex(lower({text_col}), '\\s+'))
                AS w
            FROM {src}
        ),
        bpe_wc AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS wc
            FROM bpe_words WHERE w <> '' GROUP BY 1
        ),
        bpe_fan AS (
            SELECT substring(w, CAST(u.i AS INT), 1) AS sym_a,
                   substring(w, CAST(u.i + 1 AS INT), 1) AS sym_b,
                   wc
            FROM bpe_wc,
                 LATERAL (SELECT UNNEST(range(1, length(w))) AS i) u
            {end_part}
        )
        SELECT sym_a, sym_b, CAST(SUM(wc) AS BIGINT) AS pair_n
        FROM bpe_fan
        GROUP BY 1, 2
        ORDER BY pair_n DESC, sym_a, sym_b
        LIMIT {top_k}
    """


def lexical_diversity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document lexical diversity — the vocabulary-richness
    curation signal (templated/spun text scores low, natural prose
    high): type count, type-token ratio, and the Gini–Simpson index

        simpson_ppm = 10⁶ · (n(n−1) − Σᵢ cᵢ(cᵢ−1)) DIV (n(n−1))

    — the probability two tokens drawn WITHOUT replacement differ,
    exact in int64 (cᵢ(cᵢ−1) ≤ n² ≤ 10¹² at 10⁶-token docs; ×10⁶
    stays < 2⁶³), no float entropy (a log-free diversity index is the
    engine's portable stand-in for Shannon — same monotone ranking on
    the unigram profile).  n < 2 tokens → NULL simpson (undefined
    without a second draw), TTR still reported.

    Tokenization: the engine's whitespace + lower convention.  Plan:
    one explode + a (doc, token) map-side-combining groupBy + one doc
    groupBy — two keyed shuffles, no windows.
    Output: (id, n_tokens, n_types, ttr_m, simpson_ppm)."""
    toks = docs.select(
        id_col,
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("_tok"),
    ).where(F.col("_tok") != "")
    counts = toks.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return counts.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.expr("CAST(COUNT(*) * 1000000 DIV SUM(_c) AS BIGINT)").alias(
            "ttr_m"
        ),
        F.expr(
            "CAST(CASE WHEN SUM(_c) < 2 THEN NULL ELSE "
            "(SUM(_c) * (SUM(_c) - 1) - SUM(_c * (_c - 1))) * 1000000 "
            "DIV (SUM(_c) * (SUM(_c) - 1)) END AS BIGINT)"
        ).alias("simpson_ppm"),
    )


def lexical_diversity_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`lexical_diversity` (standalone)."""
    return f"""
        WITH ld_toks AS (
            SELECT {id_col}, tok
            FROM {src},
                 LATERAL UNNEST(string_split_regex(lower({text_col}),
                                '\\s+')) AS u(tok)
            WHERE tok <> ''
        ),
        ld_counts AS (
            SELECT {id_col}, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM ld_toks GROUP BY 1, 2
        )
        SELECT {id_col},
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS ttr_m,
               CAST(CASE WHEN SUM(c) < 2 THEN NULL ELSE
                    (SUM(c) * (SUM(c) - 1) - SUM(c * (c - 1))) * 1000000
                    // (SUM(c) * (SUM(c) - 1)) END AS BIGINT)
                   AS simpson_ppm
        FROM ld_counts GROUP BY 1
    """


WINNOW_POS_BOUND = 1 << 20  # ~1M chars per doc — loud-guarded below


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm): hash every character k-gram, slide a
    w-window over the hash sequence, keep each window's MINIMUM (ties
    → RIGHTMOST, the paper's rule), dedup overlapping selections.
    The winnowing guarantee: any substring match of length ≥ w+k−1
    between two documents shares at least one selected fingerprint —
    the partial-overlap detector whole-doc hashes (simhash/minhash)
    structurally miss, at ~2/(w+1) the k-gram stream's density.

    Exactness: the rightmost-min is ONE integer min over the frame —
    the pair (h, pos) encodes as h·2²⁰ + (2²⁰−1−pos), so min(key)
    picks min h then max pos, identically in both engines (struct-min
    inside window frames is engine-fragile; integer min is not).
    h < 2³¹ keeps the key < 2⁵¹; pos ≥ 2²⁰ fails LOUD via assert_true
    riding the key column.  Text normalizes to lower + single spaces
    (the house tokenizer's character-level counterpart).

    Docs shorter than k+w−1 normalized chars yield NO fingerprints
    (no full window exists — the algorithm's own domain, stated).

    Plan: one explode (positions), per-position O(k) gram hash, one
    doc-keyed window frame min, one distinct on the selected
    positions — a single hash shuffle on the doc key.
    Output: (id, pos 1-based, fhash)."""
    if k < 1 or window < 1:
        raise ValueError(
            f"winnow_fingerprints: k and window must be >= 1, got "
            f"k={k}, window={window}"
        )
    from .dedup import token_hash

    from pyspark.sql import Window as W

    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    grams = docs.select(
        id_col,
        norm.alias("_s"),
    ).where(
        F.length("_s") >= F.lit(k + window - 1)
    ).select(
        id_col,
        (F.length("_s") - F.lit(k) + 1).alias("_ng"),
        F.explode(
            F.sequence(F.lit(1), F.length("_s") - F.lit(k) + 1)
        ).alias("pos"),
        F.col("_s"),
    ).select(
        id_col,
        "_ng",
        "pos",
        token_hash(
            F.substring(F.col("_s"), F.col("pos").cast("int"), k)
        ).alias("_h"),
    )
    bound_ok = F.assert_true(
        F.col("pos") < F.lit(WINNOW_POS_BOUND),
        F.lit(
            "winnow_fingerprints: position exceeds the 2^20 encoding "
            "bound (~1M chars); chunk the document first"
        ),
    )
    key = (
        F.col("_h") * F.lit(WINNOW_POS_BOUND)
        + (F.lit(WINNOW_POS_BOUND - 1) - F.col("pos"))
        + F.coalesce(bound_ok.cast("bigint"), F.lit(0))
    )
    w = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(0, window - 1)
    )
    sel = grams.select(
        id_col,
        "_ng",
        "pos",
        F.min(key).over(w).alias("_mk"),
    ).where(
        # only anchors with a FULL window define a selection
        F.col("pos") <= F.col("_ng") - F.lit(window) + 1
    )
    return sel.select(
        id_col,
        (
            F.lit(WINNOW_POS_BOUND - 1)
            - F.pmod(F.col("_mk"), F.lit(WINNOW_POS_BOUND))
        ).cast("int").alias("pos"),
        F.expr(f"_mk DIV {WINNOW_POS_BOUND}").alias("fhash"),
    ).distinct()


def winnow_fingerprints_sql(
    src: str,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` (standalone)."""
    from .dedup import token_hash_sql

    B = WINNOW_POS_BOUND
    gram = token_hash_sql(f"substring(s, CAST(pos AS INT), {k})")
    return f"""
        WITH wf_norm AS (
            SELECT {id_col},
                   trim(regexp_replace(lower({text_col}), '\\s+', ' ',
                                       'g')) AS s
            FROM {src}
        ),
        wf_grams AS (
            SELECT {id_col},
                   length(s) - {k} + 1 AS ng,
                   u.pos,
                   {gram} AS h
            FROM wf_norm,
                 LATERAL (SELECT UNNEST(range(1, length(s) - {k} + 2))
                          AS pos) u
            WHERE length(s) >= {k + window - 1}
        ),
        wf_sel AS (
            SELECT {id_col}, ng, pos,
                   MIN(h * {B} + ({B - 1} - pos)) OVER (
                       PARTITION BY {id_col} ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {window - 1}
                       FOLLOWING) AS mk
            FROM wf_grams
        )
        SELECT DISTINCT {id_col},
               CAST({B - 1} - (mk % {B}) AS INTEGER) AS pos,
               CAST(mk // {B} AS BIGINT) AS fhash
        FROM wf_sel
        WHERE pos <= ng - {window} + 1
    """


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """robots.txt compliance filtering with RFC 9309 semantics — the
    crawl pipeline's legal gate, applied corpus-side (a 100-TB crawl
    re-filters retroactively when rules change; re-fetching is not an
    option): per URL, the LONGEST matching rule prefix on its domain
    decides, allow wins exact-length ties (the RFC rule), no matching
    rule ⇒ allowed.

    ``rules``: (domain, prefix, allow) — the parsed Allow/Disallow
    lines.  Rule tables are small (sites × lines) → broadcast join on
    the domain, prefix match is a native startswith, and the
    most-specific-rule pick is a row_number inside the (url, domain)
    partition ordered by (prefix length DESC, allow DESC) — a keyed
    window over ≤ rules-per-domain rows, never a global sort.

    URL decomposition is one native regexp per part (scheme://host
    then path, '' → '/'), identical in the twin.  Output: one row per
    DISTINCT url — (url, domain, path, allowed, rule_prefix NULL when
    no rule matched).  No url is dropped: the DECISION is the output
    (callers filter on it), so denied URLs stay auditable — and the
    prefix condition lives in the JOIN (a left join + WHERE would
    silently drop a url whose domain has rules but none matching)."""
    from pyspark.sql import Window as W

    dom = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)
    raw_path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/]+(/.*)$", 1)
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    base = pages.select(
        url_col, dom.alias("domain"), path.alias("path")
    ).distinct()
    r = F.broadcast(
        rules.select(
            F.col("domain").alias("_rdom"),
            F.col("prefix"),
            F.col("allow").cast("boolean").alias("allow"),
        )
    )
    matched = base.join(
        r,
        (F.col("domain") == F.col("_rdom"))
        & F.col("path").startswith(F.col("prefix")),
        "left",
    )
    w = W.partitionBy(url_col, "path").orderBy(
        F.length("prefix").desc(), F.col("allow").desc()
    )
    best = matched.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") == 1
    )
    return best.select(
        url_col,
        "domain",
        "path",
        F.coalesce("allow", F.lit(True)).alias("allowed"),
        F.col("prefix").alias("rule_prefix"),
    )


def robots_filter_sql(
    src: str,
    rules_values: str,
    url_col: str = "url",
) -> str:
    """DuckDB twin of :func:`robots_filter`.  ``rules_values`` is a
    SQL relation string exposing (domain, prefix, allow), e.g. a
    VALUES literal."""
    return f"""
        WITH rb_base AS (
            SELECT DISTINCT {url_col},
                   regexp_extract({url_col}, '^[a-z]+://([^/]+)', 1)
                       AS domain,
                   CASE WHEN regexp_extract({url_col},
                             '^[a-z]+://[^/]+(/.*)$', 1) = ''
                        THEN '/' ELSE regexp_extract({url_col},
                             '^[a-z]+://[^/]+(/.*)$', 1) END AS path
            FROM {src}
        ),
        rb_rules AS (SELECT * FROM {rules_values}),
        rb_match AS (
            SELECT b.{url_col}, b.domain, b.path, r.prefix, r.allow,
                   ROW_NUMBER() OVER (
                       PARTITION BY b.{url_col}, b.path
                       ORDER BY length(r.prefix) DESC, r.allow DESC
                   ) AS rn
            FROM rb_base b
            LEFT JOIN rb_rules r
              ON r.domain = b.domain
             AND starts_with(b.path, r.prefix)
        )
        SELECT {url_col}, domain, path,
               COALESCE(allow, TRUE) AS allowed,
               prefix AS rule_prefix
        FROM rb_match WHERE rn = 1
    """


def percentile_calibrate(
    df: DataFrame,
    value_col: str,
    group_cols: "Sequence[str]",
    id_cols: "Sequence[str]",
) -> DataFrame:
    """Per-group percentile-rank calibration: map a raw score to its
    within-group rank percentile pct_m = (rank−1)·10⁶ DIV (n−1) — the
    cross-lingual quality-threshold fix (a 0.6 quality score means
    different things in en and sw; "top 20% of ITS OWN language" is
    the comparable statement, and the mixture step then thresholds
    pct_m uniformly).

    rank is RANK() over (group ORDER BY value) — ties share the rank
    (equal scores calibrate equally; a row-number would order ties by
    physical accident, the banned nondeterminism), so pct_m of a tie
    class is its FIRST member's percentile.  n = 1 → pct_m = 0 (the
    only member is its own minimum; (n−1) = 0 never divides).  All
    integer; one keyed window shuffle.

    Output: (*id_cols, *group_cols, value_col, n, rank, pct_m)."""
    groups = list(group_cols)
    ids = list(id_cols)
    from pyspark.sql import Window as W

    w = W.partitionBy(*groups).orderBy(value_col)
    wn = W.partitionBy(*groups)
    return df.select(*ids, *groups, value_col).select(
        *ids,
        *groups,
        value_col,
        F.count(F.lit(1)).over(wn).alias("n"),
        F.rank().over(w).alias("rank"),
        F.expr(
            "CAST(CASE WHEN count(1) OVER "
            f"(PARTITION BY {', '.join(groups)}) = 1 THEN 0 ELSE "
            f"(rank() OVER (PARTITION BY {', '.join(groups)} "
            f"ORDER BY {value_col}) - 1) * 1000000 DIV "
            f"(count(1) OVER (PARTITION BY {', '.join(groups)}) - 1) "
            "END AS BIGINT)"
        ).alias("pct_m"),
    )


def percentile_calibrate_sql(
    src: str,
    value_col: str,
    group_cols: "Sequence[str]",
    id_cols: "Sequence[str]",
) -> str:
    """DuckDB twin of :func:`percentile_calibrate` (standalone)."""
    g = ", ".join(group_cols)
    ids = ", ".join(id_cols)
    return f"""
        SELECT {ids}, {g}, {value_col},
               CAST(COUNT(*) OVER (PARTITION BY {g}) AS BIGINT) AS n,
               CAST(RANK() OVER (PARTITION BY {g} ORDER BY {value_col})
                    AS BIGINT) AS rank,
               CAST(CASE WHEN COUNT(*) OVER (PARTITION BY {g}) = 1
                    THEN 0 ELSE
                    (RANK() OVER (PARTITION BY {g} ORDER BY {value_col})
                     - 1) * 1000000
                    // (COUNT(*) OVER (PARTITION BY {g}) - 1) END
                    AS BIGINT) AS pct_m
        FROM {src}
    """


def kn_bigram_model(
    docs: DataFrame,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Interpolated Kneser–Ney bigram model with discount D = 3/4 —
    the n-gram LM every perplexity-based quality filter needs, in
    EXACT integer arithmetic: clearing D = 3/4 from

        p_kn(w2|w1) = max(c−D, 0)/c(w1·) + D·N1+(w1·)/c(w1·) · p_cont
        p_cont(w2)  = N1+(·w2) / n_bigram_types

    gives

        p_ppm = (max(4c−3, 0)·T + 3·R(w1)·L(w2)) · 10⁶
                DIV (4·c(w1·)·T)

    with c the bigram count, c(w1·) the left-context total, R(w1) =
    N1+(w1·) distinct right continuations, L(w2) = N1+(·w2) distinct
    left contexts (the KN insight: "Francisco" is frequent but
    follows only "San" — continuation counts, not raw counts, feed
    the backoff), and T the distinct-bigram-type count.  The wide
    product runs in decimal(38,0)/HUGEINT; the result ≤ 10⁶ is exact
    ppm.  Σ_w2 p(w2|w1) = 1 up to the per-row DIV flooring (property-
    tested within vocabulary·1 ppm).

    Tokenization: whitespace + lower (the collocations stream,
    bigrams within documents only — no cross-doc adjacency).  Plan:
    one posexplode + LEAD window keyed by doc, then four map-side-
    combining aggregates (bigram, left-total+right-continuation,
    left-continuation, 1-row type total broadcast back).

    Output: (w1, w2, c, c_w1, cont_right, cont_left, p_kn_ppm),
    bigrams with c ≥ ``min_count``."""
    from pyspark.sql import Window as W

    toks = docs.select(
        id_col,
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "token"),
    ).where(F.col("token") != "")
    w = W.partitionBy(id_col).orderBy("pos")
    bi = toks.select(
        F.col("token").alias("w1"),
        F.lead("token").over(w).alias("w2"),
    ).where(F.col("w2").isNotNull())
    # the bigram-count table feeds FOUR consumers (left/right marginals,
    # type total, final join) — checkpoint it so the corpus tokenize +
    # window + count pipeline runs once, not once per consumer
    c_ab = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint(eager=True)
    left = c_ab.groupBy("w1").agg(
        F.sum("c").alias("c_w1"),
        F.count(F.lit(1)).alias("cont_right"),
    )
    right = c_ab.groupBy("w2").agg(
        F.count(F.lit(1)).alias("cont_left")
    )
    types = c_ab.agg(F.count(F.lit(1)).alias("_t"))
    dec = "decimal(38,0)"
    return (
        c_ab.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(types))
        .where(F.col("c") >= int(min_count))
        .select(
            "w1", "w2", "c", "c_w1", "cont_right", "cont_left",
            F.expr(
                f"CAST((CAST(GREATEST(4 * c - 3, 0) AS {dec}) * _t "
                f"+ CAST(3 AS {dec}) * cont_right * cont_left) "
                f"* 1000000 DIV (CAST(4 AS {dec}) * c_w1 * _t) "
                "AS BIGINT)"
            ).alias("p_kn_ppm"),
        )
    )


def kn_bigram_model_sql(
    src: str,
    min_count: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`kn_bigram_model` (standalone)."""
    return f"""
        WITH kn_split AS (
            SELECT {id_col},
                   string_split_regex(lower({text_col}), '\\s+') AS ws
            FROM {src}
        ),
        kn_toks AS (
            SELECT {id_col}, u.i AS pos, ws[u.i] AS token
            FROM kn_split,
                 LATERAL (SELECT UNNEST(range(1, len(ws) + 1)) AS i) u
            WHERE ws[u.i] <> ''
        ),
        kn_bi AS (
            SELECT token AS w1,
                   LEAD(token) OVER (PARTITION BY {id_col}
                                     ORDER BY pos) AS w2
            FROM kn_toks
        ),
        kn_c AS (
            SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c
            FROM kn_bi WHERE w2 IS NOT NULL GROUP BY 1, 2
        ),
        kn_left AS (
            SELECT w1, CAST(SUM(c) AS BIGINT) AS c_w1,
                   CAST(COUNT(*) AS BIGINT) AS cont_right
            FROM kn_c GROUP BY 1
        ),
        kn_right AS (
            SELECT w2, CAST(COUNT(*) AS BIGINT) AS cont_left
            FROM kn_c GROUP BY 1
        ),
        kn_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM kn_c)
        SELECT b.w1, b.w2, b.c, l.c_w1, l.cont_right, r.cont_left,
               CAST((CAST(GREATEST(4 * b.c - 3, 0) AS HUGEINT) * t.t
                     + CAST(3 AS HUGEINT) * l.cont_right * r.cont_left)
                    * 1000000
                    // (CAST(4 AS HUGEINT) * l.c_w1 * t.t)
                    AS BIGINT) AS p_kn_ppm
        FROM kn_c b
        JOIN kn_left l USING (w1)
        JOIN kn_right r USING (w2)
        CROSS JOIN kn_t t
        WHERE b.c >= {int(min_count)}
    """


def vocab_drift(
    docs_a: DataFrame,
    docs_b: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary drift between two corpus snapshots — the
    distribution-shift monitor a recrawl pipeline gates on (a crawler
    regression, a spam wave, or a seasonal shift shows up as tokens
    whose document frequency RATE jumps, appears, or vanishes long
    before any downstream model metric moves).

    Per token: document frequency in each corpus and the corpus-size-
    normalized rate ratio

        drift_ppm = (df_b · n_a · 10⁶) DIV (df_a · n_b)

    (10⁶ = unchanged rate, 2·10⁶ = doubled; decimal(38)/HUGEINT wide
    product), NULL when the token is absent from either side — those
    carry status 'new' / 'gone' instead ('present' otherwise).
    Tokens with df_a + df_b < ``min_df`` are dropped (hapax noise).

    Plan: per side one explode + one distinct + one map-side-
    combining groupBy to vocabulary size; a full outer join on the
    token; two 1-row totals broadcast back.  Output:
    (token, df_a, df_b, drift_ppm, status)."""

    def df_of(docs):
        return (
            docs.select(
                id_col,
                F.explode(
                    F.split(F.lower(F.col(text_col)), r"\s+")
                ).alias("token"),
            )
            .where(F.col("token") != "")
            .distinct()
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
        )

    dfa = df_of(docs_a).select("token", F.col("df").alias("df_a"))
    dfb = df_of(docs_b).select("token", F.col("df").alias("df_b"))
    na = docs_a.agg(F.countDistinct(id_col).alias("_na"))
    nb = docs_b.agg(F.countDistinct(id_col).alias("_nb"))
    dec = "decimal(38,0)"
    return (
        dfa.join(dfb, "token", "full_outer")
        .select(
            "token",
            F.coalesce("df_a", F.lit(0)).alias("df_a"),
            F.coalesce("df_b", F.lit(0)).alias("df_b"),
        )
        .where(F.col("df_a") + F.col("df_b") >= int(min_df))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "token",
            "df_a",
            "df_b",
            F.expr(
                f"CAST(CASE WHEN df_a = 0 OR df_b = 0 THEN NULL ELSE "
                f"(CAST(df_b AS {dec}) * _na * 1000000) "
                f"DIV (CAST(df_a AS {dec}) * _nb) END AS BIGINT)"
            ).alias("drift_ppm"),
            F.expr(
                "CASE WHEN df_a = 0 THEN 'new' "
                "WHEN df_b = 0 THEN 'gone' "
                "ELSE 'present' END"
            ).alias("status"),
        )
    )


def vocab_drift_sql(
    src_a: str,
    src_b: str,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`vocab_drift` (standalone); ``src_a`` /
    ``src_b`` expose (id, text)."""

    def df_cte(src, tag):
        return f"""
        vd_{tag} AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df
            FROM (
                SELECT DISTINCT {id_col}, tok AS token
                FROM {src},
                     LATERAL UNNEST(string_split_regex(
                         lower({text_col}), '\\s+')) AS u(tok)
                WHERE tok <> ''
            ) GROUP BY 1
        )"""

    return f"""
        WITH {df_cte(src_a, 'a')},
        {df_cte(src_b, 'b')},
        vd_na AS (
            SELECT CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS na
            FROM {src_a}
        ),
        vd_nb AS (
            SELECT CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS nb
            FROM {src_b}
        )
        SELECT COALESCE(a.token, b.token) AS token,
               COALESCE(a.df, 0) AS df_a,
               COALESCE(b.df, 0) AS df_b,
               CAST(CASE WHEN COALESCE(a.df, 0) = 0
                         OR COALESCE(b.df, 0) = 0 THEN NULL ELSE
                    (CAST(b.df AS HUGEINT) * na * 1000000)
                    // (CAST(a.df AS HUGEINT) * nb) END AS BIGINT)
                   AS drift_ppm,
               CASE WHEN COALESCE(a.df, 0) = 0 THEN 'new'
                    WHEN COALESCE(b.df, 0) = 0 THEN 'gone'
                    ELSE 'present' END AS status
        FROM vd_a a
        FULL OUTER JOIN vd_b b USING (token)
        CROSS JOIN vd_na CROSS JOIN vd_nb
        WHERE COALESCE(a.df, 0) + COALESCE(b.df, 0) >= {int(min_df)}
    """


def token_burstiness(
    docs: DataFrame,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token burstiness — the Fano factor (variance-to-mean ratio of
    per-document counts, zeros included) per token: Poisson-scattered
    tokens (function words, boilerplate vocabulary) sit near 10⁶,
    CONTENT words burst far above it (Church & Gale: a word that
    appears once in a doc is likely to appear again) — the signal
    separating topical vocabulary from glue without any stopword
    list.

    Exact integers: with S = Σ per-doc counts, Q = Σ per-doc counts²
    (absent docs contribute 0 to both) and N the corpus size,

        fano_ppm = ((N·Q − S²) · 10⁶) DIV (N·S)

    in decimal(38,0)/HUGEINT (N·Q ≤ 10¹²·c_max² stays far inside).
    Tokens in fewer than ``min_df`` docs drop (a hapax is trivially
    'bursty').

    Plan: one explode + (doc, token) groupBy + token groupBy (all
    map-side combining), 1-row corpus total broadcast back.  Output:
    (token, df, total, fano_ppm)."""
    per_doc = (
        docs.select(
            id_col,
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    per_tok = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("_c").alias("total"),
        F.sum(F.col("_c") * F.col("_c")).alias("_q"),
    )
    n_docs = docs.agg(F.countDistinct(id_col).alias("_n"))
    dec = "decimal(38,0)"
    return (
        per_tok.where(F.col("df") >= int(min_df))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "df",
            "total",
            F.expr(
                f"CAST(((CAST(_n AS {dec}) * _q - CAST(total AS {dec}) "
                f"* total) * 1000000) DIV (CAST(_n AS {dec}) * total) "
                "AS BIGINT)"
            ).alias("fano_ppm"),
        )
    )


def token_burstiness_sql(
    src: str,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`token_burstiness` (standalone)."""
    return f"""
        WITH tb_pd AS (
            SELECT {id_col}, tok AS token,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM {src},
                 LATERAL UNNEST(string_split_regex(lower({text_col}),
                                '\\s+')) AS u(tok)
            WHERE tok <> ''
            GROUP BY 1, 2
        ),
        tb_tok AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(c) AS BIGINT) AS total,
                   CAST(SUM(c * c) AS BIGINT) AS q
            FROM tb_pd GROUP BY 1
        ),
        tb_n AS (
            SELECT CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n
            FROM {src}
        )
        SELECT token, df, total,
               CAST(((CAST(n AS HUGEINT) * q
                      - CAST(total AS HUGEINT) * total) * 1000000)
                    // (CAST(n AS HUGEINT) * total) AS BIGINT)
                   AS fano_ppm
        FROM tb_tok CROSS JOIN tb_n
        WHERE df >= {int(min_df)}
    """


# (spark_java_regex, duckdb_re2_regex) per script class — same char
# sets, two regex dialects (Java accepts literal range chars; RE2
# wants \x{...}).  Parity probe-verified on mixed-script samples.
CHARSET_CLASSES = [
    ("ascii_alpha", "[a-zA-Z]", "[a-zA-Z]"),
    ("digit", "[0-9]", "[0-9]"),
    ("space", r"[ \t\n\r]", r"[ \t\n\r]"),
    ("ascii_punct", r"[!-/:-@\[-`{-~]", r"[!-/:-@\[-`{-~]"),
    ("latin_ext", "[À-ɏ]", r"[\x{00C0}-\x{024F}]"),
    ("cjk", "[一-鿿]", r"[\x{4E00}-\x{9FFF}]"),
    ("cyrillic", "[Ѐ-ӿ]", r"[\x{0400}-\x{04FF}]"),
    ("arabic", "[؀-ۿ]", r"[\x{0600}-\x{06FF}]"),
]


def charset_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document script/charset profile — the mojibake and
    script-mix detector (a 'German' page that is 40% CJK is a
    mislabeled crawl; a page that is 30% 'other' is likely
    encoding-corrupt): exact character-class counts per doc for the
    eight classes in ``CHARSET_CLASSES`` plus the OTHER remainder
    (n_chars − Σ classes — the classes are disjoint codepoint ranges,
    so the remainder is exact, never negative).

    All native regexp_count — one projection, whole-stage codegen, no
    explode, no Python; the twin counts the identical classes via
    RE2's \\x{} syntax (dialects differ, char sets verified equal).
    Output: (id, n_chars, n_<class>..., n_other)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(spark_re)).cast(
            "bigint"
        ).alias(f"n_{name}")
        for name, spark_re, _ in CHARSET_CLASSES
    ]
    base = docs.select(
        id_col,
        F.length(text_col).cast("bigint").alias("n_chars"),
        *counts,
    )
    total = None
    for name, _, _ in CHARSET_CLASSES:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return base.withColumn(
        "n_other", (F.col("n_chars") - total).cast("bigint")
    )


def charset_profile_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`charset_profile` (standalone)."""
    cols = ",\n".join(
        f"CAST(len(regexp_extract_all({text_col}, '{duck_re}')) "
        f"AS BIGINT) AS n_{name}"
        for name, _, duck_re in CHARSET_CLASSES
    )
    minus = " - ".join(f"n_{name}" for name, _, _ in CHARSET_CLASSES)
    return f"""
        WITH cs_base AS (
            SELECT {id_col},
                   CAST(length({text_col}) AS BIGINT) AS n_chars,
                   {cols}
            FROM {src}
        )
        SELECT *, CAST(n_chars - ({minus.replace(' - ', ' + ')})
                   AS BIGINT) AS n_other
        FROM cs_base
    """


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

def rake_keywords(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: "list[str] | None" = None,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010), the exact-integer
    form — per-document top-k multi-word keyphrases for corpus
    indexing/labeling:

    1. candidate phrases = maximal runs of MEMBER tokens (lowercase
       pure-alphabetic, not a stopword); stopwords, numbers,
       punctuation-bearing and empty tokens all break phrases;
    2. per document and word: freq(w) = member occurrences,
       deg(w) = Σ over occurrences of the containing phrase's length
       (RAKE's co-occurrence degree, self included);
    3. word_score_ppm = (deg·10⁶) DIV freq — the deg/freq rational
       cleared to ppm, truncating (both engines, non-negative);
    4. phrase_score_ppm = Σ word_score_ppm over the phrase's member
       OCCURRENCES (a word repeated in a phrase counts each time —
       the reference algorithm's convention);
    5. keywords = DISTINCT phrase strings per document, top-k by
       (score desc, phrase asc) — a total order, so ranks are
       reproducible.

    Identical phrase strings always carry identical scores (same
    words ⇒ same word scores), so the distinct step is lossless.

    Physical plan: one posexplode over the corpus, islands via the
    gaps-and-islands row_number trick (position − member rank is
    constant within a run), phrase length by a doc-partitioned
    window, word stats by one groupBy((doc, word)), scores joined
    back on (doc, word) — every window and shuffle is document- or
    word-keyed, nothing global.  All arithmetic int64 (per-document
    counts are document-bounded).

    Output: (doc_id, phrase, n_words, score_ppm, rk ∈ [1, k])."""
    from pyspark.sql import Window as W

    stops = stopwords if stopwords is not None else STOPWORDS["en"]
    stop_arr = F.array(*[F.lit(s) for s in stops])
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "tok"),
    )
    members = toks.where(
        F.col("tok").rlike("^[a-z]+$")
        & ~F.array_contains(stop_arr, F.col("tok"))
    )
    rn = F.row_number().over(W.partitionBy("doc").orderBy("pos"))
    isl = members.select(
        "doc", "pos", "tok", (F.col("pos") - rn).alias("isl")
    )
    plen = F.count(F.lit(1)).over(W.partitionBy("doc", "isl"))
    occ = isl.select("doc", "pos", "tok", "isl", plen.alias("plen"))
    # per-(doc, word) stats as WINDOW aggregates instead of a groupBy
    # + join-back: hash(doc) from the first window already satisfies
    # every (doc, …)-keyed clustering below, so the whole operator runs
    # on ONE exchange — the former plan re-shuffled for the word
    # groupBy and again for the join (6 exchanges total)
    ww = W.partitionBy("doc", "tok")
    scored = occ.select(
        "doc",
        "pos",
        "tok",
        "isl",
        F.sum("plen").over(ww).alias("deg"),
        F.count(F.lit(1)).over(ww).alias("freq"),
    ).select(
        "doc",
        "pos",
        "tok",
        "isl",
        F.expr("(deg * 1000000L) DIV freq").alias("wscore"),
    )
    phrases = scored.groupBy("doc", "isl").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "tok"))
                ),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("wscore").cast("bigint").alias("score_ppm"),
    )
    dedup = phrases.groupBy("doc", "phrase").agg(
        F.max("n_words").alias("n_words"),
        F.max("score_ppm").alias("score_ppm"),
    )
    rk = F.row_number().over(
        W.partitionBy("doc").orderBy(
            F.desc("score_ppm"), F.asc("phrase")
        )
    )
    return (
        dedup.select(
            F.col("doc").alias(id_col),
            "phrase",
            "n_words",
            "score_ppm",
            rk.alias("rk"),
        )
        .where(F.col("rk") <= k)
    )


def rake_keywords_sql(
    src: str,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: "list[str] | None" = None,
) -> str:
    """DuckDB twin of :func:`rake_keywords` (subscript-generated
    positions, the same islands/degree/score pipeline)."""
    stops = stopwords if stopwords is not None else STOPWORDS["en"]
    stop_list = ", ".join(f"'{s}'" for s in stops)
    return f"""
        WITH rake_toks AS (
            SELECT {id_col} AS doc, i AS pos, ts[i] AS tok
            FROM (
                SELECT {id_col},
                       string_split_regex(lower({text_col}), '\\s+') AS ts
                FROM {src}
            ) t,
            LATERAL (SELECT UNNEST(range(1, len(ts) + 1)) AS i) g
        ),
        rake_members AS (
            SELECT doc, pos, tok,
                   pos - ROW_NUMBER() OVER (
                       PARTITION BY doc ORDER BY pos) AS isl
            FROM rake_toks
            WHERE regexp_full_match(tok, '[a-z]+')
              AND tok NOT IN ({stop_list})
        ),
        rake_occ AS (
            SELECT doc, pos, tok, isl,
                   COUNT(*) OVER (PARTITION BY doc, isl) AS plen
            FROM rake_members
        ),
        rake_words AS (
            SELECT doc, tok,
                   COUNT(*) AS freq,
                   CAST(SUM(plen) AS BIGINT) AS deg
            FROM rake_occ GROUP BY 1, 2
        ),
        rake_scored AS (
            SELECT o.doc, o.pos, o.tok, o.isl,
                   (w.deg * 1000000) // w.freq AS wscore
            FROM rake_occ o
            JOIN rake_words w ON w.doc = o.doc AND w.tok = o.tok
        ),
        rake_phrases AS (
            SELECT doc, isl,
                   STRING_AGG(tok, ' ' ORDER BY pos) AS phrase,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(wscore) AS BIGINT) AS score_ppm
            FROM rake_scored GROUP BY 1, 2
        ),
        rake_dedup AS (
            SELECT doc, phrase,
                   MAX(n_words) AS n_words,
                   MAX(score_ppm) AS score_ppm
            FROM rake_phrases GROUP BY 1, 2
        )
        SELECT doc AS {id_col}, phrase, n_words, score_ppm, rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                       PARTITION BY doc
                       ORDER BY score_ppm DESC, phrase ASC) AS rk
            FROM rake_dedup
        ) ranked
        WHERE rk <= {int(k)}
    """


def kn_score_docs(
    targets: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents under a :func:`kn_bigram_model` — the CCNet
    move (domain filtering by LM fit: train on a trusted corpus,
    score the crawl, keep what the model finds unsurprising) with the
    engine's no-float discipline: instead of log-perplexity, emit the
    EXACT integer sufficient statistics per document —

        n_bigrams   total bigrams in the doc
        n_oov       bigrams whose w1 lacks a left context or w2 a
                    continuation in the model (unscorable)
        sum_p_ppm   Σ p_kn_ppm over scored bigrams
        min_p_ppm   the single most surprising scored bigram

    — ranking by sum/n (mean probability) and flagging by min is the
    analyst's division.  Scored bigrams use the model's OWN closed
    form with c = 0 standing in for unseen pairs:

        p_ppm = (max(4c−3,0)·T + 3·R(w1)·L(w2))·10⁶ DIV (4·c(w1·)·T)

    so a bigram PRESENT in the model reproduces its p_kn_ppm exactly
    (property-tested) and an absent-but-in-vocabulary bigram gets
    precisely the KN backoff mass — one formula, no special cases.
    The model must be built with ``min_count=1`` (a filtered model
    undercounts T and marginals; stated, not guessed).

    Plan: doc-keyed bigram window over the targets, one broadcastable
    join per marginal (vocab-scale), one left join on the bigram
    table, one per-doc aggregation.  Wide products in
    decimal(38,0)/HUGEINT.

    Output: (doc_id, n_bigrams, n_scored, n_oov, sum_p_ppm,
    min_p_ppm)."""
    from pyspark.sql import Window as W

    toks = targets.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "token"),
    ).where(F.col("token") != "")
    w = W.partitionBy("doc").orderBy("pos")
    bi = toks.select(
        "doc",
        F.col("token").alias("w1"),
        F.lead("token").over(w).alias("w2"),
    ).where(F.col("w2").isNotNull())
    # the model plan feeds FOUR consumers below; materialize it once
    # (vocab²-scale rows) instead of re-running its whole build per
    # consumer — the former plan re-scanned the training corpus 4×.
    # The checkpoint erases Catalyst's size estimate, so re-derive the
    # broadcast decision from the REAL row count (the colocation_pairs
    # policy): model tables under the session threshold broadcast as
    # before; bigger ones fall back to AQE's runtime join choice.
    from .spatial import _broadcast_threshold_bytes as _bthresh

    model = model.localCheckpoint(eager=True)
    _bc = (
        model.count() * 64  # ~64 B/row: two short tokens + 5 int64s
        <= _bthresh(model.sparkSession)
    )
    _b = F.broadcast if _bc else (lambda df: df)
    left = _b(model.select("w1", "c_w1", "cont_right").distinct())
    right = _b(model.select("w2", "cont_left").distinct())
    tot = model.agg(F.count(F.lit(1)).alias("_t"))
    big = _b(model.select("w1", "w2", F.col("c").alias("_c")))
    dec = "decimal(38,0)"
    p = (
        f"CAST(CASE WHEN c_w1 IS NULL OR cont_left IS NULL THEN NULL "
        f"ELSE ((GREATEST(4 * COALESCE(_c, 0) - 3, 0) "
        f"* CAST(_t AS {dec}) + 3 * CAST(cont_right AS {dec}) "
        f"* cont_left) * 1000000) "
        f"DIV (4 * CAST(c_w1 AS {dec}) * _t) END AS BIGINT)"
    )
    scored = (
        bi.join(left, "w1", "left")
        .join(right, "w2", "left")
        .join(big, ["w1", "w2"], "left")
        .crossJoin(F.broadcast(tot))
        .select("doc", F.expr(p).alias("_p"))
    )
    return scored.groupBy(F.col("doc").alias(id_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.count("_p").cast("bigint").alias("n_scored"),
        (F.count(F.lit(1)) - F.count("_p"))
        .cast("bigint")
        .alias("n_oov"),
        F.coalesce(F.sum("_p"), F.lit(0))
        .cast("bigint")
        .alias("sum_p_ppm"),
        F.min("_p").alias("min_p_ppm"),
    )


def kn_score_docs_sql(
    targets_src: str,
    model_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`kn_score_docs`; ``model_sql`` is a
    parenthesizable model query (e.g. ``kn_bigram_model_sql(...)``)."""
    return f"""
        WITH ks_model AS ({model_sql}),
        ks_split AS (
            SELECT {id_col} AS doc,
                   string_split_regex(lower({text_col}), '\\s+') AS ws
            FROM {targets_src}
        ),
        ks_toks AS (
            SELECT doc, u.i AS pos, ws[u.i] AS token
            FROM ks_split,
                 LATERAL (SELECT UNNEST(range(1, len(ws) + 1)) AS i) u
            WHERE ws[u.i] <> ''
        ),
        ks_bi AS (
            SELECT doc, token AS w1,
                   LEAD(token) OVER (PARTITION BY doc ORDER BY pos)
                       AS w2
            FROM ks_toks
        ),
        ks_bi2 AS (SELECT * FROM ks_bi WHERE w2 IS NOT NULL),
        ks_left AS (
            SELECT DISTINCT w1, c_w1, cont_right FROM ks_model
        ),
        ks_right AS (
            SELECT DISTINCT w2, cont_left FROM ks_model
        ),
        ks_tot AS (SELECT COUNT(*) AS t FROM ks_model),
        ks_scored AS (
            SELECT b.doc,
                   CAST(CASE WHEN l.c_w1 IS NULL OR r.cont_left IS NULL
                        THEN NULL
                        ELSE ((GREATEST(4 * COALESCE(m.c, 0) - 3, 0)
                               * CAST(t.t AS HUGEINT)
                               + 3 * CAST(l.cont_right AS HUGEINT)
                               * r.cont_left) * 1000000)
                             // (4 * CAST(l.c_w1 AS HUGEINT) * t.t)
                   END AS BIGINT) AS p
            FROM ks_bi2 b
            LEFT JOIN ks_left l USING (w1)
            LEFT JOIN ks_right r USING (w2)
            LEFT JOIN ks_model m ON m.w1 = b.w1 AND m.w2 = b.w2
            CROSS JOIN ks_tot t
        )
        SELECT doc AS {id_col},
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(COUNT(p) AS BIGINT) AS n_scored,
               CAST(COUNT(*) - COUNT(p) AS BIGINT) AS n_oov,
               CAST(COALESCE(SUM(p), 0) AS BIGINT) AS sum_p_ppm,
               MIN(p) AS min_p_ppm
        FROM ks_scored
        GROUP BY 1
    """


def topic_gaps(
    docs: DataFrame,
    block_size: int = 20,
    threshold_ppm: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TextTiling-style topic-shift detection — the document-structure
    signal a fixed-window chunker (:func:`chunk_documents`) ignores:
    split a document into consecutive ``block_size``-token blocks and
    score every gap between adjacent blocks by the exact Jaccard of
    their DISTINCT vocabularies,

        sim_ppm = |V_b ∩ V_{b+1}|·10⁶ DIV |V_b ∪ V_{b+1}|,

    flagging gaps with sim_ppm < ``threshold_ppm`` as candidate topic
    boundaries (the place a semantic chunker should cut).  This is
    Hearst's TextTiling block comparison with set-Jaccard instead of
    the cosine-of-counts (exact integers, no sqrt) and a flat
    threshold instead of the depth-score smoothing (each gap judged
    on its own evidence — deterministic, no smoothing window to
    tune); stated simplifications, not approximations of them.

    The tail block keeps its true (shorter) size — same convention as
    chunk_documents / the audio tail frame.  Single-block documents
    have no gaps and are absent.

    Plan: one posexplode, DISTINCT (doc, block, token), one
    self-equi-join on (doc, token) restricted to adjacent block ids
    (each gap's intersection counted once), block vocabulary sizes
    from one groupBy, everything doc-keyed.

    Output: (doc_id, gap, n_inter, n_union, sim_ppm, is_boundary) —
    gap g sits between blocks g and g+1."""
    if block_size < 1:
        raise ValueError(f"block_size must be >= 1, got {block_size}")
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "token"),
    ).where(F.col("token") != "")
    blocks = toks.select(
        "doc",
        (F.col("pos") / F.lit(block_size)).cast("int").alias("blk"),
        "token",
    ).distinct()
    sizes = blocks.groupBy("doc", "blk").agg(
        F.count(F.lit(1)).alias("sz")
    )
    # fully renamed right leg: the self-join on shared lineage would
    # otherwise resolve ambiguously (the cohen_kappa lesson)
    nxt = blocks.select(
        F.col("doc").alias("doc_n"),
        (F.col("blk") - 1).alias("gap_n"),
        F.col("token").alias("token_n"),
    )
    inter = (
        blocks.join(
            nxt,
            (F.col("doc") == F.col("doc_n"))
            & (F.col("blk") == F.col("gap_n"))
            & (F.col("token") == F.col("token_n")),
        )
        .groupBy("doc", F.col("blk").alias("gap"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    gaps = (
        sizes.alias("a")
        .join(
            sizes.alias("b"),
            (F.col("a.doc") == F.col("b.doc"))
            & (F.col("b.blk") == F.col("a.blk") + 1),
        )
        .select(
            F.col("a.doc").alias("doc"),
            F.col("a.blk").alias("gap"),
            F.col("a.sz").alias("_sa"),
            F.col("b.sz").alias("_sb"),
        )
    )
    out = gaps.join(inter, ["doc", "gap"], "left").select(
        F.col("doc").alias(id_col),
        "gap",
        F.coalesce("n_inter", F.lit(0)).cast("bigint").alias("n_inter"),
        (F.col("_sa") + F.col("_sb") - F.coalesce("n_inter", F.lit(0)))
        .cast("bigint")
        .alias("n_union"),
    )
    sim = F.expr("(n_inter * 1000000L) DIV n_union")
    return out.select(
        id_col,
        "gap",
        "n_inter",
        "n_union",
        sim.alias("sim_ppm"),
        (sim < F.lit(int(threshold_ppm))).alias("is_boundary"),
    )


def topic_gaps_sql(
    src: str,
    block_size: int = 20,
    threshold_ppm: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`topic_gaps`."""
    return f"""
        WITH tg_toks AS (
            SELECT {id_col} AS doc, u.i - 1 AS pos, ws[u.i] AS token
            FROM (
                SELECT {id_col},
                       string_split_regex(lower({text_col}), '\\s+') AS ws
                FROM {src}
            ) t,
            LATERAL (SELECT UNNEST(range(1, len(ws) + 1)) AS i) u
            WHERE ws[u.i] <> ''
        ),
        tg_blocks AS (
            SELECT DISTINCT doc,
                   CAST(pos // {int(block_size)} AS INT) AS blk,
                   token
            FROM tg_toks
        ),
        tg_sizes AS (
            SELECT doc, blk, CAST(COUNT(*) AS BIGINT) AS sz
            FROM tg_blocks GROUP BY 1, 2
        ),
        tg_inter AS (
            SELECT a.doc, a.blk AS gap,
                   CAST(COUNT(*) AS BIGINT) AS n_inter
            FROM tg_blocks a
            JOIN tg_blocks b
              ON b.doc = a.doc AND b.blk = a.blk + 1
             AND b.token = a.token
            GROUP BY 1, 2
        ),
        tg_gaps AS (
            SELECT a.doc, a.blk AS gap,
                   a.sz AS sa, b.sz AS sb
            FROM tg_sizes a
            JOIN tg_sizes b ON b.doc = a.doc AND b.blk = a.blk + 1
        )
        SELECT g.doc AS {id_col}, g.gap,
               COALESCE(i.n_inter, 0) AS n_inter,
               g.sa + g.sb - COALESCE(i.n_inter, 0) AS n_union,
               (COALESCE(i.n_inter, 0) * 1000000)
                   // (g.sa + g.sb - COALESCE(i.n_inter, 0)) AS sim_ppm,
               (COALESCE(i.n_inter, 0) * 1000000)
                   // (g.sa + g.sb - COALESCE(i.n_inter, 0))
                   < {int(threshold_ppm)} AS is_boundary
        FROM tg_gaps g
        LEFT JOIN tg_inter i ON i.doc = g.doc AND i.gap = g.gap
    """


def vocab_growth(
    docs: DataFrame,
    checkpoints: "list[int]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps-law vocabulary growth curve — cumulative corpus size vs
    cumulative vocabulary after each id-prefix checkpoint: natural
    text grows types sublinearly (V ≈ K·nᵝ, β < 1); near-linear
    growth is the serial-number/boilerplate smell, saturation is the
    spun-template smell.  The per-checkpoint audit a mixture designer
    reads before fixing a tokenizer vocabulary.

    ``id_col`` is the arrival order (the documents table's dense
    doc_id); checkpoint c covers ids < c.  Docs at id ≥ max(c) are
    outside the curve by construction; token-less docs still count
    toward n_docs (the doc axis comes from the docs table, not the
    token stream).

    Scale design: a type's first occurrence is min(id) — ONE token
    groupBy (map-side combined), never a corpus-ordered window; each
    type/doc then lands in the smallest covering checkpoint via a
    broadcast literal array, and the cumulative step runs on the
    ≤ ``len(checkpoints)`` aggregate rows (tiny triangular self-join
    — no global window, no WindowExec warning at any scale).
    Tokenization: the engine's whitespace + lower convention.

    Output: (checkpoint, n_docs, n_tokens, n_types, types_per_mtok)
    — types_per_mtok = n_types·10⁶ DIV n_tokens (NULL on an empty
    prefix), the normalized richness the β-fit reads."""
    cps = list(checkpoints)
    if not cps or len(cps) > 64:
        raise ValueError(f"1..64 checkpoints required, got {len(cps)}")
    if any(c <= 0 for c in cps) or sorted(set(cps)) != cps:
        raise ValueError(
            "checkpoints must be strictly increasing positive ints"
        )
    arr = F.array(*[F.lit(int(c)) for c in cps])
    cover = lambda col: F.array_min(  # noqa: E731
        F.filter(arr, lambda c: c > col)
    )
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("_tok"),
    ).where(F.col("_tok") != "")
    typ = (
        toks.groupBy("_tok")
        .agg(F.min("_id").alias("_first"))
        .select(cover(F.col("_first")).alias("_cp"))
        .where(F.col("_cp").isNotNull())
        .groupBy("_cp")
        .agg(F.count(F.lit(1)).alias("_types"))
        .select("_cp", F.lit(0).alias("_docs"),
                F.lit(0).cast("bigint").alias("_toks"), "_types")
    )
    doc = (
        docs.select(cover(F.col(id_col)).alias("_cp"))
        .where(F.col("_cp").isNotNull())
        .groupBy("_cp")
        .agg(F.count(F.lit(1)).alias("_docs"))
        .select("_cp", "_docs", F.lit(0).cast("bigint").alias("_toks"),
                F.lit(0).cast("bigint").alias("_types"))
    )
    tok = (
        toks.select(cover(F.col("_id")).alias("_cp"))
        .where(F.col("_cp").isNotNull())
        .groupBy("_cp")
        .agg(F.count(F.lit(1)).alias("_toks"))
        .select("_cp", F.lit(0).alias("_docs"), "_toks",
                F.lit(0).cast("bigint").alias("_types"))
    )
    per = (
        typ.unionByName(doc).unionByName(tok)
        .groupBy("_cp")
        .agg(F.sum("_docs").alias("_docs"),
             F.sum("_toks").alias("_toks"),
             F.sum("_types").alias("_types"))
    )
    dim = docs.sparkSession.range(1).select(
        F.explode(arr).alias("checkpoint")
    )
    # NB: dim.checkpoint would resolve to DataFrame.checkpoint (the
    # method) — address the column explicitly.
    base = dim.join(per, F.col("checkpoint") == F.col("_cp"), "left")
    cum = (
        base.alias("a")
        .join(base.alias("b"),
              F.col("b.checkpoint") <= F.col("a.checkpoint"))
        .groupBy(F.col("a.checkpoint").alias("checkpoint"))
        .agg(
            F.coalesce(F.sum("b._docs"), F.lit(0))
            .cast("bigint").alias("n_docs"),
            F.coalesce(F.sum("b._toks"), F.lit(0))
            .cast("bigint").alias("n_tokens"),
            F.coalesce(F.sum("b._types"), F.lit(0))
            .cast("bigint").alias("n_types"),
        )
    )
    return cum.select(
        "checkpoint", "n_docs", "n_tokens", "n_types",
        F.expr(
            "CAST(CASE WHEN n_tokens = 0 THEN NULL ELSE "
            "n_types * 1000000 DIV n_tokens END AS BIGINT)"
        ).alias("types_per_mtok"),
    )


def vocab_growth_sql(
    src: str,
    checkpoints: "list[int]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`vocab_growth` (standalone; vg_*
    namespaced).  Same covering-checkpoint and triangular-cumulative
    derivation."""
    cps = list(checkpoints)
    if not cps or any(c <= 0 for c in cps) or sorted(set(cps)) != cps:
        raise ValueError("bad checkpoints")
    vals = ", ".join(f"({int(c)})" for c in cps)
    return f"""
        WITH vg_cps AS (SELECT * FROM (VALUES {vals}) c(cp)),
        vg_toks AS (
            SELECT {id_col} AS id, tok
            FROM {src},
                 LATERAL UNNEST(string_split_regex(lower({text_col}),
                                '\\s+')) AS u(tok)
            WHERE tok <> ''
        ),
        vg_typ AS (
            SELECT (SELECT MIN(cp) FROM vg_cps WHERE cp > t.first_id)
                       AS cp,
                   CAST(0 AS BIGINT) AS docs, CAST(0 AS BIGINT) AS toks,
                   CAST(COUNT(*) AS BIGINT) AS types
            FROM (SELECT tok, MIN(id) AS first_id FROM vg_toks
                  GROUP BY tok) t
            GROUP BY 1 HAVING cp IS NOT NULL
        ),
        vg_doc AS (
            SELECT (SELECT MIN(cp) FROM vg_cps WHERE cp > d.{id_col})
                       AS cp,
                   CAST(COUNT(*) AS BIGINT) AS docs,
                   CAST(0 AS BIGINT) AS toks,
                   CAST(0 AS BIGINT) AS types
            FROM {src} d
            GROUP BY 1 HAVING cp IS NOT NULL
        ),
        vg_tok AS (
            SELECT (SELECT MIN(cp) FROM vg_cps WHERE cp > t.id) AS cp,
                   CAST(0 AS BIGINT) AS docs,
                   CAST(COUNT(*) AS BIGINT) AS toks,
                   CAST(0 AS BIGINT) AS types
            FROM vg_toks t
            GROUP BY 1 HAVING cp IS NOT NULL
        ),
        vg_per AS (
            SELECT cp, SUM(docs) AS docs, SUM(toks) AS toks,
                   SUM(types) AS types
            FROM (SELECT * FROM vg_typ UNION ALL SELECT * FROM vg_doc
                  UNION ALL SELECT * FROM vg_tok)
            GROUP BY cp
        )
        SELECT a.cp AS checkpoint,
               CAST(COALESCE(SUM(b.docs), 0) AS BIGINT) AS n_docs,
               CAST(COALESCE(SUM(b.toks), 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(SUM(b.types), 0) AS BIGINT) AS n_types,
               CAST(CASE WHEN COALESCE(SUM(b.toks), 0) = 0 THEN NULL
                    ELSE COALESCE(SUM(b.types), 0) * 1000000
                         // SUM(b.toks) END AS BIGINT)
                   AS types_per_mtok
        FROM vg_cps a
        LEFT JOIN vg_per b ON b.cp <= a.cp
        GROUP BY a.cp
    """


def zipf_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Zipf rank–frequency diagnostics without a single float log:
    token n-gram frequencies histogrammed by power-of-two bucket
    (bucket = ⌊log₂ c⌋ as ``length(bin(c)) − 1`` — exact integer in
    both engines), plus the per-doubling type ratio.  Under Zipf with
    exponent s = 1 the number of types per frequency-doubling bucket
    HALVES (ratio_ppm ≈ 500000); a heavy hapax spike or a flat ratio
    is the scraped-ID/templated-corpus smell, read next to
    vocab_growth's β.  ``ngram`` > 1 diagnoses the COLLOCATION tail
    (a template corpus is flat at n=1 but Zipfian at n=2).

    Scale: n-grams are row-local array algebra over the cleaned token
    sequence (no join), then one gram groupBy (map-side combined) →
    ≤ 63 bucket rows; the doubling ratio is a self-join on the tiny
    bucket table, never a window.  Output: (bucket, freq_lo, n_types,
    n_tokens, types_ratio_ppm) — ratio NULL when bucket−1 is
    absent/first."""
    if not 1 <= int(ngram) <= 4:
        raise ValueError(f"ngram out of range: {ngram}")
    n = int(ngram)
    arr = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: x != "",
    )
    docs = docs.select(arr.alias("_arr"))
    grams = F.when(
        F.size("_arr") >= n,
        F.expr(
            f"transform(sequence(0, size(_arr) - {n}), "
            f"i -> concat_ws(' ', slice(_arr, i + 1, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    toks = docs.select(F.explode(grams).alias("_tok"))
    freq = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    bucket = (F.length(F.bin(F.col("_c"))) - 1).cast("bigint")
    per = (
        freq.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_types"))
        .join(
            freq.select(bucket.alias("bucket"), "_c")
            .groupBy("bucket")
            .agg(F.sum("_c").alias("n_tokens")),
            "bucket",
        )
    )
    prev = per.select(
        (F.col("bucket") + 1).alias("bucket"),
        F.col("n_types").alias("_prev_types"),
    )
    return (
        per.join(prev, "bucket", "left")
        .select(
            "bucket",
            F.expr(
                "CAST(shiftleft(CAST(1 AS BIGINT), "
                "CAST(bucket AS INT)) AS BIGINT)"
            ).alias("freq_lo"),
            F.col("n_types").cast("bigint").alias("n_types"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.expr(
                "CAST(CASE WHEN _prev_types IS NULL THEN NULL ELSE "
                "n_types * 1000000 DIV _prev_types END AS BIGINT)"
            ).alias("types_ratio_ppm"),
        )
    )


def zipf_buckets_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 1,
) -> str:
    """DuckDB twin of :func:`zipf_buckets` (standalone; zb_*
    namespaced).  Same bin()-length bucket and tiny self-join; grams
    built by 1-based inclusive list slicing over the cleaned token
    list."""
    if not 1 <= int(ngram) <= 4:
        raise ValueError(f"ngram out of range: {ngram}")
    n = int(ngram)
    return f"""
        WITH zb_arr AS (
            SELECT list_filter(string_split_regex(lower({text_col}),
                               '\\s+'), x -> x <> '') AS a
            FROM {src}
        ),
        zb_freq AS (
            SELECT array_to_string(a[i : i + {n} - 1], ' ') AS tok,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM zb_arr,
                 LATERAL UNNEST(range(1, len(a) - {n} + 2)) AS r(i)
            GROUP BY tok
        ),
        zb_per AS (
            SELECT CAST(length(bin(c)) - 1 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(c) AS BIGINT) AS n_tokens
            FROM zb_freq GROUP BY 1
        )
        SELECT a.bucket,
               CAST(1 << CAST(a.bucket AS INTEGER) AS BIGINT)
                   AS freq_lo,
               a.n_types, a.n_tokens,
               CAST(CASE WHEN b.n_types IS NULL THEN NULL ELSE
                    a.n_types * 1000000 // b.n_types END AS BIGINT)
                   AS types_ratio_ppm
        FROM zb_per a
        LEFT JOIN zb_per b ON b.bucket = a.bucket - 1
    """


def slice_divergence(
    docs: DataFrame,
    slice_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact total-variation distance between each corpus slice's
    unigram distribution and the REST of the corpus — the log-free
    distribution-shift audit (KL needs floats and is undefined on
    disjoint support; TV = ½·Σ_t |p_t − q_t| is bounded, symmetric,
    and exactly rational).  High tv_ppm flags a slice whose token mix
    diverges from the mixture (wrong-language contamination, a
    template-dominated source); tv_ppm → 0 flags a slice that adds no
    distributional information.  The mixture designer's companion to
    :func:`vocab_drift` (which compares SNAPSHOTS by per-token df
    ratios; this compares SLICES by whole-distribution distance).

    Exact arithmetic: with c_t the slice count, tot_t the corpus
    count, n = Σc, m = N − n (rest mass),

        TV = Σ_{t∈slice} |c_t·m − (tot_t−c_t)·n|  +  n·(m − Σ_{t∈slice}(tot_t−c_t))
             ────────────────────────────────────────────────────────
                                   2·n·m

    The second numerator term is the CLOSED-FORM mass of types the
    slice never saw (their |0·m − d_t·n| = d_t·n telescopes), so
    absent types are never enumerated — the per-slice work is the
    slice's own vocabulary, not the corpus union.  Wide products run
    in decimal(38,0) (HUGEINT in the twin) with truncating DIV; at
    10¹³ corpus tokens c_t·m ≤ 10²⁶ sits well under 10³⁸.

    Plan shape at 100 TB: explode → (slice, token) counts is ONE
    map-side-combinable shuffle; token totals re-aggregate that
    already-reduced table (vocab × slices rows, not the raw stream);
    the totals join is token-keyed (Zipf head = AQE skew case); the
    per-slice rollup is a third partial agg on ≤|slices| groups.  No
    windows, no collects.  A slice covering the whole corpus (m = 0)
    yields NULL tv_ppm — TV against an empty complement is undefined.

    Returns (slice, n_docs, n_tokens, n_types, tv_ppm)."""
    dec = "decimal(38,0)"
    sl = (
        docs.select(
            F.col(slice_col).alias("slice"),
            F.col(id_col).alias("_id"),
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .groupBy("slice", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = sl.groupBy("token").agg(F.sum("c").alias("tot"))
    ndoc = docs.groupBy(F.col(slice_col).alias("slice")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    per = (
        sl.join(tot, "token")
        .groupBy("slice")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.col("tot") - F.col("c")).alias("d_seen"),
        )
    )
    # corpus total N as a 1-row broadcast (tiny aggregate of per);
    # built ONCE PER USE — reusing one DataFrame object on both sides
    # of the final join trips Spark's self-join attribute ambiguity
    def n_all():
        # "ncorp", not "N": Spark resolves case-insensitively, so an
        # alias "N" collides with the per-slice column "n"
        return per.agg(F.sum("n").alias("ncorp"))

    num_seen = (
        sl.join(tot, "token")
        .join(per.select("slice", "n"), "slice")
        .join(F.broadcast(n_all()))
        .select(
            "slice",
            F.abs(
                F.col("c").cast(dec)
                * (F.col("ncorp") - F.col("n")).cast(dec)
                - (F.col("tot") - F.col("c")).cast(dec)
                * F.col("n").cast(dec)
            ).alias("term"),
        )
        .groupBy("slice")
        .agg(F.sum("term").alias("num_seen"))
    )
    out = (
        per.join(num_seen, "slice")
        .join(ndoc, "slice")
        .join(F.broadcast(n_all()))
        .select(
            "slice",
            "n_docs",
            F.col("n").alias("n_tokens"),
            "n_types",
            F.when(
                F.col("ncorp") > F.col("n"),
                F.expr(
                    "CAST((num_seen + CAST(n AS decimal(38,0)) * "
                    "CAST(ncorp - n - d_seen AS decimal(38,0))) * 1000000 "
                    "DIV (CAST(2 AS decimal(38,0)) * CAST(n AS decimal(38,0)) "
                    "* CAST(ncorp - n AS decimal(38,0))) AS BIGINT)"
                ),
            ).alias("tv_ppm"),
        )
    )
    return out


def slice_divergence_sql(
    src: str,
    slice_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`slice_divergence` (standalone; sd_*
    namespaced).  Same closed-form absent-type mass, HUGEINT wide
    products, truncating // on non-negative operands ≡ Spark DIV."""
    return f"""
        WITH sd_tok AS (
            SELECT {slice_col} AS slice, sd_u.tok AS token,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM {src},
                 LATERAL UNNEST(list_filter(
                     string_split_regex(lower({text_col}), '\\s+'),
                     x -> x <> '')) AS sd_u(tok)
            GROUP BY 1, 2
        ),
        sd_tot AS (
            SELECT token, SUM(c) AS tot FROM sd_tok GROUP BY 1
        ),
        sd_ndoc AS (
            SELECT {slice_col} AS slice,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM {src} GROUP BY 1
        ),
        sd_per AS (
            SELECT slice, SUM(c) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   SUM(tot - c) AS d_seen
            FROM sd_tok JOIN sd_tot USING (token)
            GROUP BY 1
        ),
        sd_all AS (SELECT SUM(n) AS N FROM sd_per),
        sd_num AS (
            SELECT k.slice,
                   SUM(ABS(CAST(k.c AS HUGEINT)
                           * CAST(a.N - p.n AS HUGEINT)
                           - CAST(t.tot - k.c AS HUGEINT)
                           * CAST(p.n AS HUGEINT))) AS num_seen
            FROM sd_tok k
            JOIN sd_tot t USING (token)
            JOIN sd_per p ON p.slice = k.slice
            CROSS JOIN sd_all a
            GROUP BY 1
        )
        SELECT p.slice, d.n_docs,
               CAST(p.n AS BIGINT) AS n_tokens, p.n_types,
               CAST(CASE WHEN a.N > p.n THEN
                   (m.num_seen + CAST(p.n AS HUGEINT)
                    * CAST(a.N - p.n - p.d_seen AS HUGEINT)) * 1000000
                   // (CAST(2 AS HUGEINT) * CAST(p.n AS HUGEINT)
                       * CAST(a.N - p.n AS HUGEINT))
               END AS BIGINT) AS tv_ppm
        FROM sd_per p
        JOIN sd_num m ON m.slice = p.slice
        JOIN sd_ndoc d ON d.slice = p.slice
        CROSS JOIN sd_all a
    """


def token_runs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Longest same-token run per document — the adjacent-repetition
    curation signal ("buy buy buy …", stuck-key OCR, copy-paste
    stutter) that :func:`repetition_stats`'s n-gram shares can dilute
    when the document is long: a 50-token spam run in a 10⁵-token doc
    is invisible as a share but unmistakable as a run.

    Run algebra is ROW-LOCAL array arithmetic (zero shuffle before
    the caller's use): boundary positions b = [i : a_i ≠ a_{i−1}],
    run lengths = pairwise diffs of b ⧺ [n+1]; max_run is their max
    and max_run_token the token at the EARLIEST maximal run's start
    (deterministic tie rule, encoded as one integer argmin
    len·2²⁰·(−1)+start … realized as min over (−len, start) pairs
    packed as len·2²⁰ − start under negation — see inline comment).
    Documents with no tokens emit n_tokens = 0 and NULL run fields.

    Plan: explode-free — whole-stage-codegen higher-order functions
    on the tokens array; the only shuffle in the contract entry is
    the driver's own collect.  Position cap: docs beyond 2²⁰ tokens
    fail loud in the packing guard rather than mis-rank.

    Returns (id, n_tokens, n_runs, max_run, max_run_token)."""
    a = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    d = docs.select(F.col(id_col), a.alias("_a")).withColumn(
        "_n", F.size("_a")
    )
    # boundary starts (1-based): i == 1 or a[i] != a[i-1]
    starts = F.filter(
        F.sequence(F.lit(1), F.col("_n")),
        lambda i: (i == 1)
        | (
            F.element_at("_a", i)
            != F.try_element_at("_a", i - 1)  # i=1 probes index 0
        ),
    )
    d = d.withColumn("_b", F.when(F.col("_n") > 0, starts))
    # run at starts[j] spans [starts[j], nxt) with nxt = starts[j+1]
    # or n+1; pack (run_len, start) as len·2²⁰ + (2²⁰ − start) so ONE
    # integer max picks longest-run-then-earliest-start (start < 2²⁰
    # enforced loudly — beyond that the packing would collide).
    packed = F.transform(
        F.sequence(F.lit(1), F.size("_b")),
        lambda j: (
            F.coalesce(
                F.try_element_at("_b", j + 1), F.col("_n") + 1
            )
            - F.element_at("_b", j)
        )
        * F.lit(1 << 20)
        + (F.lit(1 << 20) - F.element_at("_b", j)),
    )
    d = d.withColumn(
        "_chk",
        F.when(
            F.col("_n") >= F.lit(1 << 20),
            F.assert_true(
                F.lit(False), F.lit("token_runs: doc exceeds 2^20 tokens")
            ),
        ),
    )
    best = F.array_max(packed)
    best_start = F.lit(1 << 20) - (best % F.lit(1 << 20))
    return d.select(
        F.col(id_col),
        F.col("_n").alias("n_tokens"),
        F.when(F.col("_n") > 0, F.size("_b"))
        .cast("bigint").alias("n_runs"),
        F.when(F.col("_n") > 0, (best / F.lit(1 << 20)).cast("bigint"))
        .alias("max_run"),
        F.when(
            F.col("_n") > 0, F.element_at("_a", best_start.cast("int"))
        ).alias("max_run_token"),
        F.col("_chk").alias("_guard"),
    ).drop("_guard")


def token_runs_sql(
    src: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`token_runs` (standalone; tr_*
    namespaced).  Structurally DIFFERENT execution: the twin explodes
    positions and finds boundaries/next-boundaries with window LEAD
    per doc, so the Spark side's packed-integer row-local algebra is
    verified against a plain windowed formulation."""
    return f"""
        WITH tr_arr AS (
            SELECT {id_col} AS id,
                   list_filter(string_split_regex(lower({text_col}),
                               '\\s+'), x -> x <> '') AS a
            FROM {src}
        ),
        tr_pos AS (
            SELECT id, a, i, a[i] AS tok
            FROM tr_arr, LATERAL UNNEST(range(1, len(a) + 1)) AS r(i)
        ),
        tr_bound AS (
            SELECT id, i AS start, tok,
                   COALESCE(LEAD(i) OVER (PARTITION BY id ORDER BY i),
                            len(a) + 1) - i AS run_len
            FROM tr_pos
            WHERE i = 1 OR a[i] <> a[i - 1]
        ),
        tr_win AS (
            SELECT id, start, tok, run_len,
                   MAX(run_len) OVER (PARTITION BY id) AS mx
            FROM tr_bound
        ),
        tr_best AS (
            SELECT id,
                   CAST(COUNT(*) AS BIGINT) AS n_runs,
                   MAX(run_len) AS max_run,
                   MIN(CASE WHEN run_len = mx THEN start END) AS bstart
            FROM tr_win GROUP BY id
        )
        SELECT r.id AS {id_col},
               CAST(len(r.a) AS BIGINT) AS n_tokens,
               b.n_runs,
               CAST(b.max_run AS BIGINT) AS max_run,
               tb.tok AS max_run_token
        FROM tr_arr r
        LEFT JOIN tr_best b ON b.id = r.id
        LEFT JOIN tr_bound tb ON tb.id = b.id AND tb.start = b.bstart
    """


CURATION_REASONS = ("gopher", "repetition", "gibberish", "length_outlier")


def curation_verdict(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    len_col: str = "n_chars",
    max_rare_ppm: int = 500_000,
    mad_threshold_ppm: int = 3_500_000,
) -> DataFrame:
    """The end-to-end per-document curation verdict — the four
    quality families this engine ships, composed into ONE keep/drop
    row with a reason bitmask (``CURATION_REASONS`` order): the table
    a 100-TB pretraining run actually materializes before dedup, and
    the per-shard "which rule ate my corpus" report.

        bit 0  gopher    — any :func:`gopher_filter` rule violated
        bit 1  repetition — :func:`repetition_stats` published drop rule
        bit 2  gibberish — :func:`rare_token_ratio` above ``max_rare_ppm``
                           (more than half its distinct tokens corpus-
                           unique at the default: OCR noise / serials)
        bit 3  length_outlier — per-``lang_col`` median/MAD flag on
                           ``len_col`` (:func:`profile.mad_outliers`)

    keep ⟺ reasons = 0.  Pure composition — no new arithmetic, so
    the twin joins the component twins and the driver hash-verifies
    the COMPOSITION (the emerging_hotspots discipline).  Documents
    the token stages never see (empty text) carry no repetition/
    gibberish evidence: those bits coalesce to false, while gopher's
    own min_words rule still fires — stated, pinned by test.

    Plan: the four stages share the scan but aggregate independently
    (gopher 2 shuffles, repetition 2, rare 3, MAD 2 window passes on
    the lang key); the verdict join is id-keyed on four |docs|-sized
    aggregates.  At 100 TB run the stages as one pass each and
    checkpoint — the operator's deliberate structure.

    Returns (id, lang, gopher_flags, repetitive, rare_ppm,
    len_outlier, reasons, keep)."""
    from openstreetmap_license_change_spark.operators.profile import (
        mad_outliers,
    )

    g = gopher_filter(docs, id_col=id_col, text_col=text_col).select(
        id_col, F.col("flags").alias("gopher_flags")
    )
    r = repetition_stats(docs, id_col=id_col, text_col=text_col).select(
        id_col, "repetitive"
    )
    rt = rare_token_ratio(docs, id_col=id_col, text_col=text_col).select(
        id_col, "rare_ppm"
    )
    mo = mad_outliers(docs, lang_col, id_col, len_col,
                      threshold_ppm=mad_threshold_ppm).select(
        id_col, F.col("is_outlier").alias("len_outlier")
    )
    rep = F.coalesce(F.col("repetitive"), F.lit(False))
    gib = F.coalesce(
        F.col("rare_ppm") > F.lit(int(max_rare_ppm)), F.lit(False)
    )
    reasons = (
        (F.col("gopher_flags") != 0).cast("int")
        + rep.cast("int") * 2
        + gib.cast("int") * 4
        + F.col("len_outlier").cast("int") * 8
    ).cast("bigint")
    return (
        docs.select(id_col, lang_col)
        .join(g, id_col)
        .join(r, id_col, "left")
        .join(rt, id_col, "left")
        .join(mo, id_col)
        .select(
            id_col,
            lang_col,
            "gopher_flags",
            rep.alias("repetitive"),
            "rare_ppm",
            "len_outlier",
            reasons.alias("reasons"),
            (reasons == 0).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# χ² token–slice association (feature selection / slice fingerprints)
# ---------------------------------------------------------------------------

def chi2_tokens(
    docs: DataFrame,
    k: int = 15,
    min_df: int = 2,
    slice_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k tokens most ASSOCIATED with each corpus slice by the
    exact document-level χ² statistic — the classic feature-selection
    / slice-fingerprint table (which tokens make `lang=de` de, which
    tokens make a boilerplate source that source).  Complements
    :func:`slice_divergence` (one number per slice) with the per-token
    WHY, and :func:`vocab_drift` (same token table, df-ratio over
    snapshots) with a significance-ranked contrast.

    Per (slice s, token t) the 2×2 presence table is n11 = |docs in s
    containing t|, n10 = df_t − n11, n01 = N_s − n11, n00 = N − df_t
    − N_s + n11, and

        χ² = N·(n11·n00 − n10·n01)² / (df_t·(N−df_t)·N_s·(N−N_s))

    — every factor an integer, so chi2_ppm = 10⁶·χ² is exactly
    rational: the square and the 10⁶ scaling run in decimal(38,0)
    (HUGEINT in the twin) with truncating division (all factors
    non-negative, so floor = trunc across engines).  Degenerate
    margins (a token in EVERY doc, a slice covering the whole corpus)
    have zero denominators and are excluded — χ² is undefined there,
    not zero.  Tokens under ``min_df`` document frequency are dropped
    before ranking (a df-1 token is a perfect but useless separator).

    Plan shape at 100 TB: per-doc `array_distinct` makes presence
    row-local, so ONE map-side-combinable shuffle produces the
    (slice, token) counts; token df re-aggregates that already
    reduced table (vocab×slices rows, never the raw stream); slice
    sizes and N broadcast; the top-k window partitions by slice over
    vocab-sized input (WindowGroupLimit prunes to k per partition).

    Returns (slice, token, n11, df_t, chi2_ppm, rnk), rnk 1..k by
    chi2_ppm DESC with token ASC tie-break."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        )
    )
    pres = (
        docs.select(
            F.col(slice_col).alias("slice"),
            F.explode(toks).alias("token"),
        )
        .groupBy("slice", "token")
        .agg(F.count(F.lit(1)).alias("n11"))
    )
    df_t = pres.groupBy("token").agg(F.sum("n11").alias("df_t"))
    n_s = docs.groupBy(F.col(slice_col).alias("slice")).agg(
        F.count(F.lit(1)).alias("n_s")
    )
    n_tot = docs.agg(F.count(F.lit(1)).alias("n_tot"))
    scored = (
        pres.join(df_t, "token")
        .join(F.broadcast(n_s), "slice")
        .crossJoin(F.broadcast(n_tot))
        .where(
            (F.col("df_t") >= int(min_df))
            & (F.col("df_t") < F.col("n_tot"))
            & (F.col("n_s") < F.col("n_tot"))
        )
        .select(
            "slice",
            "token",
            "n11",
            "df_t",
            F.expr(
                f"CAST(CAST(n_tot AS {dec}) * 1000000 "
                f"* CAST(n11 * (n_tot - df_t - n_s + n11) "
                f"       - (df_t - n11) * (n_s - n11) AS {dec}) "
                f"* CAST(n11 * (n_tot - df_t - n_s + n11) "
                f"       - (df_t - n11) * (n_s - n11) AS {dec}) "
                f"DIV (CAST(df_t AS {dec}) * (n_tot - df_t) "
                f"     * n_s * (n_tot - n_s)) AS BIGINT)"
            ).alias("chi2_ppm"),
        )
    )
    w = Window.partitionBy("slice").orderBy(
        F.desc("chi2_ppm"), F.asc("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .select("slice", "token", "n11", "df_t", "chi2_ppm", "rnk")
    )


def chi2_tokens_sql(
    src: str,
    k: int = 15,
    min_df: int = 2,
    slice_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`chi2_tokens` (standalone; x2_*
    namespaced).  HUGEINT wide products; // floors = Spark DIV on the
    non-negative operands."""
    return f"""
        WITH x2_pres AS (
            SELECT {slice_col} AS slice,
                   UNNEST(list_distinct(list_filter(
                       string_split_regex(lower({text_col}), '\\s+'),
                       t -> t <> ''))) AS token
            FROM {src}
        ),
        x2_cnt AS (
            SELECT slice, token, CAST(COUNT(*) AS BIGINT) AS n11
            FROM x2_pres GROUP BY 1, 2
        ),
        x2_df AS (
            SELECT token, CAST(SUM(n11) AS BIGINT) AS df_t
            FROM x2_cnt GROUP BY 1
        ),
        x2_ns AS (
            SELECT {slice_col} AS slice,
                   CAST(COUNT(*) AS BIGINT) AS n_s
            FROM {src} GROUP BY 1
        ),
        x2_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM {src}),
        x2_scored AS (
            SELECT c.slice, c.token, c.n11, d.df_t,
                   CAST(CAST(n.n_tot AS HUGEINT) * 1000000
                        * CAST(c.n11 * (n.n_tot - d.df_t - s.n_s + c.n11)
                               - (d.df_t - c.n11) * (s.n_s - c.n11)
                               AS HUGEINT)
                        * CAST(c.n11 * (n.n_tot - d.df_t - s.n_s + c.n11)
                               - (d.df_t - c.n11) * (s.n_s - c.n11)
                               AS HUGEINT)
                        // (CAST(d.df_t AS HUGEINT) * (n.n_tot - d.df_t)
                            * s.n_s * (n.n_tot - s.n_s))
                        AS BIGINT) AS chi2_ppm
            FROM x2_cnt c
            JOIN x2_df d ON d.token = c.token
            JOIN x2_ns s ON s.slice = c.slice
            CROSS JOIN x2_n n
            WHERE d.df_t >= {int(min_df)}
              AND d.df_t < n.n_tot
              AND s.n_s < n.n_tot
        ),
        x2_rk AS (
            SELECT slice, token, n11, df_t, chi2_ppm,
                   ROW_NUMBER() OVER (
                       PARTITION BY slice
                       ORDER BY chi2_ppm DESC, token ASC
                   ) AS rnk
            FROM x2_scored
        )
        SELECT slice, token, n11, df_t, chi2_ppm, CAST(rnk AS INT) AS rnk
        FROM x2_rk WHERE rnk <= {int(k)}
    """


def gazetteer_tag(
    docs: DataFrame,
    phrases: list,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_phrase_tokens: int = 16,
) -> DataFrame:
    """Dictionary phrase tagging (gazetteer / entity-list matching) —
    the multi-pattern string-matching stage of a webtext pipeline
    (place-name extraction, brand lists, blocked-phrase screens),
    re-expressed as one broadcast token join instead of a per-row
    Aho-Corasick automaton: an occurrence of phrase P at token
    position s exists iff for EVERY index i of P the document token
    at s+i equals P[i], so candidates are (doc, phrase, s = pos − i)
    rows from a single token equi-join against the exploded phrase
    list and a full match is the group with COUNT(DISTINCT i) = len(P)
    (distinct, because a repeated token inside P hits several i per
    document position, each voting for a DIFFERENT s).

    Match semantics: MAXIMAL occurrences — an occurrence strictly
    contained in a longer occurrence (any phrase) is suppressed
    (unigram "hash" inside "hash value" doesn't double-report), while
    overlapping non-nested occurrences both stand; this is the
    standard gazetteer longest-match rule made order-free, hence
    expressible as one containment anti-join instead of a sequential
    left-to-right scan.  Distinct phrases can never share a span
    (same span ⇒ same token sequence), so "longest wins" is
    unambiguous.

    Scale: the phrase list is a broadcast dim by construction (it is
    validated driver-side); the token join costs Σ_t df(t)·gaz(t) —
    linear in corpus tokens for any fixed gazetteer, with Zipf-head
    fan-out on stop tokens being AQE's skew case; the maximality
    anti-join is doc-keyed (matches per doc are bounded by tokens per
    doc).  No Python runs per row.

    Reference parity: the same member-list screening role as the
    reference's whitelist/blacklist scans (`change_bot.rb:30-51`)
    generalized from whole-key equality to in-text phrase positions.

    Returns (doc_id, phrase, n_hits, first_pos, n_tokens) —
    occurrences after suppression, earliest 0-based token position,
    phrase length in tokens."""
    norm = []
    for p in phrases:
        q = " ".join(str(p).lower().split())
        if not q:
            raise ValueError(f"empty gazetteer phrase: {p!r}")
        if len(q.split()) > max_phrase_tokens:
            raise ValueError(
                f"gazetteer phrase over {max_phrase_tokens} tokens: {q!r}"
            )
        norm.append(q)
    if len(set(norm)) != len(norm):
        raise ValueError("duplicate gazetteer phrases after normalization")
    spark = docs.sparkSession
    gaz = spark.createDataFrame([(p,) for p in norm], "phrase string")
    gtok = gaz.select(
        "phrase",
        F.size(F.split("phrase", " ")).alias("glen"),
        F.posexplode(F.split(F.col("phrase"), " ")).alias("gidx", "gtok"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("pos", "token"),
    ).where(F.col("token") != "")
    cand = (
        toks.join(F.broadcast(gtok), toks.token == gtok.gtok)
        .select(
            "doc_id", "phrase", "glen", "gidx",
            (F.col("pos") - F.col("gidx")).cast("long").alias("m_start"),
        )
        .where(F.col("m_start") >= 0)
    )
    matches = (
        cand.groupBy("doc_id", "phrase", "glen", "m_start")
        .agg(F.countDistinct("gidx").alias("_nidx"))
        .where(F.col("_nidx") == F.col("glen"))
        .drop("_nidx")
    )
    other = matches.select(
        F.col("doc_id").alias("_d"),
        F.col("glen").alias("_g"),
        F.col("m_start").alias("_s"),
    )
    kept = matches.join(
        other,
        (F.col("doc_id") == F.col("_d"))
        & (F.col("_s") <= F.col("m_start"))
        & (F.col("_s") + F.col("_g") >= F.col("m_start") + F.col("glen"))
        & (F.col("_g") > F.col("glen")),
        "left_anti",
    )
    return kept.groupBy("doc_id", "phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("m_start").alias("first_pos"),
        F.min("glen").cast("long").alias("n_tokens"),
    )


def gazetteer_tag_sql(
    src: str,
    phrases: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`gazetteer_tag` (standalone statement,
    gz_*-namespaced; the gazetteer rides along as a VALUES list).
    Positions are 0-based on both engines (DuckDB's 1-based array
    index is shifted before the start arithmetic)."""
    norm = [" ".join(str(p).lower().split()) for p in phrases]
    if len(set(norm)) != len(norm) or any(not p for p in norm):
        raise ValueError("invalid gazetteer phrase list")
    vals = ", ".join("('" + p.replace("'", "''") + "')" for p in norm)
    return f"""
        WITH gz_gaz(phrase) AS (VALUES {vals}),
        gz_sp AS (
            SELECT phrase, string_split(phrase, ' ') AS gs FROM gz_gaz
        ),
        gz_gt AS (
            SELECT phrase, len(gs) AS glen, u.i - 1 AS gidx,
                   gs[u.i] AS gtok
            FROM gz_sp,
                 LATERAL (SELECT UNNEST(range(1, len(gs) + 1)) AS i) u
        ),
        gz_ws AS (
            SELECT {id_col} AS doc_id,
                   string_split_regex(lower({text_col}), '\\s+') AS ws
            FROM {src}
        ),
        gz_tok AS (
            SELECT doc_id, u.i - 1 AS pos, ws[u.i] AS token
            FROM gz_ws,
                 LATERAL (SELECT UNNEST(range(1, len(ws) + 1)) AS i) u
            WHERE ws[u.i] <> ''
        ),
        gz_cand AS (
            SELECT t.doc_id, g.phrase, g.glen, g.gidx,
                   CAST(t.pos - g.gidx AS BIGINT) AS m_start
            FROM gz_tok t JOIN gz_gt g ON g.gtok = t.token
            WHERE t.pos - g.gidx >= 0
        ),
        gz_match AS (
            SELECT doc_id, phrase, glen, m_start
            FROM gz_cand
            GROUP BY 1, 2, 3, 4
            HAVING COUNT(DISTINCT gidx) = glen
        ),
        gz_keep AS (
            SELECT m.* FROM gz_match m
            WHERE NOT EXISTS (
                SELECT 1 FROM gz_match o
                WHERE o.doc_id = m.doc_id
                  AND o.m_start <= m.m_start
                  AND o.m_start + o.glen >= m.m_start + m.glen
                  AND o.glen > m.glen
            )
        )
        SELECT doc_id, phrase,
               CAST(COUNT(*) AS BIGINT) AS n_hits,
               MIN(m_start) AS first_pos,
               CAST(MIN(glen) AS BIGINT) AS n_tokens
        FROM gz_keep GROUP BY 1, 2
    """


def readability(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade per document —
    the classic readability axis of a webtext quality panel (low FRE
    = academic/boilerplate, implausibly high = listicle/spam), in the
    engine's exact-integer form:

        fre_milli = 206835 − (1015·W) DIV S − (84600·Y) DIV W
        fkg_milli = (390·W) DIV S + (11800·Y) DIV W − 15590

    with W = whitespace tokens, S = sentence-ending punctuation runs
    ([.!?]+, min 1), Y = syllables as Σ_w max(1, vowel-group runs of
    [aeiouy]+ in w) — the standard heuristic counted identically on
    both engines.  The two DIV terms floor independently (stated —
    the scores are DEFINED over floored milli-units); every operand
    is non-negative, so trunc-vs-floor divergence can't arise even
    though fre itself goes negative on dense text.

    All native column arithmetic (regexp_extract_all + aggregate over
    the token array — no UDF, no shuffle; this is a map-only
    projection).  W = 0 → NULL scores (declared; nothing to read).

    Returns (doc_id, n_words, n_sentences, n_syllables, fre_milli,
    fkg_milli)."""
    toks = F.expr(
        f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    )
    syl = (
        "aggregate(filter(split(lower({t}), '\\\\s+'), t -> t <> ''), "
        "CAST(0 AS BIGINT), (acc, w) -> acc + greatest(1, "
        "size(regexp_extract_all(w, '[aeiouy]+', 0))))"
    ).format(t=text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_words"),
        F.greatest(
            F.lit(1),
            F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)")),
        ).cast("bigint").alias("n_sentences"),
        F.expr(syl).alias("n_syllables"),
    ).select(
        "doc_id", "n_words", "n_sentences", "n_syllables",
        F.when(
            F.col("n_words") > 0,
            F.lit(206835)
            - F.expr("(1015 * n_words) DIV n_sentences")
            - F.expr("(84600 * n_syllables) DIV n_words"),
        ).alias("fre_milli"),
        F.when(
            F.col("n_words") > 0,
            F.expr("(390 * n_words) DIV n_sentences")
            + F.expr("(11800 * n_syllables) DIV n_words")
            - F.lit(15590),
        ).alias("fkg_milli"),
    )


def readability_sql(
    src: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`readability` (standalone,
    rd_*-namespaced).  list_aggregate-free: syllables via the same
    per-token max(1, runs) fold expressed as a LATERAL unnest sum."""
    return f"""
        WITH rd_toks AS (
            SELECT {id_col} AS doc_id,
                   list_filter(
                       string_split_regex(lower({text_col}), '\\s+'),
                       t -> t <> ''
                   ) AS ws,
                   CAST(len(regexp_extract_all({text_col}, '[.!?]+'))
                        AS BIGINT) AS raw_sent
            FROM {src}
        ),
        rd_cnt AS (
            SELECT doc_id,
                   CAST(len(ws) AS BIGINT) AS n_words,
                   GREATEST(CAST(1 AS BIGINT), raw_sent) AS n_sentences,
                   CAST(COALESCE(list_sum(list_transform(ws, w ->
                       GREATEST(1, len(regexp_extract_all(
                           w, '[aeiouy]+'))))), 0) AS BIGINT)
                       AS n_syllables
            FROM rd_toks
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               CASE WHEN n_words > 0 THEN
                   206835 - (1015 * n_words) // n_sentences
                          - (84600 * n_syllables) // n_words
               END AS fre_milli,
               CASE WHEN n_words > 0 THEN
                   (390 * n_words) // n_sentences
                   + (11800 * n_syllables) // n_words - 15590
               END AS fkg_milli
        FROM rd_cnt
    """


def gini_gain_tokens(
    docs: DataFrame,
    k: int = 25,
    min_df: int = 2,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k tokens by Gini-impurity gain of their presence split
    against the label — the DECISION-TREE split criterion beside
    :func:`chi2_tokens`' significance ranking (χ² asks "is the
    association real?", Gini gain asks "how much purer would the
    corpus be if we split on this token?" — the two rankings disagree
    exactly on rare-but-perfect separators, which is why a curation
    pipeline wants both):

        gain = G(labels) − (n_p·G(present) + n_a·G(absent))/N
        G(·) = 1 − Σ (share)²

    in integer ppm with ONE declared floor per branch impurity
    ((Σc²·10⁶) DIV n² — the anova_oneway discipline; every operand
    stays ≤ N²·10⁶ in DECIMAL(38)/HUGEINT, so the form is exact at
    ANY corpus size — no N⁴ cleared product) plus one floor for the weighted average;
    gain clamped at 0 (the ≤3 independent floors can push an
    exactly-zero gain a few ppm negative).  Σa² comes from the
    identity Σ(C_l−p_l)² = ΣC² − 2ΣC_l·p_l + Σp² — absent-branch
    label counts are never densified.  Tokens present in EVERY doc
    split nothing: gain 0 by the same formula (n_a = 0 branch
    contributes nothing, declared).

    Plan shape: per-doc array_distinct presence → one map-side
    (label, token) aggregation → one token aggregation (label sizes
    broadcast into it) → global top-k via orderBy+limit
    (TakeOrderedAndProject — no single-partition window), ties broken
    (gain DESC, token ASC).

    Returns (token, df_t, gain_ppm)."""
    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        )
    )
    pres = (
        docs.select(
            F.col(label_col).alias("lbl"),
            F.explode(toks).alias("token"),
        )
        .groupBy("lbl", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pl"))
    )
    sizes = docs.groupBy(F.col(label_col).alias("lbl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cl")
    )
    tot = sizes.agg(
        F.sum("cl").cast("bigint").alias("n"),
        F.sum(F.expr("cl * cl")).cast("bigint").alias("sc2"),
    )
    per_tok = (
        pres.join(F.broadcast(sizes), "lbl")
        .groupBy("token")
        .agg(
            F.sum("pl").cast("bigint").alias("np"),
            F.sum(F.expr("pl * pl")).cast("bigint").alias("sp2"),
            F.sum(F.expr("cl * pl")).cast("bigint").alias("scp"),
        )
        .crossJoin(F.broadcast(tot))
        .where(F.col("np") >= int(min_df))
    )
    g = per_tok.select(
        "token",
        F.col("np").alias("df_t"),
        F.expr(
            """
            CAST(greatest(0,
                (1000000 - (CAST(sc2 AS DECIMAL(38,0)) * 1000000)
                           DIV (CAST(n AS DECIMAL(38,0)) * n))
                - (  np * (1000000 -
                        (CAST(sp2 AS DECIMAL(38,0)) * 1000000)
                        DIV (CAST(np AS DECIMAL(38,0)) * np))
                   + CASE WHEN n - np = 0 THEN 0
                     ELSE (n - np) * (1000000 -
                        (CAST(sc2 - 2 * scp + sp2 AS DECIMAL(38,0))
                         * 1000000)
                        DIV (CAST(n - np AS DECIMAL(38,0))
                             * (n - np)))
                     END
                  ) DIV n
            ) AS BIGINT)
            """
        ).alias("gain_ppm"),
    )
    return g.orderBy(
        F.col("gain_ppm").desc(), F.col("token").asc()
    ).limit(int(k))


def gini_gain_tokens_sql(
    src: str,
    k: int = 25,
    min_df: int = 2,
    label_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`gini_gain_tokens` — identical presence
    model, per-branch floors, clamp, and (gain DESC, token ASC)
    top-k.  Standalone."""
    return f"""
        WITH gg_pres AS (
            SELECT {label_col} AS lbl, token,
                   CAST(COUNT(*) AS BIGINT) AS pl
            FROM (
                SELECT {label_col}, unnest(list_distinct(list_filter(
                    string_split_regex(lower({text_col}), '\\s+'),
                    x -> x <> ''))) AS token
                FROM {src}
            ) GROUP BY 1, 2
        ),
        gg_sizes AS (
            SELECT {label_col} AS lbl,
                   CAST(COUNT(*) AS BIGINT) AS cl
            FROM {src} GROUP BY 1
        ),
        gg_tot AS (
            SELECT CAST(SUM(cl) AS BIGINT) AS n,
                   CAST(SUM(cl * cl) AS BIGINT) AS sc2
            FROM gg_sizes
        ),
        gg_tok AS (
            SELECT p.token,
                   CAST(SUM(p.pl) AS BIGINT) AS np,
                   CAST(SUM(p.pl * p.pl) AS BIGINT) AS sp2,
                   CAST(SUM(s.cl * p.pl) AS BIGINT) AS scp
            FROM gg_pres p JOIN gg_sizes s USING (lbl)
            GROUP BY 1
            HAVING SUM(p.pl) >= {int(min_df)}
        )
        SELECT token, np AS df_t,
               CAST(GREATEST(0,
                   (1000000 - (CAST(sc2 AS HUGEINT) * 1000000)
                              // (CAST(n AS HUGEINT) * n))
                   - (  np * (1000000 -
                           (CAST(sp2 AS HUGEINT) * 1000000)
                           // (CAST(np AS HUGEINT) * np))
                      + CASE WHEN n - np = 0 THEN 0
                        ELSE (n - np) * (1000000 -
                           (CAST(sc2 - 2 * scp + sp2 AS HUGEINT)
                            * 1000000)
                           // (CAST(n - np AS HUGEINT) * (n - np)))
                        END
                     ) // n
               ) AS BIGINT) AS gain_ppm
        FROM gg_tok, gg_tot
        ORDER BY gain_ppm DESC, token ASC
        LIMIT {int(k)}
    """


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
    min_len: int = 4,
    iterations: int = 6,
    damping_pct: int = 85,
    k: int = 25,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — corpus
    keywords as PageRank over the token CO-OCCURRENCE graph, the
    graph-structural counterweight to tfidf_topk's frequency view
    (TF-IDF scores a token by rarity; TextRank scores it by how
    central it sits among the tokens it travels with, so a
    mid-frequency hub term can outrank a rare-but-isolated one).

    Graph construction, declared exactly: tokens are lowercased
    whitespace splits with RAW positions (the window is measured on
    the original sequence); candidates keep length ≥ ``min_len``
    (the deterministic stand-in for the reference algorithm's POS
    filter); an undirected unweighted edge links two distinct
    surviving tokens whenever they co-occur within ``window`` raw
    positions in any document.  Ranks come from
    :func:`graph.pagerank_quantized` — exact quantized int64 after a
    fixed round count, so the whole composition hash-verifies.

    Scale: the co-occurrence build is offset-explode + equi-join on
    (doc, position) — fan-out ≤ ``window`` per token, NEVER the
    per-document quadratic self-join (a 10⁵-token page would
    otherwise emit 10¹⁰ pairs before any filter); edges dedupe once
    corpus-wide.  PageRank is 2 shuffles/round on the pre-partitioned
    edge list.  The final cut is a total-order ORDER BY
    (rank_q DESC, token) LIMIT k — no unpartitioned window.

    Returns ≤ k rows: (token, rank_q)."""
    from .graph import pagerank_quantized

    if not 1 <= int(window) <= 16:
        raise ValueError(f"window must be in [1, 16]: {window}")
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("_p", "_t"),
    ).where(
        (F.col("_t") != "") & (F.length("_t") >= int(min_len))
    )
    left = toks.select(
        "_d",
        F.col("_p").alias("_pa"),
        F.col("_t").alias("_ts"),
        F.explode(F.expr(f"sequence(1, {int(window)})")).alias("_o"),
    ).select(
        "_d", (F.col("_pa") + F.col("_o")).alias("_p"), "_ts"
    )
    pair = (
        left.join(toks, ["_d", "_p"])
        .where(F.col("_ts") != F.col("_t"))
        .select(F.col("_ts").alias("_s"), F.col("_t").alias("_x"))
        .distinct()
    )
    edges = (
        pair.select(F.col("_s").alias("src"), F.col("_x").alias("dst"))
        .unionAll(
            pair.select(
                F.col("_x").alias("src"), F.col("_s").alias("dst")
            )
        )
        .distinct()
    )
    nodes = toks.select(F.col("_t").alias("node")).distinct()
    pr = pagerank_quantized(
        nodes, edges, iterations=int(iterations),
        damping_pct=int(damping_pct),
    )
    return (
        pr.orderBy(F.desc("rank_q"), "node")
        .limit(int(k))
        .select(F.col("node").alias("token"), "rank_q")
    )


def textrank_keywords_sql(
    src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
    min_len: int = 4,
    iterations: int = 6,
    damping_pct: int = 85,
    k: int = 25,
) -> str:
    """DuckDB twin of :func:`textrank_keywords` — identical
    tokenization (string_split_regex over the house '\\s+' twin),
    identical raw-position window edges, and the UNMODIFIED
    :func:`graph.pagerank_sql` recurrence spliced over MATERIALIZED
    token/edge CTEs (tr_tok is read by both join sides — plain-CTE
    inlining would re-explode the corpus per reference).
    Standalone."""
    from .graph import pagerank_sql

    ctes = f"""tr_tok AS MATERIALIZED (
            SELECT _d, u.i AS _p, ts[u.i] AS _t
            FROM (SELECT {id_col} AS _d,
                         string_split_regex(lower({text_col}),
                                            '\\s+') AS ts
                  FROM {src}) b,
                 LATERAL (SELECT UNNEST(range(1, len(ts) + 1)) AS i) u
            WHERE ts[u.i] <> '' AND length(ts[u.i]) >= {int(min_len)}
        ),
        tr_pair AS MATERIALIZED (
            SELECT DISTINCT a._t AS _s, b._t AS _x
            FROM tr_tok a
            JOIN tr_tok b ON b._d = a._d
                 AND b._p > a._p AND b._p <= a._p + {int(window)}
                 AND b._t <> a._t
        ),
        tr_eg AS MATERIALIZED (
            SELECT _s AS src, _x AS dst FROM tr_pair
            UNION
            SELECT _x, _s FROM tr_pair
        ),
        tr_nd AS MATERIALIZED (
            SELECT DISTINCT _t AS node FROM tr_tok
        )"""
    inner = pagerank_sql(
        "tr_nd", "tr_eg", iterations=int(iterations),
        damping_pct=int(damping_pct),
    )
    stripped = inner.lstrip()
    assert stripped.startswith("WITH ")
    inner = "WITH " + ctes + ",\n" + stripped[len("WITH "):]
    return f"""
        SELECT node AS token, rank_q
        FROM ({inner})
        ORDER BY rank_q DESC, token LIMIT {int(k)}
    """


def text_tiles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_tokens: int = 20,
    thr_num: int = 4,
    thr_den: int = 5,
) -> DataFrame:
    """TextTiling topic segmentation (Hearst 1997) — WHERE does a
    document change subject?  The intra-document boundary detector
    of the chunking pipeline (chunk_documents cuts by SIZE; this
    cuts by TOPIC, so a chunk never straddles a subject change):

        block b = tokens [b·w, (b+1)·w)      (tail dropped, stated)
        sim(g)  = dot²·10⁶ DIV (‖a‖²·‖b‖²)   (squared cosine of the
                  adjacent blocks' term-count vectors — the √-free
                  exact form, cross-multiplied)
        boundary(g) ⟺ sim(g) strictly below BOTH neighbours
                      ∧ sim(g)·n_gaps·thr_den < thr_num·Σsim

    (a valley that is also below thr_num/thr_den × the document's
    own mean gap similarity — Hearst's depth cut reduced to its
    exact-integer core; documents with < 3 gaps have no interior
    valley and emit nothing).

    Exact integers end-to-end: counts are integers, dot² ≤
    (w²)²·10⁶ rides decimal(38)/HUGEINT; zero-overlap gaps score 0
    (a shared-vocabulary-free cut is the strongest boundary).

    Plan: one posexplode, one (doc, block, token) count, one
    (doc, token)-keyed self-join of ADJACENT blocks for the dot
    (never block×block), one (doc)-keyed gap window for the valley
    test.  Returns boundary rows: (doc, gap_idx, sim_ppm) — a
    boundary after block gap_idx."""
    if block_tokens < 2:
        raise ValueError(f"block_tokens must be >= 2: {block_tokens}")
    if thr_num < 0 or thr_den < 1:
        raise ValueError(
            f"need thr_num >= 0, thr_den >= 1: {thr_num}/{thr_den}"
        )
    w = int(block_tokens)
    toks = docs.select(
        F.col(id_col).alias("_d"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("_p", "_t"),
    )
    nblk = toks.groupBy("_d").agg(
        F.expr(f"CAST(COUNT(*) DIV {w} AS INT)").alias("_nb")
    )
    counts = (
        toks.withColumn("_b", F.expr(f"CAST(_p DIV {w} AS INT)"))
        .join(nblk, "_d")
        .where(F.col("_b") < F.col("_nb"))
        .groupBy("_d", "_b", "_t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
        .localCheckpoint(eager=True)
    )
    norms = counts.groupBy("_d", "_b").agg(
        F.sum(F.expr("CAST(_c AS DECIMAL(38,0)) * _c")).alias("_n2")
    )
    dots = (
        counts.alias("a")
        .join(
            counts.select(
                F.col("_d"),
                (F.col("_b") - 1).alias("_b"),
                F.col("_t"),
                F.col("_c").alias("_cb"),
            ).alias("b"),
            ["_d", "_b", "_t"],
        )
        .groupBy("_d", "_b")
        .agg(
            F.sum(
                F.expr("CAST(_c AS DECIMAL(38,0)) * _cb")
            ).alias("_dot")
        )
    )
    gaps = (
        norms.alias("na")
        .join(
            norms.select(
                F.col("_d"), (F.col("_b") - 1).alias("_b"),
                F.col("_n2").alias("_n2b"),
            ).alias("nb"),
            ["_d", "_b"],
        )
        .join(dots, ["_d", "_b"], "left")
        .select(
            "_d",
            F.col("_b").alias("gap_idx"),
            F.expr(
                "CAST((COALESCE(_dot, 0) * COALESCE(_dot, 0) "
                "* 1000000) DIV (_n2 * _n2b) AS BIGINT)"
            ).alias("sim_ppm"),
        )
    )
    from pyspark.sql import Window as W

    gw = W.partitionBy("_d").orderBy("gap_idx")
    tot = gaps.groupBy("_d").agg(
        F.sum("sim_ppm").alias("_tot"),
        F.count(F.lit(1)).alias("_ng"),
    )
    return (
        gaps.withColumn("_lhs", F.lag("sim_ppm").over(gw))
        .withColumn("_rhs", F.lead("sim_ppm").over(gw))
        .join(tot, "_d")
        .where(
            F.col("_lhs").isNotNull()
            & F.col("_rhs").isNotNull()
            & (F.col("sim_ppm") < F.col("_lhs"))
            & (F.col("sim_ppm") < F.col("_rhs"))
            & (
                F.col("sim_ppm") * F.col("_ng") * F.lit(int(thr_den))
                < F.lit(int(thr_num)) * F.col("_tot")
            )
        )
        .select(F.col("_d").alias(id_col), "gap_idx", "sim_ppm")
    )


def text_tiles_sql(
    src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_tokens: int = 20,
    thr_num: int = 4,
    thr_den: int = 5,
) -> str:
    """DuckDB twin of :func:`text_tiles` — identical tokenization
    (the house string_split_regex twin), block counts, adjacent
    dot/norm algebra, and valley + cross-multiplied mean cut.
    Standalone."""
    w = int(block_tokens)
    return f"""
        WITH tt_tok AS MATERIALIZED (
            SELECT _d, u.i - 1 AS _p, ts[u.i] AS _t
            FROM (SELECT {id_col} AS _d,
                         string_split_regex(lower({text_col}),
                                            '\\s+') AS ts
                  FROM {src}) b,
                 LATERAL (SELECT UNNEST(range(1, len(ts) + 1)) AS i) u
            WHERE ts[u.i] <> ''
        ),
        tt_pos AS MATERIALIZED (
            SELECT _d, _t,
                   ROW_NUMBER() OVER (PARTITION BY _d
                                      ORDER BY _p) - 1 AS _rp
            FROM tt_tok
        ),
        tt_nb AS (
            SELECT _d, CAST(COUNT(*) // {w} AS INT) AS _nb
            FROM tt_pos GROUP BY 1
        ),
        tt_cnt AS MATERIALIZED (
            SELECT p._d, CAST(p._rp // {w} AS INT) AS _b, p._t,
                   CAST(COUNT(*) AS BIGINT) AS _c
            FROM tt_pos p JOIN tt_nb n USING (_d)
            WHERE p._rp // {w} < n._nb
            GROUP BY 1, 2, 3
        ),
        tt_norm AS MATERIALIZED (
            SELECT _d, _b, SUM(CAST(_c AS HUGEINT) * _c) AS _n2
            FROM tt_cnt GROUP BY 1, 2
        ),
        tt_dot AS (
            SELECT a._d, a._b,
                   SUM(CAST(a._c AS HUGEINT) * b._c) AS _dot
            FROM tt_cnt a
            JOIN tt_cnt b ON b._d = a._d AND b._b = a._b + 1
                         AND b._t = a._t
            GROUP BY 1, 2
        ),
        tt_gap AS MATERIALIZED (
            SELECT na._d, na._b AS gap_idx,
                   CAST((COALESCE(d._dot, 0) * COALESCE(d._dot, 0)
                        * 1000000) // (na._n2 * nb._n2) AS BIGINT)
                       AS sim_ppm
            FROM tt_norm na
            JOIN tt_norm nb ON nb._d = na._d AND nb._b = na._b + 1
            LEFT JOIN tt_dot d ON d._d = na._d AND d._b = na._b
        ),
        tt_tot AS (
            SELECT _d, SUM(sim_ppm) AS _tot, COUNT(*) AS _ng
            FROM tt_gap GROUP BY 1
        )
        SELECT g._d AS {id_col}, g.gap_idx, g.sim_ppm
        FROM (
            SELECT *,
                   LAG(sim_ppm) OVER (PARTITION BY _d
                                      ORDER BY gap_idx) AS _lhs,
                   LEAD(sim_ppm) OVER (PARTITION BY _d
                                       ORDER BY gap_idx) AS _rhs
            FROM tt_gap
        ) g JOIN tt_tot t USING (_d)
        WHERE g._lhs IS NOT NULL AND g._rhs IS NOT NULL
          AND g.sim_ppm < g._lhs AND g.sim_ppm < g._rhs
          AND g.sim_ppm * t._ng * {int(thr_den)}
              < {int(thr_num)} * t._tot
    """
