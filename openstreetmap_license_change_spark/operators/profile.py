"""Column profiling — the schema-audit rollup.

Reference analogue: the reference's loaders assert shape ad hoc
(handlers drop malformed rows silently); a 10¹²-row ingest instead
runs a PROFILE pass first and gates the load on it: per column the
null share, distinct cardinality, and value range, as one long-form
table a diff can track across snapshots ("lang nulls jumped 40×" is a
crawler regression caught before training, not after).

One scan: every column's aggregates live in a single agg() row —
Spark plans multi-column count(DISTINCT) with one Expand, so the cost
is one pass plus one shuffle — then the row unpivots to long form
with a stack() projection.  min/max aggregate on the NATIVE type
(lexicographic for strings, numeric for ints) and cast to string only
for the unified output schema.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form profile of ``cols``: one output row per column with
    (column, n_rows, n_null, n_distinct, min_value, max_value) —
    n_distinct EXACT and excluding NULLs (the SQL COUNT(DISTINCT)
    convention), min/max as strings of the native-type extremes,
    NULL on all-null columns.

    Swap :func:`~.sketches.hll_distinct` in for n_distinct when exact
    per-column cardinalities are too hot at full scale; this operator
    is the exact gate."""
    cols = list(cols)
    if not cols:
        raise ValueError("column_profile: need at least one column")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count_if(F.col(c).isNull()).alias(f"_null_{i}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{i}"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _null_{i}, _dist_{i}, _min_{i}, _max_{i}"
        for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_value, max_value)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_null", "n_distinct",
        "min_value", "max_value",
    )


def column_profile_sql(src: str, cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`column_profile` — one aggregate row, one
    UNNEST-free unpivot via UNION ALL of constant projections."""
    cols = list(cols)
    selects = []
    for c in cols:
        selects.append(f"""
            SELECT '{c}' AS column,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) FILTER ({c} IS NULL) AS BIGINT)
                       AS n_null,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(MIN({c}) AS VARCHAR) AS min_value,
                   CAST(MAX({c}) AS VARCHAR) AS max_value
            FROM {src}
        """)
    return " UNION ALL ".join(selects)


def mad_outliers(
    rows: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    threshold_ppm: int = 3_500_000,
) -> DataFrame:
    """Robust per-group outlier flags via the exact median/MAD pair —
    the curation filter mean/stddev can't be trusted for (a handful
    of 100 MB documents move a mean arbitrarily; the median ignores
    them): a row is an outlier iff

        |x − median| · 10⁶  >  threshold_ppm · MAD

    with median = the LOWER nearest-rank median (the value at rank
    ⌈n/2⌉ = (n+1) DIV 2 — exact, no interpolation, declared) and
    MAD = the same median of |x − median|.  The comparison is
    CROSS-MULTIPLIED (the tile_hotspots discipline): no division, no
    float z-scores, engine-exact; threshold_ppm = 3 500 000 means
    "3.5 raw MADs" (multiply by 1.4826 yourself if you want
    σ-equivalents — presentation-layer, not engine).  MAD = 0 (at
    least half the group identical) degenerates gracefully: ANY
    deviation flags, which is the right robust answer.

    Physical plan: two group-keyed window passes (rank the values,
    rank the deviations — each one shuffle on the group key, no
    global window), medians joined back broadcast-style by group.
    Wide products ride decimal(38,0)/HUGEINT (|x−med|·10⁶ at
    x ~ 10¹² would clip int64).

    Output: one row per input row —
    (group, id, value, med, mad, is_outlier)."""
    from pyspark.sql import Window as W

    base = rows.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("rid"),
        F.col(value_col).cast("bigint").alias("x"),
    )

    def _median_of(df: DataFrame, col: str) -> DataFrame:
        w = W.partitionBy("grp").orderBy(col)
        ranked = df.select(
            "grp",
            F.col(col),
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(W.partitionBy("grp")).alias("_n"),
        )
        return ranked.where(
            F.expr("_rn = (_n + 1) DIV 2")
        ).select("grp", F.col(col).alias("_med"))

    med = _median_of(base, "x").withColumnRenamed("_med", "med")
    dev = base.join(med, "grp").withColumn(
        "adev", F.abs(F.col("x") - F.col("med"))
    )
    mad = (
        _median_of(dev.select("grp", F.col("adev").alias("x")), "x")
        .withColumnRenamed("_med", "mad")
    )
    dec = "decimal(38,0)"
    return (
        dev.join(mad, "grp")
        .select(
            F.col("grp").alias(group_col),
            F.col("rid").alias(id_col),
            F.col("x").alias(value_col),
            "med",
            "mad",
            (
                F.expr(f"CAST(adev AS {dec}) * 1000000")
                > F.expr(f"CAST({int(threshold_ppm)} AS {dec}) * mad")
            ).alias("is_outlier"),
        )
    )


def mad_outliers_sql(
    src: str,
    group_col: str,
    id_col: str,
    value_col: str,
    threshold_ppm: int = 3_500_000,
) -> str:
    """DuckDB twin of :func:`mad_outliers` (same nearest-rank
    medians, HUGEINT cross-multiplied flag)."""
    return f"""
        WITH mo_base AS (
            SELECT {group_col} AS grp, {id_col} AS rid,
                   CAST({value_col} AS BIGINT) AS x
            FROM {src}
        ),
        mo_r1 AS (
            SELECT grp, x,
                   ROW_NUMBER() OVER (PARTITION BY grp ORDER BY x)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY grp) AS n
            FROM mo_base
        ),
        mo_med AS (
            SELECT grp, x AS med FROM mo_r1 WHERE rn = (n + 1) // 2
        ),
        mo_dev AS (
            SELECT b.grp, b.rid, b.x, m.med, ABS(b.x - m.med) AS adev
            FROM mo_base b JOIN mo_med m USING (grp)
        ),
        mo_r2 AS (
            SELECT grp, adev,
                   ROW_NUMBER() OVER (PARTITION BY grp ORDER BY adev)
                       AS rn,
                   COUNT(*) OVER (PARTITION BY grp) AS n
            FROM mo_dev
        ),
        mo_mad AS (
            SELECT grp, adev AS mad FROM mo_r2 WHERE rn = (n + 1) // 2
        )
        SELECT d.grp AS {group_col}, d.rid AS {id_col},
               d.x AS {value_col}, d.med, a.mad,
               CAST(d.adev AS HUGEINT) * 1000000
                   > CAST({int(threshold_ppm)} AS HUGEINT) * a.mad
                   AS is_outlier
        FROM mo_dev d JOIN mo_mad a USING (grp)
    """


def cube_rollup(
    df: DataFrame,
    dims: Sequence[str],
    count_alias: str = "n_rows",
    sum_col: str | None = None,
    sum_alias: str = "sum_value",
) -> DataFrame:
    """All 2^|dims| grouping combinations in ONE pass — the
    warehouse CUBE a dashboard reads without re-scanning per
    breakdown (total, per-dim marginals, full cross).  grp_id is the
    standard grouping bitmask (bit set ⇔ that dim is AGGREGATED;
    leftmost dim = most significant bit — Spark's grouping_id() and
    DuckDB's GROUPING() agree on this convention, which the twin
    hash-verifies rather than assumes).

    Scale: Spark plans CUBE as one Expand (×2^|dims| row replication
    BEFORE the partial agg — each replica map-side-combines into its
    own tiny group space), so the shuffle carries ~2^|dims| ×
    |distinct groups| rows, not ×|input|.  |dims| is capped at 6
    loudly: past that the Expand fan (64×) is the dominant cost and
    the multires-rollup pattern (aggregate finest, re-aggregate
    upward — see tile_rollup_multires) wins instead; that tradeoff is
    the documented reason GROUPING SETS was rejected there.

    NULL dimension VALUES would be indistinguishable from CUBE's
    aggregated-slot NULLs in the output (the classic CUBE ambiguity);
    rows with a NULL in any dim fail loud via an assert riding the
    count column rather than silently merging into the marginals.

    Returns (dims…, grp_id, n_rows[, sum_value])."""
    dims = list(dims)
    if not 1 <= len(dims) <= 6:
        raise ValueError(f"1..6 cube dims required, got {len(dims)}")
    guard = (
        F.when(
            sum(F.col(d).isNull().cast("int") for d in dims) > 0,
            F.assert_true(
                F.lit(False), F.lit("cube_rollup: NULL dimension value")
            ).cast("int"),
        )
        .otherwise(F.lit(0))
    )
    aggs = [
        F.grouping_id().alias("grp_id"),
        (F.count(F.lit(1)) + F.coalesce(F.sum(guard), F.lit(0)))
        .cast("bigint").alias(count_alias),
    ]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).cast("bigint").alias(sum_alias))
    return df.cube(*dims).agg(*aggs)


def cube_rollup_sql(
    src: str,
    dims: Sequence[str],
    count_alias: str = "n_rows",
    sum_col: str | None = None,
    sum_alias: str = "sum_value",
) -> str:
    """DuckDB twin of :func:`cube_rollup` (standalone).  GROUPING()
    with the same leftmost-MSB bit order (probed: rightmost dim is
    the LSB on both engines); the NULL-dim guard is an error() CASE
    arm SUMMED INTO the count column — DuckDB's `1//0` is silently
    NULL and a standalone guard column would be optimizer-pruned, so
    the guard must ride a used aggregate, exactly like the Spark
    side's assert riding count."""
    dims = list(dims)
    dl = ", ".join(dims)
    nullcheck = " + ".join(
        f"CASE WHEN {d} IS NULL THEN 1 ELSE 0 END" for d in dims
    )
    sumsel = (
        f",\n               CAST(SUM({sum_col}) AS BIGINT) AS {sum_alias}"
        if sum_col is not None
        else ""
    )
    return f"""
        SELECT {dl},
               CAST(GROUPING({dl}) AS BIGINT) AS grp_id,
               CAST(COUNT(*) + SUM(CASE WHEN {nullcheck} > 0
                   THEN error('cube_rollup: NULL dimension value')
                   ELSE 0 END) AS BIGINT) AS {count_alias}{sumsel}
        FROM {src}
        GROUP BY CUBE ({dl})
    """


# log10(1 + 1/d) in ppm, d = 1..9 — the Benford expectation (declared
# constants; they sum to exactly 10⁶)
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181,
               66947, 57992, 51153, 45757)

assert sum(BENFORD_PPM) == 1_000_000


def benford_profile(
    rows: DataFrame,
    slice_col: str,
    value_col: str,
) -> DataFrame:
    """First-significant-digit profile per slice vs Benford's law —
    the forensic audit for any positive count-like column (synthetic
    or templated data rarely survives it; organically-growing counts
    usually do).  Output is DENSE: all nine digits per slice (zero
    counts included — a missing digit is the strongest possible
    signal and must appear as a row, not an absence), with

        obs_ppm = (n_digit·10⁶) DIV n_total          (one floor)
        dev_ppm = obs_ppm − exp_ppm                  (signed)
        tvd_ppm = (Σ_d |dev_ppm|) DIV 2              (per slice)

    against the declared log10(1+1/d) ppm constants.  Non-positive
    values can't carry a first significant digit; they are excluded
    and COUNTED (n_excluded per slice — never silent).  The first
    digit comes from the engine-portable decimal rendering of a
    BIGINT (both engines print integers identically; no float ever
    enters).

    Physical plan: one (slice, digit) hash aggregation, re-aggregated
    per slice, dense 9-digit grid via explode(sequence) on the TINY
    per-slice row, left join of counts back, one 9-row window for the
    TVD.  Everything after the first aggregation is 9·|slices|-sized.

    Output: (slice, digit, n_digit, n_total, n_excluded, obs_ppm,
    exp_ppm, dev_ppm, tvd_ppm)."""
    from pyspark.sql import Window as W

    base = rows.select(
        F.col(slice_col).alias("sl"),
        F.col(value_col).cast("bigint").alias("y"),
    )
    cnt = (
        base.where(F.col("y") > 0)
        .select(
            "sl",
            F.substring(F.col("y").cast("string"), 1, 1)
            .cast("int").alias("digit"),
        )
        .groupBy("sl", "digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_digit"))
    )
    tot = base.groupBy("sl").agg(
        F.sum(F.when(F.col("y") > 0, 1).otherwise(0))
        .cast("bigint").alias("n_total"),
        F.sum(F.when((F.col("y") <= 0) | F.col("y").isNull(), 1)
              .otherwise(0)).cast("bigint").alias("n_excluded"),
    )
    exp_arr = "array({})".format(
        ", ".join(str(v) for v in BENFORD_PPM)
    )
    grid = tot.select(
        "sl", "n_total", "n_excluded",
        F.explode(F.expr("sequence(1, 9)")).alias("digit"),
    )
    j = (
        grid.join(cnt, ["sl", "digit"], "left")
        .withColumn("n_digit", F.coalesce("n_digit", F.lit(0)))
        .withColumn(
            "obs_ppm",
            F.when(F.col("n_total") > 0,
                   F.expr("(n_digit * 1000000) DIV n_total")),
        )
        .withColumn("exp_ppm",
                    F.expr(f"element_at({exp_arr}, digit)")
                    .cast("bigint"))
        .withColumn("dev_ppm", F.col("obs_ppm") - F.col("exp_ppm"))
    )
    return j.withColumn(
        "tvd_ppm",
        F.expr(
            "CAST(sum(abs(dev_ppm)) OVER (PARTITION BY sl) "
            "DIV 2 AS BIGINT)"
        ),
    ).select(
        F.col("sl").alias(slice_col),
        "digit", "n_digit", "n_total", "n_excluded",
        "obs_ppm", "exp_ppm", "dev_ppm", "tvd_ppm",
    )


def benford_profile_sql(
    src: str, slice_col: str, value_col: str
) -> str:
    """DuckDB twin of :func:`benford_profile` — identical dense grid,
    string-rendered first digit, floored obs_ppm, window TVD.
    Standalone."""
    exp_list = ", ".join(str(v) for v in BENFORD_PPM)
    return f"""
        WITH bf_base AS (
            SELECT {slice_col} AS sl,
                   CAST({value_col} AS BIGINT) AS y
            FROM {src}
        ),
        bf_cnt AS (
            SELECT sl,
                   CAST(substr(CAST(y AS VARCHAR), 1, 1) AS INTEGER)
                       AS digit,
                   CAST(COUNT(*) AS BIGINT) AS n_digit
            FROM bf_base WHERE y > 0 GROUP BY 1, 2
        ),
        bf_tot AS (
            SELECT sl,
                   CAST(SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN y <= 0 OR y IS NULL
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_excluded
            FROM bf_base GROUP BY 1
        ),
        bf_grid AS (
            SELECT t.sl, t.n_total, t.n_excluded, d.digit
            FROM bf_tot t, (SELECT unnest(range(1, 10)) AS digit) d
        ),
        bf_j AS (
            SELECT g.sl, CAST(g.digit AS INTEGER) AS digit,
                   COALESCE(c.n_digit, 0) AS n_digit,
                   g.n_total, g.n_excluded,
                   CASE WHEN g.n_total > 0 THEN
                       (COALESCE(c.n_digit, 0) * 1000000) // g.n_total
                   END AS obs_ppm,
                   CAST([{exp_list}][g.digit] AS BIGINT) AS exp_ppm
            FROM bf_grid g LEFT JOIN bf_cnt c
              ON c.sl = g.sl AND c.digit = g.digit
        )
        SELECT sl AS {slice_col}, digit, n_digit, n_total, n_excluded,
               obs_ppm, exp_ppm,
               obs_ppm - exp_ppm AS dev_ppm,
               CAST(SUM(ABS(obs_ppm - exp_ppm)) OVER
                        (PARTITION BY sl) // 2 AS BIGINT) AS tvd_ppm
        FROM bf_j
    """


def quantile_normalize(
    rows: DataFrame,
    slice_col: str,
    id_col: str,
    value_col: str,
    q_bins: int = 20,
) -> DataFrame:
    """Cross-slice quantile-normalization mapping table — the feature
    -prep transform that makes a score comparable ACROSS slices by
    replacing each slice's value scale with a shared reference
    distribution (the bioinformatics/array-normalization classic,
    here for per-language quality scores whose raw scales differ):

        slice s's q-th grid quantile  v_s[q] = value at nearest rank
                                      r = ⌈q·n_s/Q⌉   (exact integer)
        reference                     ref[q] = ⌊mean_s v_s[q]⌋
                                      (one sign-decomposed floor)

    A row in slice s whose within-slice percentile falls in bin q is
    re-scored to ref[q]; this emits the (slice, q) MAPPING TABLE —
    the small, verifiable artifact — rather than re-materializing the
    corpus (apply is a broadcast join downstream).

    Ranks use the TOTAL order (value, id): duplicate values rank
    deterministically.  Slices smaller than Q simply repeat rows
    across grid points (nearest-rank, stated).

    Plan: one slice-keyed window pass (row_number + count), the
    Q-point grid exploded from the TINY per-slice row, an equi-join
    on the computed nearest rank, one Q-sized reference aggregation
    joined back — everything after the window is Q·|slices|-bounded.

    Returns (slice, q, q_value, ref_value)."""
    from pyspark.sql import Window as W

    if q_bins < 1:
        raise ValueError(f"q_bins must be ≥ 1: {q_bins}")
    ranked = rows.select(
        F.col(slice_col).alias("sl"),
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("bigint").alias("v"),
    ).select(
        "sl", "v",
        F.row_number().over(
            W.partitionBy("sl").orderBy("v", "_id")
        ).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("sl")).alias("n_s"),
    )
    grid = (
        ranked.groupBy("sl").agg(F.max("n_s").alias("n_s"))
        .select(
            "sl", "n_s",
            F.explode(F.expr(f"sequence(1, {int(q_bins)})")).alias("q"),
        )
        .withColumn(
            "r",
            F.expr(f"(q * n_s + {int(q_bins)} - 1) DIV {int(q_bins)}"),
        )
    )
    grid = grid.select(
        F.col("sl").alias("_gsl"), "q", "r"
    )
    quants = grid.join(
        ranked,
        (F.col("_gsl") == ranked.sl) & (F.col("r") == ranked.rn),
    ).select(
        F.col("_gsl").alias("slice_"), "q",
        F.col("v").alias("q_value"),
    )
    ref = quants.groupBy("q").agg(
        F.sum(F.col("q_value").cast("decimal(38,0)")).alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    ).select(
        "q",
        F.expr(
            "CAST(CASE WHEN _s < 0 THEN -((-_s) DIV _n) "
            "ELSE _s DIV _n END AS BIGINT)"
        ).alias("ref_value"),
    )
    return quants.join(ref, "q").select(
        F.col("slice_").alias(slice_col), "q", "q_value", "ref_value"
    )


def quantile_normalize_sql(
    src: str,
    slice_col: str,
    id_col: str,
    value_col: str,
    q_bins: int = 20,
) -> str:
    """DuckDB twin of :func:`quantile_normalize` — identical
    nearest-rank grid, (value, id) total order, sign-decomposed
    reference floor.  Standalone."""
    q = int(q_bins)
    return f"""
        WITH qn_ranked AS (
            SELECT {slice_col} AS sl,
                   CAST({value_col} AS BIGINT) AS v,
                   ROW_NUMBER() OVER (PARTITION BY {slice_col}
                       ORDER BY CAST({value_col} AS BIGINT),
                                {id_col}) AS rn,
                   COUNT(*) OVER (PARTITION BY {slice_col}) AS n_s
            FROM {src}
        ),
        qn_grid AS (
            SELECT sl, n_s, g.q,
                   (g.q * n_s + {q} - 1) // {q} AS r
            FROM (SELECT sl, MAX(n_s) AS n_s FROM qn_ranked
                  GROUP BY 1) t,
                 (SELECT UNNEST(range(1, {q} + 1)) AS q) g
        ),
        qn_quants AS (
            SELECT g.sl, g.q, r.v AS q_value
            FROM qn_grid g
            JOIN qn_ranked r ON r.sl = g.sl AND r.rn = g.r
        ),
        qn_ref AS (
            SELECT q,
                   CAST(CASE WHEN SUM(CAST(q_value AS HUGEINT)) < 0
                     THEN -((-SUM(CAST(q_value AS HUGEINT)))
                            // COUNT(*))
                     ELSE SUM(CAST(q_value AS HUGEINT)) // COUNT(*)
                   END AS BIGINT) AS ref_value
            FROM qn_quants GROUP BY 1
        )
        SELECT s.sl AS {slice_col}, s.q, s.q_value, r.ref_value
        FROM qn_quants s JOIN qn_ref r USING (q)
    """


def trimmed_mean(
    rows: DataFrame,
    group_col: str,
    value_col: str,
    trim_ppm: int = 100_000,
) -> DataFrame:
    """Per-group trimmed mean — the robust LOCATION estimate between
    the mean (wrecked by one 100 MB document) and the median (throws
    away everything but one rank): drop the lowest and highest
    ``trim_ppm`` fraction by NEAREST RANK and average the rest
    exactly.

    Trim bounds (stated): with n rows, k = (n·trim_ppm) DIV 10⁶ rows
    are dropped from EACH side (nearest-rank floor — never a
    fractional-weight interpolation, so the kept multiset is
    integer-exact and engine-identical); n − 2k ≤ 0 can't happen for
    trim_ppm < 500 000, which the operator validates loudly.  Kept
    mean ships as one sign-decomposed trunc division of exact sums.

    Plan: one group-keyed rank window (value order, row_number — the
    duplicate-value trim is positional, stated), one filtered group
    aggregation on the same key shuffle.

    Returns (group, n, n_trimmed_each, kept_sum, mean_q)."""
    from pyspark.sql import Window as W

    if not (0 <= int(trim_ppm) < 500_000):
        raise ValueError(
            f"trim_ppm must be in [0, 500000): {trim_ppm}"
        )
    ranked = rows.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("bigint").alias("v"),
    ).select(
        "grp", "v",
        F.row_number().over(
            W.partitionBy("grp").orderBy("v")
        ).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("grp")).alias("n"),
    ).withColumn(
        "k", F.expr(f"(n * {int(trim_ppm)}) DIV 1000000")
    )
    agg = (
        ranked.where(
            (F.col("rn") > F.col("k")) & (F.col("rn") <= F.col("n") - F.col("k"))
        )
        .groupBy("grp")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max("k").cast("bigint").alias("n_trimmed_each"),
            F.sum(F.col("v").cast("decimal(38,0)")).alias("_s"),
            F.count(F.lit(1)).alias("_kept"),
        )
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n", "n_trimmed_each",
        F.expr("CAST(_s AS BIGINT)").alias("kept_sum"),
        F.expr(
            "CAST(CASE WHEN _s < 0 THEN -((-_s) DIV _kept) "
            "ELSE _s DIV _kept END AS BIGINT)"
        ).alias("mean_q"),
    )


def trimmed_mean_sql(
    src: str,
    group_col: str,
    value_col: str,
    trim_ppm: int = 100_000,
) -> str:
    """DuckDB twin of :func:`trimmed_mean` — identical positional
    nearest-rank trim and sign-decomposed division.  Standalone."""
    return f"""
        WITH tm_ranked AS (
            SELECT {group_col} AS grp,
                   CAST({value_col} AS BIGINT) AS v,
                   ROW_NUMBER() OVER (PARTITION BY {group_col}
                       ORDER BY CAST({value_col} AS BIGINT)) AS rn,
                   COUNT(*) OVER (PARTITION BY {group_col}) AS n
            FROM {src}
        ),
        tm_kept AS (
            SELECT grp, v, n,
                   (n * {int(trim_ppm)}) // 1000000 AS k
            FROM tm_ranked
            WHERE rn > (n * {int(trim_ppm)}) // 1000000
              AND rn <= n - (n * {int(trim_ppm)}) // 1000000
        )
        SELECT grp AS {group_col},
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(k) AS BIGINT) AS n_trimmed_each,
               CAST(SUM(CAST(v AS HUGEINT)) AS BIGINT) AS kept_sum,
               CAST(CASE WHEN SUM(CAST(v AS HUGEINT)) < 0
                 THEN -((-SUM(CAST(v AS HUGEINT))) // COUNT(*))
                 ELSE SUM(CAST(v AS HUGEINT)) // COUNT(*)
               END AS BIGINT) AS mean_q
        FROM tm_kept GROUP BY 1
    """


def k_anonymity_ladder(
    rows: DataFrame,
    cat_cols: "Sequence[str]",
    num_col: str,
    k: int,
    dividers: "Sequence[int]" = (1, 200, 1000, 0),
) -> DataFrame:
    """k-anonymity audit over a generalization ladder — the privacy
    gate a dataset release runs before shipping quasi-identifiers:
    at each generalization level the numeric QI is coarsened
    (bucket = value DIV d; d = 0 drops the column entirely) and the
    report says how many equivalence classes exist, how many violate
    (fewer than k members), and how many ROWS would need suppression
    to fix the level — so the release picks the finest level whose
    suppression cost it can afford, from one table instead of k
    manual queries.

    Exact and deterministic throughout: classes are plain groupBys,
    a class violates iff n < k, suppression cost = Σ n over violating
    classes.  Dividers must be non-negative with d=1 meaning "exact
    value" (validated); levels report in the given order with their
    divider echoed.

    Plan: one (cats, bucket) aggregation per level re-aggregated to
    ONE row per level — each map-side partial; |levels| is a
    constant, so this is a fixed small number of passes (a lattice
    walk, not a per-class loop).

    Returns (level, divider, n_classes, n_violating, rows_suppressed,
    k_anonymous)."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2: {k}")
    divs = [int(d) for d in dividers]
    if any(d < 0 for d in divs):
        raise ValueError(f"dividers must be ≥ 0: {divs}")
    cats = list(cat_cols)
    outs = []
    for lvl, d in enumerate(divs):
        if d == 0:
            keys = [F.col(c) for c in cats]
        else:
            keys = [F.col(c) for c in cats] + [
                F.expr(f"CAST({num_col} AS BIGINT) DIV {d}")
                .alias("_b")
            ]
        classes = rows.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("_n")
        )
        outs.append(
            classes.agg(
                F.lit(lvl).cast("bigint").alias("level"),
                F.lit(d).cast("bigint").alias("divider"),
                F.count(F.lit(1)).cast("bigint").alias("n_classes"),
                F.sum(F.when(F.col("_n") < int(k), 1).otherwise(0))
                .cast("bigint").alias("n_violating"),
                F.sum(F.when(F.col("_n") < int(k), F.col("_n"))
                      .otherwise(0)).cast("bigint")
                .alias("rows_suppressed"),
            ).withColumn(
                "k_anonymous", F.col("n_violating") == 0
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def k_anonymity_ladder_sql(
    src: str,
    cat_cols: "Sequence[str]",
    num_col: str,
    k: int,
    dividers: "Sequence[int]" = (1, 200, 1000, 0),
) -> str:
    """DuckDB twin of :func:`k_anonymity_ladder` — one UNION ALL
    branch per level, identical bucketing and suppression
    accounting.  Standalone."""
    cats = ", ".join(cat_cols)
    branches = []
    for lvl, d in enumerate(int(x) for x in dividers):
        if d == 0:
            key = cats
        else:
            key = f"{cats}, CAST({num_col} AS BIGINT) // {d}"
        branches.append(f"""
            SELECT CAST({lvl} AS BIGINT) AS level,
                   CAST({d} AS BIGINT) AS divider,
                   CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(SUM(CASE WHEN n < {int(k)} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violating,
                   CAST(SUM(CASE WHEN n < {int(k)} THEN n ELSE 0 END)
                        AS BIGINT) AS rows_suppressed,
                   SUM(CASE WHEN n < {int(k)} THEN 1 ELSE 0 END) = 0
                       AS k_anonymous
            FROM (
                SELECT COUNT(*) AS n FROM {src} GROUP BY {key}
            )
        """)
    return " UNION ALL ".join(branches)


def l_diversity_ladder(
    rows: DataFrame,
    cat_cols: "Sequence[str]",
    num_col: str,
    sens_col: str,
    l: int,
    dividers: "Sequence[int]" = (1, 200, 1000, 0),
) -> DataFrame:
    """Distinct l-diversity audit over the same generalization ladder
    as :func:`k_anonymity_ladder` — the second privacy gate: a class
    can be k-anonymous yet leak the sensitive attribute outright when
    every member shares one sensitive value (the homogeneity attack
    k-anonymity cannot see).  Per level the report counts equivalence
    classes whose DISTINCT sensitive-value count falls below ``l``
    and the exact row-suppression cost to fix the level.

    Distinct counts follow the SQL ``COUNT(DISTINCT …)`` convention
    (NULL sensitive values do not contribute a flavor); a class of
    only-NULL sensitive rows has diversity 0 and always violates.

    Plan: per level one (cats, bucket) aggregation with an exact
    count(DISTINCT) (Spark plans it as one Expand — no second
    shuffle), re-aggregated to ONE row per level; |levels| is a small
    constant.

    Returns (level, divider, n_classes, n_violating, rows_suppressed,
    l_diverse)."""
    if l < 2:
        raise ValueError(f"l must be ≥ 2: {l}")
    divs = [int(d) for d in dividers]
    if any(d < 0 for d in divs):
        raise ValueError(f"dividers must be ≥ 0: {divs}")
    cats = list(cat_cols)
    outs = []
    for lvl, d in enumerate(divs):
        if d == 0:
            keys = [F.col(c) for c in cats]
        else:
            keys = [F.col(c) for c in cats] + [
                F.expr(f"CAST({num_col} AS BIGINT) DIV {d}")
                .alias("_b")
            ]
        classes = rows.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("bigint").alias("_n"),
            F.countDistinct(F.col(sens_col)).cast("bigint")
            .alias("_s"),
        )
        outs.append(
            classes.agg(
                F.lit(lvl).cast("bigint").alias("level"),
                F.lit(d).cast("bigint").alias("divider"),
                F.count(F.lit(1)).cast("bigint").alias("n_classes"),
                F.sum(F.when(F.col("_s") < int(l), 1).otherwise(0))
                .cast("bigint").alias("n_violating"),
                F.sum(F.when(F.col("_s") < int(l), F.col("_n"))
                      .otherwise(0)).cast("bigint")
                .alias("rows_suppressed"),
            ).withColumn(
                "l_diverse", F.col("n_violating") == 0
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def l_diversity_ladder_sql(
    src: str,
    cat_cols: "Sequence[str]",
    num_col: str,
    sens_col: str,
    l: int,
    dividers: "Sequence[int]" = (1, 200, 1000, 0),
) -> str:
    """DuckDB twin of :func:`l_diversity_ladder` — one UNION ALL
    branch per level, identical distinct-flavor accounting.
    Standalone."""
    cats = ", ".join(cat_cols)
    branches = []
    for lvl, d in enumerate(int(x) for x in dividers):
        if d == 0:
            key = cats
        else:
            key = f"{cats}, CAST({num_col} AS BIGINT) // {d}"
        branches.append(f"""
            SELECT CAST({lvl} AS BIGINT) AS level,
                   CAST({d} AS BIGINT) AS divider,
                   CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(SUM(CASE WHEN s < {int(l)} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violating,
                   CAST(SUM(CASE WHEN s < {int(l)} THEN n ELSE 0 END)
                        AS BIGINT) AS rows_suppressed,
                   SUM(CASE WHEN s < {int(l)} THEN 1 ELSE 0 END) = 0
                       AS l_diverse
            FROM (
                SELECT COUNT(*) AS n,
                       COUNT(DISTINCT {sens_col}) AS s
                FROM {src} GROUP BY {key}
            )
        """)
    return " UNION ALL ".join(branches)


def t_closeness_report(
    rows: DataFrame,
    cat_cols: "Sequence[str]",
    sens_col: str,
    t_ppm: int = 250_000,
) -> DataFrame:
    """t-closeness audit — the third privacy gate: l-diversity is
    satisfied by ANY l flavors, even when a class's sensitive-value
    distribution screams (99% of one rare value); t-closeness instead
    bounds the total-variation distance between each equivalence
    class's sensitive distribution and the corpus-wide one.

    Exact cross-multiplied integers throughout (the house
    tile_hotspots discipline): with class counts c_v (n = Σc_v) and
    global counts g_v (N = Σg_v),

        TVD = ½ Σ_v |c_v/n − g_v/N|
            = [ Σ_{v∈class} |c_v·N − g_v·n| + n·(N − Σ_{v∈class} g_v) ]
              / (2·n·N)

    — the absent-value tail folds to one closed term, so the class ×
    value grid is never densified.  Products ride decimal(38,0)
    (|c_v·N| ≤ N² ≤ 10²⁴ at 10¹² rows); the single division is the
    final ppm floor whose quotient is ≤ 10⁶, inside the int64-quotient
    bound Spark's decimal DIV silently wraps past.  Rows with NULL
    sensitive values are excluded from BOTH distributions (they carry
    no flavor); NULL quasi-identifier values form their own class (the
    per-class n rides a keyed window, never a NULL-dropping equi-join).

    Plan: one (cats, v) aggregation, per-class n via a window keyed by
    the same cats, global histogram broadcast (|values| is small by
    definition of a sensitive CATEGORY), one final groupBy(cats).

    Returns one row per equivalence class:
    (cats…, n, tvd_ppm, t_close)."""
    if not (0 < int(t_ppm) <= 1_000_000):
        raise ValueError(f"t_ppm must be in (0, 10⁶]: {t_ppm}")
    from pyspark.sql import Window

    cats = list(cat_cols)
    dec = "decimal(38,0)"
    nn = rows.filter(F.col(sens_col).isNotNull())
    g = (
        nn.groupBy(F.col(sens_col).alias("_v"))
        .agg(F.count(F.lit(1)).cast(dec).alias("_g"))
    )
    tot = nn.agg(F.count(F.lit(1)).cast(dec).alias("_tN"))
    cv = (
        nn.groupBy(*[F.col(c) for c in cats],
                   F.col(sens_col).alias("_v"))
        .agg(F.count(F.lit(1)).cast(dec).alias("_c"))
        .withColumn(
            "_n", F.sum("_c").over(Window.partitionBy(*cats))
        )
    )
    dev = (
        cv.alias("c")
        .join(F.broadcast(g.alias("g")), "_v")
        .crossJoin(F.broadcast(tot.alias("t")))
        .withColumn(
            "_dev",
            F.abs(F.col("c._c") * F.col("t._tN")
                  - F.col("g._g") * F.col("c._n")),
        )
    )
    return (
        dev.groupBy(*cats)
        .agg(
            F.max("_n").alias("_mn"),
            F.max("_tN").alias("_mtN"),
            F.sum("_dev").alias("_sp"),
            F.sum("_g").alias("_gp"),
        )
        .select(
            *cats,
            F.col("_mn").cast("bigint").alias("n"),
            F.expr(
                "CAST(((_sp + _mn * (_mtN - _gp)) * 1000000)"
                " DIV (2 * _mn * _mtN) AS BIGINT)"
            ).alias("tvd_ppm"),
        )
        .withColumn("t_close", F.col("tvd_ppm") <= int(t_ppm))
    )


def t_closeness_report_sql(
    src: str,
    cat_cols: "Sequence[str]",
    sens_col: str,
    t_ppm: int = 250_000,
) -> str:
    """DuckDB twin of :func:`t_closeness_report` — identical
    absent-tail closed form over HUGEINT, identical NULL handling
    (sensitive NULLs excluded, QI NULLs keep their class via the
    window).  Standalone."""
    cats = ", ".join(cat_cols)
    return f"""
        WITH tc_rows AS (
            SELECT {cats}, {sens_col} AS _v FROM {src}
            WHERE {sens_col} IS NOT NULL
        ),
        tc_tot AS (
            SELECT CAST(COUNT(*) AS HUGEINT) AS _tN FROM tc_rows
        ),
        tc_g AS (
            SELECT _v, CAST(COUNT(*) AS HUGEINT) AS _g
            FROM tc_rows GROUP BY _v
        ),
        tc_c AS (
            SELECT {cats}, _v, CAST(COUNT(*) AS HUGEINT) AS _c
            FROM tc_rows GROUP BY {cats}, _v
        ),
        tc_n AS (
            SELECT *, SUM(_c) OVER (PARTITION BY {cats}) AS _n
            FROM tc_c
        ),
        tc_dev AS (
            SELECT {cats}, _n,
                   ABS(c._c * t._tN - g._g * c._n) AS _dev,
                   g._g AS _g, t._tN AS _tN
            FROM tc_n c JOIN tc_g g USING (_v) CROSS JOIN tc_tot t
        )
        SELECT {cats},
               CAST(MAX(_n) AS BIGINT) AS n,
               CAST(((SUM(_dev) + MAX(_n) * (MAX(_tN) - SUM(_g)))
                     * 1000000)
                    // (2 * MAX(_n) * MAX(_tN)) AS BIGINT) AS tvd_ppm,
               CAST(((SUM(_dev) + MAX(_n) * (MAX(_tN) - SUM(_g)))
                     * 1000000)
                    // (2 * MAX(_n) * MAX(_tN)) AS BIGINT)
                   <= {int(t_ppm)} AS t_close
        FROM tc_dev GROUP BY {cats}
    """


def dq_checks(
    df: DataFrame,
    checks: "Sequence[tuple]",
    refs: "dict[str, DataFrame] | None" = None,
) -> DataFrame:
    """Declarative data-quality expectation suite — the pre-ingest
    gate (the Deequ / Great-Expectations role) as ONE verdict table: a
    10¹²-row load runs the suite first and ships only when every row
    of the report says passed, with exact violation counts for the
    ones that don't (a count, not a sample — triage needs to know
    whether 3 rows or 3 billion are bad).

    ``checks`` is a list of declarative specs, each a tuple:

      ("not_null", col)              — NULLs are violations
      ("range", col, lo, hi)         — non-NULL values outside the
                                       closed interval violate (NULL
                                       handling belongs to not_null:
                                       stacking both is the idiom)
      ("accepted", col, [v, …])      — non-NULL values off the list
      ("unique", (col, …))           — every row whose key tuple
                                       occurs more than once violates
                                       (all of them, not n−1: triage
                                       sees the full blast radius)
      ("subset", col, (ref, refcol)) — non-NULL values with no match
                                       in refs[ref].refcol violate
                                       (referential integrity)

    Physical plan — the point of declaring the suite instead of
    running k ad-hoc queries: every SCALAR check (not_null / range /
    accepted) folds into a single aggregation row, so the base table
    is scanned ONCE for all of them; each unique check adds one
    key-hash aggregation, each subset check one distinct-build
    left-anti join against a (typically broadcast-sized) reference
    key column.  Violation counts are exact int64.

    Output: one row per check, in suite order —
    (check_id, check_type, target, n_rows, n_violations, passed)."""
    refs = refs or {}
    scalar_aggs = []
    scalar_meta = []
    extra_outs = []
    n_rows = F.count(F.lit(1)).cast("bigint")

    def _q(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    for cid, spec in enumerate(checks):
        kind = spec[0]
        if kind == "not_null":
            _, col = spec
            scalar_aggs.append(
                F.count_if(F.col(col).isNull()).cast("bigint")
                .alias(f"_v{cid}")
            )
            scalar_meta.append((cid, kind, col))
        elif kind == "range":
            _, col, lo, hi = spec
            scalar_aggs.append(
                F.count_if(
                    F.col(col).isNotNull()
                    & ~F.col(col).between(lo, hi)
                ).cast("bigint").alias(f"_v{cid}")
            )
            scalar_meta.append((cid, kind, col))
        elif kind == "accepted":
            _, col, vals = spec
            lst = ", ".join(_q(v) for v in vals)
            scalar_aggs.append(
                F.count_if(F.expr(
                    f"{col} IS NOT NULL AND {col} NOT IN ({lst})"
                )).cast("bigint").alias(f"_v{cid}")
            )
            scalar_meta.append((cid, kind, col))
        elif kind == "unique":
            _, cols = spec
            cols = [cols] if isinstance(cols, str) else list(cols)
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_n") > 1, F.col("_n"))),
                        F.lit(0),
                    ).cast("bigint").alias("n_violations"),
                    F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint")
                    .alias("n_rows"),
                )
            )
            extra_outs.append(dup.select(
                F.lit(cid).cast("bigint").alias("check_id"),
                F.lit(kind).alias("check_type"),
                F.lit(",".join(cols)).alias("target"),
                "n_rows", "n_violations",
            ))
        elif kind == "subset":
            _, col, (ref_name, ref_col) = spec
            if ref_name not in refs:
                raise ValueError(
                    f"dq_checks: subset check references unknown "
                    f"table {ref_name!r}; pass it via refs="
                )
            ref_keys = refs[ref_name].select(
                F.col(ref_col).alias("_rk")
            ).distinct()
            miss = (
                df.select(F.col(col).alias("_ck"))
                .where(F.col("_ck").isNotNull())
                .join(ref_keys, F.col("_ck") == F.col("_rk"),
                      "left_anti")
                .agg(F.count(F.lit(1)).cast("bigint")
                     .alias("n_violations"))
            )
            tot = df.agg(n_rows.alias("n_rows"))
            extra_outs.append(
                miss.crossJoin(F.broadcast(tot)).select(
                    F.lit(cid).cast("bigint").alias("check_id"),
                    F.lit(kind).alias("check_type"),
                    F.lit(f"{col}⊆{ref_name}.{ref_col}")
                    .alias("target"),
                    "n_rows", "n_violations",
                )
            )
        else:
            raise ValueError(f"dq_checks: unknown check kind {kind!r}")

    outs = []
    if scalar_meta:
        # ONE aggregate row unpivoted with stack() (the
        # column_profile pattern) — a per-check select would make
        # Catalyst replay the scan once per scalar check
        row = df.agg(n_rows.alias("n_rows"), *scalar_aggs)
        stack_args = ", ".join(
            f"CAST({cid} AS BIGINT), '{kind}', '{col}', _v{cid}"
            for cid, kind, col in scalar_meta
        )
        outs.append(row.select(
            F.expr(
                f"stack({len(scalar_meta)}, {stack_args}) AS "
                "(check_id, check_type, target, n_violations)"
            ),
            F.col("n_rows"),
        ).select("check_id", "check_type", "target", "n_rows",
                 "n_violations"))
    outs.extend(extra_outs)
    if not outs:
        raise ValueError("dq_checks: empty suite")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.withColumn(
        "passed", F.col("n_violations") == 0
    ).orderBy("check_id")


def dq_checks_sql(
    src: str,
    checks: "Sequence[tuple]",
    refs: "dict[str, str] | None" = None,
) -> str:
    """DuckDB twin of :func:`dq_checks` — one UNION ALL branch per
    check with identical violation semantics (``refs`` maps reference
    names to source expressions).  Standalone."""
    refs = refs or {}

    def _q(v) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    branches = []
    for cid, spec in enumerate(checks):
        kind = spec[0]
        if kind == "not_null":
            _, col = spec
            cond, target = f"{col} IS NULL", col
        elif kind == "range":
            _, col, lo, hi = spec
            cond = (f"{col} IS NOT NULL AND "
                    f"{col} NOT BETWEEN {_q(lo)} AND {_q(hi)}")
            target = col
        elif kind == "accepted":
            _, col, vals = spec
            lst = ", ".join(_q(v) for v in vals)
            cond = f"{col} IS NOT NULL AND {col} NOT IN ({lst})"
            target = col
        elif kind == "unique":
            _, cols = spec
            cols = [cols] if isinstance(cols, str) else list(cols)
            key = ", ".join(cols)
            branches.append(f"""
                SELECT CAST({cid} AS BIGINT) AS check_id,
                       'unique' AS check_type,
                       '{",".join(cols)}' AS target,
                       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
                       CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END),
                                     0) AS BIGINT) AS n_violations
                FROM (SELECT COUNT(*) AS n FROM {src}
                      GROUP BY {key})
            """)
            continue
        elif kind == "subset":
            _, col, (ref_name, ref_col) = spec
            ref_src = refs[ref_name]
            branches.append(f"""
                SELECT CAST({cid} AS BIGINT) AS check_id,
                       'subset' AS check_type,
                       '{col}⊆{ref_name}.{ref_col}' AS target,
                       (SELECT CAST(COUNT(*) AS BIGINT) FROM {src})
                           AS n_rows,
                       (SELECT CAST(COUNT(*) AS BIGINT) FROM {src} s
                        WHERE s.{col} IS NOT NULL
                          AND NOT EXISTS (
                              SELECT 1 FROM {ref_src} r
                              WHERE r.{ref_col} = s.{col}))
                           AS n_violations
            """)
            continue
        else:
            raise ValueError(f"dq_checks_sql: unknown kind {kind!r}")
        branches.append(f"""
            SELECT CAST({cid} AS BIGINT) AS check_id,
                   '{kind}' AS check_type, '{target}' AS target,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) FILTER ({cond}) AS BIGINT)
                       AS n_violations
            FROM {src}
        """)
    return (
        "SELECT *, n_violations = 0 AS passed FROM ("
        + " UNION ALL ".join(branches)
        + ") ORDER BY check_id"
    )
