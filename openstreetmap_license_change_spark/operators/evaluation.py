"""Exact model-evaluation operators for the curation pipeline.

A 100-TB training-data pipeline lives and dies by its quality
classifiers (which documents to keep) and its labelers (human or
model annotators): these operators grade BOTH, with the engine's
exact-integer discipline — no float accumulation, no sampling —
so evaluation numbers are reproducible across engines, partitionings
and reruns (hash-verified by the DuckDB twins, parallelism-audited
by the determinism CI).

* :func:`roc_auc` — per-group tie-corrected ROC-AUC of a score
  against a binary label, the Mann–Whitney integer form: never a
  per-pair join, one aggregation over DISTINCT scores.
* :func:`cohen_kappa` — per-group inter-annotator chance-corrected
  agreement over categorical labels, the contingency closed form.

Reference anchor: the reference's acceptance decisions are binary
per-user "agreed?" labels joined onto edits (change_bot.rb:40-76);
these operators are the evaluation layer such a licensing/curation
decision system needs at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def roc_auc(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC per group — the probability that a
    random positive outscores a random negative, ties counting half:
    the Mann–Whitney statistic

        2U = 2·Σ_{pos} R̄ − n₊(n₊+1),
        auc_ppm = (2U · 10⁶) DIV (2·n₊·n₋)

    with R̄ the AVERAGE rank of a tie class.  The doubled form keeps
    every intermediate an integer: a tie class occupying positions
    [c+1, c+k] has 2R̄ = 2c + k + 1 exactly.

    Physical plan — never the O(n²) pair join the definition
    suggests: one groupBy((group, score)) collapses the corpus to
    distinct scores with (count, positives); one window per group
    ORDERED BY score over those DISTINCT rows builds the running
    rank offset (cardinality = score cardinality, not corpus rows —
    a quantized quality score has thousands of distinct values at
    any corpus size, and the window is group-partitioned, so no
    single-partition WindowExec); one final groupBy emits the
    statistic.  Wide terms (Σ pos·2R̄ is O(n²)) ride decimal(38,0) /
    HUGEINT, division truncates — identically in both engines on the
    non-negative 2U.

    Degenerate groups (no positives or no negatives) emit NULL
    auc_ppm with their counts — visible, not dropped.

    Output: (group, n_pos, n_neg, auc_ppm ∈ [0, 10⁶])."""
    g = (
        scored.select(
            F.col(group_col).alias("grp"),
            F.col(score_col).alias("score"),
            F.col(label_col).cast("int").alias("lab"),
        )
        .groupBy("grp", "score")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("lab").alias("pos"),
        )
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = g.select(
        "grp",
        "cnt",
        "pos",
        (
            F.lit(2) * (F.sum("cnt").over(w) - F.col("cnt"))
            + F.col("cnt")
            + F.lit(1)
        ).alias("rank2"),
    )
    agg = ranked.groupBy("grp").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n_neg"),
        F.sum(F.expr(f"CAST(pos AS {_DEC}) * rank2")).alias("_r2"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_pos",
        "n_neg",
        F.expr(
            f"CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE "
            f"((_r2 - CAST(n_pos AS {_DEC}) * (n_pos + 1)) * 1000000) "
            f"DIV (2 * CAST(n_pos AS {_DEC}) * n_neg) END AS BIGINT)"
        ).alias("auc_ppm"),
    )


def roc_auc_sql(
    src: str, group_col: str, score_col: str, label_col: str
) -> str:
    """DuckDB twin of :func:`roc_auc` (same doubled-rank integer
    form; HUGEINT wide terms, ``//`` on the non-negative numerator
    truncates identically to Spark's DIV)."""
    return f"""
        WITH auc_g AS (
            SELECT {group_col} AS grp, {score_col} AS score,
                   COUNT(*) AS cnt,
                   CAST(SUM(CAST({label_col} AS INT)) AS BIGINT) AS pos
            FROM {src}
            GROUP BY 1, 2
        ),
        auc_rank AS (
            SELECT grp, cnt, pos,
                   2 * (SUM(cnt) OVER (
                         PARTITION BY grp ORDER BY score
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - cnt) + cnt + 1 AS rank2
            FROM auc_g
        ),
        auc_agg AS (
            SELECT grp,
                   CAST(SUM(pos) AS BIGINT) AS n_pos,
                   CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
                   SUM(CAST(pos AS HUGEINT) * rank2) AS r2
            FROM auc_rank
            GROUP BY 1
        )
        SELECT grp AS {group_col}, n_pos, n_neg,
               CAST(CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL ELSE
                    ((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1))
                     * 1000000)
                    // (2 * CAST(n_pos AS HUGEINT) * n_neg)
               END AS BIGINT) AS auc_ppm
        FROM auc_agg
    """


def cohen_kappa(
    labels: DataFrame,
    group_col: str,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Exact Cohen's kappa per group — chance-corrected agreement
    between two annotators over a shared categorical label space:

        κ = (pₒ − pₑ)/(1 − pₑ)
          = (N·Σₖ dₖ − Σₖ rₖ·cₖ) / (N² − Σₖ rₖ·cₖ)

    (dₖ diagonal counts, rₖ/cₖ the annotators' marginals) — the
    N-cleared rational form, evaluated exactly: kappa_ppm is the
    numerator·10⁶ divided by the denominator with TRUNC-toward-zero
    on both engines (κ can be negative — worse than chance — so the
    twin uses sign decomposition: DuckDB's ``//`` floors, Spark's
    DIV truncates, and they only agree on non-negative operands).

    Physical plan: one groupBy((group, a, b)) contingency pass over
    the corpus, then marginal products joined per label — everything
    downstream of the first aggregation is |labels|²-bounded per
    group, not corpus-bounded.  Perfect-marginal-degenerate groups
    (pₑ = 1, e.g. both annotators constant) emit NULL kappa_ppm.

    Output: (group, n, n_agree, kappa_ppm ∈ [−10⁶, 10⁶])."""
    cont = (
        labels.select(
            F.col(group_col).alias("grp"),
            F.col(a_col).alias("la"),
            F.col(b_col).alias("lb"),
        )
        .groupBy("grp", "la", "lb")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    # marginals self-join: rename the right side's key columns so the
    # equi-join is unambiguous (both legs share cont's lineage)
    ra = cont.groupBy("grp", "la").agg(F.sum("m").alias("rk"))
    cb = (
        cont.groupBy("grp", "lb")
        .agg(F.sum("m").alias("ck"))
        .withColumnRenamed("grp", "grp_b")
    )
    rc = (
        ra.join(
            cb,
            (F.col("grp") == F.col("grp_b"))
            & (F.col("la") == F.col("lb")),
        )
        .select(
            "grp",
            F.expr(f"CAST(rk AS {_DEC}) * ck").alias("rc"),
        )
        .groupBy("grp")
        .agg(F.sum("rc").alias("sum_rc"))
    )
    tot = cont.groupBy("grp").agg(
        F.sum("m").cast("bigint").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("la") == F.col("lb"), F.col("m"))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_agree"),
    )
    j = tot.join(rc, "grp")
    num = f"(CAST(n AS {_DEC}) * n_agree - sum_rc)"
    den = f"(CAST(n AS {_DEC}) * n - sum_rc)"
    return j.select(
        F.col("grp").alias(group_col),
        "n",
        "n_agree",
        F.expr(
            f"CAST(CASE WHEN {den} = 0 THEN NULL "
            f"WHEN {num} < 0 THEN "
            f"-((-{num} * 1000000) DIV {den}) "
            f"ELSE ({num} * 1000000) DIV {den} "
            f"END AS BIGINT)"
        ).alias("kappa_ppm"),
    )


def cohen_kappa_sql(
    src: str, group_col: str, a_col: str, b_col: str
) -> str:
    """DuckDB twin of :func:`cohen_kappa` (HUGEINT contingency
    closed form, sign-decomposed truncating division)."""
    return f"""
        WITH ck_cont AS (
            SELECT {group_col} AS grp, {a_col} AS la, {b_col} AS lb,
                   COUNT(*) AS m
            FROM {src}
            GROUP BY 1, 2, 3
        ),
        ck_ra AS (
            SELECT grp, la, CAST(SUM(m) AS BIGINT) AS rk
            FROM ck_cont GROUP BY 1, 2
        ),
        ck_cb AS (
            SELECT grp, lb, CAST(SUM(m) AS BIGINT) AS ck
            FROM ck_cont GROUP BY 1, 2
        ),
        ck_rc AS (
            SELECT a.grp,
                   SUM(CAST(a.rk AS HUGEINT) * b.ck) AS sum_rc
            FROM ck_ra a JOIN ck_cb b
              ON a.grp = b.grp AND a.la = b.lb
            GROUP BY 1
        ),
        ck_tot AS (
            SELECT grp, CAST(SUM(m) AS BIGINT) AS n,
                   CAST(COALESCE(SUM(CASE WHEN la = lb THEN m END), 0)
                        AS BIGINT) AS n_agree
            FROM ck_cont GROUP BY 1
        )
        SELECT t.grp AS {group_col}, t.n, t.n_agree,
               CAST(CASE
                 WHEN CAST(t.n AS HUGEINT) * t.n - r.sum_rc = 0
                   THEN NULL
                 WHEN CAST(t.n AS HUGEINT) * t.n_agree - r.sum_rc < 0
                   THEN -((-(CAST(t.n AS HUGEINT) * t.n_agree
                             - r.sum_rc) * 1000000)
                          // (CAST(t.n AS HUGEINT) * t.n - r.sum_rc))
                 ELSE ((CAST(t.n AS HUGEINT) * t.n_agree - r.sum_rc)
                       * 1000000)
                      // (CAST(t.n AS HUGEINT) * t.n - r.sum_rc)
               END AS BIGINT) AS kappa_ppm
        FROM ck_tot t JOIN ck_rc r USING (grp)
    """


def chi2_2x2(
    rows: DataFrame,
    group_col: str,
    variant_col: str,
    success_col: str,
    critical_ppm: int = 3_841_459,
) -> DataFrame:
    """Exact 2×2 chi-square test per group — the A/B-experiment
    readout (did variant B convert differently?), df = 1, in the
    N-cleared rational form:

        χ² = N·(ad − bc)² / (r₁·r₂·c₁·c₂)

    (a/b = variant-A successes/failures, c/d = variant-B, r/c the
    margins).  Two exact integer outputs:

    * chi2_ppm = (10⁶·N·(ad−bc)²) DIV (r₁·r₂·c₁·c₂) — exact to the
      ppm floor while 10⁶·N⁵/16 fits decimal(38): per-group
      N ≲ 4·10⁶ rows (stated per the house bounds rule; beyond that
      the ppm quantization saturates loudly in testing, the flag
      below stays exact far longer);
    * significant = 10⁶·N·(ad−bc)² > critical_ppm·(r₁·r₂·c₁·c₂) —
      the cross-multiplied decision at α = 0.05
      (``critical_ppm`` = 3 841 459 ≈ χ²₀.₀₅,₁·10⁶), exact while
      critical_ppm·N⁴/16 fits decimal(38): N ≲ 4·10⁸.

    Any zero margin (a variant absent, or all/no successes) leaves
    χ² undefined — NULL, visible, with the counts still emitted.

    Plan: one groupBy contingency pass; everything after is
    group-cardinality-bounded.  The variant and success predicates
    are the caller's columns (booleans), so the operator is one
    aggregation — no joins.

    Output: (group, n_a, n_b, succ_a, succ_b, chi2_ppm,
    significant)."""
    g = (
        rows.select(
            F.col(group_col).alias("grp"),
            F.col(variant_col).cast("boolean").alias("is_b"),
            F.col(success_col).cast("boolean").alias("ok"),
        )
        .groupBy("grp")
        .agg(
            F.count_if(~F.col("is_b") & F.col("ok")).alias("a"),
            F.count_if(~F.col("is_b") & ~F.col("ok")).alias("b"),
            F.count_if(F.col("is_b") & F.col("ok")).alias("c"),
            F.count_if(F.col("is_b") & ~F.col("ok")).alias("d"),
        )
    )
    num = f"(CAST(a AS {_DEC}) * d - CAST(b AS {_DEC}) * c)"
    prod = (
        f"(CAST(a + b AS {_DEC}) * (c + d) * (a + c) * (b + d))"
    )
    n = "(a + b + c + d)"
    return g.select(
        F.col("grp").alias(group_col),
        (F.col("a") + F.col("b")).cast("bigint").alias("n_a"),
        (F.col("c") + F.col("d")).cast("bigint").alias("n_b"),
        F.col("a").cast("bigint").alias("succ_a"),
        F.col("c").cast("bigint").alias("succ_b"),
        F.expr(
            f"CAST(CASE WHEN {prod} = 0 THEN NULL ELSE "
            f"(1000000 * {n} * {num} * {num}) DIV {prod} "
            f"END AS BIGINT)"
        ).alias("chi2_ppm"),
        F.expr(
            f"CASE WHEN {prod} = 0 THEN NULL ELSE "
            f"1000000 * {n} * {num} * {num} "
            f"> CAST({int(critical_ppm)} AS {_DEC}) * {prod} END"
        ).alias("significant"),
    )


def chi2_2x2_sql(
    src: str,
    group_col: str,
    variant_col: str,
    success_col: str,
    critical_ppm: int = 3_841_459,
) -> str:
    """DuckDB twin of :func:`chi2_2x2` (HUGEINT N-cleared form)."""
    return f"""
        WITH x2_g AS (
            SELECT {group_col} AS grp,
                   CAST(COUNT(CASE WHEN NOT {variant_col}
                        AND {success_col} THEN 1 END) AS BIGINT) AS a,
                   CAST(COUNT(CASE WHEN NOT {variant_col}
                        AND NOT {success_col} THEN 1 END) AS BIGINT)
                       AS b,
                   CAST(COUNT(CASE WHEN {variant_col}
                        AND {success_col} THEN 1 END) AS BIGINT) AS c,
                   CAST(COUNT(CASE WHEN {variant_col}
                        AND NOT {success_col} THEN 1 END) AS BIGINT)
                       AS d
            FROM {src}
            GROUP BY 1
        )
        SELECT grp AS {group_col},
               a + b AS n_a, c + d AS n_b,
               a AS succ_a, c AS succ_b,
               CAST(CASE WHEN CAST(a + b AS HUGEINT) * (c + d)
                         * (a + c) * (b + d) = 0 THEN NULL ELSE
                    (1000000 * CAST(a + b + c + d AS HUGEINT)
                     * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                     * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c))
                    // (CAST(a + b AS HUGEINT) * (c + d)
                        * (a + c) * (b + d))
               END AS BIGINT) AS chi2_ppm,
               CASE WHEN CAST(a + b AS HUGEINT) * (c + d)
                         * (a + c) * (b + d) = 0 THEN NULL ELSE
                    1000000 * CAST(a + b + c + d AS HUGEINT)
                    * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                    * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
                    > CAST({int(critical_ppm)} AS HUGEINT)
                      * (CAST(a + b AS HUGEINT) * (c + d)
                         * (a + c) * (b + d))
               END AS significant
        FROM x2_g
    """


def confusion_metrics(
    confusion: DataFrame,
    truth_col: str = "truth",
    pred_col: str = "pred",
    n_col: str = "n",
) -> DataFrame:
    """Per-class precision / recall / F1 from an aggregated confusion
    matrix (rows: truth, pred, count) — the classifier report card
    over the multiclass case the binary :func:`roc_auc` doesn't
    cover, in exact ppm:

        precision_ppm = tp·10⁶ DIV (tp + fp)
        recall_ppm    = tp·10⁶ DIV (tp + fn)
        f1_ppm        = 2·tp·10⁶ DIV (2·tp + fp + fn)

    — the F1 form clears both nested rationals into ONE truncating
    division (2PR/(P+R) = 2tp/(2tp+fp+fn) identically), so no
    intermediate rounding compounds.  A class with an empty
    prediction column (tp+fp = 0) or empty truth row (tp+fn = 0) has
    that metric NULL — visible, the degenerate-group rule.

    The class list is the UNION of truth and predicted labels (a
    class the model invents — 'und' — appears with NULL recall
    rather than disappearing).  Input is matrix-scale (|classes|²),
    so every step is tiny regardless of corpus size; pair with a
    corpus-scale groupBy((truth, pred)) upstream.

    Output: (label, tp, fp, fn, precision_ppm, recall_ppm,
    f1_ppm)."""
    m = confusion.select(
        F.col(truth_col).alias("t"),
        F.col(pred_col).alias("p"),
        F.col(n_col).cast("bigint").alias("n"),
    )
    rows = m.groupBy(F.col("t").alias("label")).agg(
        F.sum("n").alias("row_total")
    )
    cols = m.groupBy(F.col("p").alias("label")).agg(
        F.sum("n").alias("col_total")
    )
    diag = m.where(F.col("t") == F.col("p")).groupBy(
        F.col("t").alias("label")
    ).agg(F.sum("n").alias("tp"))
    base = (
        rows.join(cols, "label", "full_outer")
        .join(diag, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
            (F.coalesce("col_total", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint")
            .alias("fp"),
            (F.coalesce("row_total", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint")
            .alias("fn"),
        )
    )
    return base.select(
        "label",
        "tp",
        "fp",
        "fn",
        F.expr(
            "CAST(CASE WHEN tp + fp = 0 THEN NULL ELSE "
            "(tp * 1000000L) DIV (tp + fp) END AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(CASE WHEN tp + fn = 0 THEN NULL ELSE "
            "(tp * 1000000L) DIV (tp + fn) END AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE "
            "(2 * tp * 1000000L) DIV (2 * tp + fp + fn) END AS BIGINT)"
        ).alias("f1_ppm"),
    )


def confusion_metrics_sql(
    src: str,
    truth_col: str = "truth",
    pred_col: str = "pred",
    n_col: str = "n",
) -> str:
    """DuckDB twin of :func:`confusion_metrics`; ``src`` exposes the
    aggregated (truth, pred, n) matrix."""
    return f"""
        WITH cm_m AS (
            SELECT {truth_col} AS t, {pred_col} AS p,
                   CAST({n_col} AS BIGINT) AS n
            FROM {src}
        ),
        cm_rows AS (
            SELECT t AS label, CAST(SUM(n) AS BIGINT) AS row_total
            FROM cm_m GROUP BY 1
        ),
        cm_cols AS (
            SELECT p AS label, CAST(SUM(n) AS BIGINT) AS col_total
            FROM cm_m GROUP BY 1
        ),
        cm_diag AS (
            SELECT t AS label, CAST(SUM(n) AS BIGINT) AS tp
            FROM cm_m WHERE t = p GROUP BY 1
        ),
        cm_base AS (
            SELECT COALESCE(r.label, c.label) AS label,
                   COALESCE(d.tp, 0) AS tp,
                   COALESCE(c.col_total, 0) - COALESCE(d.tp, 0) AS fp,
                   COALESCE(r.row_total, 0) - COALESCE(d.tp, 0) AS fn
            FROM cm_rows r
            FULL OUTER JOIN cm_cols c ON c.label = r.label
            LEFT JOIN cm_diag d
              ON d.label = COALESCE(r.label, c.label)
        )
        SELECT label, tp, fp, fn,
               CAST(CASE WHEN tp + fp = 0 THEN NULL ELSE
                    (tp * 1000000) // (tp + fp) END AS BIGINT)
                   AS precision_ppm,
               CAST(CASE WHEN tp + fn = 0 THEN NULL ELSE
                    (tp * 1000000) // (tp + fn) END AS BIGINT)
                   AS recall_ppm,
               CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN NULL ELSE
                    (2 * tp * 1000000) // (2 * tp + fp + fn)
               END AS BIGINT) AS f1_ppm
        FROM cm_base
    """


def blocking_eval(
    cand_pairs: DataFrame,
    truth_pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Entity-resolution blocking quality — grade a CANDIDATE pair
    generator (LSH bands, sorted neighborhood, …) against known
    duplicate truth with the two classic metrics, exact:

        pair completeness  = |cand ∩ truth| ·10⁶ DIV |truth|
            (how many real duplicate pairs the blocking kept)
        reduction ratio    = (C(n,2) − |cand|) ·10⁶ DIV C(n,2)
            (how much of the all-pairs quadratic it avoided)

    — the recall/efficiency trade every dedup pipeline tunes; a
    blocking with completeness < 10⁶ is silently losing duplicates,
    one with low reduction is quietly quadratic.  Both pair sets are
    normalized to unordered (least, greatest) form here, so callers
    may pass either orientation.  |truth| = 0 → completeness NULL
    (nothing to find); C(n,2) rides decimal(38)/HUGEINT (n ≤ 10¹²
    docs exact).

    Plan: one equi-join of the two pair sets + three 1-row aggregates
    cross-joined broadcast — nothing quadratic, nothing collected.

    Output: single row (n_docs, n_cand, n_truth, n_found,
    completeness_ppm, reduction_ppm)."""
    def norm(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(a_col), F.col(b_col)).alias("pa"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("pb"),
        ).distinct()

    cand = norm(cand_pairs)
    truth = norm(truth_pairs)
    found = cand.join(truth, ["pa", "pb"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_found")
    )
    n_cand = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand")
    )
    n_truth = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth")
    )
    n_docs = docs.agg(
        F.count_distinct(F.col(id_col)).cast("bigint").alias("n_docs")
    )
    j = (
        n_docs.crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_truth))
        .crossJoin(F.broadcast(found))
    )
    allpairs = f"(CAST(n_docs AS {_DEC}) * (n_docs - 1) DIV 2)"
    return j.select(
        "n_docs",
        "n_cand",
        "n_truth",
        "n_found",
        F.expr(
            "CAST(CASE WHEN n_truth = 0 THEN NULL ELSE "
            "(n_found * 1000000L) DIV n_truth END AS BIGINT)"
        ).alias("completeness_ppm"),
        F.expr(
            f"CAST(CASE WHEN {allpairs} = 0 THEN NULL ELSE "
            f"(({allpairs} - n_cand) * 1000000) DIV {allpairs} "
            f"END AS BIGINT)"
        ).alias("reduction_ppm"),
    )


def blocking_eval_sql(
    cand_src: str,
    truth_src: str,
    docs_src: str,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> str:
    """DuckDB twin of :func:`blocking_eval`."""
    return f"""
        WITH be_cand AS (
            SELECT DISTINCT LEAST({a_col}, {b_col}) AS pa,
                   GREATEST({a_col}, {b_col}) AS pb
            FROM {cand_src}
        ),
        be_truth AS (
            SELECT DISTINCT LEAST({a_col}, {b_col}) AS pa,
                   GREATEST({a_col}, {b_col}) AS pb
            FROM {truth_src}
        ),
        be_found AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_found
            FROM be_cand JOIN be_truth USING (pa, pb)
        ),
        be_n AS (
            SELECT CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n_docs
            FROM {docs_src}
        ),
        be_c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM be_cand),
        be_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM be_truth)
        SELECT n.n_docs, c.n_cand, t.n_truth, f.n_found,
               CAST(CASE WHEN t.n_truth = 0 THEN NULL ELSE
                    (f.n_found * 1000000) // t.n_truth
               END AS BIGINT) AS completeness_ppm,
               CAST(CASE WHEN CAST(n.n_docs AS HUGEINT)
                         * (n.n_docs - 1) // 2 = 0 THEN NULL ELSE
                    ((CAST(n.n_docs AS HUGEINT) * (n.n_docs - 1) // 2
                      - c.n_cand) * 1000000)
                    // (CAST(n.n_docs AS HUGEINT) * (n.n_docs - 1) // 2)
               END AS BIGINT) AS reduction_ppm
        FROM be_n n, be_c c, be_t t, be_found f
    """


def ranking_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int,
) -> DataFrame:
    """Per-query ranked-retrieval metrics — the report card for every
    retrieval operator in the engine (BM25 / TF-IDF / ANN / RRF): cut
    each run at rank ``k`` and grade it against a relevance set in
    exact ppm integers:

        p_at_k_ppm  = hits·10⁶ DIV k
        recall_ppm  = hits·10⁶ DIV n_rel          (NULL if n_rel = 0)
        rr_ppm      = 10⁶ DIV first_rel_rank      (0 if no hit — the
                       MRR convention: a missing answer scores zero)
        ap_ppm      = ( Σ_{i-th hit at rank rᵢ} (i·10⁶ DIV rᵢ) )
                       DIV n_rel                  (NULL if n_rel = 0)

    ap_ppm is average precision with the FULL-relevant denominator
    (uncapped n_rel), so AP@k degrades when relevant docs fall below
    the cut — the curation-relevant reading.  Every term truncates
    identically in Spark and DuckDB (all operands non-negative), so
    the per-term-then-sum order is engine-stable; bounds: hits ≤ k,
    each per-hit term ≤ 10⁶, ap numerator ≤ k·10⁶ — int64 with nine
    digits of headroom.

    ``runs``: (query_id, doc_id, rank) with rank 1-based and unique
    per query (ties must be broken upstream — rank IS the ranking).
    ``qrels``: (query_id, doc_id) relevant pairs, assumed distinct.
    Queries appear in the output iff they have run rows (grading
    requires a run); n_rel counts ALL relevant docs for the query,
    retrieved or not.

    Scale: one equi-join of the rank-k-cut runs against qrels, one
    per-query window ordered by rank (bounded at k rows per query —
    never corpus-wide), one groupBy — the qrels side is typically
    broadcastable.  Output: (query_id, n_rel, n_ret, hits,
    first_rank, p_at_k_ppm, recall_ppm, rr_ppm, ap_ppm)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    top = runs.select(
        "query_id", "doc_id", F.col("rank").cast("bigint").alias("rank")
    ).where(F.col("rank") <= k)
    rel = qrels.select("query_id", "doc_id").withColumn(
        "_rel", F.lit(1).cast("bigint")
    )
    n_rel = rel.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    marked = (
        top.join(rel, ["query_id", "doc_id"], "left")
        .withColumn("_hit", F.coalesce("_rel", F.lit(0)))
        .withColumn("_cum", F.sum("_hit").over(w))
    )
    per_q = marked.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_ret"),
        F.sum("_hit").alias("hits"),
        F.min(F.when(F.col("_hit") == 1, F.col("rank"))).alias(
            "first_rank"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("_hit") == 1,
                    F.expr("(_cum * 1000000L) DIV rank"),
                )
            ),
            F.lit(0),
        ).alias("_ap_num"),
    )
    return (
        per_q.join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).cast("bigint").alias("n_rel"),
            "n_ret",
            "hits",
            "first_rank",
            F.expr(f"CAST((hits * 1000000L) DIV {int(k)} AS BIGINT)")
            .alias("p_at_k_ppm"),
            F.expr(
                "CAST(CASE WHEN COALESCE(n_rel, 0) = 0 THEN NULL ELSE "
                "(hits * 1000000L) DIV n_rel END AS BIGINT)"
            ).alias("recall_ppm"),
            F.expr(
                "CAST(CASE WHEN first_rank IS NULL THEN 0 ELSE "
                "1000000L DIV first_rank END AS BIGINT)"
            ).alias("rr_ppm"),
            F.expr(
                "CAST(CASE WHEN COALESCE(n_rel, 0) = 0 THEN NULL ELSE "
                "_ap_num DIV n_rel END AS BIGINT)"
            ).alias("ap_ppm"),
        )
    )


def ranking_eval_sql(runs_src: str, qrels_src: str, k: int) -> str:
    """DuckDB twin of :func:`ranking_eval` (standalone statement,
    same column contract)."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    return f"""
        WITH re_top AS (
            SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank
            FROM {runs_src} WHERE rank <= {int(k)}
        ),
        re_rel AS (
            SELECT query_id, doc_id, CAST(1 AS BIGINT) AS _rel
            FROM {qrels_src}
        ),
        re_nrel AS (
            SELECT query_id, COUNT(*) AS n_rel FROM re_rel GROUP BY 1
        ),
        re_marked AS (
            SELECT t.query_id, t.rank,
                   COALESCE(r._rel, 0) AS _hit,
                   SUM(COALESCE(r._rel, 0)) OVER (
                       PARTITION BY t.query_id ORDER BY t.rank
                   ) AS _cum
            FROM re_top t
            LEFT JOIN re_rel r
              ON r.query_id = t.query_id AND r.doc_id = t.doc_id
        ),
        re_perq AS (
            SELECT query_id,
                   COUNT(*) AS n_ret,
                   SUM(_hit) AS hits,
                   MIN(CASE WHEN _hit = 1 THEN rank END) AS first_rank,
                   COALESCE(SUM(CASE WHEN _hit = 1 THEN
                       (_cum * 1000000) // rank END), 0) AS _ap_num
            FROM re_marked GROUP BY query_id
        )
        SELECT p.query_id,
               CAST(COALESCE(n.n_rel, 0) AS BIGINT) AS n_rel,
               CAST(p.n_ret AS BIGINT) AS n_ret,
               CAST(p.hits AS BIGINT) AS hits,
               CAST(p.first_rank AS BIGINT) AS first_rank,
               CAST((p.hits * 1000000) // {int(k)} AS BIGINT)
                   AS p_at_k_ppm,
               CAST(CASE WHEN COALESCE(n.n_rel, 0) = 0 THEN NULL ELSE
                    (p.hits * 1000000) // n.n_rel END AS BIGINT)
                   AS recall_ppm,
               CAST(CASE WHEN p.first_rank IS NULL THEN 0 ELSE
                    1000000 // p.first_rank END AS BIGINT) AS rr_ppm,
               CAST(CASE WHEN COALESCE(n.n_rel, 0) = 0 THEN NULL ELSE
                    p._ap_num // n.n_rel END AS BIGINT) AS ap_ppm
        FROM re_perq p LEFT JOIN re_nrel n USING (query_id)
    """


def silhouette_centroid(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    scale: int = 10**6,
) -> DataFrame:
    """Simplified (centroid-based) silhouette of a LABELED embedding
    set — per point, cohesion a = squared quantized distance to its
    OWN label's centroid, separation b = the min over OTHER labels'
    centroids, score s = (b − a)/max(a, b) ∈ [−1, 1] in exact ppm:
    the clustering report card (s < 0 ⟺ the point sits closer to a
    foreign centroid — mislabeled or boundary).  The classic
    silhouette's O(n²) point-pair means are replaced by the standard
    centroid surrogate, which is what makes it a one-pass aggregate
    at corpus scale (and exactly reproducible — the M-step's
    quantized means, :func:`similarity.embedding_centroids`, are the
    only inputs).

    Exactness: distances are Σ(q_v − mean_q)² in int64 (the
    nearest_centroid_assign bound), sil_ppm = ((b−a)·10⁶) DIV
    max(a,b) with the ·10⁶ product in decimal(38,0)/HUGEINT — a
    far-from-home distance times the ppm scale clears int64 already
    at ~10¹³, i.e. 64 dims of unit-range vectors (caught by the
    planted mislabeled-point test, not by the happy-path corpus).
    a = b = 0 (a point EXACTLY on two centroids) is the genuine
    undefined case → NULL.  A label with a single centroid
    and no others (k = 1) yields NULL b — also NULL score.

    Plan: one posexplode → broadcast centroid join → per-(point,
    label) partial sums (the E-step shape); own/other split is two
    conditional aggregates on the same (point)-keyed stream — no
    window, no second scan.  Returns (id, group, a_q, b_q,
    sil_ppm)."""
    from openstreetmap_license_change_spark.operators.similarity import (
        embedding_centroids,
    )

    cents = embedding_centroids(embeddings, group_col=group_col,
                                vec_col=vec_col, scale=scale)
    vlong = embeddings.select(
        id_col,
        F.col(group_col).alias("_own"),
        F.posexplode(vec_col).alias("dim", "_v"),
    ).withColumn(
        "_q", F.round(F.col("_v") * F.lit(float(scale))).cast("bigint")
    )
    j = vlong.join(
        F.broadcast(
            cents.select(F.col(group_col).alias("_g"), "dim", "mean_q")
        ),
        "dim",
    )
    d = F.col("_q") - F.col("mean_q")
    per = j.groupBy(id_col, "_own", "_g").agg(
        F.sum(d * d).alias("_dist")
    )
    agg = per.groupBy(id_col, "_own").agg(
        F.max(F.when(F.col("_g") == F.col("_own"), F.col("_dist")))
        .alias("a_q"),
        F.min(F.when(F.col("_g") != F.col("_own"), F.col("_dist")))
        .alias("b_q"),
    )
    return agg.select(
        id_col,
        F.col("_own").alias(group_col),
        "a_q",
        "b_q",
        F.expr(
            "CAST(CASE WHEN b_q IS NULL OR GREATEST(a_q, b_q) = 0 "
            "THEN NULL ELSE "
            "(CAST(b_q - a_q AS decimal(38,0)) * 1000000) "
            "DIV CAST(GREATEST(a_q, b_q) AS decimal(38,0)) "
            "END AS BIGINT)"
        ).alias("sil_ppm"),
    )


def silhouette_centroid_sql(
    emb_src: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
    scale: int = 10**6,
) -> str:
    """DuckDB twin of :func:`silhouette_centroid` (standalone; sc_*
    namespaced; inlines the M-step like nearest_centroid_assign_sql,
    float32 widened before scaling — the documented promotion
    trap)."""
    return f"""
        WITH sc_long AS (
            SELECT {id_col}, {group_col} AS own,
                   CAST(u.i - 1 AS INTEGER) AS dim,
                   CAST(ROUND(CAST({vec_col}[u.i] AS DOUBLE) * {scale})
                        AS BIGINT) AS q
            FROM {emb_src},
                 LATERAL (SELECT UNNEST(range(1, len({vec_col}) + 1))
                          AS i) u
        ),
        sc_cent AS (
            SELECT own AS g, dim,
                   CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_q
            FROM sc_long GROUP BY 1, 2
        ),
        sc_per AS (
            SELECT v.{id_col}, v.own, c.g,
                   CAST(SUM((v.q - c.mean_q) * (v.q - c.mean_q))
                        AS BIGINT) AS dist
            FROM sc_long v JOIN sc_cent c USING (dim)
            GROUP BY 1, 2, 3
        ),
        sc_agg AS (
            SELECT {id_col}, own,
                   MAX(CASE WHEN g = own THEN dist END) AS a_q,
                   MIN(CASE WHEN g <> own THEN dist END) AS b_q
            FROM sc_per GROUP BY 1, 2
        )
        SELECT {id_col}, own AS {group_col}, a_q, b_q,
               CAST(CASE WHEN b_q IS NULL OR GREATEST(a_q, b_q) = 0
                    THEN NULL ELSE
                    (CAST(b_q - a_q AS HUGEINT) * 1000000)
                    // CAST(GREATEST(a_q, b_q) AS HUGEINT)
                    END AS BIGINT) AS sil_ppm
        FROM sc_agg
    """


def calibration_bins(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a [0, 10⁶]-ppm score against a
    boolean outcome — the calibration report card next to
    :func:`roc_auc`'s discrimination (AUC says the ranking is right;
    calibration says the NUMBERS are): per equal-width score bin, the
    count, the mean predicted score, and the observed positive rate,
    all in exact ppm (|observed − predicted| per bin is the ECE
    summand — presentation-layer, the bins carry the exact parts).

    Binning: bin = min(score·n_bins DIV 10⁶, n_bins−1) — equal-width
    with the right edge CLOSED on the last bin (score = 10⁶ lands in
    bin n−1, stated); scores outside [0, 10⁶] fail loud via an
    assert riding the bin column.  Bins the data never hits densify
    to zero-count rows so the diagram axis is stable.

    One partial-agg groupBy; n_bins ≤ 10⁴ loudly (a reliability
    diagram beyond that is a scatter plot).  Returns (bin, lo_ppm,
    n, mean_score_ppm, observed_ppm) — the ratio columns NULL on
    empty bins."""
    if not 1 <= int(n_bins) <= 10_000:
        raise ValueError(f"n_bins out of range: {n_bins}")
    nb = int(n_bins)
    guard = F.when(
        (F.col("_s") < 0) | (F.col("_s") > 1_000_000),
        F.assert_true(
            F.lit(False),
            F.lit("calibration_bins: score outside [0, 1e6] ppm"),
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    binned = scored.select(
        F.col(score_col).cast("bigint").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).select(
        (F.least(
            F.expr(f"_s * {nb} DIV 1000000"), F.lit(nb - 1)
        ) + guard).cast("int").alias("bin"),
        "_s",
        "_y",
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_s").alias("_sum_s"),
        F.sum(F.col("_y").cast("bigint")).alias("_pos"),
    )
    bins = scored.sparkSession.range(0, nb).select(
        F.col("id").cast("int").alias("bin")
    )
    return bins.join(agg, "bin", "left").select(
        "bin",
        (F.col("bin").cast("bigint") * F.lit(1_000_000 // nb))
        .alias("lo_ppm"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.expr("CAST(_sum_s DIV n AS BIGINT)").alias("mean_score_ppm"),
        F.expr(
            "CAST((_pos * 1000000) DIV n AS BIGINT)"
        ).alias("observed_ppm"),
    ).orderBy("bin")


def calibration_bins_sql(
    src: str, score_col: str, label_col: str, n_bins: int = 10
) -> str:
    """DuckDB twin of :func:`calibration_bins` (standalone; cb_*
    namespaced; the range guard is an error() arm riding the bin —
    the cube_rollup lesson)."""
    nb = int(n_bins)
    return f"""
        WITH cb_rows AS (
            SELECT CAST({score_col} AS BIGINT) AS s,
                   CAST({label_col} AS BOOLEAN) AS y
            FROM {src}
        ),
        cb_bin AS (
            SELECT LEAST(s * {nb} // 1000000, {nb} - 1)
                   + CASE WHEN s < 0 OR s > 1000000
                          THEN CAST(error(
                    'calibration_bins: score outside [0, 1e6] ppm'
                          ) AS BIGINT) ELSE 0 END AS bin,
                   s, y
            FROM cb_rows
        ),
        cb_agg AS (
            SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(s) AS sum_s,
                   SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos
            FROM cb_bin GROUP BY 1
        )
        SELECT CAST(b.bin AS INTEGER) AS bin,
               CAST(b.bin * {1_000_000 // nb} AS BIGINT) AS lo_ppm,
               CAST(COALESCE(a.n, 0) AS BIGINT) AS n,
               CAST(a.sum_s // a.n AS BIGINT) AS mean_score_ppm,
               CAST((a.pos * 1000000) // a.n AS BIGINT) AS observed_ppm
        FROM (SELECT UNNEST(range(0, {nb})) AS bin) b
        LEFT JOIN cb_agg a ON a.bin = b.bin
        ORDER BY bin
    """


# cumulative Poisson(1) CDF in ppm — e^{-1}·Σ 1/k!, rounded half-up
# once and FROZEN (the table IS the spec; both engines read the same
# integers, so bootstrap replicate weights are deterministic)
POISSON1_CDF_PPM = (367879, 735759, 919699, 981012, 996340, 999406)


def bootstrap_means(
    rows: DataFrame,
    id_col: str,
    value_col: str,
    n_reps: int = 20,
) -> DataFrame:
    """Poisson-bootstrap replicate means — the error bar every corpus
    metric needs before a mixture decision ("is en's mean doc length
    REALLY above de's, or is that three big documents?"): each
    replicate r reweights every row by a deterministic Poisson(1)
    draw w = CDF⁻¹(hash(id, r) mod 10⁶) (``POISSON1_CDF_PPM``, tail
    clamped at 6) — the streaming-safe surrogate for resampling n
    rows with replacement, exact in expectation.

    Determinism: the draw routes through the house KMV avalanche mix
    (sequential ids would otherwise correlate across replicates —
    the mixture_resample lesson), so both engines and any
    parallelism produce identical replicates.

    Exactness: each replicate emits n_eff = Σw, sum_w = Σw·x, and
    mean_ppm = (Σw·x·10⁶) DIV Σw (NULL on an all-zero replicate —
    possible only for tiny corpora).  The replicate spread IS the
    standard error; quantiles of 20 rows are presentation-layer.

    Plan: one ×n_reps literal-array explode on the scan, one
    partial-agg groupBy on ≤ n_reps groups — no shuffle of the raw
    rows beyond the map-side combine.  Returns (rep, n_rows, n_eff,
    sum_wx, mean_ppm)."""
    if not 1 <= int(n_reps) <= 1000:
        raise ValueError(f"n_reps out of range: {n_reps}")
    from openstreetmap_license_change_spark.operators.sketches import (
        kmv_hash,
    )

    reps = F.explode(
        F.array(*[F.lit(r) for r in range(int(n_reps))])
    ).alias("rep")
    h = kmv_hash(
        F.col(id_col).cast("bigint") * F.lit(1009) + F.col("rep")
    ) % F.lit(1_000_000)
    w = F.lit(len(POISSON1_CDF_PPM))
    for i, thr in reversed(list(enumerate(POISSON1_CDF_PPM))):
        w = F.when(h < thr, F.lit(i)).otherwise(w)
    return (
        rows.select(
            F.col(id_col), F.col(value_col).cast("bigint").alias("_x"),
            reps,
        )
        .withColumn("_w", w.cast("bigint"))
        .groupBy("rep")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_w").alias("n_eff"),
            F.sum(F.col("_w") * F.col("_x")).alias("sum_wx"),
        )
        .select(
            "rep", "n_rows", "n_eff", "sum_wx",
            F.expr(
                "CAST(CASE WHEN n_eff = 0 THEN NULL ELSE "
                "(sum_wx * 1000000) DIV n_eff END AS BIGINT)"
            ).alias("mean_ppm"),
        )
    )


def bootstrap_means_sql(
    src: str, id_col: str, value_col: str, n_reps: int = 20
) -> str:
    """DuckDB twin of :func:`bootstrap_means` (standalone; same
    avalanche mix via kmv_hash_sql, same frozen CDF table)."""
    from openstreetmap_license_change_spark.operators.sketches import (
        kmv_hash_sql,
    )

    hexpr = kmv_hash_sql(
        f"CAST({id_col} AS BIGINT) * 1009 + r.rep"
    ) + f" % 1000000"
    cdf = " ".join(
        f"WHEN h < {thr} THEN {i}"
        for i, thr in enumerate(POISSON1_CDF_PPM)
    )
    return f"""
        WITH bm_rows AS (
            SELECT r.rep, {hexpr} AS h,
                   CAST({value_col} AS BIGINT) AS x
            FROM {src},
                 (SELECT UNNEST(range(0, {int(n_reps)})) AS rep) r
        ),
        bm_w AS (
            SELECT rep, x,
                   CAST(CASE {cdf} ELSE {len(POISSON1_CDF_PPM)} END
                        AS BIGINT) AS w
            FROM bm_rows
        )
        SELECT CAST(rep AS INTEGER) AS rep,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(w) AS BIGINT) AS n_eff,
               CAST(SUM(w * x) AS BIGINT) AS sum_wx,
               CAST(CASE WHEN SUM(w) = 0 THEN NULL ELSE
                    (SUM(w * x) * 1000000) // SUM(w) END AS BIGINT)
                   AS mean_ppm
        FROM bm_w GROUP BY 1
    """


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    max_groups: int = 1024,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic, one-vs-rest per
    group — the distribution-drift detector of the evaluation layer
    (does THIS slice's length/quality/score distribution differ from
    the rest of the corpus?), with the engine's integer discipline:

        D = max_v |F_in(v) − F_rest(v)|
          = max_v |n_rest·cum_in(v) − n_in·cum_rest(v)| / (n_in·n_rest)

    evaluated at every distinct pooled value (the max of a pair of
    step functions is attained at a jump of either — evaluating only
    at the group's own points UNDERSTATES D when the rest jumps
    between them).  The cross-multiplied numerator keeps every
    comparison an exact integer; products ride decimal(38)/HUGEINT so
    n up to 10¹² rows is exact; d_ppm = (d_num·10⁶) DIV
    (n_in·n_rest) — all operands non-negative, so Spark's truncating
    DIV and DuckDB's flooring ``//`` agree.  The argmax value uses the
    SMALLEST-v tie-break (deterministic across engines and
    partitionings).

    Physical plan — never a per-pair or per-permutation job: one
    groupBy((group, value)) collapses the corpus to its histogram;
    the (group × distinct-value) evaluation grid is a broadcast
    cross-join of the ≤``max_groups`` group list onto the value
    histogram (guard raises LOUDLY above the cap, riding the used
    n_rest column so Catalyst can't prune it); one window per group
    ordered by value produces both cumulatives.  Grid size is
    G·|distinct v| — for unbounded-cardinality value columns, bucket
    upstream.

    A single-group input has n_rest = 0: D is undefined → d_ppm NULL
    (not 0 — "no rest sample" is absence of evidence).

    Output: one row per group
    (``group_col``, n_in, n_rest, d_ppm, d_at)."""
    cnt = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("c_in")
    )
    vals = cnt.groupBy(value_col).agg(
        F.sum("c_in").cast("long").alias("tot")
    )
    grps = cnt.groupBy(group_col).agg(
        F.sum("c_in").cast("long").alias("n_in")
    )
    tots = grps.agg(
        F.sum("n_in").cast("long").alias("n_all"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
    )
    grps_g = grps.crossJoin(F.broadcast(tots)).select(
        group_col,
        "n_in",
        F.when(
            F.col("n_groups") > int(max_groups),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"ks_two_sample: {group_col} cardinality "
                    ),
                    F.col("n_groups").cast("string"),
                    F.lit(
                        f" exceeds max_groups={int(max_groups)}; "
                        "bucket the group column or raise the cap"
                    ),
                )
            ).cast("long"),
        )
        .otherwise(F.col("n_all") - F.col("n_in"))
        .alias("n_rest"),
    )
    grid = (
        vals.crossJoin(F.broadcast(grps_g))
        .join(cnt, on=[group_col, value_col], how="left")
        .select(
            group_col,
            value_col,
            "n_in",
            "n_rest",
            "tot",
            F.coalesce(F.col("c_in"), F.lit(0)).alias("c_in"),
        )
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = grid.select(
        group_col,
        value_col,
        "n_in",
        "n_rest",
        F.sum("c_in").over(w).alias("cum_in"),
        F.sum("tot").over(w).alias("cum_tot"),
    ).select(
        group_col,
        value_col,
        "n_in",
        "n_rest",
        F.abs(
            F.col("n_rest").cast(_DEC) * F.col("cum_in")
            - F.col("n_in").cast(_DEC)
            * (F.col("cum_tot") - F.col("cum_in"))
        ).alias("d_num"),
    )
    pick = Window.partitionBy(group_col).orderBy(
        F.col("d_num").desc(), F.col(value_col).asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            group_col,
            "n_in",
            "n_rest",
            F.expr(
                f"CAST(CASE WHEN n_rest > 0 THEN "
                f"(d_num * 1000000) DIV "
                f"(CAST(n_in AS {_DEC}) * n_rest) END AS BIGINT)"
            ).alias("d_ppm"),
            F.col(value_col).cast("long").alias("d_at"),
        )
    )


def ks_two_sample_sql(
    src: str, group_col: str, value_col: str
) -> str:
    """DuckDB twin of :func:`ks_two_sample` (histogram collapse,
    full-pooled-value grid, HUGEINT cross-multiplied numerator,
    smallest-v argmax tie-break).  Standalone."""
    return f"""
        WITH ks_cnt AS (
            SELECT {group_col} AS g, {value_col} AS v,
                   CAST(COUNT(*) AS BIGINT) AS c_in
            FROM {src} GROUP BY 1, 2
        ),
        ks_vals AS (
            SELECT v, CAST(SUM(c_in) AS BIGINT) AS tot
            FROM ks_cnt GROUP BY 1
        ),
        ks_grp AS (
            SELECT g, CAST(SUM(c_in) AS BIGINT) AS n_in
            FROM ks_cnt GROUP BY 1
        ),
        ks_tot AS (
            SELECT CAST(SUM(n_in) AS BIGINT) AS n_all FROM ks_grp
        ),
        ks_grid AS (
            SELECT gr.g, va.v, gr.n_in,
                   t.n_all - gr.n_in AS n_rest,
                   va.tot, COALESCE(c.c_in, 0) AS c_in
            FROM ks_vals va
            CROSS JOIN ks_grp gr
            CROSS JOIN ks_tot t
            LEFT JOIN ks_cnt c ON c.g = gr.g AND c.v = va.v
        ),
        ks_cum AS (
            SELECT g, v, n_in, n_rest,
                   CAST(SUM(c_in) OVER w AS BIGINT) AS cum_in,
                   CAST(SUM(tot) OVER w AS BIGINT) AS cum_tot
            FROM ks_grid
            WINDOW w AS (PARTITION BY g ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW)
        ),
        ks_d AS (
            SELECT g, v, n_in, n_rest,
                   ABS(CAST(n_rest AS HUGEINT) * cum_in
                       - CAST(n_in AS HUGEINT)
                         * (cum_tot - cum_in)) AS d_num
            FROM ks_cum
        ),
        ks_best AS (
            SELECT g, v, n_in, n_rest, d_num,
                   ROW_NUMBER() OVER (
                       PARTITION BY g ORDER BY d_num DESC, v ASC
                   ) AS rn
            FROM ks_d
        )
        SELECT g AS {group_col}, n_in, n_rest,
               CAST(CASE WHEN n_rest > 0 THEN
                    (d_num * 1000000)
                    // (CAST(n_in AS HUGEINT) * n_rest)
               END AS BIGINT) AS d_ppm,
               CAST(v AS BIGINT) AS d_at
        FROM ks_best WHERE rn = 1
    """


def rank_sum_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact Mann–Whitney rank-sum test, one-vs-rest per group — the
    LOCATION-drift companion of :func:`ks_two_sample`: KS asks "does
    this slice's distribution differ ANYWHERE" (supremum of CDF gap),
    the rank-sum asks the sharper directional question "does this
    slice's values tend to sit ABOVE or BELOW the rest" — which is
    what a curation pipeline usually means by drift (slice X's docs
    got shorter / lower-quality than the corpus).

    Integer discipline — U doubled so midrank ties stay integral
    (``value_col`` must be integral: lengths, counts, scaled scores —
    the house discipline; cast upstream):

        2U = Σ_v c_in(v) · (2·rest_below(v) + rest_at(v))
        rest_below(v) = cum_tot(<v) − cum_in(<v)

    plus the common-language effect size auc_ppm = U/(n_in·n_rest)
    (= P(in > rest) + ½P(=), exactly roc_auc's quantity with the
    rest-of-corpus as the negative class) and the tie-corrected
    normal-approximation z² in ppm:

        Var(U) = n_in·n_rest·T / (12·N·(N−1)),
        T = (N+1)·N·(N−1) − Σ_v(t_v³−t_v)
        z² = (U − n_in·n_rest/2)² / Var(U)

    computed as STAGED truncating divisions,

        q2 = (2U − n·m)² DIV (n·m)          (≈ z²·4N/3, exact-ish)
        tt = T DIV (N·(N−1))                 (tie-corrected N+1 term)
        z2_ppm = (3·q2·10⁶) DIV (4·tt)

    staged this way because Spark's decimal DIV returns a SILENTLY
    WRAPPING int64 quotient (measured: decimal(38) DIV produces
    garbage past 2⁶³) — every quotient above is ≤ n·m, so the test is
    exact-to-staging for pooled N ≤ 6·10⁹ rows per test (u2 as BIGINT
    has the same bound); the staging truncation error is sub-ppm
    (≤ 3/(4N) absolute in z²) and IDENTICAL in both engines.  tt = 0
    (every pooled value tied, which subsumes N = 1, or ties so heavy
    the corrected variance rounds to zero at integer precision) makes
    z2_ppm NULL in BOTH engines by an explicit guard — Spark's
    DIV-by-zero yields NULL but DuckDB's ``//`` raises, so an
    unguarded twin would diverge loudly on a degenerate corpus.

    Physical plan — CHEAPER than KS: no group×value grid.  One
    groupBy((group, value)) histogram; cum_tot(<v) over the pooled
    distinct values via the house TWO-LEVEL prefix (value-bucket
    histogram + broadcast triangular offsets + bucket-local window —
    never an unpartitioned window, the round-1 dense_rank lesson); a
    per-group window over the group's OWN values for cum_in(<v); one
    final groupBy(group).  The statistic only jumps at the group's
    own points, so group cardinality never fans out a grid.

    Single-group inputs have n_rest = 0: auc_ppm/z2_ppm NULL (absence
    of evidence), u2 = 0 naturally.

    Output: one row per group
    (``group_col``, n_in, n_rest, u2, auc_ppm, z2_ppm)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be ≥ 2, got {n_buckets}")
    cnt = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("c_in")
    )
    vals = cnt.groupBy(value_col).agg(
        F.sum("c_in").cast("long").alias("tot")
    )
    bounds = vals.agg(
        F.min(value_col).cast("long").alias("_lo"),
        F.max(value_col).cast("long").alias("_hi"),
    )
    vals_b = vals.crossJoin(F.broadcast(bounds)).withColumn(
        "_rb",
        F.expr(
            f"CAST(((CAST({value_col} AS BIGINT) - _lo) "
            f"* {int(n_buckets)}) "
            f"DIV (GREATEST(_hi - _lo, 0) + 1) AS BIGINT)"
        ),
    )
    bhist = vals_b.groupBy("_rb").agg(F.sum("tot").alias("_bn"))
    earlier = bhist.select(
        F.col("_rb").alias("_prb"), F.col("_bn").alias("_pbn")
    )
    prefix = (
        bhist.join(
            F.broadcast(earlier), F.col("_prb") < F.col("_rb"), "left"
        )
        .groupBy("_rb")
        .agg(F.coalesce(F.sum("_pbn"), F.lit(0)).alias("_off"))
    )
    wb = (
        Window.partitionBy("_rb")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    vals_c = (
        vals_b.join(F.broadcast(prefix), "_rb")
        .withColumn(
            "cumtot_lt",
            F.col("_off")
            + F.coalesce(F.sum("tot").over(wb), F.lit(0)),
        )
        .select(value_col, "tot", "cumtot_lt")
    )
    ties = vals.agg(
        F.sum(
            F.col("tot").cast(_DEC) * F.col("tot") * F.col("tot")
            - F.col("tot")
        ).alias("tie_cubes"),
        F.sum("tot").cast("long").alias("n_all"),
    )
    wg = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = (
        cnt.withColumn(
            "cumin_lt",
            F.coalesce(F.sum("c_in").over(wg), F.lit(0)),
        )
        .join(vals_c, on=value_col)
        .groupBy(group_col)
        .agg(
            F.sum("c_in").cast("long").alias("n_in"),
            F.sum(
                F.col("c_in").cast(_DEC)
                * (
                    F.lit(2)
                    * (F.col("cumtot_lt") - F.col("cumin_lt"))
                    + (F.col("tot") - F.col("c_in"))
                )
            ).alias("u2"),
        )
    )
    t_term = (
        f"((CAST(n_all AS {_DEC}) + 1) * n_all * (n_all - 1) "
        f"- tie_cubes)"
    )
    r_term = (
        f"(CAST(u2 AS {_DEC}) "
        f"- CAST(n_in AS {_DEC}) * (n_all - n_in))"
    )
    # GREATEST(·,1): at N=1, T=0 → tt=0 → guard-false — without it the
    # twin's HUGEINT // would raise on the zero divisor (AND does not
    # short-circuit in SQL), diverging from Spark's NULL
    tt_term = (
        f"({t_term} DIV (CAST(n_all AS {_DEC}) "
        f"* GREATEST(n_all - 1, 1)))"
    )
    return scored.crossJoin(F.broadcast(ties)).selectExpr(
        group_col,
        "n_in",
        "CAST(n_all - n_in AS BIGINT) AS n_rest",
        "CAST(u2 AS BIGINT) AS u2",
        f"""CAST(CASE WHEN n_all > n_in THEN
            (CAST(u2 AS {_DEC}) * 1000000)
            DIV (CAST(2 AS {_DEC}) * n_in * (n_all - n_in))
        END AS BIGINT) AS auc_ppm""",
        f"""CAST(CASE WHEN n_all > n_in AND {tt_term} > 0 THEN
            (CAST(3 AS {_DEC})
             * ({r_term} * {r_term}
                DIV (CAST(n_in AS {_DEC}) * (n_all - n_in)))
             * 1000000)
            DIV (CAST(4 AS {_DEC}) * {tt_term})
        END AS BIGINT) AS z2_ppm""",
    )


def rank_sum_test_sql(src: str, group_col: str, value_col: str) -> str:
    """DuckDB twin of :func:`rank_sum_test` (histogram collapse,
    global + per-group below-cumulatives, HUGEINT doubled-U, the
    identical staged truncating divisions and the identical T = 0
    NULL guard — DuckDB's ``//`` raises on zero where Spark's DIV is
    NULL, so the guard is what keeps a degenerate corpus from
    DIVERGING instead of matching).  The twin's cumulative is a plain
    window — the two-level prefix is the OPERATOR's physical plan,
    not part of the semantics being verified.  Standalone."""
    t_term = (
        "((CAST(t.n_all AS HUGEINT) + 1) * t.n_all * (t.n_all - 1) "
        "- t.tie_cubes)"
    )
    tt_term = (
        f"({t_term} // (CAST(t.n_all AS HUGEINT) "
        f"* GREATEST(t.n_all - 1, 1)))"
    )
    return f"""
        WITH rs_cnt AS (
            SELECT {group_col} AS g, {value_col} AS v,
                   CAST(COUNT(*) AS BIGINT) AS c_in
            FROM {src} GROUP BY 1, 2
        ),
        rs_vals AS (
            SELECT v, CAST(SUM(c_in) AS BIGINT) AS tot
            FROM rs_cnt GROUP BY 1
        ),
        rs_vcum AS (
            SELECT v, tot,
                   CAST(COALESCE(SUM(tot) OVER (
                       ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cumtot_lt
            FROM rs_vals
        ),
        rs_ties AS (
            SELECT SUM(CAST(tot AS HUGEINT) * tot * tot - tot)
                       AS tie_cubes,
                   CAST(SUM(tot) AS BIGINT) AS n_all
            FROM rs_vals
        ),
        rs_g AS (
            SELECT g, v, c_in,
                   CAST(COALESCE(SUM(c_in) OVER (
                       PARTITION BY g ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS BIGINT) AS cumin_lt
            FROM rs_cnt
        ),
        rs_u AS (
            SELECT a.g, CAST(SUM(a.c_in) AS BIGINT) AS n_in,
                   SUM(CAST(a.c_in AS HUGEINT)
                       * (2 * (vc.cumtot_lt - a.cumin_lt)
                          + (vc.tot - a.c_in))) AS u2
            FROM rs_g a JOIN rs_vcum vc ON vc.v = a.v
            GROUP BY 1
        )
        SELECT u.g AS {group_col}, u.n_in,
               CAST(t.n_all - u.n_in AS BIGINT) AS n_rest,
               CAST(u.u2 AS BIGINT) AS u2,
               CAST(CASE WHEN t.n_all > u.n_in THEN
                   (CAST(u.u2 AS HUGEINT) * 1000000)
                   // (CAST(2 AS HUGEINT) * u.n_in
                       * (t.n_all - u.n_in))
               END AS BIGINT) AS auc_ppm,
               CAST(CASE WHEN t.n_all > u.n_in
                         AND {tt_term} > 0 THEN
                   (CAST(3 AS HUGEINT)
                    * ((CAST(u.u2 AS HUGEINT)
                        - CAST(u.n_in AS HUGEINT)
                          * (t.n_all - u.n_in))
                       * (CAST(u.u2 AS HUGEINT)
                          - CAST(u.n_in AS HUGEINT)
                            * (t.n_all - u.n_in))
                       // (CAST(u.n_in AS HUGEINT)
                           * (t.n_all - u.n_in)))
                    * 1000000)
                   // (CAST(4 AS HUGEINT) * {tt_term})
               END AS BIGINT) AS z2_ppm
        FROM rs_u u CROSS JOIN rs_ties t
    """


def mcnemar_paired(
    df: DataFrame,
    group_col: str,
    a_col: str,
    b_col: str,
) -> DataFrame:
    """Exact McNemar paired-classifier comparison per group — the
    missing third leg of the evaluation layer: :func:`roc_auc` grades
    ONE scorer, :func:`cohen_kappa` grades agreement as a symmetric
    quantity, McNemar answers the decision question "is filter A
    actually keeping DIFFERENT documents than filter B, beyond what
    their shared verdicts explain" — only the DISCORDANT pairs carry
    evidence (both-keep and both-drop cells cancel by design):

        b = #{A ∧ ¬B},  c = #{¬A ∧ B}
        χ²_ppm = (max(|b−c|−1, 0))²·10⁶ DIV (b+c)

    with Edwards' continuity correction clamped at zero (the raw
    (|b−c|−1)² would manufacture evidence from b = c) and NULL when
    b + c = 0 — no discordant pairs is absence of evidence, and the
    guard is also what keeps DuckDB's raising ``//`` aligned with
    Spark's NULL DIV.  All counts int64-exact; the ppm quotient is
    bounded by (b+c)·10⁶ so it fits Spark's int64 DIV to ~9·10¹²
    discordant pairs per group.

    One map-side-combined groupBy — the four cells are conditional
    counts, nothing joins, nothing fans out.

    Output: (group, n, n_both, n_neither, n_a_only, n_b_only,
    chi2_ppm)."""
    a = F.col(a_col).cast("boolean")
    b = F.col(b_col).cast("boolean")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            cnt(a & b).alias("n_both"),
            cnt(~a & ~b).alias("n_neither"),
            cnt(a & ~b).alias("n_a_only"),
            cnt(~a & b).alias("n_b_only"),
        )
        .selectExpr(
            group_col,
            "n", "n_both", "n_neither", "n_a_only", "n_b_only",
            """CAST(CASE WHEN n_a_only + n_b_only > 0 THEN
                (GREATEST(ABS(n_a_only - n_b_only) - 1, 0)
                 * GREATEST(ABS(n_a_only - n_b_only) - 1, 0)
                 * CAST(1000000 AS DECIMAL(38,0)))
                DIV (n_a_only + n_b_only)
            END AS BIGINT) AS chi2_ppm""",
        )
    )


def mcnemar_paired_sql(
    src: str, group_col: str, a_expr: str, b_expr: str
) -> str:
    """DuckDB twin of :func:`mcnemar_paired` (same four conditional
    counts, clamped continuity correction, b+c = 0 NULL guard).
    ``a_expr``/``b_expr`` are boolean SQL expressions over ``src``.
    Standalone."""
    return f"""
        WITH mc_cells AS (
            SELECT {group_col} AS g,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN ({a_expr}) AND ({b_expr})
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
                   CAST(SUM(CASE WHEN NOT ({a_expr})
                        AND NOT ({b_expr})
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_neither,
                   CAST(SUM(CASE WHEN ({a_expr})
                        AND NOT ({b_expr})
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
                   CAST(SUM(CASE WHEN NOT ({a_expr}) AND ({b_expr})
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only
            FROM {src} GROUP BY 1
        )
        SELECT g AS {group_col},
               n, n_both, n_neither, n_a_only, n_b_only,
               CAST(CASE WHEN n_a_only + n_b_only > 0 THEN
                   (GREATEST(ABS(n_a_only - n_b_only) - 1, 0)
                    * GREATEST(ABS(n_a_only - n_b_only) - 1, 0)
                    * CAST(1000000 AS HUGEINT))
                   // (n_a_only + n_b_only)
               END AS BIGINT) AS chi2_ppm
        FROM mc_cells
    """


def isotonic_calibrate(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    key_cols: list,
    n_bins: int = 10,
    max_bins: int = 64,
) -> DataFrame:
    """Per-key ISOTONIC calibration (pool-adjacent-violators fit) of a
    [0, 10⁶]-ppm score against a boolean outcome — the monotone
    repair step after :func:`calibration_bins` diagnoses
    miscalibration: the best monotone-non-decreasing fit (L2, hence
    also the canonical calibration map) of observed positive rate
    as a function of score bin.

    PAVA is a sequential pooling scan — useless shape for a shuffle
    engine — but its fixpoint has the order-free MIN-MAX closed form

        iso_k = max_{i ≤ k} min_{j ≥ k} rate(i..j),
        rate(i..j) = Σ pos / Σ n over nonempty bins i..j

    so the fit is three bounded joins instead of a loop.  Exactness:
    each block rate is floor-quantized to ppm FIRST, and floor is
    monotone non-decreasing, so min∘floor = floor∘min and
    max∘floor = floor∘max — the nested integer result is exactly
    ⌊10⁶·(true isotonic fit)⌋, no float anywhere (verified against a
    Fraction-exact stack PAVA in tests — a different algorithm
    family).

    Scale: per key the expansion is ≤ B³/2 rows for B nonempty bins
    (B ≤ ``max_bins``, loud assert riding the bin column — beyond
    that an isotonic diagram is the wrong tool; raise n_bins
    consciously), all three joins are key-local (one shuffle by key,
    AQE handles key skew), counts are map-side partial aggs.  Empty
    bins carry no weight and no fit row (PAVA is undefined there;
    interpolate presentation-side if needed).

    Returns (key..., bin, n, observed_ppm, iso_ppm), nonempty bins
    only; iso_ppm is non-decreasing in bin within every key by
    construction."""
    if not 1 <= int(n_bins) <= 10_000:
        raise ValueError(f"n_bins out of range: {n_bins}")
    if not isinstance(key_cols, (list, tuple)) or not key_cols:
        raise ValueError("key_cols must be a non-empty list")
    nb, keys = int(n_bins), [str(k) for k in key_cols]
    guard_rng = F.when(
        (F.col("_s") < 0) | (F.col("_s") > 1_000_000),
        F.assert_true(
            F.lit(False),
            F.lit("isotonic_calibrate: score outside [0, 1e6] ppm"),
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    binned = scored.select(
        *keys,
        F.col(score_col).cast("bigint").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).select(
        *keys,
        (F.least(F.expr(f"_s * {nb} DIV 1000000"), F.lit(nb - 1))
         + guard_rng).cast("int").alias("bin"),
        "_y",
    )
    bins = binned.groupBy(*keys, "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_y").cast("bigint")).alias("_pos"),
    )
    wk = Window.partitionBy(*keys)
    guard_nb = F.when(
        F.count(F.lit(1)).over(wk) > int(max_bins),
        F.assert_true(
            F.lit(False),
            F.lit(f"isotonic_calibrate: more than {int(max_bins)} "
                  "nonempty bins per key"),
        ).cast("int"),
    ).otherwise(F.lit(0))
    bins = bins.select(
        *keys, (F.col("bin") + guard_nb).alias("bin"), "n", "_pos"
    )
    lo = bins.select(*keys, F.col("bin").alias("_i"))
    hi = bins.select(*keys, F.col("bin").alias("_j"))
    mem = bins.select(*keys, F.col("bin").alias("_m"),
                      F.col("n").alias("_mn"), F.col("_pos").alias("_mp"))
    blocks = (
        lo.join(hi, keys).where(F.col("_i") <= F.col("_j"))
        .join(mem, keys)
        .where(F.col("_m").between(F.col("_i"), F.col("_j")))
        .groupBy(*keys, "_i", "_j")
        .agg(F.expr(
            "CAST((SUM(_mp) * 1000000) DIV SUM(_mn) AS BIGINT)"
        ).alias("_rate"))
    )
    at_k = (
        bins.select(*keys, F.col("bin").alias("_k"))
        .join(blocks, keys)
        .where((F.col("_i") <= F.col("_k")) & (F.col("_j") >= F.col("_k")))
    )
    inner = at_k.groupBy(*keys, "_k", "_i").agg(
        F.min("_rate").alias("_minr")
    )
    iso = inner.groupBy(*keys, "_k").agg(
        F.max("_minr").alias("iso_ppm")
    )
    return (
        bins.join(iso, [*keys, *[]], "inner")
        .where(F.col("bin") == F.col("_k"))
        .select(
            *keys, "bin", F.col("n").cast("bigint").alias("n"),
            F.expr(
                "CAST((_pos * 1000000) DIV n AS BIGINT)"
            ).alias("observed_ppm"),
            "iso_ppm",
        )
    )


def isotonic_calibrate_sql(
    src: str,
    score_col: str,
    label_col: str,
    key_cols: list,
    n_bins: int = 10,
    max_bins: int = 64,
) -> str:
    """DuckDB twin of :func:`isotonic_calibrate` (standalone,
    iso_*-namespaced): same binning, same min-max nest over
    ppm-floored block rates, error() guards riding used columns."""
    if not 1 <= int(n_bins) <= 10_000:
        raise ValueError(f"n_bins out of range: {n_bins}")
    nb, keys = int(n_bins), [str(k) for k in key_cols]
    kl = ", ".join(keys)
    ja = " AND ".join(f"b.{k} = a.{k}" for k in keys)
    jm = " AND ".join(f"m.{k} = p.{k}" for k in keys)
    jk = " AND ".join(f"t.{k} = z.{k}" for k in keys)
    jo = " AND ".join(f"o.{k} = t.{k}" for k in keys)
    return f"""
        WITH iso_rows AS (
            SELECT {kl},
                   LEAST(CAST({score_col} AS BIGINT) * {nb} // 1000000,
                         {nb} - 1)
                   + CASE WHEN CAST({score_col} AS BIGINT) < 0
                            OR CAST({score_col} AS BIGINT) > 1000000
                          THEN CAST(error(
                    'isotonic_calibrate: score outside [0, 1e6] ppm'
                          ) AS BIGINT) ELSE 0 END AS bin,
                   CAST({label_col} AS BOOLEAN) AS y
            FROM {src}
        ),
        iso_bins0 AS (
            SELECT {kl}, bin, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                       AS pos
            FROM iso_rows GROUP BY ALL
        ),
        iso_bins AS (
            SELECT {kl},
                   bin + CASE WHEN COUNT(*) OVER
                                   (PARTITION BY {kl}) > {int(max_bins)}
                              THEN CAST(error(
                    'isotonic_calibrate: more than {int(max_bins)} '
                    'nonempty bins per key'
                              ) AS BIGINT) ELSE 0 END AS bin,
                   n, pos
            FROM iso_bins0
        ),
        iso_blocks AS (
            SELECT a.{', a.'.join(keys)}, a.bin AS i, b.bin AS j,
                   CAST((SUM(m.pos) * 1000000) // SUM(m.n) AS BIGINT)
                       AS rate
            FROM iso_bins a
            JOIN iso_bins b ON {ja} AND b.bin >= a.bin
            JOIN iso_bins m
              ON {" AND ".join(f"m.{k} = a.{k}" for k in keys)}
             AND m.bin BETWEEN a.bin AND b.bin
            GROUP BY ALL
        ),
        iso_inner AS (
            SELECT p.{', p.'.join(keys)}, m.bin AS k, p.i,
                   MIN(p.rate) AS minr
            FROM iso_bins m
            JOIN iso_blocks p
              ON {jm} AND p.i <= m.bin AND p.j >= m.bin
            GROUP BY ALL
        ),
        iso_fit AS (
            SELECT {kl}, k, MAX(minr) AS iso_ppm
            FROM iso_inner GROUP BY ALL
        )
        SELECT t.{', t.'.join(keys)}, t.bin, t.n,
               CAST((t.pos * 1000000) // t.n AS BIGINT) AS observed_ppm,
               z.iso_ppm
        FROM iso_bins t
        JOIN iso_fit z ON {jk} AND z.k = t.bin
    """


def anova_oneway(
    rows: DataFrame,
    slice_col: str,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Exact one-way ANOVA per slice — the PARAMETRIC cross-group
    spread test beside ks (distribution shape) and rank_sum
    (location, robust): does the group factor explain variance in the
    value at all?  With per-group totals T_g, sizes n_g, grand total
    T, grand size N, and raw square sum S:

        SSB = Σ_g T_g²/n_g − T²/N        SSW = S − Σ_g T_g²/n_g
        F   = (N−k)/(k−1) · SSB/SSW      η²  = SSB/(SSB+SSW)

    evaluated in micro-units with ONE declared floor per group term
    ((T_g²·10⁶) DIV n_g — the readability discipline of independent
    non-negative floors; ssb is clamped at 0 because the k
    independent floors can push an exactly-zero SSB to −k µ-units),
    then one declared division each for f_ppm and eta2_ppm.  No
    float, no mean subtraction (the totals form), products in
    DECIMAL(38)/HUGEINT.

    Degenerate slices: k < 2 or N ≤ k → NULL F and η²; SSW = 0 with
    SSB > 0 (perfect separation) → NULL F (infinite), η² = 10⁶.

    Physical plan: two nested hash aggregations (slice, group) →
    (slice), both map-side partial — never a window, never a join.

    Output: (slice, k_groups, n, ssb_micro, ssw_micro, f_ppm,
    eta2_ppm)."""
    g = (
        rows.select(
            F.col(slice_col).alias("sl"),
            F.col(group_col).alias("g"),
            F.col(value_col).cast("bigint").alias("y"),
        )
        .groupBy("sl", "g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("ng"),
            F.sum(F.col("y").cast(_DEC)).alias("tg"),
            F.sum((F.col("y") * F.col("y")).cast(_DEC)).alias("sg"),
        )
    )
    agg = g.groupBy("sl").agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("tg").alias("t"),
        F.sum("sg").alias("s"),
        F.sum(F.expr("(tg * tg * 1000000) DIV ng")).alias("bsum"),
    )
    ssb = "greatest(CAST(0 AS DECIMAL(38,0)), bsum - (t * t * 1000000) DIV n)"
    ssw = "(s * 1000000 - bsum)"
    return agg.select(
        F.col("sl").alias(slice_col),
        "k_groups",
        "n",
        F.expr(f"CAST({ssb} AS BIGINT)").alias("ssb_micro"),
        F.expr(f"CAST({ssw} AS BIGINT)").alias("ssw_micro"),
        F.expr(
            f"CAST(CASE WHEN k_groups < 2 OR n <= k_groups "
            f"OR {ssw} = 0 THEN NULL "
            f"ELSE ((n - k_groups) * {ssb} * 1000000) "
            f"DIV ((k_groups - 1) * {ssw}) END AS BIGINT)"
        ).alias("f_ppm"),
        F.expr(
            f"CAST(CASE WHEN k_groups < 2 OR n <= k_groups THEN NULL "
            f"WHEN {ssb} + {ssw} = 0 THEN NULL "
            f"ELSE ({ssb} * 1000000) DIV ({ssb} + {ssw}) "
            f"END AS BIGINT)"
        ).alias("eta2_ppm"),
    )


def anova_oneway_sql(
    src: str,
    slice_col: str,
    group_col: str,
    value_col: str,
) -> str:
    """DuckDB twin of :func:`anova_oneway` — identical totals form,
    once-per-group floored micro-units, HUGEINT products, the same
    declared divisions.  Standalone."""
    return f"""
        WITH av_g AS (
            SELECT {slice_col} AS sl, {group_col} AS g,
                   CAST(COUNT(*) AS HUGEINT) AS ng,
                   SUM(CAST({value_col} AS HUGEINT)) AS tg,
                   SUM(CAST({value_col} AS HUGEINT) * {value_col})
                       AS sg
            FROM {src} GROUP BY 1, 2
        ),
        av_a AS (
            SELECT sl,
                   CAST(COUNT(*) AS HUGEINT) AS k_groups,
                   SUM(ng) AS n,
                   SUM(tg) AS t,
                   SUM(sg) AS s,
                   SUM((tg * tg * 1000000) // ng) AS bsum
            FROM av_g GROUP BY 1
        )
        SELECT sl AS {slice_col},
               CAST(k_groups AS BIGINT) AS k_groups,
               CAST(n AS BIGINT) AS n,
               CAST(GREATEST(CAST(0 AS HUGEINT),
                    bsum - (t * t * 1000000) // n) AS BIGINT)
                   AS ssb_micro,
               CAST(s * 1000000 - bsum AS BIGINT) AS ssw_micro,
               CAST(CASE WHEN k_groups < 2 OR n <= k_groups
                         OR s * 1000000 - bsum = 0 THEN NULL
                 ELSE ((n - k_groups)
                       * GREATEST(CAST(0 AS HUGEINT),
                             bsum - (t * t * 1000000) // n)
                       * 1000000)
                      // ((k_groups - 1) * (s * 1000000 - bsum))
               END AS BIGINT) AS f_ppm,
               CAST(CASE WHEN k_groups < 2 OR n <= k_groups THEN NULL
                 WHEN GREATEST(CAST(0 AS HUGEINT),
                          bsum - (t * t * 1000000) // n)
                      + (s * 1000000 - bsum) = 0 THEN NULL
                 ELSE (GREATEST(CAST(0 AS HUGEINT),
                           bsum - (t * t * 1000000) // n) * 1000000)
                      // (GREATEST(CAST(0 AS HUGEINT),
                              bsum - (t * t * 1000000) // n)
                          + (s * 1000000 - bsum))
               END AS BIGINT) AS eta2_ppm
        FROM av_a
    """


def fleiss_kappa(
    ratings: DataFrame,
    group_col: str,
    item_col: str,
    cat_col: str,
) -> DataFrame:
    """Exact Fleiss' kappa per group — chance-corrected agreement
    among r ANONYMOUS raters per item (the r > 2 generalization of
    :func:`cohen_kappa`, which identifies its two raters).  With
    n_ij = ratings of item i in category j, T_j = Σ_i n_ij,
    A = Σ_ij n_ij², M = N·r:

        κ = ((A − M)·M − B·(r−1)) / ((r−1)·(M² − B)),   B = Σ_j T_j²

    — the cleared-integer rational of (P̄ₒ − P̄ₑ)/(1 − P̄ₑ), evaluated
    exactly; kappa_ppm under one sign-decomposed trunc-toward-zero
    division (κ < 0 = worse than chance, real and representable).

    Every item in a group MUST carry the same rating count r: the
    operator fails LOUDLY (assert_true riding the output column —
    Catalyst cannot prune it) on ragged panels rather than averaging
    them silently; r = 1 (no pair to agree) and P̄ₑ = 1 (degenerate
    marginals) emit NULL.

    Physical plan: contingency groupBy(group, item, cat), re-aggregate
    per item then per group, marginal groupBy(group, cat) → per group,
    one group-keyed join of two TINY aggregates.  Never a pairwise
    rater join — raters are anonymous counts, so the r² pair space of
    the Cohen form never materializes.

    Output: (group, n_items, n_raters, kappa_ppm)."""
    cont = (
        ratings.select(
            F.col(group_col).alias("grp"),
            F.col(item_col).alias("it"),
            F.col(cat_col).alias("cat"),
        )
        .groupBy("grp", "it", "cat")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
    )
    per_item = cont.groupBy("grp", "it").agg(
        F.sum("nij").cast("bigint").alias("ri"),
        F.sum(F.expr(f"CAST(nij AS {_DEC}) * nij")).alias("ai"),
    )
    per_grp = per_item.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.min("ri").alias("rmin"),
        F.max("ri").alias("rmax"),
        F.sum("ai").alias("a"),
    )
    marg = (
        cont.groupBy("grp", "cat")
        .agg(F.sum("nij").cast("bigint").alias("tj"))
        .groupBy("grp")
        .agg(F.sum(F.expr(f"CAST(tj AS {_DEC}) * tj")).alias("b"))
    )
    j = per_grp.join(marg, "grp")
    m = f"(CAST(n_items AS {_DEC}) * rmin)"
    num = f"((a - {m}) * {m} - b * (rmin - 1))"
    den = f"((rmin - 1) * ({m} * {m} - b))"
    return j.select(
        F.col("grp").alias(group_col),
        "n_items",
        # ragged-panel guard rides the emitted rater count
        F.when(
            F.expr("assert_true(rmin = rmax, "
                   "'fleiss_kappa: ragged panel — items with "
                   "differing rating counts')").isNull(),
            F.col("rmin"),
        ).alias("n_raters"),
        F.expr(
            f"CAST(CASE WHEN rmin < 2 OR {den} = 0 THEN NULL "
            f"WHEN {num} < 0 THEN -(((-{num}) * 1000000) DIV {den}) "
            f"ELSE ({num} * 1000000) DIV {den} END AS BIGINT)"
        ).alias("kappa_ppm"),
    )


def fleiss_kappa_sql(
    src: str, group_col: str, item_col: str, cat_col: str
) -> str:
    """DuckDB twin of :func:`fleiss_kappa` (HUGEINT cleared form,
    sign-decomposed truncating division; assumes a rectangular panel
    — the operator's guard is the loud one).  Standalone."""
    return f"""
        WITH fk_cont AS (
            SELECT {group_col} AS grp, {item_col} AS it,
                   {cat_col} AS cat, COUNT(*) AS nij
            FROM {src} GROUP BY 1, 2, 3
        ),
        fk_item AS (
            SELECT grp, it, CAST(SUM(nij) AS HUGEINT) AS ri,
                   SUM(CAST(nij AS HUGEINT) * nij) AS ai
            FROM fk_cont GROUP BY 1, 2
        ),
        fk_grp AS (
            SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n_items,
                   MIN(ri) AS r, SUM(ai) AS a
            FROM fk_item GROUP BY 1
        ),
        fk_marg AS (
            SELECT grp, SUM(CAST(tj AS HUGEINT) * tj) AS b
            FROM (
                SELECT grp, cat, CAST(SUM(nij) AS HUGEINT) AS tj
                FROM fk_cont GROUP BY 1, 2
            ) GROUP BY 1
        )
        SELECT g.grp AS {group_col},
               CAST(g.n_items AS BIGINT) AS n_items,
               CAST(g.r AS BIGINT) AS n_raters,
               CAST(CASE
                 WHEN g.r < 2
                   OR (g.r - 1) * (g.n_items * g.r * g.n_items * g.r
                                   - m.b) = 0 THEN NULL
                 WHEN (g.a - g.n_items * g.r) * g.n_items * g.r
                      - m.b * (g.r - 1) < 0 THEN
                   -(((-((g.a - g.n_items * g.r) * g.n_items * g.r
                         - m.b * (g.r - 1))) * 1000000)
                     // ((g.r - 1)
                         * (g.n_items * g.r * g.n_items * g.r - m.b)))
                 ELSE (((g.a - g.n_items * g.r) * g.n_items * g.r
                        - m.b * (g.r - 1)) * 1000000)
                      // ((g.r - 1)
                          * (g.n_items * g.r * g.n_items * g.r - m.b))
               END AS BIGINT) AS kappa_ppm
        FROM fk_grp g JOIN fk_marg m USING (grp)
    """


# quantized DCG discounts: round(10⁹ / log2(i+1)) for rank i —
# declared constants (the Benford-table trick: the irrational log is
# frozen ONCE here, both engines consume identical integers)
import math as _math

NDCG_DISC_U = tuple(
    round(1_000_000_000 / _math.log2(i + 1)) for i in range(1, 41)
)
assert NDCG_DISC_U[0] == 1_000_000_000


def ndcg_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query nDCG@k over binary relevance — the position-
    discounted member of the retrieval report card
    (:func:`ranking_eval` covers MRR/MAP/P@k/recall; nDCG is the one
    that credits a relevant doc at rank 3 more than rank 9 even when
    both are "found"):

        DCG  = Σ_{hits} disc[rank]        disc[i] = ⌊10⁹/log2(i+1)⌉
        IDCG = Σ_{i ≤ min(R, k)} disc[i]  (all R relevants up front)
        nDCG = (DCG·10⁶) DIV IDCG

    The irrational log discount is frozen as DECLARED integer
    constants (NDCG_DISC_U — module-level, consumed identically by
    both engines; the Benford-table discipline), so the statistic is
    exactly rational and hash-stable.  R counts the query's FULL
    relevance set (a query with more relevants than k can still reach
    nDCG = 10⁶ by filling its window); R = 0 → NULL.

    Plan: one left-semi-style join marking hits, one query
    aggregation with element_at into the broadcast constant arrays
    (discounts AND their prefix sums are literals — IDCG is one
    array lookup, not a join).

    Returns (query_id, n_rel_in_k, n_rel_total, dcg_u, idcg_u,
    ndcg_ppm)."""
    if not (1 <= int(k) <= len(NDCG_DISC_U)):
        raise ValueError(
            f"k must be in [1, {len(NDCG_DISC_U)}]: {k}"
        )
    disc = list(NDCG_DISC_U[: int(k)])
    prefix = []
    s = 0
    for d in disc:
        s += d
        prefix.append(s)
    disc_arr = "array({})".format(", ".join(map(str, disc)))
    pref_arr = "array({})".format(", ".join(map(str, prefix)))
    rel_counts = qrels.groupBy(
        F.col(query_col).alias("_q")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rel_total"))
    marked = runs.where(F.col(rank_col) <= int(k)).join(
        qrels.select(
            F.col(query_col).alias("_mq"),
            F.col(doc_col).alias("_md"),
            F.lit(1).alias("_rel"),
        ),
        (F.col(query_col) == F.col("_mq"))
        & (F.col(doc_col) == F.col("_md")),
        "left",
    )
    agg = marked.groupBy(F.col(query_col)).agg(
        F.sum(F.coalesce("_rel", F.lit(0))).cast("bigint")
        .alias("n_rel_in_k"),
        F.sum(
            F.when(
                F.col("_rel").isNotNull(),
                F.expr(
                    f"element_at({disc_arr}, "
                    f"CAST({rank_col} AS INT))"
                ),
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("dcg_u"),
    )
    j = agg.join(
        rel_counts, agg[query_col] == rel_counts._q, "left"
    ).withColumn(
        "n_rel_total", F.coalesce("n_rel_total", F.lit(0))
    ).withColumn(
        "idcg_u",
        F.when(
            F.col("n_rel_total") > 0,
            F.expr(
                f"element_at({pref_arr}, "
                f"CAST(least(n_rel_total, {int(k)}) AS INT))"
            ),
        ).cast("bigint"),
    )
    return j.select(
        query_col, "n_rel_in_k", "n_rel_total", "dcg_u", "idcg_u",
        F.expr(
            "CAST(CASE WHEN idcg_u IS NULL THEN NULL "
            "ELSE (CAST(dcg_u AS DECIMAL(38,0)) * 1000000) "
            "DIV idcg_u END AS BIGINT)"
        ).alias("ndcg_ppm"),
    )


def ndcg_eval_sql(
    runs_src: str,
    qrels_src: str,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> str:
    """DuckDB twin of :func:`ndcg_eval` — the identical frozen
    discount table and prefix sums as SQL literals.  Standalone."""
    disc = list(NDCG_DISC_U[: int(k)])
    prefix = []
    s = 0
    for d in disc:
        s += d
        prefix.append(s)
    disc_l = "[" + ", ".join(map(str, disc)) + "]"
    pref_l = "[" + ", ".join(map(str, prefix)) + "]"
    return f"""
        WITH nd_marked AS (
            SELECT r.{query_col} AS q, r.{rank_col} AS rnk,
                   CASE WHEN g.{doc_col} IS NOT NULL
                        THEN 1 ELSE 0 END AS rel
            FROM {runs_src} r
            LEFT JOIN {qrels_src} g
              ON g.{query_col} = r.{query_col}
             AND g.{doc_col} = r.{doc_col}
            WHERE r.{rank_col} <= {int(k)}
        ),
        nd_agg AS (
            SELECT q,
                   CAST(SUM(rel) AS BIGINT) AS n_rel_in_k,
                   CAST(SUM(CASE WHEN rel = 1
                        THEN {disc_l}[rnk] ELSE 0 END) AS BIGINT)
                       AS dcg_u
            FROM nd_marked GROUP BY 1
        ),
        nd_rel AS (
            SELECT {query_col} AS q,
                   CAST(COUNT(*) AS BIGINT) AS n_rel_total
            FROM {qrels_src} GROUP BY 1
        )
        SELECT a.q AS {query_col}, a.n_rel_in_k,
               COALESCE(r.n_rel_total, 0) AS n_rel_total,
               a.dcg_u,
               CASE WHEN COALESCE(r.n_rel_total, 0) > 0 THEN
                   CAST({pref_l}[CAST(LEAST(r.n_rel_total, {int(k)})
                                 AS INT)] AS BIGINT)
               END AS idcg_u,
               CASE WHEN COALESCE(r.n_rel_total, 0) > 0 THEN
                   CAST((CAST(a.dcg_u AS HUGEINT) * 1000000)
                        // {pref_l}[CAST(LEAST(r.n_rel_total,
                                              {int(k)}) AS INT)]
                        AS BIGINT)
               END AS ndcg_ppm
        FROM nd_agg a LEFT JOIN nd_rel r USING (q)
    """


def brier_score(
    scored: DataFrame,
    group_col: str,
    prob_col: str,
    outcome_col: str,
) -> DataFrame:
    """Per-group Brier score — the PROPER scoring rule of the
    calibration family (:func:`calibration_bins` shows WHERE a
    predictor lies; the Brier score is the single number a model
    comparison sorts on, and unlike accuracy it punishes confident
    wrongness):

        brier     = Σ (p − y)² / n        p, y ∈ [0, 1]
        uncert    = ȳ·(1 − ȳ)             (the no-skill floor)

    in exact ppm² integers: ``prob_col`` is a ppm prediction
    (0..10⁶, the percentile_calibrate convention — validated loudly,
    assert_true riding the emitted n), y·10⁶ the outcome, the square
    sum exact in DECIMAL(38)/HUGEINT, ONE declared floor each for
    brier_ppm2 = Σ(p−y·10⁶)² DIV n and uncertainty_ppm2 =
    (n_pos·(n−n_pos)·10¹²) DIV n².  brier < uncert ⟺ the predictor
    beats the base rate — both emitted, the skill is the reader's
    subtraction.

    Plan: one group aggregation, map-side partial — nothing else.

    Returns (group, n, n_pos, brier_ppm2, uncertainty_ppm2)."""
    dec = "DECIMAL(38,0)"
    base = scored.select(
        F.col(group_col).alias("grp"),
        F.col(prob_col).cast("bigint").alias("p"),
        F.col(outcome_col).cast("boolean").cast("int").alias("y"),
    )
    agg = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("_n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(
            F.expr(
                f"CAST(p - y * 1000000 AS {dec})"
                f" * (p - y * 1000000)"
            )
        ).alias("_sq"),
        F.max(
            (F.col("p") < 0) | (F.col("p") > 1_000_000)
        ).alias("_bad"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        F.when(
            F.expr(
                "assert_true(NOT _bad, 'brier_score: prob_col out of "
                "[0, 1000000] ppm range')"
            ).isNull(),
            F.col("_n"),
        ).alias("n"),
        "n_pos",
        F.expr("CAST(_sq DIV _n AS BIGINT)").alias("brier_ppm2"),
        F.expr(
            f"CAST((CAST(n_pos AS {dec}) * (_n - n_pos) * "
            f"1000000000000) DIV (CAST(_n AS {dec}) * _n) AS BIGINT)"
        ).alias("uncertainty_ppm2"),
    )


def brier_score_sql(
    src: str,
    group_col: str,
    prob_col: str,
    outcome_col: str,
) -> str:
    """DuckDB twin of :func:`brier_score` (HUGEINT square sums, same
    declared floors; assumes in-range ppm — the operator owns the
    loud guard).  Standalone."""
    return f"""
        WITH bs_base AS (
            SELECT {group_col} AS grp,
                   CAST({prob_col} AS BIGINT) AS p,
                   CASE WHEN {outcome_col} THEN 1 ELSE 0 END AS y
            FROM {src}
        ),
        bs_agg AS (
            SELECT grp,
                   CAST(COUNT(*) AS HUGEINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   SUM(CAST(p - y * 1000000 AS HUGEINT)
                       * (p - y * 1000000)) AS sq
            FROM bs_base GROUP BY 1
        )
        SELECT grp AS {group_col},
               CAST(n AS BIGINT) AS n,
               n_pos,
               CAST(sq // n AS BIGINT) AS brier_ppm2,
               CAST((CAST(n_pos AS HUGEINT) * (n - n_pos)
                     * 1000000000000) // (n * n) AS BIGINT)
                   AS uncertainty_ppm2
        FROM bs_agg
    """


# lcm(1..12): every pairable-item denominator (n_u − 1) ≤ 12 divides
# it, so Krippendorff's per-item disagreement terms clear to EXACT
# integers under one shared constant (the Benford-table discipline:
# the only "hard" number is frozen once, identically in both engines)
KRIPP_LCM = 27_720
KRIPP_MAX_RATINGS = 13


def krippendorff_alpha(
    ratings: DataFrame,
    group_col: str,
    item_col: str,
    cat_col: str,
) -> DataFrame:
    """Exact nominal Krippendorff's alpha per group — the agreement
    coefficient for RAGGED panels, which is precisely the case
    :func:`fleiss_kappa` refuses loudly: real annotation jobs have
    items with 2 raters and items with 5, and alpha is the standard
    statistic that handles missing ratings instead of failing on them
    (items with a single rating carry no pair and are dropped, per
    Krippendorff's definition).

    With per-item category counts n_uc (n_u = Σ_c n_uc, pairable
    items have n_u ≥ 2), marginals n_c over pairable items, and
    n = Σ n_u:

        α = 1 − (n−1)·Σ_u [(n_u² − Σ_c n_uc²)/(n_u−1)] / (n² − Σ_c n_c²)

    The per-item denominators (n_u − 1) vary — the trap that pushes
    implementations to floats.  They are also BOUNDED: n_u ≤ 13 is
    enforced loudly (assert_true riding the output), so multiplying
    every term by LCM(1..12) = 27 720 clears each to an exact integer
    and α becomes one cleared rational, alpha_ppm under one
    sign-decomposed truncating division (α < 0 — disagreement worse
    than chance — is real and representable).  Bounds: the widest
    product (n−1)·Σ_u t_u ≤ 12·27 720·n² rides decimal(38,0)
    comfortably to n ~ 10¹⁶ pairable ratings.

    Degenerate cases emit NULL: n < 2, or every pairable rating in
    one category (De = 0).  Groups with NO pairable item vanish from
    the output (there is nothing to estimate), documented.

    Physical plan: contingency groupBy(group, item, cat); n_u via a
    (group, item)-keyed window (no self-join); pairable filter; one
    re-aggregation per item, one per group, one marginal groupBy
    joined group-keyed.  Raters stay anonymous counts — no rater-pair
    join ever materializes.

    Output: (group, n_items, n_ratings, alpha_ppm)."""
    from pyspark.sql import Window as W

    cont = (
        ratings.select(
            F.col(group_col).alias("grp"),
            F.col(item_col).alias("it"),
            F.col(cat_col).alias("cat"),
        )
        .groupBy("grp", "it", "cat")
        .agg(F.count(F.lit(1)).cast("bigint").alias("nij"))
        .withColumn(
            "ri",
            F.sum("nij").over(W.partitionBy("grp", "it")),
        )
        .where(F.col("ri") >= 2)
    )
    per_item = cont.groupBy("grp", "it").agg(
        F.max("ri").cast("bigint").alias("ru"),
        F.sum(F.expr(f"CAST(nij AS {_DEC}) * nij")).alias("au"),
    ).select(
        "grp", "ru",
        # (n_u² − Σ_c n_uc²) · L / (n_u − 1) — exact: (n_u−1) | L
        F.expr(
            f"(CAST(ru AS {_DEC}) * ru - au) * {KRIPP_LCM}"
            " DIV (ru - 1)"
        ).alias("tu"),
    )
    per_grp = per_item.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.max("ru").alias("rumax"),
        F.sum(F.expr(f"CAST(ru AS {_DEC})")).alias("n"),
        F.sum(F.expr(f"CAST(tu AS {_DEC})")).alias("t"),
    )
    marg = (
        cont.groupBy("grp", "cat")
        .agg(F.sum("nij").cast("bigint").alias("tj"))
        .groupBy("grp")
        .agg(F.sum(F.expr(f"CAST(tj AS {_DEC}) * tj")).alias("b"))
    )
    j = per_grp.join(marg, "grp")
    den = f"(CAST({KRIPP_LCM} AS {_DEC}) * (n * n - b))"
    num = f"({den} - (n - 1) * t)"
    return j.select(
        F.col("grp").alias(group_col),
        "n_items",
        # loud bound guard rides the emitted ratings count
        F.when(
            F.expr(
                f"assert_true(rumax <= {KRIPP_MAX_RATINGS}, "
                "'krippendorff_alpha: an item carries more than "
                f"{KRIPP_MAX_RATINGS} ratings — raise KRIPP_LCM')"
            ).isNull(),
            F.col("n").cast("bigint"),
        ).alias("n_ratings"),
        F.expr(
            f"CAST(CASE WHEN n < 2 OR {den} = 0 THEN NULL "
            f"WHEN {num} < 0 THEN -(((-{num}) * 1000000) DIV {den}) "
            f"ELSE ({num} * 1000000) DIV {den} END AS BIGINT)"
        ).alias("alpha_ppm"),
    )


def krippendorff_alpha_sql(
    src: str, group_col: str, item_col: str, cat_col: str
) -> str:
    """DuckDB twin of :func:`krippendorff_alpha` — identical cleared
    rational over HUGEINT, identical pairable filter and NULL cases
    (assumes the rating-count bound holds; the operator's guard is
    the loud one).  Standalone."""
    L = KRIPP_LCM
    return f"""
        WITH ka_cont AS (
            SELECT {group_col} AS grp, {item_col} AS it,
                   {cat_col} AS cat, COUNT(*) AS nij
            FROM {src} GROUP BY 1, 2, 3
        ),
        ka_pair AS (
            SELECT *, SUM(nij) OVER (PARTITION BY grp, it) AS ri
            FROM ka_cont
        ),
        ka_kept AS (SELECT * FROM ka_pair WHERE ri >= 2),
        ka_item AS (
            SELECT grp, it, CAST(MAX(ri) AS HUGEINT) AS ru,
                   SUM(CAST(nij AS HUGEINT) * nij) AS au
            FROM ka_kept GROUP BY 1, 2
        ),
        ka_grp AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_items,
                   SUM(ru) AS n,
                   SUM((ru * ru - au) * {L} // (ru - 1)) AS t
            FROM ka_item GROUP BY 1
        ),
        ka_marg AS (
            SELECT grp, SUM(CAST(tj AS HUGEINT) * tj) AS b
            FROM (
                SELECT grp, cat, SUM(nij) AS tj
                FROM ka_kept GROUP BY 1, 2
            ) GROUP BY 1
        )
        SELECT g.grp AS {group_col}, g.n_items,
               CAST(g.n AS BIGINT) AS n_ratings,
               CAST(CASE
                 WHEN g.n < 2 OR {L} * (g.n * g.n - m.b) = 0 THEN NULL
                 WHEN {L} * (g.n * g.n - m.b) - (g.n - 1) * g.t < 0
                   THEN -(((-({L} * (g.n * g.n - m.b)
                             - (g.n - 1) * g.t)) * 1000000)
                          // ({L} * (g.n * g.n - m.b)))
                 ELSE (({L} * (g.n * g.n - m.b) - (g.n - 1) * g.t)
                       * 1000000)
                      // ({L} * (g.n * g.n - m.b))
               END AS BIGINT) AS alpha_ppm
        FROM ka_grp g JOIN ka_marg m USING (grp)
    """


def ece_eval(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Expected + maximum calibration error — the single-number
    verdict over :func:`calibration_bins`' diagram (the diagram says
    WHERE the numbers lie; ECE says HOW MUCH, the figure a model
    gate thresholds on).  Same binning contract (equal-width ppm
    bins, closed right edge, loud out-of-range guard).

    The exactness win that makes this one division instead of one
    per bin: with per-bin positives p_b and score sums s_b,

        ECE = Σ_b (n_b/N)·|p_b·10⁶/n_b − s_b/n_b|
            = ( Σ_b |p_b·10⁶ − s_b| ) / N

    — the bin weights cancel the bin denominators, so ece_ppm is ONE
    floored division of an exact integer sum.  MCE (the worst bin)
    keeps one floored division per occupied bin, quotient ≤ 10⁶.
    Empty bins contribute nothing to either (no 0/0).

    One partial-agg groupBy + one 1-row reduce.  Returns one row:
    (n, n_bins, ece_ppm, mce_ppm)."""
    if not 1 <= int(n_bins) <= 10_000:
        raise ValueError(f"n_bins out of range: {n_bins}")
    nb = int(n_bins)
    guard = F.when(
        (F.col("_s") < 0) | (F.col("_s") > 1_000_000),
        F.assert_true(
            F.lit(False),
            F.lit("ece_eval: score outside [0, 1e6] ppm"),
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    binned = scored.select(
        F.col(score_col).cast("bigint").alias("_s"),
        F.col(label_col).cast("boolean").alias("_y"),
    ).select(
        (F.least(
            F.expr(f"_s * {nb} DIV 1000000"), F.lit(nb - 1)
        ) + guard).cast("int").alias("bin"),
        "_s",
        "_y",
    )
    dec = "decimal(38,0)"
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.expr(f"CAST(_s AS {dec})")).alias("_sum_s"),
        F.sum(F.col("_y").cast("bigint")).alias("_pos"),
    )
    dev = F.expr(f"ABS(_pos * CAST(1000000 AS {dec}) - _sum_s)")
    return agg.agg(
        F.sum("_n").cast("bigint").alias("n"),
        F.lit(nb).cast("bigint").alias("n_bins"),
        F.expr(
            f"CAST(SUM(ABS(_pos * CAST(1000000 AS {dec}) - _sum_s))"
            " DIV SUM(_n) AS BIGINT)"
        ).alias("ece_ppm"),
        F.max(
            F.expr(
                f"ABS(_pos * CAST(1000000 AS {dec}) - _sum_s) DIV _n"
            )
        ).cast("bigint").alias("mce_ppm"),
    )


def ece_eval_sql(
    src: str, score_col: str, label_col: str, n_bins: int = 10
) -> str:
    """DuckDB twin of :func:`ece_eval` (HUGEINT, identical
    cancelled-weights identity and floored divisions).
    Standalone."""
    nb = int(n_bins)
    return f"""
        WITH ee_rows AS (
            SELECT CAST({score_col} AS BIGINT) AS s,
                   CAST({label_col} AS BOOLEAN) AS y
            FROM {src}
        ),
        ee_bin AS (
            SELECT LEAST(s * {nb} // 1000000, {nb} - 1)
                   + CASE WHEN s < 0 OR s > 1000000
                          THEN CAST(error(
                        'ece_eval: score outside [0, 1e6] ppm'
                          ) AS BIGINT) ELSE 0 END AS bin,
                   s, y
            FROM ee_rows
        ),
        ee_agg AS (
            SELECT bin, COUNT(*) AS n,
                   SUM(CAST(s AS HUGEINT)) AS sum_s,
                   SUM(CASE WHEN y THEN 1 ELSE 0 END) AS pos
            FROM ee_bin GROUP BY 1
        )
        SELECT CAST(SUM(n) AS BIGINT) AS n,
               CAST({nb} AS BIGINT) AS n_bins,
               CAST(SUM(ABS(pos * CAST(1000000 AS HUGEINT) - sum_s))
                    // SUM(n) AS BIGINT) AS ece_ppm,
               CAST(MAX(ABS(pos * CAST(1000000 AS HUGEINT) - sum_s)
                        // n) AS BIGINT) AS mce_ppm
        FROM ee_agg
    """


def sprt_decision(
    trials: DataFrame,
    key_col: str,
    t_col: str,
    success_col: str,
    llr_pos_ppm: int,
    llr_neg_ppm: int,
    a_ppm: int,
    b_ppm: int,
) -> DataFrame:
    """Wald's sequential probability ratio test (SPRT, 1945) per key
    — the SEQUENTIAL sibling of :func:`chi2_2x2`'s fixed-horizon
    A/B verdict: scan Bernoulli trials in order and stop at the
    FIRST time the cumulative log-likelihood ratio leaves (b, a) —
    the earliest-possible decision at the declared error rates,
    and the "when could we have stopped?" audit for experiments
    that ran to the end anyway.

    Frozen-constant discipline (Benford/NDCG): the caller declares
    the per-outcome LLR increments in ppm — ``llr_pos_ppm`` =
    round(ln(p1/p0)·1e6) > 0 for a success, ``llr_neg_ppm`` =
    round(ln((1−p1)/(1−p0))·1e6) < 0 for a failure — and the Wald
    bounds ``a_ppm`` ≈ round(ln((1−β)/α)·1e6) > 0 >
    ``b_ppm`` ≈ round(ln(β/(1−α))·1e6); no engine ever calls ln(),
    so LLR_n = k_n·c1 + (n−k_n)·c0 is an exact integer and the
    first-crossing index is engine- and parallelism-exact.

    ``t_col`` must be UNIQUE per key (a trial sequence, not a
    timestamp with ties) — duplicates make "first crossing"
    order-dependent, so they fail LOUDLY.  Decision per key:
    'accept_h1' (LLR ≥ a first), 'accept_h0' (LLR ≤ b first), or
    'continue' (never left the band; n_decide NULL).

    Plan: one keyed window cumsum + one min(struct) argmin per key
    — no iteration, no Python.  Returns (key, n_total, k_total,
    llr_final_ppm, decision, n_decide, llr_decide_ppm)."""
    c1, c0 = int(llr_pos_ppm), int(llr_neg_ppm)
    if not (c0 < 0 < c1):
        raise ValueError(
            f"need llr_neg_ppm < 0 < llr_pos_ppm: {c0}, {c1}"
        )
    if not (int(b_ppm) < 0 < int(a_ppm)):
        raise ValueError(
            f"need b_ppm < 0 < a_ppm: {b_ppm}, {a_ppm}"
        )
    a_v, b_v = int(a_ppm), int(b_ppm)
    base = trials.select(
        F.col(key_col).alias("_k"),
        F.col(t_col).alias("_t"),
        F.col(success_col).cast("int").alias("_s"),
    )
    dups = (
        base.groupBy("_k", "_t").count().where(F.col("count") > 1)
        .count()
    )
    if dups:
        raise ValueError(
            f"sprt_decision: {dups} duplicate (key, t) trial "
            "positions — the crossing order would be undefined; "
            "disambiguate the sequence first"
        )
    w = Window.partitionBy("_k").orderBy("_t")
    scanned = base.select(
        "_k", "_t", "_s",
        F.row_number().over(w).alias("_n"),
        (
            F.sum("_s").over(w) * F.lit(c1)
            + (F.row_number().over(w) - F.sum("_s").over(w))
            * F.lit(c0)
        ).cast("bigint").alias("_llr"),
    )
    crossing = scanned.where(
        (F.col("_llr") >= a_v) | (F.col("_llr") <= b_v)
    )
    first = crossing.groupBy("_k").agg(
        F.min(F.struct("_n", "_llr")).alias("_c")
    ).select(
        "_k",
        F.col("_c._n").alias("_nd"),
        F.col("_c._llr").alias("_ld"),
    )
    totals = scanned.groupBy("_k").agg(
        F.max("_n").alias("n_total"),
        F.sum("_s").cast("bigint").alias("k_total"),
        F.max_by("_llr", "_n").alias("llr_final_ppm"),
    )
    return totals.join(first, "_k", "left").select(
        F.col("_k").alias(key_col),
        "n_total", "k_total", "llr_final_ppm",
        F.when(F.col("_ld") >= a_v, F.lit("accept_h1"))
        .when(F.col("_ld") <= b_v, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
        F.col("_nd").cast("bigint").alias("n_decide"),
        F.col("_ld").alias("llr_decide_ppm"),
    )


def sprt_decision_sql(
    src: str,
    key_col: str,
    t_col: str,
    success_col: str,
    llr_pos_ppm: int,
    llr_neg_ppm: int,
    a_ppm: int,
    b_ppm: int,
) -> str:
    """DuckDB twin of :func:`sprt_decision` (identical windows and
    constants; the operator's duplicate guard is the loud one).
    Standalone statement."""
    c1, c0 = int(llr_pos_ppm), int(llr_neg_ppm)
    a_v, b_v = int(a_ppm), int(b_ppm)
    return f"""
        WITH sp_s AS MATERIALIZED (
            SELECT {key_col} AS k, {t_col} AS t,
                   CAST({success_col} AS INTEGER) AS s,
                   ROW_NUMBER() OVER (PARTITION BY {key_col}
                       ORDER BY {t_col}) AS n,
                   CAST(SUM(CAST({success_col} AS INTEGER)) OVER (
                           PARTITION BY {key_col} ORDER BY {t_col})
                        * {c1}
                      + (ROW_NUMBER() OVER (PARTITION BY {key_col}
                             ORDER BY {t_col})
                         - SUM(CAST({success_col} AS INTEGER)) OVER (
                               PARTITION BY {key_col}
                               ORDER BY {t_col}))
                        * {c0} AS BIGINT) AS llr
            FROM {src}
        ),
        sp_first AS (
            SELECT k, MIN(STRUCT_PACK(n := n, llr := llr)) AS c
            FROM sp_s WHERE llr >= {a_v} OR llr <= {b_v}
            GROUP BY 1
        ),
        sp_tot AS (
            SELECT k, CAST(MAX(n) AS BIGINT) AS n_total,
                   CAST(SUM(s) AS BIGINT) AS k_total,
                   CAST(MAX_BY(llr, n) AS BIGINT) AS llr_final_ppm
            FROM sp_s GROUP BY 1
        )
        SELECT t.k AS {key_col}, t.n_total, t.k_total,
               t.llr_final_ppm,
               CASE WHEN f.c.llr >= {a_v} THEN 'accept_h1'
                    WHEN f.c.llr <= {b_v} THEN 'accept_h0'
                    ELSE 'continue' END AS decision,
               CAST(f.c.n AS BIGINT) AS n_decide,
               CAST(f.c.llr AS BIGINT) AS llr_decide_ppm
        FROM sp_tot t LEFT JOIN sp_first f USING (k)
    """


def conformal_thresholds(
    calib: DataFrame,
    test: DataFrame,
    group_col: str,
    score_col: str,
    alpha_ppm: int = 100_000,
) -> DataFrame:
    """Split conformal prediction (Vovk et al.; the Angelopoulos–
    Bates split recipe) per group: from a CALIBRATION set of
    integer nonconformity scores, the finite-sample threshold

        q̂ = the r-th smallest calibration score,
        r = ceil((n+1)·(1−α))   (exact integer ceiling division)

    guarantees P(test score ≤ q̂) ≥ 1−α for exchangeable data — the
    distribution-free coverage certificate a curation pipeline wants
    before trusting a model filter at a declared risk level.  When
    r > n (tiny calibration sets) the method must ABSTAIN — q̂ is
    NULL, not the max score (stated; the honest branch).

    Everything is exact: the rank is ((n+1)·(1e6−α)) ceiling-divided
    by 1e6 in integers, q̂ is a nearest-rank order statistic (ties
    included naturally — scores are integers), and the TEST-side
    audit counts are exact (n_covered = #{score ≤ q̂},
    cover_ppm = n_covered·1e6 DIV n_test, NULL when abstaining) —
    the empirical check of the guarantee runs in the same pass.

    Plan: one per-group window rank on the calibration side + one
    broadcast-joinable threshold row per group + one conditional
    count on the test side — no Python, no iteration.

    Returns (group, n_cal, r_rank, qhat, n_test, n_covered,
    cover_ppm)."""
    if not 1 <= int(alpha_ppm) < 10**6:
        raise ValueError(f"alpha_ppm in [1, 1e6): {alpha_ppm}")
    keep = 10**6 - int(alpha_ppm)
    cb = calib.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).cast("bigint").alias("_s"),
    )
    w = Window.partitionBy("_g").orderBy("_s")
    ranked = cb.select(
        "_g", "_s", F.row_number().over(w).alias("_r")
    )
    n_cal = cb.groupBy("_g").agg(F.count(F.lit(1)).alias("n_cal"))
    rank = n_cal.select(
        "_g", "n_cal",
        F.expr(
            f"CAST(((n_cal + 1) * {keep} + {10**6 - 1}) "
            f"DIV {10**6} AS BIGINT)"
        ).alias("r_rank"),
    )
    rk = rank.select(
        F.col("_g").alias("_rg"), "n_cal", "r_rank"
    )
    qhat = (
        rk.join(
            ranked,
            (rk._rg == ranked._g) & (rk.r_rank == ranked._r),
            "left",
        )
        .select(F.col("_rg").alias("_g"), "n_cal", "r_rank",
                F.col("_s").alias("qhat"))
    )
    ts = test.select(
        F.col(group_col).alias("_g"),
        F.col(score_col).cast("bigint").alias("_t"),
    )
    audit = qhat.join(ts, "_g", "left").groupBy(
        "_g", "n_cal", "r_rank", "qhat"
    ).agg(
        F.count(F.col("_t")).alias("n_test"),
        F.coalesce(
            F.sum(
                F.when(F.col("_t") <= F.col("qhat"), 1).otherwise(0)
            ),
            F.lit(0),
        ).cast("bigint").alias("n_covered"),
    )
    return audit.select(
        F.col("_g").alias(group_col),
        "n_cal", "r_rank", "qhat", "n_test",
        F.when(F.col("qhat").isNull(), F.lit(None).cast("bigint"))
        .otherwise(F.col("n_covered")).alias("n_covered"),
        F.expr(
            "CAST(CASE WHEN qhat IS NULL OR n_test = 0 THEN NULL "
            "ELSE (n_covered * 1000000) DIV n_test END AS BIGINT)"
        ).alias("cover_ppm"),
    )


def conformal_thresholds_sql(
    calib_src: str,
    test_src: str,
    group_col: str,
    score_col: str,
    alpha_ppm: int = 100_000,
) -> str:
    """DuckDB twin of :func:`conformal_thresholds` (identical
    ceiling rank, nearest-rank order statistic, audit counts).
    Standalone statement."""
    keep = 10**6 - int(alpha_ppm)
    return f"""
        WITH cf_c AS (
            SELECT {group_col} AS g,
                   CAST({score_col} AS BIGINT) AS s,
                   ROW_NUMBER() OVER (PARTITION BY {group_col}
                       ORDER BY CAST({score_col} AS BIGINT)) AS r
            FROM {calib_src}
        ),
        cf_n AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n_cal,
                   CAST(((COUNT(*) + 1) * {keep} + {10**6 - 1})
                        // {10**6} AS BIGINT) AS r_rank
            FROM cf_c GROUP BY 1
        ),
        cf_q AS (
            SELECT n.g, n.n_cal, n.r_rank, c.s AS qhat
            FROM cf_n n
            LEFT JOIN cf_c c ON c.g = n.g AND c.r = n.r_rank
        ),
        cf_t AS (
            SELECT {group_col} AS g,
                   CAST({score_col} AS BIGINT) AS t
            FROM {test_src}
        )
        SELECT q.g AS {group_col}, q.n_cal, q.r_rank, q.qhat,
               CAST(COUNT(t.t) AS BIGINT) AS n_test,
               CAST(CASE WHEN q.qhat IS NULL THEN NULL ELSE
                   COALESCE(SUM(CASE WHEN t.t <= q.qhat
                                     THEN 1 ELSE 0 END), 0)
               END AS BIGINT) AS n_covered,
               CAST(CASE WHEN q.qhat IS NULL OR COUNT(t.t) = 0
                    THEN NULL ELSE
                   (COALESCE(SUM(CASE WHEN t.t <= q.qhat
                                      THEN 1 ELSE 0 END), 0)
                    * 1000000) // COUNT(t.t)
               END AS BIGINT) AS cover_ppm
        FROM cf_q q LEFT JOIN cf_t t ON t.g = q.g
        GROUP BY 1, 2, 3, 4
    """
