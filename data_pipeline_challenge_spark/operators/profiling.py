"""Column profiling — per-column data-quality stats in ONE table scan.

The pipeline-health op a warehouse runs on every landed batch: null rate
and distinct cardinality per column, shaped long (one row per column) so
downstream drift checks can diff two profiles with a plain join.

Plan shape: a single wide aggregation computes every per-column stat in
one pass, then a ``stack`` unpivot reshapes driver-free. Multiple exact
``count(DISTINCT col)`` in one aggregate become a single Expand-based
multi-distinct (one scan, one shuffle) — versus the naive one-scan-per-
column loop an orchestration script would run (N scans of a 100 TB table).
For approximate profiles at scale, pass ``exact=False`` to use HLL
(``approx_count_distinct``) and keep the aggregation fully partial-merge
(no Expand).

Reference parity: the reference tracks only per-file record counters
(file_splitter.py:114-130); per-column profiling is a north-star extension.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def profile_columns(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """Profile ``cols`` of ``df`` → (column string, n_rows bigint,
    n_nulls bigint, n_distinct bigint), one output row per column, one scan
    of the input. ``n_distinct`` excludes NULL (SQL COUNT DISTINCT rule)."""
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{c}")
        )
        aggs.append(distinct(c).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, n_distinct)"
        ),
        F.col("__rows").alias("n_rows"),
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def exact_quantiles(
    df: DataFrame, value_col: str, fractions: list[tuple[int, int]]
) -> DataFrame:
    """EXACT quantiles of an integer-valued metric via its value
    histogram: group-count by value (one partial-agg shuffle down to
    O(distinct values) rows), cumulative-sum the SMALL post-agg frame
    (a single-task window over the distribution, not the data — the
    same bounded-frame global window the rank reports use), and for
    each requested fraction pick the smallest value whose cumulative
    count covers it.

    ``fractions`` are INTEGER pairs (num, den) and the pick rule is the
    all-integer ``cum * den >= num * n_total`` — no float multiply, so
    the boundary case (a fraction landing exactly on a row) cannot flip
    on ULP and the result is engine-stable / oracle-checkable, unlike
    ``ceil(q * n)`` with a binary-inexact q. This is percentile_disc
    semantics. Exactness makes it mergeable for free: histograms add,
    which is what the maintained streaming twin folds.

    Returns ``(q_num int, q_den int, value bigint)``."""
    return histogram_quantiles(value_histogram(df, value_col), fractions)


def grouped_exact_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    fractions: list[tuple[int, int]],
) -> DataFrame:
    """Per-GROUP exact quantiles of an integer-valued metric — the
    stratified form of :func:`exact_quantiles` (per-source length
    profiles, per-language budgets). Same structure, better parallelism
    at scale: one partial-agg shuffle down to O(groups × distinct
    values) histogram rows, then the cumulative sum runs as a
    PER-GROUP window over the small post-agg frame, so the window's
    parallelism ceiling is the group count — the global form's single
    sequential task is the one thing this avoids. The all-integer pick
    rule lives once, in :func:`histogram_quantiles`.

    Returns ``({group_col}, q_num int, q_den int, value bigint)``."""
    return histogram_quantiles(
        grouped_value_histogram(df, [group_col], value_col),
        fractions,
        group_cols=[group_col],
    )


def value_histogram(df: DataFrame, value_col: str) -> DataFrame:
    """The exact-quantile contract's OTHER half, shared with the
    maintained streaming twin's per-batch fold: integer cast, nulls
    dropped, ``(v, n)`` counts — one definition so the null/typing
    policy can never diverge between the batch operator and the store
    the stream folds."""
    return (
        df.select(F.col(value_col).cast("long").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# internal alias namespace of the histogram/quantile pipeline — a group
# column with one of these names would silently collide with the
# machinery's own columns (the cluster_aware_split precedent: refuse
# loudly, never shadow)
_QUANTILE_RESERVED = frozenset({"v", "n", "cum", "nt", "q_num", "q_den"})


def _guard_group_cols(group_cols: list[str]) -> None:
    bad = sorted(set(group_cols) & _QUANTILE_RESERVED)
    if bad:
        raise ValueError(
            f"group column(s) {bad} collide with the quantile pipeline's "
            f"internal aliases {sorted(_QUANTILE_RESERVED)} — rename the "
            "column (e.g. .withColumnRenamed) before profiling"
        )


def grouped_value_histogram(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """:func:`value_histogram` stratified by ``group_cols`` — shared by
    the grouped batch operator and the grouped mode of the maintained
    streaming twin (same one-definition rationale)."""
    gcs = list(group_cols)
    _guard_group_cols(gcs)
    return (
        df.select(*gcs, F.col(value_col).cast("long").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy(*gcs, "v")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    fractions: list[tuple[int, int]],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The quantile core over a pre-counted ``(…group_cols, v, n)``
    histogram frame — shared by :func:`exact_quantiles`,
    :func:`grouped_exact_quantiles`, and the maintained streaming
    twin's report (``streaming/quantile_stream.quantile_report``), so
    the all-integer pick rule exists exactly once. Duplicate ``v`` rows
    (e.g. one per store increment) are summed first. With
    ``group_cols`` the cumsum window partitions per group (parallelism
    = group count); without, it is the documented single-task window
    over the bounded distribution frame."""
    from pyspark.sql import Window

    gcs = list(group_cols or ())
    _guard_group_cols(gcs)
    spark = hist.sparkSession
    hist = hist.groupBy(*gcs, "v").agg(F.sum("n").alias("n"))
    w = (
        Window.partitionBy(*gcs)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "nt", F.sum("n").over(Window.partitionBy(*gcs))
    )
    q = spark.createDataFrame(
        [(int(n), int(d)) for n, d in fractions], "q_num int, q_den int"
    )
    return (
        s.join(F.broadcast(q), s["cum"] * q["q_den"] >= q["q_num"] * s["nt"])
        .groupBy(*gcs, "q_num", "q_den")
        .agg(F.min("v").alias("value"))
    )
