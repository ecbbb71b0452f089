"""As-of join — a time-series operator Spark lacks as a builtin.

For each left row, attach the most recent right row whose timestamp is <=
the left timestamp (per key). Implemented as a composition of existing
DataFrame ops (prompt tier (a) — no UDF):

    union(left-tagged, right-tagged)
      → window last_value(right payload, ignoreNulls) over
        (partition by key order by (ts, side) rows unbounded preceding)
      → keep left rows

One shuffle on (key), same as a sort-merge join would cost; state per key
is a single carried struct, so it scales to arbitrarily long histories —
the classic union-trick that beats a range self-join (which explodes
quadratically in versions per key).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join (right.ts <= left.ts, latest wins; ties on equal
    timestamps take the right row — the right side sorts first at equal ts).
    Returns all left columns + ``<payload><suffix>`` columns (null when no
    prior right row exists).

    ``right_tiebreak`` names a right column (typically its unique id) used
    as the final window sort key: when two right rows share (key, ts), the
    MAX tiebreak row is carried deterministically across runs and
    partitionings — any oracle must dedupe the right side by the same rule.
    """
    lcols = left.columns
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    # The tiebreak keeps its NATIVE type: a blanket cast("long") turned a
    # string/uuid id into NULL for every right row, silently voiding the
    # determinism guarantee this parameter exists for. The left side's
    # null placeholder is cast to the same type so the union lines up.
    tb_type = dict(right.dtypes)[right_tiebreak] if right_tiebreak else "int"
    r_tb = (
        F.col(right_tiebreak).cast(tb_type) if right_tiebreak else F.lit(0)
    )
    # Left rows sort after right rows at equal ts via __side; a null __tb
    # on the left keeps the tiebreak from reordering left rows.
    l_tb = F.lit(None).cast(tb_type) if right_tiebreak else F.lit(0)

    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        l_tb.alias("__tb"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in right_payload) + ">"
        ).alias("__r"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_tb.alias("__tb"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in lcols) + ">"
        ).alias("__l"),
        payload_struct.alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        l_tag.unionByName(r_tag)
        .withColumn("__carry", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    out = joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__carry.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out
