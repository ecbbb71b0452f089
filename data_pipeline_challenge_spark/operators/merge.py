"""Keyed upsert merge — the reference's core write operator.

Reproduces the semantics of the Mongo bulk upsert
(/root/reference/app/processing/data_processor.py:95-113):

- ``UpdateOne({"code": code}, {"$set": full_record_dump}, upsert=True)``
  per record, **ordered** within a batch;
- ``$set`` of the full dump ⇒ spine fields (incl. an explicit
  ``product_name=None``) always overwrite, but *extra* fields present only
  in an older version survive — a field-level merge, not a row replace;
- within one batch, the **last** occurrence of a duplicate code wins.

Spark-first design: one ``groupBy(code)`` — the only shuffle — with
``collect_list(struct(...))`` sorted by (generation, seq); the newest
element supplies the spine, and the attrs maps are folded oldest→newest
with ``map_concat(map_filter(acc, key ∉ newer), newer)`` so newer keys
overwrite and older keys survive. The fold is structurally collision-free,
so it works under any ``spark.sql.mapKeyDedupPolicy`` — no session conf is
touched (mutating the caller's session would silently change map_concat
semantics for unrelated queries). No window pass, no self-join.

Scale notes: versions-per-key is small (weekly files), so the collected
struct list stays tiny; for hot keys AQE skew handling applies. On a real
deployment the same logic is the ``foreachBatch`` body of the streaming
ingest, and the storage-side equivalent is a MERGE INTO on a Delta/Iceberg
table bucketed by code.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MERGE_COLS = ("code", "product_name", "file_id", "last_modified_at_company", "attrs")


def merge_products(
    existing: DataFrame | None,
    batch: DataFrame,
    seq_col: str = "seq",
) -> DataFrame:
    """Merge a normalized valid batch into the keyed product table.

    ``batch`` columns: code, product_name, file_id, last_modified_at_company,
    attrs, + ``seq_col`` (intra-batch order, larger = later = wins).
    ``existing`` (or None) columns: the product table itself; its rows rank
    below every batch row (generation 0 vs 1).

    Returns the new product table (one row per code). Deterministic and
    idempotent: re-merging the same batch yields the same table — the
    engine's exactly-once upgrade of the reference's at-least-once
    redelivery (SURVEY §2, mq.py:169-175).
    """
    b = batch.select(
        F.lit(1).alias("gen"),
        F.col(seq_col).cast("long").alias("ord"),
        *[F.col(c) for c in _MERGE_COLS],
    )
    if existing is not None:
        e = existing.select(
            F.lit(0).alias("gen"),
            F.lit(-1).cast("long").alias("ord"),
            *[F.col(c) for c in _MERGE_COLS],
        )
        allrows = e.unionByName(b)
    else:
        allrows = b

    def _cmp(l, r):  # noqa: E741 - explicit comparator: structs holding maps
        # are not naturally orderable, so sort on (gen, ord) only
        return (
            F.when(l["gen"] < r["gen"], -1)
            .when(l["gen"] > r["gen"], 1)
            .when(l["ord"] < r["ord"], -1)
            .when(l["ord"] > r["ord"], 1)
            .otherwise(0)
        )

    versions = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("gen"),
                F.col("ord"),
                F.col("product_name"),
                F.col("file_id"),
                F.col("last_modified_at_company"),
                F.col("attrs"),
            )
        ),
        _cmp,
    )
    merged = (
        allrows.groupBy("code")
        .agg(versions.alias("vs"))
        .select(
            "code",
            F.element_at("vs", -1).alias("latest"),
            F.aggregate(
                "vs",
                F.create_map().cast("map<string,string>"),
                # newer map wins per key: drop acc keys the newer map holds,
                # then concat — no duplicate keys ever reach map_concat, so
                # the fold is dedup-policy-independent.
                lambda acc, x: F.map_concat(
                    F.map_filter(
                        acc,
                        lambda k, _v: ~F.map_contains_key(
                            F.coalesce(x["attrs"], F.create_map().cast("map<string,string>")), k
                        ),
                    ),
                    F.coalesce(x["attrs"], F.create_map().cast("map<string,string>")),
                ),
            ).alias("attrs"),
        )
        .select(
            "code",
            F.col("latest.product_name").alias("product_name"),
            F.col("latest.file_id").alias("file_id"),
            F.col("latest.last_modified_at_company").alias("last_modified_at_company"),
            "attrs",
        )
    )
    return merged
