"""Sequence packing — fill fixed-capacity training bins with documents.

The step between "chunked corpus" and "training batches": concatenate
documents (or chunks) into sequences of at most ``capacity`` tokens so a
training run wastes no padding. The packer is the greedy sequential
first-fit used by most LLM data pipelines: walk the group in a
deterministic order, keep appending while the next item fits, else open a
new bin. An item larger than ``capacity`` gets a bin of its own (it is the
chunker's job to cut those down first).

Greedy sequential packing is a prefix-dependent recurrence (bin of row *n*
depends on the running fill after rows 1..n-1), so it is not expressible as
a window function. It runs as an Arrow-batched ``applyInPandas`` per group:
one shuffle on the group key, then a linear in-memory walk of each group.

100 TB design: the group key bounds both state and skew. Pack per
(source, shard) — a shard being e.g. ``pmod(hash(doc_id), n_shards)`` — so
every group holds a bounded number of rows regardless of corpus size, and
the walk stays O(group). Packing quality is unaffected: bins never cross
groups by construction. The per-group walk carries only (order, tokens),
never the text payload; the caller re-joins bin ids to text afterwards if
it needs packed text bytes.

Reference parity: the reference pipeline has no packing operator (its unit
of work is the product record, file_splitter.py chunks by count at
file_splitter.py:117-130); this is a north-star extension from the brief.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _make_packer(keep_cols: list[str], oc: str, tc: str, cap: int):
    # Nested so cloudpickle ships it by value (repo closure convention,
    # see sources/json_ingest.py docstring).
    def pack(pdf):
        pdf = pdf.sort_values(oc, kind="mergesort").reset_index(drop=True)
        bins = []
        fill = 0
        cur = 0
        for tok in pdf[tc]:
            t = int(tok)
            if bins and fill + t > cap:
                cur += 1
                fill = t
            else:
                fill += t
            bins.append(cur)
        pdf = pdf[keep_cols].copy()
        pdf["bin"] = bins
        return pdf

    return pack


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    capacity: int,
) -> DataFrame:
    """Assign each row a ``bin`` (0-based, per group) by greedy sequential
    first-fit over rows sorted by ``order_col`` within ``group_col``.

    Returns (group_col, order_col, token_col, bin bigint). Deterministic:
    the order column must be unique per group (doc_id here), so the walk —
    and therefore every bin id — is partitioning-independent.

    A bare group key is the oracle-twin form: exact greedy semantics over
    the whole group, but one Python task walks the entire group, so it is
    only safe when every group is known-bounded. The scale path is
    :func:`pack_sequences_sharded`.
    """
    schema = (
        f"{group_col} string, {order_col} bigint, {token_col} bigint, bin bigint"
    )
    gc, oc, tc = group_col, order_col, token_col
    slim = df.select(gc, oc, tc)
    packer = _make_packer([gc, oc, tc], oc, tc, capacity)
    return slim.groupBy(gc).applyInPandas(packer, schema=schema)


def pack_sequences_sharded(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    capacity: int,
    n_shards: int = 64,
    shard: Column | None = None,
) -> DataFrame:
    """Shard-bounded greedy packing: the 100 TB form of
    :func:`pack_sequences`.

    A corpus has few sources, so grouping by bare ``source`` would hand one
    unbounded Python task billions of rows. Here each group is split into
    ``n_shards`` deterministic shards — by default
    ``pmod(xxhash64(order_col), n_shards)`` — and the greedy first-fit walk
    runs per (group, shard). Every applyInPandas task then holds
    ~|group|/n_shards rows regardless of corpus size; raise ``n_shards``
    with the corpus and the walk stays O(bounded). Bins never cross shards,
    so packing quality is unchanged within a shard and the only cost is at
    most one under-filled tail bin per shard.

    ``shard`` overrides the shard expression (e.g. ``pmod(col, n)`` on a
    numeric key so an external SQL oracle can replay the exact recurrence).

    Returns (group_col, shard int, order_col, token_col, bin bigint); bin
    ids are 0-based per (group, shard). Deterministic and
    partitioning-independent for a unique order column: the shard of a row
    is a pure function of its key, and the walk order within a shard is
    fully specified by ``order_col``.
    """
    gc, oc, tc = group_col, order_col, token_col
    if shard is None:
        shard = F.pmod(F.xxhash64(F.col(oc)), F.lit(n_shards))
    schema = (
        f"{gc} string, shard int, {oc} bigint, {tc} bigint, bin bigint"
    )
    slim = df.select(gc, oc, tc).withColumn("shard", shard.cast("int"))
    packer = _make_packer([gc, "shard", oc, tc], oc, tc, capacity)
    return slim.groupBy(gc, "shard").applyInPandas(packer, schema=schema)


def group_texts_blocks(
    df: DataFrame,
    id_col: str,
    token_col: str,
    block_len: int,
    shard: Column | None = None,
    shard_hex: int = 2,
) -> DataFrame:
    """The LM "group texts" step: concatenate documents in a
    deterministic order and split the token stream into fixed-length
    blocks that CROSS document boundaries — the complement of
    :func:`pack_sequences`, which bins whole docs without splitting.
    Pre-training pipelines use exactly this to turn a screened corpus
    into fixed-``block_len`` training sequences with no padding waste.

    Returns one row per (shard, block_id, doc): ``(shard, block_id,``
    ``{id_col}, n_tokens, doc_off, block_off)`` — the tokens the doc
    contributes to that block (a doc spanning a boundary appears in
    every block it touches), so a reader joining back on ``id_col`` can
    materialize any block's text from exactly the docs listed.
    ``doc_off`` is the 0-based start of the contribution WITHIN the
    doc's token stream and ``block_off`` its 0-based start WITHIN the
    block — the explicit slice coordinates
    :func:`materialize_block_texts` consumes (take ``n_tokens`` tokens
    of the doc starting at ``doc_off``; they land at ``block_off``).
    Blocks are 0-based per shard; the final block of a shard may be
    partial.

    Scale shape: the concatenation order is md5-of-id WITHIN a shard
    (default ``substring(md5(id), 1, shard_hex)`` — 16^shard_hex
    deterministic shards, mirror of the sharded packer), so offsets
    come from one shard-keyed window cumsum, blocks from an explode of
    each doc's touched-block RANGE (|tokens|/block_len rows per doc,
    not |tokens|), and there is no global sort; zero-token docs are
    excluded (they contribute to no block). The cumsum's parallelism
    ceiling IS the shard count (each shard's running offset is one
    sequential task): the default 2 hex chars = 256 shards; raise
    ``shard_hex`` with the corpus — the only cost is at most one more
    partial tail block per extra shard."""
    idc, tc = id_col, token_col
    if shard is None:
        shard = F.substring(F.md5(F.col(idc).cast("string")), 1, int(shard_hex))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.md5(F.col(idc).cast("string")), idc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = (
        # shard evaluated while df's FULL schema is in scope, so a
        # custom expression may reference any column (e.g. shard by
        # language/source to keep blocks domain-pure)
        df.select(
            idc, F.col(tc).cast("long").alias("tok"), shard.alias("shard")
        )
        .filter(F.col("tok") > 0)
        .withColumn("off", F.sum("tok").over(w) - F.col("tok"))
    )
    L = F.lit(int(block_len))
    first_b = F.floor(F.col("off") / L)
    last_b = F.floor((F.col("off") + F.col("tok") - 1) / L)
    exploded = t.withColumn(
        "block_id", F.explode(F.sequence(first_b, last_b))
    )
    contrib = F.least(
        F.col("off") + F.col("tok"), (F.col("block_id") + 1) * L
    ) - F.greatest(F.col("off"), F.col("block_id") * L)
    return exploded.select(
        "shard",
        F.col("block_id").cast("long").alias("block_id"),
        idc,
        contrib.cast("long").alias("n_tokens"),
        F.greatest(F.lit(0), F.col("block_id") * L - F.col("off"))
        .cast("long")
        .alias("doc_off"),
        F.greatest(F.lit(0), F.col("off") - F.col("block_id") * L)
        .cast("long")
        .alias("block_off"),
    )


def materialize_block_texts(
    blocks: DataFrame,
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
) -> DataFrame:
    """The group-texts READER: turn the (shard, block_id, doc, slice)
    assignment map from :func:`group_texts_blocks` into actual
    fixed-length training sequences.

    ``docs`` must carry ``id_col`` and ``tokens_col`` (``array`` of
    token strings whose length matches the token counts the map was
    built from). Each map row slices ``n_tokens`` tokens starting at
    ``doc_off`` from its doc; contributions are reassembled per
    (shard, block_id) in ``block_off`` order. Returns
    ``(shard, block_id, n_tokens bigint, seq_text string)`` — the
    block's token stream joined with single spaces (string form keeps
    the result order-insensitively hashable by external oracles).

    Scale shape: one equi-join of the map to the corpus on ``id_col``
    (the map side carries only ids + 3 ints — at 100 TB it is the
    SMALL side per shard and AQE picks the right strategy), one
    ``F.slice`` per contribution (JVM-side, no Python), and one
    groupBy(shard, block_id) whose per-group state is exactly
    block_len tokens: sort_array over (block_off, slice) structs —
    at most ceil(block_len / 1) contributions, in practice a handful —
    then flatten + array_join. No window, no global sort, no UDF."""
    idc = id_col
    sliced = blocks.join(
        docs.select(idc, F.col(tokens_col).alias("_toks")), idc
    ).select(
        "shard",
        "block_id",
        "block_off",
        F.expr("slice(_toks, int(doc_off) + 1, int(n_tokens))").alias("_sub"),
    )
    return (
        sliced.groupBy("shard", "block_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("block_off", "_sub"))
            ).alias("_parts")
        )
        .select(
            "shard",
            "block_id",
            F.aggregate(
                "_parts",
                F.lit(0).cast("long"),
                lambda acc, p: acc + F.size(p["_sub"]).cast("long"),
            ).alias("n_tokens"),
            F.array_join(
                F.flatten(F.transform("_parts", lambda p: p["_sub"])), " "
            ).alias("seq_text"),
        )
    )
