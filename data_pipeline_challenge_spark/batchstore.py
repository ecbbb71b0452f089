"""Append-only micro-batch stores and their consolidation.

Several maintained structures accumulate one ``ingest_batch=B`` partition
directory per micro-batch (the packing stream's rows store, the ANN index
increment stores). Partition PRUNING keeps scans O(touched), but partition
DISCOVERY still lists every batch directory — after a year of
micro-batches the listing itself is the bottleneck. Consolidation folds
all live batches into ONE negative-id partition so the directory count
resets to O(1) while the reader view is unchanged.

Crash-safe without a transactional format, via a marker file:

- the live view is ``(ingest_batch == marker.consolidated) OR
  (ingest_batch > marker.through)`` — both planning-time partition
  filters; with no marker it is ``ingest_batch >= 0`` (so a half-written
  consolidated dir from a crashed fold is invisible);
- a fold writes the new consolidated dir (tmp + atomic rename, id =
  previous consolidated - 1, starting at -1), atomically replaces the
  marker (``os.replace``), then sweeps dirs that have been excluded for a
  FULL fold generation — the dirs this fold just excluded stay on disk
  until the next fold, so a concurrent reader's already-planned scan
  (which pinned the previous marker view's files at planning time) is
  never torn mid-scan (see ``_sweep_stale``). A crash before the marker
  swap leaves the old view fully intact; a crash after it leaves stale
  dirs the reader already excludes and a later fold sweeps;
- batch ids only grow (checkpointed stream), so a post-fold batch is
  always ``> through`` and immediately visible; a FRESH-checkpoint replay
  re-writing an already-folded batch id lands ``<= through`` and stays
  invisible — no duplicates either way.

Writer coordination: run consolidation OFFLINE (owning stream stopped),
or IN-STREAM from the owning stream's own ``foreachBatch``
(:func:`maybe_consolidate_in_stream`) — the stream is the store's only
writer, so its serialized foreachBatch needs no extra coordination.
Readers need no coordination either way: new plans resolve the marker at
planning time, and already-built plans are protected by the sweep's
one-generation grace period.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_MARKER = "_consolidated.json"
_BATCH_RE = re.compile(r"^ingest_batch=(-?\d+)$")
REBUILT_MARKER = "_rebuilt.json"


def has_rebuilt_marker(store_root: str | Path) -> bool:
    """True when ``store_root`` was produced by :func:`rebuild_swap`
    (or a hand-rolled rebuild that wrote the marker): the signal that
    arms :func:`sequential_fold_guard` for an otherwise-empty-looking
    store whose batch numbering restarted at -1."""
    return (Path(store_root) / REBUILT_MARKER).exists()


def sequential_fold_guard(
    batch_id: int,
    committed: int,
    store: str | Path,
    *,
    rebuilt: bool = False,
    strict: bool = True,
) -> bool:
    """Shared admission check for every maintained store's
    ``fold_batch`` (VERDICT r17 #1 — the guard the components store
    proved, hoisted family-wide). Returns False for ``batch_id <=
    committed`` — a replay of work the store already holds (skip);
    True when the fold should run.

    Raises when ``strict`` and the id is GAPPED (``batch_id >
    committed + 1``) on a store with history (``committed >= 0``) or a
    rebuilt store (``rebuilt=True`` arms the check at ``committed ==
    -1``). Under ONE stream checkpoint, foreachBatch ids are gap-free,
    so a gapped id means the checkpoint does not belong to this
    store's history — most importantly a STALE pre-rebuild checkpoint
    resumed against a store a rebuild just swapped in, or a FOREIGN
    checkpoint pointed at the wrong warehouse; silently folding it
    would lose the gap's batches from the store forever (irreversible
    for count/frontier stores: the skipped history can never be
    retrofitted). The one benign ahead case — attaching a fold
    MID-LIFE to an existing stream, so the first fold arrives at a
    high id against a brand-new, never-rebuilt store — stays allowed.

    ``strict=False`` keeps only the replay skip: for folds fed by the
    RESEQUENCER, whose downstream ids (``2B`` per arrival batch,
    ``2B+1`` per flush, absent entirely when a batch releases
    nothing) are monotone but legitimately non-contiguous. Those
    stores are protected transitively by the resequencer's own strict
    guard on its gap-free arrival ids."""
    if batch_id <= committed:
        return False
    if strict and batch_id > committed + 1 and (committed >= 0 or rebuilt):
        raise RuntimeError(
            f"maintained store at {store} disagrees with the stream's "
            f"batch numbering (batch {batch_id}, store committed through "
            f"{committed}): the checkpoint belongs to a different history "
            "— resume this store with its own original checkpoint; after "
            "a rebuild, start a FRESH checkpoint over post-rebuild "
            "arrivals only. If this store was written by a pre-r18 "
            "writer (which skipped empty/all-dropped batches without "
            "sentinels) and the gap ids are KNOWN to be such batches, "
            "record them with batchstore.backfill_empty_sentinels("
            f"{str(store)!r}, {batch_id}) and resume."
        )
    return True


def backfill_empty_sentinels(store: str | Path, next_batch_id: int) -> list[int]:
    """Migration/repair helper for :func:`sequential_fold_guard`: record
    every missing batch id STRICTLY BELOW ``next_batch_id`` (and above
    the store's consolidation floor / first fold) as an empty-fold
    sentinel, and return the ids written. Pass the batch id the guard
    refused, verbatim from its error message — the helper deliberately
    never writes a sentinel AT or past it (code-review r18: an
    overshot horizon would convert real future batches into
    guard-skipped 'replays', the silent loss the guard exists to
    prevent).

    ``store`` may be the batch store itself or a gate/store ROOT whose
    sub-stores hold the batches (the path the guard message prints) —
    the helper applies itself to every batch store found underneath,
    and REFUSES a root containing a resequencer dir (its buffer/wm
    stores live in the arrival-id space, not the downstream fold-id
    space — target each sub-store explicitly there). Raises when no
    batch store exists at the path at all, rather than silently doing
    nothing. Use ONLY when the gap ids are known to be empty/dropped
    batches (the operator's acknowledgment)."""
    store = Path(store)
    sub = find_batch_stores(store)
    if not sub:
        raise RuntimeError(
            f"no batch store found at {store}: pass the store dir the "
            "guard named (or a root whose sub-dirs hold ingest_batch=N "
            "partitions)"
        )
    if len(sub) > 1 or sub != [store]:
        if any(p.name == "reseq" or "reseq" in p.parts[len(store.parts):] for p in sub):
            raise RuntimeError(
                f"{store} contains a resequencer store, whose "
                "buffer/wm ids live in the ARRIVAL id space while the "
                "sibling stores carry downstream fold ids — backfill "
                "each sub-store explicitly instead of the root"
            )
        out: list[int] = []
        for s in sub:
            out.extend(backfill_empty_sentinels(s, next_batch_id))
        return sorted(set(out))

    present = {n for n, _ in _batch_dirs(store) if n >= 0} | set(
        _empty_sentinel_ids(store)
    )
    marker = _read_marker(store)
    if marker:
        start = int(marker["through"]) + 1
    elif present:
        # never-consolidated store: ids below its first fold belong to
        # the time before a mid-life attach, not to a gap
        start = min(present)
    else:
        return []  # a brand-new store needs no backfill (attach is free)
    written = []
    for n in range(start, next_batch_id):
        if n in present:
            continue
        tmp = store / f".empty.b{n}.tmp"
        tmp.write_text("")
        os.replace(tmp, store / f".empty.b{n}")
        written.append(n)
    return written


def rebuild_swap(out_dir: str | Path, build) -> int:
    """The ONE rebuild-into-fresh-store protocol (VERDICT r17 #3):
    recompute into a sibling temp dir via ``build(tmp_dir)``, stamp a
    generation ``_rebuilt.json`` marker (which arms
    :func:`sequential_fold_guard` against the stale pre-rebuild
    checkpoint), then atomically swap the new store in. Returns the
    new generation number.

    Crash-safety: the rebuild must be a pure function of its inputs,
    built entirely in the temp dir; a crash mid-swap leaves either the
    old store, the old store aside (``.<name>.pre-rebuild``) with the
    complete new one in the temp dir, or the new store — re-running
    the rebuild converges from any of those states. Run while no
    stream is writing the store."""
    odir = Path(out_dir)
    tmp = odir.parent / f".{odir.name}.rebuild.tmp"
    aside = odir.parent / f".{odir.name}.pre-rebuild"
    for stale in (tmp, aside):
        if stale.exists():
            shutil.rmtree(stale)
    tmp.mkdir(parents=True)

    generation = 1
    old_marker = odir / REBUILT_MARKER
    if old_marker.exists():
        try:
            generation = int(json.loads(old_marker.read_text())["generation"]) + 1
        except (OSError, ValueError, KeyError):
            pass

    build(tmp)
    mtmp = tmp / (REBUILT_MARKER + ".tmp")
    mtmp.write_text(json.dumps({"generation": generation}, sort_keys=True))
    os.replace(mtmp, tmp / REBUILT_MARKER)

    if odir.exists():
        odir.rename(aside)
    tmp.rename(odir)
    if aside.exists():
        shutil.rmtree(aside)
    return generation


def prefix_bucket(col, n_buckets: int, *more_cols):
    """The gate stores' shared partition-bucket expression:
    ``pmod(xxhash64(cols...), n) AS int``. One definition — the probe's
    pruning filter and the store's partition layout must compute the
    IDENTICAL bucket, and private copies of this expression in each gate
    had already begun to multiply."""
    return F.pmod(F.xxhash64(col, *more_cols), F.lit(n_buckets)).cast("int")


def prefix_bucket_local(spark, values: "list[str]", n_buckets: int) -> "list[int]":
    """Driver-local evaluation of :func:`prefix_bucket` for a SMALL list
    of literal STRINGS (probe/search inputs, never data): the same
    ``pmod(xxhash64(...), n)`` expression evaluated through a one-row
    parameterized SELECT — the literals constant-fold, the plan collapses
    to a LocalRelation, and ``first()`` returns without launching a
    single task. The old shape (createDataFrame + collect) cost a full
    cluster job per probe just to hash a handful of query terms (r19
    probe profile: ~0.34s of a 1.25s warm probe). Values must be the
    same TYPE the store's bucket column hashes (xxhash64 of a bigint is
    a different value than of its string); every current store buckets
    strings. Equality with the distributed expression is pinned by
    ``test_prefix_bucket_local_matches_distributed``."""
    out: list[int] = []
    for start in range(0, len(values), 100):  # bound statement width
        chunk = values[start : start + 100]
        exprs = ", ".join(
            f"pmod(xxhash64(:v{i}), :n) AS b{i}" for i in range(len(chunk))
        )
        args = {f"v{i}": v for i, v in enumerate(chunk)}
        args["n"] = int(n_buckets)
        out.extend(int(v) for v in spark.sql(f"SELECT {exprs}", args=args).first())
    return out


def cap_per_bucket(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    cap: int,
    audit: "CapAudit | None" = None,
) -> DataFrame:
    """Deterministic per-bucket fan-out cap (smallest ``order_col`` wins):
    the standard bound on candidate explosion under bucket crowding,
    shared by the near-dup gates.

    The cap trades recall for a bounded verify join: a true near-dup
    whose kept twin ranks beyond the cap in a crowded bucket is silently
    admitted. Pass ``audit`` to RECORD each batch's cap pressure (buckets
    at the cap, candidate rows dropped) so an operator has a signal when
    the cap starts costing recall (VERDICT r7 missing #3) — the extra
    aggregation runs over the already-pruned candidate slice, one tiny
    driver row per batch."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(order_col))
    ranked = df.withColumn("__rk", F.row_number().over(w))
    if audit is not None:
        over = ranked.filter(F.col("__rk") > cap)
        row = over.agg(
            F.count(F.lit(1)).alias("rows_dropped"),
            F.count_distinct(*[F.col(k) for k in keys]).alias("buckets_at_cap"),
        ).first()
        audit.record(
            cap=cap,
            buckets_at_cap=int(row["buckets_at_cap"]),
            rows_dropped=int(row["rows_dropped"]),
        )
    return ranked.filter(F.col("__rk") <= cap).drop("__rk")


class CapAudit:
    """Per-batch cap-pressure recorder for a gate's candidate cap.

    Writes ``<out_dir>/cap_audit/<family>.b<batch_id>.json`` (atomic
    rename, idempotent under replay — the capped slice is a deterministic
    function of the store and the batch) ONLY when the cap actually
    dropped candidates, so a healthy store accretes no files. Read back
    with :func:`read_cap_audit` to see where and how hard the cap binds.
    """

    def __init__(self, out_dir: str | Path, family: str, batch_id: int) -> None:
        self.dir = Path(out_dir) / "cap_audit"
        self.family = family
        self.batch_id = batch_id

    def record(self, cap: int, buckets_at_cap: int, rows_dropped: int) -> None:
        if rows_dropped <= 0:
            return
        self.dir.mkdir(parents=True, exist_ok=True)
        final = self.dir / f"{self.family}.b{self.batch_id}.json"
        tmp = self.dir / f".{final.name}.tmp"
        tmp.write_text(
            json.dumps(
                {
                    "family": self.family,
                    "batch_id": self.batch_id,
                    "cap": cap,
                    "buckets_at_cap": buckets_at_cap,
                    "rows_dropped": rows_dropped,
                },
                sort_keys=True,
            )
        )
        os.replace(tmp, final)


def read_cap_audit(out_dir: str | Path) -> list[dict]:
    """All recorded cap-pressure events for a gate, batch-ordered. Empty
    = the cap never dropped a candidate (full recall within the probe
    geometry)."""
    d = Path(out_dir) / "cap_audit"
    if not d.exists():
        return []
    out = []
    for p in sorted(d.glob("*.json")):
        try:
            out.append(json.loads(p.read_text()))
        except (OSError, ValueError):
            continue
    return sorted(out, key=lambda r: (r.get("batch_id", -1), r.get("family", "")))


_LAMBDA_TOKEN_RE = re.compile(r"[xyz]_\d+")
_LAMBDA_DECL1_RE = re.compile(r"([xyz]_\d+)\s*->")
_LAMBDA_DECL2_RE = re.compile(r"\(\s*([xyz]_\d+)\s*,\s*([xyz]_\d+)\s*\)\s*->")


def canonical_column_str(col) -> str:
    """``str(Column)`` with higher-order-function lambda variables
    alpha-renamed positionally — the construction-STABLE form a store
    pin must record.

    ``str(Column)`` is not stable across constructions of the same
    expression: Spark gensyms lambda variable names from a
    session-global counter, so ``F.transform(c, lambda x: ...)``
    stringifies as ``x_1 -> …`` on one construction and ``x_7 -> …`` on
    the next (and in a fresh JVM the numbers depend on construction
    order). Only tokens BOUND by a lambda declaration are renamed:
    declarations render as ``x_7 ->`` (one arg) or ``(x_7, y_8) ->``
    (two args, e.g. ``F.aggregate``), and a binding scopes lexically
    over the lambda body — until the ``)`` closing the call whose
    argument the lambda is, or a ``,`` at the declaration's paren
    depth, with inner declarations shadowing outer. A FREE column
    reference that merely looks like a gensym (a data column literally
    named ``x_1``) is left intact, so ``F.col('x_1') > 0`` and
    ``F.col('x_2') > 0`` pin DIFFERENT — a genuinely changed config is
    refused, per the pin contract. Bound variables are renamed to
    ``v_<k>`` in declaration order, deterministic for a fixed
    expression tree, so equal constructions pin equal.

    Known string-rendering limit: Spark's ``str(Column)`` does not
    quote string LITERALS, so a literal whose text itself spells a
    declaration (``F.lit("x_1 -> y")``) is indistinguishable from one
    and gets alpha-renamed — two configs differing only in such
    literals would pin equal. Canonicalization stays construction-
    stable either way (the rendering is identical every time); closing
    the literal ambiguity entirely would require comparing expression
    TREES, which Spark does not expose to Python. No realistic gate
    predicate embeds lambda-shaped literals; recorded for audit."""
    s = str(col)
    out: list[str] = []
    scopes: list[tuple[int, dict[str, str]]] = []  # (decl paren depth, bindings)
    depth = 0
    counter = 0
    i = 0
    n = len(s)

    def _bound(tok: str) -> str | None:
        for _, binds in reversed(scopes):
            if tok in binds:
                return binds[tok]
        return None

    while i < n:
        at_word_boundary = i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")
        if at_word_boundary:
            m2 = _LAMBDA_DECL2_RE.match(s, i)
            if m2 is not None:
                binds = {m2.group(1): f"v_{counter}", m2.group(2): f"v_{counter + 1}"}
                counter += 2
                scopes.append((depth, binds))
                out.append(f"({binds[m2.group(1)]}, {binds[m2.group(2)]}) ->")
                i = m2.end()
                continue
            m1 = _LAMBDA_DECL1_RE.match(s, i)
            if m1 is not None:
                binds = {m1.group(1): f"v_{counter}"}
                counter += 1
                scopes.append((depth, binds))
                out.append(f"{binds[m1.group(1)]} ->")
                i = m1.end()
                continue
            mt = _LAMBDA_TOKEN_RE.match(s, i)
            if mt is not None and (
                mt.end() == n or not (s[mt.end()].isalnum() or s[mt.end()] == "_")
            ):
                tok = mt.group(0)
                out.append(_bound(tok) or tok)
                i = mt.end()
                continue
        ch = s[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            while scopes and scopes[-1][0] > depth:
                scopes.pop()
        elif ch == ",":
            while scopes and scopes[-1][0] == depth:
                scopes.pop()
        out.append(ch)
        i += 1
    return "".join(out)


def ensure_store_params(out_dir: str | Path, params: dict) -> None:
    """Persist a gate's store-LAYOUT-defining parameters
    (``_gate_params.json``, written once, atomically) and REFUSE a
    restart that disagrees: the partition-bucket moduli and signature
    shapes are baked into every increment ever written — a fold running
    with, say, a different ``n_prefix`` would compute touched-prefix
    lists under the new modulus while history partitions carry the old
    one, silently missing every historical entry and re-admitting
    duplicates forever. Layout changes require a rebuild into a fresh
    store (the embedding gate's ``lsh_meta.json`` is the same contract
    for its index)."""
    marker = Path(out_dir) / "_gate_params.json"
    if marker.exists():
        existing = json.loads(marker.read_text())
        if existing != params:
            raise RuntimeError(
                f"gate store at {out_dir} was built with {existing}, "
                f"restart supplied {params}: layout parameters are baked "
                "into the stored partitions/signatures — rebuild into a "
                "fresh out_dir instead of changing them in place"
            )
        return
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    tmp = Path(out_dir) / "_gate_params.json.tmp"
    tmp.write_text(json.dumps(params, sort_keys=True))
    os.replace(tmp, marker)


def record_anti_join_key(store: str | Path, id_col: str) -> None:
    """Record the ONE column an exclusion store is keyed by
    (``_anti_join_key.json``, atomic, idempotent). Readers that
    anti-join the store against a corpus view must join on this column
    alone: inferring the key as "all shared columns" silently WIDENS
    the join when the doc schema happens to contain a column named like
    an evidence column (``n_shared``…), and widened keys stop excluding
    the revoked rows (ADVICE r9)."""
    store = Path(store)
    store.mkdir(parents=True, exist_ok=True)
    marker = store / "_anti_join_key.json"
    if marker.exists():
        existing = json.loads(marker.read_text())["id_col"]
        if existing != id_col:
            raise RuntimeError(
                f"exclusion store at {store} is keyed by {existing!r}, "
                f"writer supplied {id_col!r}"
            )
        return
    tmp = store / "_anti_join_key.json.tmp"
    tmp.write_text(json.dumps({"id_col": id_col}, sort_keys=True))
    os.replace(tmp, marker)


def read_anti_join_key(store: str | Path) -> str | None:
    """The recorded exclusion-store key column, or None for a store
    written before keys were recorded (readers fall back to shared
    columns minus known evidence columns)."""
    marker = Path(store) / "_anti_join_key.json"
    if not marker.exists():
        return None
    return json.loads(marker.read_text())["id_col"]


def _empty_sentinel_ids(store: Path) -> list[int]:
    if not store.exists():
        return []
    out = []
    for p in store.iterdir():
        m = re.match(r"^\.empty\.b(\d+)$", p.name)
        if m:
            out.append(int(m.group(1)))
    return out


def append_batch_increment(
    df: DataFrame,
    store: str | Path,
    batch_id: int,
    partition_by: str | list[str] | None = None,
) -> bool:
    """Write one micro-batch increment dir (``ingest_batch=B``) into a
    batch store: tmp + atomic rename, so a crash-replay overwrites its
    own directory idempotently. The ONE shared implementation of the
    protocol every streaming gate uses (dedup / near-dedup / decontam /
    filter gates) — the crash-safety-critical write path must not exist
    in per-module copies that drift.

    Returns False when ``df`` has no rows, writing a SENTINEL file
    (``.empty.b{B}``) instead of a data dir: a PARTITIONED write of an
    empty DataFrame produces a directory with no data files, and one
    such dir poisons every later ``spark.read.parquet`` over the store
    (``UNABLE_TO_INFER_SCHEMA``) — while writing NOTHING would leave
    ``last_batch_id`` stale after an all-empty fold, letting a
    fresh-checkpoint renumbered replay pass the gate's guard and
    OVERWRITE committed earlier increments with different content. The
    sentinel is dot-prefixed (invisible to parquet listings and the
    batch-dir regex), counted by ``last_batch_id``, and swept by
    consolidation once superseded.

    With ``partition_by``, rows are hash-clustered onto tasks by the
    partition column first — otherwise every task writes a sliver into
    every partition value's directory (n_values × tasks small files per
    batch)."""
    store = Path(store)
    # Cache across the emptiness probe and the write: both evaluate the
    # (often join/aggregation-heavy) gate output, and without the cache
    # every non-empty micro-batch would compute its plan twice. OWNERSHIP
    # matters: Spark caching is per logical plan with no refcount, so
    # unpersisting a frame the CALLER already cached would silently drop
    # their cache and force a full recompute on their next use — only a
    # cache this helper itself created is released here.
    own_cache = not df.is_cached
    if own_cache:
        df = df.cache()
    try:
        if not df.take(1):
            # Record the empty fold with a sentinel FILE (`.empty.b{B}`,
            # dot-prefixed: invisible to parquet listings and the batch-
            # dir regex) so last_batch_id still advances: without it a
            # store whose latest folds were all empty reports a stale id,
            # and a fresh-checkpoint renumbered replay would pass the
            # gate's guard and OVERWRITE committed earlier increments
            # with different content. No data dir is written — a
            # partitioned empty write leaves a file-less dir that poisons
            # every later read of the store.
            store.mkdir(parents=True, exist_ok=True)
            marker = store / f".empty.b{batch_id}"
            mtmp = store / f".empty.b{batch_id}.tmp"
            mtmp.write_text("")
            os.replace(mtmp, marker)
            return False
        store.mkdir(parents=True, exist_ok=True)
        tmp = store.parent / f".{store.name}.b{batch_id}.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        if partition_by:
            cols = (
                [partition_by] if isinstance(partition_by, str) else list(partition_by)
            )
            clustered = df.repartition(*[F.col(c) for c in cols])
            clustered.write.mode("overwrite").partitionBy(*cols).parquet(
                str(tmp)
            )
        else:
            df.write.mode("overwrite").parquet(str(tmp))
        final = store / f"ingest_batch={batch_id}"
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)
        return True
    finally:
        if own_cache:
            df.unpersist()


def account_empty_fold(
    batch_df: DataFrame, stores, batch_id: int
) -> None:
    """Record one EMPTY fold in each store, in the given order — the
    gates' shared empty/all-dropped-batch accounting (code-review r18:
    five modules had hand-rolled copies of the two sentinel appends,
    each re-encoding the write-order invariant in a comment). Pass the
    stores in the gate's normal write order (commit store LAST): each
    append leaves only a dot-prefixed sentinel (no data dir), the
    min-across-stores guard advances, and the sequential-numbering
    guard's id sequence stays gap-free."""
    empty = batch_df.limit(0)
    for s in stores:
        append_batch_increment(empty, s, batch_id)


def write_initial_consolidated(
    df: DataFrame, store: str | Path, partition_by: str | None, through: int = -1
) -> None:
    """Write ``df`` as a brand-new store's ONE consolidated partition
    (``ingest_batch=-1`` plus the marker with the given ``through``) —
    the layout :func:`consolidate_batch_store` would produce for a
    history folded through batch ``through``, so ``last_batch_id``
    reports ``through`` and the next fold arrives at ``through + 1``.
    ``through=-1`` seeds a store expecting a FRESH checkpoint's batch 0
    (the retraction-rebuild contract); ``through=N`` seeds one joining
    a CONTINUING checkpoint mid-life (the backfill contract). Lives
    HERE so the marker filename/schema exist in exactly one module
    (code-review r17: a per-store copy of the protocol had appeared).
    Empty frames write only the marker when ``through >= 0`` (the
    seeded horizon must still advance the replay guard) and nothing at
    ``through=-1`` — a file-less partitioned dir would poison every
    later read either way."""
    store = Path(store)
    has_rows = bool(df.take(1))
    if not has_rows and through < 0:
        return
    store.mkdir(parents=True, exist_ok=True)
    if has_rows:
        tmp = store / ".consolidate.1.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        if partition_by:
            df.repartition(F.col(partition_by)).write.mode("overwrite").partitionBy(
                partition_by
            ).parquet(str(tmp))
        else:
            df.write.mode("overwrite").parquet(str(tmp))
        final = store / "ingest_batch=-1"
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)
    marker = {
        # consolidated stays -1 even with no data dir written: the read
        # view's `ingest_batch == -1` arm then simply matches nothing
        # (int-typed marker fields keep every reader's arithmetic valid)
        "consolidated": -1,
        "through": int(through),
        "prev_consolidated": None,
        "prev_through": -1,
    }
    mtmp = store / (_MARKER + ".tmp")
    mtmp.write_text(json.dumps(marker))
    os.replace(mtmp, store / _MARKER)


def _read_marker(store: Path) -> dict | None:
    p = store / _MARKER
    if not p.exists():
        return None
    return json.loads(p.read_text())


def _batch_dirs(store: Path) -> list[tuple[int, Path]]:
    if not store.exists():
        return []
    return sorted(
        (int(m.group(1)), p)
        for p in store.iterdir()
        if (m := _BATCH_RE.match(p.name))
    )


def last_batch_id(store: str | Path) -> int:
    """Highest micro-batch id ever folded into the store — live dirs,
    consolidated-through, or empty-fold sentinels — or -1. The
    fresh-checkpoint replay guard."""
    store = Path(store)
    top = max((n for n, _ in _batch_dirs(store) if n >= 0), default=-1)
    top = max([top, *_empty_sentinel_ids(store)])
    marker = _read_marker(store)
    if marker:
        top = max(top, int(marker["through"]))
    return top


def read_batch_store(
    spark: SparkSession, store: str | Path, schema: str | None = None
) -> DataFrame:
    """The live view of the store: consolidated partition ∪ batches past
    it. The ``ingest_batch`` filter is a static partition filter, so
    excluded dirs (stale folds, crash leftovers, replayed-but-superseded
    batches) are pruned at planning time. The ``ingest_batch`` column is
    kept; callers drop it.

    ``schema`` (DDL, including partition columns) bypasses partition-type
    INFERENCE — mandatory for stores partitioned by a string key whose
    values can look numeric (the group-texts stream's md5-hex shards:
    an all-numeric population of dirs like ``shard=07`` would otherwise
    infer int and silently corrupt the value to 7)."""
    store = Path(store)
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.parquet(str(store))
    marker = _read_marker(store)
    if marker:
        return df.filter(
            (F.col("ingest_batch") == int(marker["consolidated"]))
            | (F.col("ingest_batch") > int(marker["through"]))
        )
    return df.filter(F.col("ingest_batch") >= 0)


def _sweep_stale(store: Path, marker: dict) -> int:
    """Delete every batch dir that has been excluded from the reader view
    for a FULL fold generation — the post-commit cleanup of a fold, also
    re-runnable standalone to finish a fold that crashed after its marker
    swap. Returns dirs removed.

    One-generation GRACE (the batch-store analog of the versioned
    tables' {new, previously-read} retention): a reader's already-built
    plan pins the concrete files of the marker view it resolved at
    planning time; deleting the dirs a fold *just* excluded would tear
    that plan mid-scan (FileNotFound on an executor) — with in-stream
    consolidation there is no longer a quiesced window to hide behind.
    So a fold sweeps only what the PREVIOUS marker already excluded
    (invisible to every plan younger than one full generation) and
    leaves its own just-folded dirs (positives in
    ``(prev_through, through]`` plus the previous consolidated dir) on
    disk until the NEXT fold. Directory count stays bounded at
    ~2 generations. Legacy markers (no ``prev_*`` fields) sweep with the
    old everything-excluded semantics until their next fold writes the
    current marker shape."""
    cons, through = int(marker["consolidated"]), int(marker["through"])
    prev_cons = marker.get("prev_consolidated", cons)
    prev_through = int(marker.get("prev_through", through))
    keep_neg = {cons} | ({int(prev_cons)} if prev_cons is not None else set())
    swept = 0
    for n, p in _batch_dirs(store):
        if n in keep_neg:
            continue
        if n < 0 or n <= prev_through:
            shutil.rmtree(p, ignore_errors=True)
            swept += 1
    # Empty-fold sentinels past their grace generation are superseded by
    # the marker's `through` (last_batch_id folds both).
    for n in _empty_sentinel_ids(store):
        if n <= prev_through:
            (store / f".empty.b{n}").unlink(missing_ok=True)
    return swept


def consolidate_batch_store(
    spark: SparkSession,
    store: str | Path,
    partition_by: list[str] | None = None,
    up_to: int | None = None,
    transform=None,
) -> int:
    """Fold live batch partitions into one consolidated partition (see
    module docstring for the crash-safety argument). Returns the number
    of directories folded or swept (0 = nothing to do).

    Writer coordination: either run OFFLINE (owning stream stopped — the
    original contract), or IN-STREAM from the owning stream's own
    ``foreachBatch`` (see :func:`maybe_consolidate_in_stream`) — the
    stream is the store's only writer, so its foreachBatch serializes
    folds against appends with no extra coordination. In-stream callers
    MUST pass ``up_to = current_batch_id - 1``: the current batch's own
    increment dir must survive the fold because a crash-replay of that
    (still-uncommitted) batch reads it back (`_stored()` in every gate,
    and the composed pipeline feeds it to downstream stages); batches
    before it are checkpoint-committed and can never be re-delivered.

    A re-run with no new batches still sweeps directories a crashed
    fold's marker already excludes — otherwise a fold that died between
    its marker swap and its cleanup would leave the stale dirs listed by
    every partition discovery until some future batch triggered another
    productive fold (never, on a quiesced store).

    ``transform`` (optional) rewrites the folded frame before it is
    written — for stores whose read side resolves rows associatively
    (latest-per-key frontiers: collapse to the resolved row; released
    resequencer buffers: drop rows below the release floor), so row
    count — not just directory count — resets at each fold. It MUST be
    read-semantics-preserving: the post-fold view is
    ``transform(folded) ∪ (ingest_batch > through)``, and the read-side
    resolution over that union must equal resolution over the raw rows
    (true exactly when the resolution is associative and the transform
    is the resolution itself, or drops rows no reader can select)."""
    store = Path(store)
    dirs = _batch_dirs(store)
    marker = _read_marker(store)
    live_positive = [n for n, _ in dirs if n >= 0]
    if marker:
        live_positive = [n for n in live_positive if n > int(marker["through"])]
    if up_to is not None:
        live_positive = [n for n in live_positive if n <= up_to]
    if len(live_positive) <= 1 and marker is None:
        return 0  # a single batch dir gains nothing
    if not live_positive and marker is not None:
        return _sweep_stale(store, marker)  # crash-leftover cleanup only
    if not live_positive:
        return 0

    through = max(
        live_positive + ([int(marker["through"])] if marker else [])
    )
    new_id = int(marker["consolidated"]) - 1 if marker else -1

    live = read_batch_store(spark, store)
    if up_to is not None:
        # Batches past the fold horizon stay in their own live dirs; the
        # fold must not absorb their rows or the post-fold view
        # (consolidated ∪ ingest_batch > through) would double-count them.
        live = live.filter(F.col("ingest_batch") <= up_to)
    live = live.drop("ingest_batch")
    if transform is not None:
        live = transform(live)
    tmp = store / f".consolidate.{-new_id}.tmp"
    if tmp.exists():
        shutil.rmtree(tmp)
    writer = live.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(tmp))
    final = store / f"ingest_batch={new_id}"
    if final.exists():
        shutil.rmtree(final)
    tmp.rename(final)

    new_marker = {
        "consolidated": new_id,
        "through": through,
        # Grace bookkeeping for the reader-safe sweep (see _sweep_stale):
        # what THIS fold just excluded stays on disk until the next fold.
        "prev_consolidated": int(marker["consolidated"]) if marker else None,
        "prev_through": int(marker["through"]) if marker else -1,
    }
    mtmp = store / (_MARKER + ".tmp")
    mtmp.write_text(json.dumps(new_marker))
    os.replace(mtmp, store / _MARKER)  # the commit point

    return len(live_positive) + _sweep_stale(store, new_marker)


_EMPTY_SENTINEL_RE = re.compile(r"^\.empty\.b\d+$")
_REBUILD_LEFTOVER_RE = re.compile(r"^\..+\.(rebuild\.tmp|pre-rebuild)$")

#: A temp dir younger than this is treated as an in-flight write, not a
#: crash leftover: the sweep is documented safe against a LIVE stream,
#: and append/consolidation tmp dirs legitimately exist for the duration
#: of a parquet write (code-review r18).
STALE_TMP_AGE_SECS = 3600.0


def _walk_warehouse(root: Path) -> tuple[list[Path], list[Path], list[Path]]:
    """One pruned walk: (batch stores, JSON sidecars, rebuild
    leftovers). Batch partition dirs, temp dirs, and rebuild
    tmp/aside dirs are not descended into — their contents are parquet
    data or a dead copy of a store tree."""
    stores: set[Path] = set()
    sidecars: list[Path] = []
    leftovers: list[Path] = []
    for dirpath, dirnames, filenames in os.walk(root):
        d = Path(dirpath)
        if (
            any(_BATCH_RE.match(x) for x in dirnames)
            or _MARKER in filenames
            or any(_EMPTY_SENTINEL_RE.match(f) for f in filenames)
        ):
            stores.add(d)
        for f in filenames:
            if f in ("_gate_params.json", REBUILT_MARKER):
                sidecars.append(d / f)
        kept = []
        for x in dirnames:
            if _REBUILD_LEFTOVER_RE.match(x):
                leftovers.append(d / x)
            elif not (_BATCH_RE.match(x) or x.endswith(".tmp")):
                kept.append(x)
        dirnames[:] = kept
    return sorted(stores), sidecars, leftovers


def find_batch_stores(root: str | Path) -> list[Path]:
    """Every batchstore-shaped directory under a warehouse root — a dir
    holding ``ingest_batch=N`` partitions, empty-fold sentinels, or a
    consolidation marker. Read-only. Rebuild tmp/aside trees (a dead
    copy of a store) are excluded."""
    root = Path(root)
    if not root.exists():
        return []
    return _walk_warehouse(root)[0]


def _stale_tmp(p: Path, now: float) -> bool:
    """A temp tree is stale only when NOTHING inside it has been
    touched for :data:`STALE_TMP_AGE_SECS`: the top-level dir's mtime
    freezes at creation while an in-flight write spends hours inside
    subdirectories (code-review r18), so staleness must be judged by
    the NEWEST mtime anywhere in the tree."""
    newest = 0.0
    try:
        newest = p.stat().st_mtime
        if p.is_dir():
            for dirpath, dirnames, filenames in os.walk(p):
                d = Path(dirpath)
                for name in dirnames + filenames:
                    try:
                        newest = max(newest, (d / name).stat().st_mtime)
                    except OSError:
                        continue
                if now - newest <= STALE_TMP_AGE_SECS:
                    return False  # fresh activity found: stop walking
    except OSError:
        return False
    return now - newest > STALE_TMP_AGE_SECS


def audit_batch_store(store: str | Path) -> list[str]:
    """Read-only invariant sweep of ONE batch store (VERDICT r17 #6 —
    the operational complement of the fold-time guards): unreadable
    marker, gapped batch-id sequence (the sequential guard's failure
    mode, visible at rest), and STALE crash-leftover temp dirs (older
    than :data:`STALE_TMP_AGE_SECS` — younger ones are a live stream's
    in-flight writes, not findings). Returns human-readable violations,
    empty when healthy.

    The gap check is skipped for stores fed by a RESEQUENCER (detected
    by a sibling ``reseq/`` dir): their downstream ids (2B / 2B+1,
    absent when a batch releases nothing) are legitimately
    non-contiguous; the resequencer's own ``buffer``/``wm`` stores
    carry the gap-free arrival ids and ARE checked."""
    import time as _time

    store = Path(store)
    problems: list[str] = []

    marker = None
    mp = store / _MARKER
    if mp.exists():
        try:
            marker = json.loads(mp.read_text())
            int(marker["consolidated"])
            int(marker["through"])
        except (OSError, ValueError, KeyError, TypeError):
            problems.append(f"{store}: unreadable or malformed {_MARKER}")
            marker = None

    reseq_fed = store.name not in ("buffer", "wm") and (
        (store.parent / "reseq").exists()
    )
    ids = sorted(
        {n for n, _ in _batch_dirs(store) if n >= 0}
        | set(_empty_sentinel_ids(store))
    )
    floor = int(marker["through"]) if marker else None
    live = [n for n in ids if floor is None or n > floor]
    if live and not reseq_fed:
        lo = floor + 1 if floor is not None else live[0]
        missing = sorted(set(range(lo, live[-1] + 1)) - set(live))
        if missing:
            shown = ", ".join(map(str, missing[:8]))
            more = ", ..." if len(missing) > 8 else ""
            problems.append(
                f"{store}: gapped batch ids ({shown}{more}) between "
                f"{lo} and {live[-1]} — a stale/foreign checkpoint "
                "folded past missing history, increments were deleted "
                "by hand, or a pre-guard writer skipped empty batches "
                "without sentinels; the store's reports silently "
                "exclude the gap (if the gap ids are KNOWN empty "
                "batches, record them with "
                "batchstore.backfill_empty_sentinels)"
            )

    now = _time.time()
    for p in store.parent.glob(f".{store.name}.b*.tmp"):
        if _stale_tmp(p, now):
            problems.append(f"{p}: stale increment tmp (crashed append)")
    for p in store.glob(".consolidate.*.tmp"):
        if _stale_tmp(p, now):
            problems.append(f"{p}: stale consolidation tmp (crashed fold)")
    return problems


def sweep_warehouse(root: str | Path) -> tuple[list[Path], list[str]]:
    """ONE pruned directory walk over a warehouse root, returning
    (batch stores found, violations): every batch store's invariants
    (:func:`audit_batch_store`), the store family's JSON sidecars
    (`_gate_params.json`, `_rebuilt.json`), and rebuild tmp/aside
    leftovers — read-only and safe against a LIVE warehouse (in-flight
    temp trees are age-gated by their newest inner mtime, not
    findings). The doctor's entry point: it needs both the listing and
    the violations, and must not pay the walk twice (code-review
    r18)."""
    import time as _time

    root = Path(root)
    if not root.exists():
        return [], []
    stores, sidecars, leftovers = _walk_warehouse(root)
    problems: list[str] = []
    for store in stores:
        problems.extend(audit_batch_store(store))
    for p in sidecars:
        try:
            json.loads(p.read_text())
        except (OSError, ValueError):
            problems.append(f"{p}: unreadable JSON sidecar")
    now = _time.time()
    for p in leftovers:
        if _stale_tmp(p, now):
            problems.append(
                f"{p}: leftover rebuild dir (crashed rebuild_swap) — "
                "re-run the rebuild to converge, then remove"
            )
    return stores, problems


def audit_warehouse_stores(root: str | Path) -> list[str]:
    """The violations half of :func:`sweep_warehouse` — catch
    checkpoint misuse, hand-edits, and crash leftovers at rest, before
    they surface as fold-time refusals. Empty = healthy."""
    return sweep_warehouse(root)[1]


def maybe_consolidate_in_stream(
    spark: SparkSession,
    stores: dict[str | Path, list[str] | None],
    batch_id: int,
    every: int | None,
    unbounded: set | frozenset | None = None,
    transforms: dict | None = None,
) -> int:
    """In-stream consolidation hook: called from the owning stream's own
    ``foreachBatch`` AFTER the batch's appends, folds each store's
    batches up to ``batch_id - 1`` whenever ``batch_id`` is a positive
    multiple of ``every``. Removes the stop-the-stream maintenance
    window: the stream is the store's only writer, so running the fold
    inside its serialized foreachBatch needs no new coordination, and
    bounding the fold at ``batch_id - 1`` keeps the current
    (uncommitted) batch's increment readable for a crash-replay.

    ``stores`` maps store path -> partition_by columns (or None).
    ``every=None`` disables (offline-only maintenance, the pre-r8
    contract). ``transforms`` maps store path -> fold-time rewrite
    (see :func:`consolidate_batch_store`'s ``transform``). ``unbounded``
    names stores whose batch ids live in an
    INDEPENDENT id space (e.g. the retrieval index's ``revoked`` store,
    written on its own generation counter while the stream is stopped):
    those fold with no ``up_to`` bound — the same discipline their
    offline compactor applies (ADVICE r12) — since bounding them at the
    stream's batch id would be comparing unrelated counters. Idempotent
    under replay: a re-delivered trigger batch re-runs the fold, which
    either finds nothing live below the horizon (already folded —
    sweep-only) or completes a fold that crashed midway. Returns total
    dirs folded/swept."""
    if not every or batch_id <= 0 or batch_id % every != 0:
        return 0
    skip_bound = {Path(p) for p in (unbounded or ())}
    xform = {Path(p): t for p, t in (transforms or {}).items()}
    total = 0
    for store, partition_by in stores.items():
        store = Path(store)
        if store.exists():
            total += consolidate_batch_store(
                spark,
                store,
                partition_by=partition_by,
                up_to=None if store in skip_bound else batch_id - 1,
                transform=xform.get(store),
            )
    return total
