"""BPE vocabulary training — the tokenizer-building step of an LLM data
pipeline, run where the data is instead of shipping the corpus to a
tokenizer trainer.

Reference parity: no counterpart in the reference (its unit of work is
the product record); this is a north-star extension from the brief's
"token counting (whitespace + a BPE-ish regex)" family, taken to its
conclusion: actually training the merges.

Shape: classic BPE (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units" — public algorithm) over the DISTINCT
token frequency table. The corpus is scanned exactly once (token
counts); every merge round after that works on the vocabulary-sized
frame alone:

  round := top adjacent symbol pair by frequency-weighted count
           (one map-side-combinable aggregation over vocab)
         → merge that pair left-to-right non-overlapping in every
           token's symbol array (one Catalyst ``aggregate`` fold, no
           Python)

The driver loop collects ONE row per round (the winning pair — bounded
driver traffic by construction) and grows a lineage of ``n_merges``
narrow projections; ``localCheckpoint`` every few rounds truncates the
plan so round cost stays flat. 100 TB note: vocab is O(distinct tokens)
(~10⁷-10⁸ rows), not O(corpus); each round is one shuffle of (pair,
count) partials — the exact profile a single-machine trainer cannot
offer and the corpus-sized alternative (re-scanning text per round)
must not have.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _split_chars(tok: Column) -> Column:
    # split with an empty pattern yields characters (unicode-aware).
    # Spark 3.x appended a trailing empty string for empty-pattern split
    # (fixed in 4.x); filter defensively so a Spark downgrade corrupts
    # neither pair counts nor merges — empty symbols are never valid BPE
    # symbols, so the filter is a no-op on 4.x.
    return F.filter(F.split(tok, ""), lambda x: x != F.lit(""))


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) → a+b in a
    symbol array, as a Catalyst fold: after a merge the accumulator's
    last element is ``a+b`` ≠ ``a``, so an overlapping re-merge within
    the round is impossible — exactly reference-BPE semantics (in
    'aaa', pair ('a','a') merges to ['aa','a'])."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: NULL (≠ a) on the empty initial accumulator
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def token_frequencies(docs: DataFrame, text_col: str) -> DataFrame:
    """The one corpus scan: whitespace tokens → (tok, c) counts."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str,
    n_merges: int,
    checkpoint_every: int = 8,
    initial_merges: list[tuple[str, str, int]] | None = None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train up to ``n_merges`` TOTAL BPE merges over whitespace tokens
    of ``docs[text_col]``.

    Returns ``(merges, vocab)``: ``merges`` is the ordered list of
    ``(left, right, weighted_count)`` rules (THE tokenizer artifact —
    apply them in order to encode new text), ``vocab`` the final
    DataFrame ``(tok, c, syms array<string>)`` of every distinct token
    with its post-merge symbol sequence. Deterministic: pair ties break
    lexicographically, so two runs (and a re-run after a crash) produce
    identical rules. Stops early when no adjacent pair remains.

    ``initial_merges`` RESUMES a training run: the rules already learned
    (persist them anywhere — they are plain tuples) are re-applied as
    cheap Catalyst folds instead of re-running their pair aggregations,
    and training continues until ``n_merges`` total. Resume-from-k
    equals training n_merges in one run (``test_bpe_train_resume``)
    because every round is a pure function of the corpus and the rules
    so far."""
    spark = docs.sparkSession
    vocab = token_frequencies(docs, text_col).withColumn(
        "syms", _split_chars(F.col("tok"))
    )
    merges: list[tuple[str, str, int]] = list(initial_merges or [])
    for a, b, _ in merges:
        vocab = vocab.withColumn("syms", _merge_pair(F.col("syms"), a, b))
    vocab = vocab.localCheckpoint()  # truncate the scan/replay lineage once
    for round_no in range(n_merges - len(merges)):
        pairs = F.transform(
            F.sequence(F.lit(1), F.size("syms") - 1),
            lambda i: F.struct(
                F.element_at("syms", i).alias("a"),
                F.element_at("syms", i + F.lit(1)).alias("b"),
            ),
        )
        top = (
            vocab.filter(F.size("syms") >= 2)
            .select(F.explode(pairs).alias("p"), "c")
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
        merges.append((a, b, n))
        vocab = vocab.withColumn("syms", _merge_pair(F.col("syms"), a, b))
        if (round_no + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
        _ = spark  # session kept for symmetry with other driver loops
    return merges, vocab


def bpe_encode(tokens: Column, merges: list[tuple[str, str, int]]) -> Column:
    """Encode a token column with trained rules: chars, then each merge
    applied in training order — the standard greedy BPE encoder, all
    Catalyst (composes into any ingest plan with zero Python)."""
    syms = _split_chars(tokens)
    for a, b, _ in merges:
        syms = _merge_pair(syms, a, b)
    return syms
