"""Text column expressions: tokenization, shingles, fingerprints, quality.

All pure Catalyst expressions (whole-stage-codegen'd, no Python per row) so
they hold up on a 100 TB documents table. Semantics are chosen to be exactly
reproducible in ANSI SQL for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# A deliberately small, fixed stopword list — part of the declared semantics
# (the oracle uses the same list), not a linguistic claim.
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokens(text: Column) -> Column:
    """Whitespace tokens. split on \\s+ keeps a leading empty token for
    leading whitespace (same as DuckDB string_split_regex) — callers that
    need counts should trim first."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    """Number of whitespace-separated tokens; 0 for empty/blank text."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles joined by single spaces; empty array when
    there are fewer than n tokens."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def normalized_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of lowercase,
    whitespace-collapsed text (md5 so the SQL oracle can reproduce it)."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")))


def stopword_ratio(toks: Column) -> Column:
    """Fraction of tokens that are stopwords (0.0 for empty docs)."""
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def distinct_token_ratio(toks: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens (0.0 for empty)."""
    return F.when(F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)).otherwise(
        F.lit(0.0)
    )

def top_token_fraction(toks: Column) -> Column:
    """Fraction of the document occupied by its single most-frequent token
    (0.0 for empty docs) — the Gopher-style repetition signal. Quadratic in
    tokens-per-doc but linear in documents, all inside codegen'd
    higher-order array functions, so it scales with the corpus."""
    counts = F.transform(
        F.array_distinct(toks),
        lambda x: F.size(F.filter(toks, lambda y: y == x)),
    )
    return F.when(
        F.size(toks) > 0, F.array_max(counts).cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


# Pattern-based PII redaction (complements the token-denylist scrub):
# (regex, mask) applied in order — email before phone before bare id runs,
# so a digits-only match left behind by an earlier mask still gets caught.
# Patterns use only RE2-safe syntax (no backrefs/lookaround) so Spark's
# Java regex engine and the DuckDB oracle's RE2 agree character-for-
# character; the phone pattern requires a leading '+' so plain long digit
# runs fall through to the <ID> mask instead.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+[0-9][0-9()\-]{6,}[0-9]", "<PHONE>"),
    (r"[0-9]{9,}", "<ID>"),
)


def scrub_pii(text: Column) -> Column:
    """Mask emails, international-format phone numbers, and long id-like
    digit runs — the regex tier of PII redaction (the token-denylist tier
    is :func:`scrub_tokens`). Pure Catalyst ``regexp_replace`` chain:
    map-only, codegen'd, no Python."""
    for pat, mask in PII_PATTERNS:
        text = F.regexp_replace(text, pat, mask)
    return text


def scrub_tokens(toks: Column, denylist: tuple[str, ...], mask: str = "[TERM]") -> Column:
    """Replace every denylisted token with ``mask``, preserving positions —
    the redaction primitive for PII/term scrubbing. Pure array transform."""
    return F.transform(
        toks, lambda x: F.when(x.isin(*denylist), F.lit(mask)).otherwise(x)
    )


def doc_shingles(
    docs: "DataFrame", n: int = 8, *cols: str, unique_rows: bool = False
) -> "DataFrame":
    """DISTINCT md5'd n-token shingles per document (plus any carried
    ``cols``): the shared frame under the boilerplate/overlap reports
    and their streaming twin. md5 fixes the shuffle width regardless of
    shingle text length — at 100 TB the shingle strings never travel,
    only 32-hex digests. Docs shorter than ``n`` tokens contribute no
    shingles (the CASE guard — Spark's ``sequence(1, k)`` with k <= 0
    would count DOWN, not return empty).

    ``unique_rows=True`` asserts that ``cols`` is unique per input ROW
    (e.g. the doc id of a one-row-per-document table): the per-key
    dedup is then exactly a per-row ``array_distinct`` BEFORE the
    explode, and the corpus-wide ``.distinct()`` shuffle disappears
    from the plan entirely (guide §2.4 — remove shuffles outright).
    Callers whose key repeats across rows (e.g. ``source``) must keep
    the default global distinct."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = int(n)
    shingles = F.expr(
        f"CASE WHEN size(_toks) >= {n} THEN "
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> md5(array_join(slice(_toks, i, {n}), ' '))) "
        "ELSE array() END"
    )
    if unique_rows:
        return (
            docs.filter(F.trim(F.col("text")) != "")
            .select(*cols, toks.alias("_toks"))
            .select(*cols, F.explode(F.array_distinct(shingles)).alias("s"))
        )
    return (
        docs.filter(F.trim(F.col("text")) != "")
        .select(*cols, toks.alias("_toks"))
        .select(*cols, F.explode(shingles).alias("s"))
        .distinct()
    )
