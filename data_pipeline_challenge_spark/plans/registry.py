"""Declared query inventory — the contract surface the driver verifies.

Each :class:`QueryDef` pairs a Spark DataFrame builder with an equivalent
ANSI-SQL oracle (DuckDB dialect) over the same parquet tables. The driver
runs both at sf=0.01 and compares row count + schema + order-insensitive
value hash, so:

- every computed column is aliased identically on both sides;
- float aggregates are rounded on both sides (summation order differs
  between engines — rounding makes the comparison stable);
- LIMIT queries carry a deterministic ORDER BY on a unique key;
- no output column depends on the session timezone (epoch arithmetic /
  NTZ-derived dates only).

Queries whose semantics SQL cannot express (hash-seeded MinHash/SimHash
sketches, LSH bucketing) set ``oracle=None`` → the driver records a weaker
rows-only check, which is the honest label for them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, QueryDef] = {}


def query(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, doc or (fn.__doc__ or ""), tags, bench)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Import side-effect modules on first use so the registry is populated.
    from . import events, relational, similarity, stats, text  # noqa: F401

    return dict(_REGISTRY)


def queries_callables() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in all_queries().items()}


def oracles() -> dict[str, str]:
    return {name: qd.oracle for name, qd in all_queries().items() if qd.oracle is not None}


def bench_queries() -> dict[str, QueryDef]:
    return {name: qd for name, qd in all_queries().items() if qd.bench}
