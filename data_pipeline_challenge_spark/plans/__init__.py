"""Declared query inventory (see registry.py)."""

from .registry import all_queries, bench_queries, oracles, queries_callables

__all__ = ["all_queries", "bench_queries", "oracles", "queries_callables"]
