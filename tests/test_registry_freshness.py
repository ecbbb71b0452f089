"""Verification-freshness mechanism (VERDICT r7 #1).

A green driver row only counts as "verified" while the query's source
fingerprint still matches the fingerprint recorded for that round; an
edited query (or edited one-level operator callee) drifts back to
unverified and re-sorts first in the driver's capped sample.
"""

from __future__ import annotations

import json
import re
import subprocess
from pathlib import Path

import pytest

from data_pipeline_challenge_spark.plans._source_hash import (
    current_query_hashes,
    query_hashes,
)

ROOT = Path(__file__).resolve().parents[1]

_QUERY_MOD = '''
from ..catalog import load_table
from ..operators.dedup import simhash_near_pairs
from .registry import query

_THRESHOLD = 5

@query("alpha", oracle="SELECT 1 AS one")
def alpha(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(df, threshold=_THRESHOLD)

@query("beta", oracle=None)
def beta(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")
'''

_DEDUP_MOD = '''
def simhash_near_pairs(df, threshold, max_hamming=16):
    return df
'''

_CATALOG_MOD = '''
def load_table(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
'''


def _files(query_mod=_QUERY_MOD, dedup_mod=_DEDUP_MOD, catalog_mod=_CATALOG_MOD):
    return {
        "plans/queries.py": query_mod,
        "operators/dedup.py": dedup_mod,
        "catalog.py": catalog_mod,
    }


def test_extracts_all_registered_queries():
    hashes = query_hashes(_files())
    assert set(hashes) == {"alpha", "beta"}


def test_fn_edit_changes_hash_only_for_that_query():
    base = query_hashes(_files())
    edited = query_hashes(
        _files(query_mod=_QUERY_MOD.replace('orders"', 'lineitem"'))
    )
    assert edited["beta"] != base["beta"]
    assert edited["alpha"] == base["alpha"]


def test_oracle_edit_changes_hash():
    base = query_hashes(_files())
    edited = query_hashes(
        _files(query_mod=_QUERY_MOD.replace("SELECT 1 AS one", "SELECT 2 AS one"))
    )
    assert edited["alpha"] != base["alpha"]


def test_operator_callee_default_change_invalidates_caller():
    """The exact r7 failure shape: an operator DEFAULT changes
    (max_hamming 16→3) without touching the plans module — the calling
    query's fingerprint must still drift."""
    base = query_hashes(_files())
    edited = query_hashes(_files(dedup_mod=_DEDUP_MOD.replace("=16", "=3")))
    assert edited["alpha"] != base["alpha"]
    assert edited["beta"] == base["beta"]  # beta doesn't call the operator


def test_module_constant_change_invalidates_referencing_query():
    base = query_hashes(_files())
    edited = query_hashes(
        _files(query_mod=_QUERY_MOD.replace("_THRESHOLD = 5", "_THRESHOLD = 9"))
    )
    assert edited["alpha"] != base["alpha"]
    assert edited["beta"] == base["beta"]


def test_shared_dep_change_invalidates_all_referencing_queries():
    base = query_hashes(_files())
    edited = query_hashes(
        _files(catalog_mod=_CATALOG_MOD.replace("parquet(", "parquet( "))
    )
    assert edited["alpha"] != base["alpha"]
    assert edited["beta"] != base["beta"]


def test_current_hashes_cover_entire_registry():
    from data_pipeline_challenge_spark.plans.registry import all_queries

    hashes = current_query_hashes()
    missing = set(all_queries()) - set(hashes)
    assert not missing, f"queries without a source fingerprint: {missing}"


def test_hash_file_covers_every_correctness_round():
    """tools/verified_query_hashes.json must be regenerated (run
    ``python3 tools/update_verified_hashes.py``) whenever a new
    CORRECTNESS_r*.json artifact lands, otherwise edited queries keep
    stale green rows for that round (name-only fallback)."""
    hash_file = ROOT / "tools" / "verified_query_hashes.json"
    assert hash_file.exists(), "run: python3 tools/update_verified_hashes.py"
    recorded = set(json.loads(hash_file.read_text()))
    rounds = {
        re.match(r"CORRECTNESS_(r\d+)\.json", p.name).group(1)
        for p in ROOT.glob("CORRECTNESS_r*.json")
    }
    # Only require rounds whose artifact is already in git history — the
    # tool reconstructs code states from commits, so an artifact the driver
    # just wrote but hasn't committed yet can't be fingerprinted.
    try:
        tracked = subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"],
            cwd=ROOT,
            check=True,
            capture_output=True,
            text=True,
        ).stdout.split()
    except (OSError, subprocess.CalledProcessError):
        pytest.skip("git unavailable")
    tracked_rounds = {
        re.match(r"CORRECTNESS_(r\d+)\.json", Path(t).name).group(1)
        for t in tracked
    }
    stale = (rounds & tracked_rounds) - recorded
    assert not stale, (
        f"rounds {sorted(stale)} missing from verified_query_hashes.json — "
        "run: python3 tools/update_verified_hashes.py"
    )


def test_r7_edited_queries_resort_first():
    """The four queries the r7 judge named as semantically changed must be
    back in the unverified (first-sampled) block until a FRESH green row
    lands. Skipped automatically once CORRECTNESS_r08+ provides one with
    matching fingerprints."""
    from data_pipeline_challenge_spark.plans.registry import (
        _driver_verified_names,
        all_queries,
    )

    targets = {
        "dedup_simhash",
        "ann_lsh_top10",
        "ann_lsh_top10_indexed",
        "events_asof_purchase_signup",
    }
    verified = _driver_verified_names()
    fresh = targets & verified
    if fresh:
        pytest.skip(f"fresh green rows already recorded for {sorted(fresh)}")
    order = list(all_queries())
    positions = {t: order.index(t) for t in targets}
    # the invariant is BLOCK membership, not an absolute index: every
    # target must enumerate before the first VERIFIED query (mid-round,
    # an edit to a shared dependency like catalog.py legitimately makes
    # the whole registry unverified — absolute positions then say
    # nothing, but verified-after-unverified must still hold)
    first_verified = min(
        (order.index(n) for n in verified if n in order),
        default=len(order),
    )
    assert all(pos < first_verified for pos in positions.values()), (
        positions,
        first_verified,
    )


_DEDUP_MOD_DEEP = '''
def _shingle_table(df, n=3):
    return df.limit(n)

def simhash_near_pairs(df, threshold, max_hamming=16):
    return _shingle_table(df)
'''


def test_transitive_helper_change_invalidates_caller():
    """Closure depth: a change in a helper the query only reaches through
    an intermediate operator (query → simhash_near_pairs →
    _shingle_table) must still drift the query's fingerprint — the
    one-level scheme missed exactly this shape (r7's e135c40 refactor
    touched helpers under the operator surface)."""
    base = query_hashes(_files(dedup_mod=_DEDUP_MOD_DEEP))
    edited = query_hashes(
        _files(dedup_mod=_DEDUP_MOD_DEEP.replace("n=3", "n=4"))
    )
    assert edited["alpha"] != base["alpha"]
    assert edited["beta"] == base["beta"]


def test_edited_queries_sort_before_unverified_backlog():
    """When the unverified backlog exceeds the driver's 50-query sample
    cap, the queries edited since the LATEST recorded round must occupy
    the front of the ordering — their green rows (if any) attest to old
    semantics, so they are the most urgent re-checks."""
    from data_pipeline_challenge_spark.plans.registry import (
        _driver_verified_names,
        _edited_since_latest_round,
        all_queries,
    )

    edited = _edited_since_latest_round() - _driver_verified_names()
    if not edited:
        pytest.skip("no unverified edited queries at this tree state")
    order = list(all_queries())
    positions = [order.index(n) for n in edited]
    assert max(positions) < len(edited), (sorted(edited), positions)
