"""Property-based test of the keyed merge against a dict-based oracle.

SURVEY §7 ranks the merge's field-survival semantics as the hardest thing
to get right; this locks it with Hypothesis: arbitrary interleavings of
batches are applied both by the Spark merge (operators/merge.py) and by a
direct Python simulation of Mongo's ordered
``UpdateOne({"code": k}, {"$set": dump}, upsert=True)``
(/root/reference/app/processing/data_processor.py:95-113), and the final
tables must be identical.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_pipeline_challenge_spark.operators.merge import merge_products

CODES = ["A", "B", "C"]
ATTR_KEYS = ["k1", "k2", "k3"]

# A record: code, optional product_name (None means "explicit null"), and a
# sparse set of attr values (absent key != null value — the crux).
record_st = st.fixed_dictionaries(
    {
        "code": st.sampled_from(CODES),
        "name": st.one_of(st.none(), st.text(alphabet="xyz", max_size=3)),
        "attrs": st.dictionaries(
            st.sampled_from(ATTR_KEYS), st.sampled_from(['"v1"', '"v2"', "null", "7"]), max_size=3
        ),
    }
)
batches_st = st.lists(st.lists(record_st, min_size=1, max_size=6), min_size=1, max_size=4)


def oracle_apply(batches):
    """Direct simulation of the reference's ordered bulk upsert."""
    table: dict[str, dict] = {}
    for gen, batch in enumerate(batches):
        for seq, rec in enumerate(batch):
            doc = table.setdefault(rec["code"], {})
            # $set of the full model dump: spine fields always set
            # (product_name may be explicit None), attrs keys set per-key,
            # absent attr keys survive.
            doc["product_name"] = rec["name"]
            doc["file_id"] = f"f{gen}"
            for k, v in rec["attrs"].items():
                doc[k] = v
    return {
        code: (
            doc["product_name"],
            doc["file_id"],
            tuple(sorted((k, v) for k, v in doc.items() if k not in ("product_name", "file_id"))),
        )
        for code, doc in table.items()
    }


@settings(
    max_examples=12,  # each example runs Spark jobs; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(batches=batches_st)
def test_merge_matches_reference_upsert_semantics(spark_prop, batches):
    spark = spark_prop
    table = None
    for gen, batch in enumerate(batches):
        rows = [
            (
                rec["code"],
                rec["name"],
                f"f{gen}",
                dt.datetime(2024, 1, 1 + gen),
                rec["attrs"],
                seq,
            )
            for seq, rec in enumerate(batch)
        ]
        bdf = spark.createDataFrame(
            rows,
            "code string, product_name string, file_id string, "
            "last_modified_at_company timestamp, attrs map<string,string>, seq long",
        )
        table = merge_products(table, bdf)

    got = {
        r["code"]: (
            r["product_name"],
            r["file_id"],
            tuple(sorted(r["attrs"].items())),
        )
        for r in table.collect()
    }
    assert got == oracle_apply(batches)


# -- rollup merge associativity -------------------------------------------

event_st = st.tuples(
    st.integers(min_value=0, max_value=4 * 3600 * 1_000_000_000),  # ts_ns, 4h span
    st.sampled_from(["view", "buy", "refund"]),
    st.floats(
        min_value=-1000, max_value=1000, allow_nan=False, allow_infinity=False
    ),
)
events_st = st.lists(event_st, min_size=0, max_size=30)


@settings(
    max_examples=10,  # each example runs Spark jobs; keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(a=events_st, b=events_st)
def test_rollup_merge_associative_property(spark, a, b):
    """merge(rollup(A), rollup(B)) == rollup(A ∪ B) for arbitrary event
    batches — including negative values (floor-based cent quantization),
    empty batches, and bucket-straddling timestamps. This is the invariant
    the streaming continuous aggregate rests on."""
    from data_pipeline_challenge_spark.operators.rollup import (
        hourly_rollup,
        merge_rollups,
    )

    def df_of(rows):
        return spark.createDataFrame(
            [(ns, t, v) for ns, t, v in rows],
            "ts_ns long, event_type string, value double",
        )

    full = hourly_rollup(df_of(a + b))
    merged = merge_rollups(hourly_rollup(df_of(a)), hourly_rollup(df_of(b)))

    def key(df):
        return sorted(
            (
                r["bucket_hr"], r["event_type"], r["n_events"], r["sum_cents"],
                r["min_value"], r["max_value"],
            )
            for r in df.collect()
        )

    assert key(merged) == key(full)
