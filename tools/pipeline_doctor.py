"""One-call health check for a composed corpus-funnel warehouse.

Usage: ``python tools/pipeline_doctor.py <funnel_out_dir>``

Prints every operational surface the streaming modules record — per-stage
admitted/diverted counts and replay horizons (``pipeline_report``),
per-batch input parallelism (``read_input_audit`` — the single-file
starvation signal), quality-score drift (``quality_drift_report``, PSI of
the latest batch vs the accumulated reference), near-dedup cap
pressure (``read_cap_audit``), and a STORE-INVARIANT sweep over every
batch store under the warehouse (``batchstore.audit_warehouse_stores``,
r18: gapped batch-id sequences from checkpoint misuse or hand-deletion,
unreadable markers/sidecars, crash-leftover temp dirs) — and exits
non-zero when something needs an operator's attention: drift PSI above
0.2, any batch below the configured partition floor, cap pressure
dropping candidates, or any store-invariant violation. The check an
on-call engineer runs before trusting an always-on pipeline, without
reading any document payloads.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PSI_ALERT = 0.2


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__.strip(), file=sys.stderr)
        return 2
    out_dir = Path(sys.argv[1])
    if not out_dir.exists():
        print(f"no warehouse at {out_dir}", file=sys.stderr)
        return 2

    from data_pipeline_challenge_spark.batchstore import read_cap_audit
    from data_pipeline_challenge_spark.session import get_spark
    from data_pipeline_challenge_spark.streaming.corpus_pipeline_stream import (
        pipeline_report,
        quality_drift_report,
        read_input_audit,
    )

    spark = get_spark("pipeline_doctor")
    spark.sparkContext.setLogLevel("ERROR")
    alerts: list[str] = []

    print(f"== pipeline_report ({out_dir}) ==")
    for r in pipeline_report(spark, out_dir).collect():
        print(f"  {r['stage']:10s} {r['metric']:40s} {r['value']}")

    audit = read_input_audit(out_dir)
    if audit:
        print("== input parallelism (last 5 batches) ==")
        for rec in audit[-5:]:
            print(
                f"  b{rec['batch_id']}: files={rec['input_files']} "
                f"partitions={rec['input_partitions']} "
                f"after_guard={rec['partitions_after_guard']}"
            )
        # -1 = file count not measured (min_input_partitions guard off)
        starved = [r for r in audit if 0 <= r["input_files"] <= 1]
        if starved:
            alerts.append(
                f"{len(starved)} batch(es) landed as a single file — the "
                "scrub/quality scan ran near-serially; raise upstream file "
                "fan-out or set min_input_partitions"
            )

    drift = quality_drift_report(out_dir)
    if drift is not None:
        print(
            f"== drift == PSI {drift['psi']} "
            f"(latest b{drift['latest_batch']} vs "
            f"{len(drift['reference_batches'])} reference batches)"
        )
        if drift["psi"] > PSI_ALERT:
            alerts.append(
                f"quality-score drift PSI {drift['psi']} > {PSI_ALERT}: "
                "re-fit gate thresholds (decontam_threshold_profile / "
                "quality_gopher_filter) before trusting funnel yield"
            )
        excluded = drift.get("reference_excluded") or []
        if excluded:
            alerts.append(
                f"{len(excluded)} drift-audit batch(es) {excluded[:5]} were "
                "recorded under a DIFFERENT score expression and are "
                "excluded from the PSI reference window — the monitor was "
                "reconfigured mid-stream; history restarts from the change"
            )

    from data_pipeline_challenge_spark.batchstore import sweep_warehouse

    stores, violations = sweep_warehouse(out_dir)
    print(f"== store invariants == {len(stores)} batch stores swept")
    for v in violations:
        print(f"  ! {v}")
        alerts.append(f"store invariant: {v}")

    cap = read_cap_audit(out_dir / "near")
    if cap:
        dropped = sum(r.get("rows_dropped", 0) for r in cap)
        print(f"== near-dedup cap pressure == {len(cap)} events, {dropped} rows dropped")
        if dropped:
            alerts.append(
                f"the near-dedup candidate cap dropped {dropped} rows — "
                "recall is bounded below 100%; raise bucket_cap or n_prefix"
            )

    spark.stop()
    if alerts:
        print("\nALERTS:")
        for a in alerts:
            print(f"  ! {a}")
        return 1
    print("\nhealthy: no alerts")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
