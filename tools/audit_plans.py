"""Plan-quality sweep: one line per registered query summarizing the
physical plan (shuffles, joins, top-k fusion, codegen, scans) so a
pathological plan stands out at a glance.

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from week4_musemotion_spark.plans.audit import plan_string
    from week4_musemotion_spark.queries import REGISTRY
    from week4_musemotion_spark.session import get_spark

    spark = get_spark("audit-plans")
    print(f"{'query':30s} {'exch':>4} {'bhj':>3} {'smj':>3} {'topk':>4} {'wsc':>3} {'scans':>5}")
    for name, spec in REGISTRY.items():
        try:
            df = spec.builder(spark, sf_dir)
            p = plan_string(df)
            simple = plan_string(df, "simple")
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s} ERROR {type(e).__name__}: {e}")
            continue
        exch = sum(1 for ln in p.splitlines() if "Exchange" in ln and "Reused" not in ln)
        print(
            f"{name:30s} {exch:>4} "
            f"{p.count('BroadcastHashJoin'):>3} {p.count('SortMergeJoin'):>3} "
            f"{p.count('TakeOrderedAndProject'):>4} "
            f"{'y' if '*(' in simple else 'n':>3} "
            f"{p.count('Scan parquet') + p.count('FileScan'):>5}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
