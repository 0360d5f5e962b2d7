"""Diff two bench snapshots (BENCH_FULL.json shape) per query.

Usage: python tools/compare_bench.py OLD.json NEW.json [threshold]

Prints queries slower by more than ``threshold`` (default 1.5×, min
0.3s absolute — tiny queries are scheduler noise), new/removed
queries, and the total delta.  Exit 1 if any regression exceeds the
threshold, so CI/driver rounds can gate on it.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]

    regressions = []
    for name, t_new in sorted(new.items(), key=lambda kv: -kv[1]):
        t_old = old.get(name)
        if t_old is None:
            print(f"NEW       {name:32s} {t_new:6.2f}s")
            continue
        if t_new > t_old * threshold and t_new - t_old > 0.3:
            regressions.append(name)
            print(f"SLOWER    {name:32s} {t_old:6.2f}s -> {t_new:6.2f}s ({t_new / t_old:.1f}x)")
        elif t_old > t_new * threshold and t_old - t_new > 0.3:
            print(f"faster    {name:32s} {t_old:6.2f}s -> {t_new:6.2f}s")
    for name in sorted(set(old) - set(new)):
        print(f"REMOVED   {name}")
    t_old_sum, t_new_sum = sum(old.values()), sum(new.values())
    print(f"total: {t_old_sum:.1f}s -> {t_new_sum:.1f}s over {len(old)} -> {len(new)} queries")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
