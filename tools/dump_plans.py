"""Dump .explain("formatted") for registry queries to a directory.

Usage: python tools/dump_plans.py OUTDIR [sf_dir] [q_name ...]

One file per query (``<name>.txt``) holding the formatted physical
plan, as required by the optimization-round deliverable
(``plans/r12/<query>_before.txt`` / ``_after.txt``).  With no query
names, dumps every registered query.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    outdir = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    names = args[2:]
    os.makedirs(outdir, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from week4_musemotion_spark.plans.audit import plan_string
    from week4_musemotion_spark.queries import REGISTRY
    from week4_musemotion_spark.session import get_spark

    spark = get_spark("dump-plans")
    todo = names or list(REGISTRY)
    for name in todo:
        spec = REGISTRY.get(name)
        try:
            if spec is None:
                # an unknown name (typo) must not abort a full-registry
                # dump — record it per-file like builder errors
                raise KeyError(f"unknown query name {name!r}")
            df = spec.builder(spark, sf_dir)
            txt = plan_string(df, "formatted")
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR {type(e).__name__}: {e}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok" if not txt.startswith("ERROR") else txt[:80])
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
