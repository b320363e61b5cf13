"""Dump `.explain("formatted")` for every flagship bench query into
plans/<round>/<query>_<tag>.txt — the optimization rounds' evidence
files (the judge checks plan claims in OPTIMIZATION_r{N}.md against
these). The round dir comes from $SPARK_GRAFT_PLANS_ROUND (default
r15).

Usage:
    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

With no query list, captures the whole BENCH_QUERIES flagship set.
One Spark session for the sweep; plans are built lazily (no execution),
so this is cheap and safe to run alongside nothing else.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    wanted = sys.argv[2:]

    import snapshot_s3_util_spark as engine
    from snapshot_s3_util_spark.plans.inspect import physical_plan
    from snapshot_s3_util_spark.session import get_spark

    engine.load_all_operators()
    from bench import BENCH_QUERIES

    names = wanted or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        _REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for q in names:
        df = engine.REGISTRY[q].fn(spark, sf_dir)
        plan = physical_plan(df)
        path = os.path.join(out_dir, f"{q}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
