"""r15 experiment: eager vs lazy input checkpoints (graphs + CC ops).

Interleaved min-of-N A/B in ONE session (the round's standing
measurement rule): arms alternate eager/lazy per pair by flipping the
module toggles, results asserted identical on the first pair.

Usage: python tools/exp_lazy_ckpt_ab.py [--pairs 7] [op ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="*", default=None)
    ap.add_argument("--pairs", type=int, default=7)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                       "/root/testdata/sf0.1")
    )
    args = ap.parse_args()
    ops = args.ops or [
        "graph_pagerank",
        "graph_label_propagation",
        "graph_triangle_count",
        "llm_dedup_components",
        "llm_dedup_components_verified",
    ]

    import snapshot_s3_util_spark as engine
    from snapshot_s3_util_spark.session import get_spark, clear_persistent_rdds
    from snapshot_s3_util_spark.operators import aggregates as amod
    from snapshot_s3_util_spark.operators import composites as cmod
    from snapshot_s3_util_spark.operators import extras as xmod
    from snapshot_s3_util_spark.operators import graphs as gmod
    from snapshot_s3_util_spark.operators import joins as jmod
    from snapshot_s3_util_spark.llm import dedup as dmod
    from snapshot_s3_util_spark.llm import similarity as smod
    from snapshot_s3_util_spark.llm import textstats as tmod

    engine.load_all_operators()
    spark = get_spark("exp-lazy-ckpt")

    def set_eager(flag: bool) -> None:
        gmod._EDGE_CKPT_EAGER = flag
        smod._IVF_C1_CKPT_EAGER = flag
        for m in (dmod, jmod, amod, cmod, xmod, tmod):
            m._INPUT_CKPT_EAGER = flag

    for name in ops:
        spark.sparkContext.setJobDescription(f"exp {name}")
        # warm both arms
        for flag in (True, False):
            set_eager(flag)
            clear_persistent_rdds(spark)
            engine.REGISTRY[name].fn(spark, args.sf).collect()
        res = {}
        walls = {True: [], False: []}
        for p in range(args.pairs):
            for flag in (True, False) if p % 2 == 0 else (False, True):
                set_eager(flag)
                clear_persistent_rdds(spark)
                t0 = time.perf_counter()
                df = engine.REGISTRY[name].fn(spark, args.sf)
                rows = df.collect()
                walls[flag].append(time.perf_counter() - t0)
                if p == 0:
                    res[flag] = sorted(map(tuple, rows))
        assert res[True] == res[False], f"{name}: arm results differ"
        we, wl = walls[True], walls[False]
        pairs_lazy_wins = sum(1 for a, b in zip(we, wl) if b < a)
        print(
            f"RESULT {name}: eager min={min(we):.3f} med={statistics.median(we):.3f} "
            f"| lazy min={min(wl):.3f} med={statistics.median(wl):.3f} "
            f"| lazy wins {pairs_lazy_wins}/{len(we)} pairs"
        )
        print(f"  eager runs: {[round(x,3) for x in we]}")
        print(f"  lazy  runs: {[round(x,3) for x in wl]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
