"""Benchmark harness (driver contract).

Default mode: runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) plus the flagship synthetic tiles+join, printing
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...}

--scaling: runs the flagship pipeline in two FRESH processes at
num_cpus=8 and num_cpus=32 on identical input and reports both
throughputs + scaling efficiency (the in-sandbox stand-in for the
north_rule's N vs 4N cluster sizes).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries() subset benchmarked per round (full set runs in the
# correctness gate; bench picks the scale-relevant ones)
BENCH_QUERIES = [
    "tile_plan",
    "pip_count",
    "clip_join",
    "knn_join",
    "cell_hist",
    "lineitem_agg",
    "events_window",
    "token_count",
    "dedup_exact",
    "minhash_pairs",
    "embed_neardup",
    "ann_topk",
]


def _consume(ds) -> int:
    try:
        import ray.data

        if isinstance(ds, ray.data.Dataset):
            return ds.count()
    except ImportError:
        pass
    return len(ds)


def run_queries(sf_dir: str) -> tuple[dict, dict]:
    from solaris_ray.pipelines.queries import QUERIES

    times, rows = {}, {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        rows[name] = _consume(QUERIES[name](sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times, rows


def run_flagship(n_images: int) -> dict:
    from solaris_ray.pipelines.flagship import flagship

    return flagship(n_images=n_images)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--n-images", type=int, default=int(os.environ.get("GRAFT_BENCH_IMAGES", "400")))
    ap.add_argument("--num-cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--flagship-only", action="store_true", help="internal: one flagship run, JSON out")
    args = ap.parse_args()

    if args.scaling:
        results = {}
        for cpus in (8, 32):
            out = subprocess.run(
                [sys.executable, __file__, "--flagship-only",
                 "--num-cpus", str(cpus), "--n-images", str(args.n_images)],
                capture_output=True, text=True, timeout=1800,
                env={**os.environ, "RAY_GRAFT_CPUS": str(cpus)},
            )
            line = out.stdout.strip().splitlines()[-1]
            results[cpus] = json.loads(line)
        r8, r32 = results[8], results[32]
        eff = (r32["tiles_join_rows_per_sec"] / r8["tiles_join_rows_per_sec"]) / (32 / 8)
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32_cpus",
            "value": round(eff, 3),
            "unit": "ratio",
            "rows_per_sec_8cpu": r8["tiles_join_rows_per_sec"],
            "rows_per_sec_32cpu": r32["tiles_join_rows_per_sec"],
            "n_images": args.n_images,
            "detail": {"8": r8, "32": r32},
        }))
        return

    import ray

    ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.flagship_only:
        res = run_flagship(args.n_images)
        print(json.dumps(res))
        ray.shutdown()
        return

    t0 = time.time()
    flag = run_flagship(args.n_images)
    qtimes, qrows = run_queries(SF_DIR)
    total = round(time.time() - t0, 3)
    queries = {"flagship_tiles_join": flag["total_sec"], **qtimes}
    print(json.dumps({
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": args.num_cpus,
        "flagship": flag,
        "query_rows": qrows,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
