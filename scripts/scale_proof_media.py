"""Scale-proof for the pixels->phash->dedup path (round 4b).

Synthesizes n images (n/3 planted near-dup groups: original png,
brightness-shifted png, jpeg q85 recompress), runs PhashImages ->
image_dedup at two parallelism levels in FRESH processes (the
in-sandbox stand-in for N vs 4N nodes), and asserts the resolver
recovers EXACTLY n/3 groups at every scale — correctness and scaling
measured on the same run.

Usage:
  python scripts/scale_proof_media.py                    # all legs
  python scripts/scale_proof_media.py --leg 6000 --cpus 16  # one leg
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_images(n: int):
    import numpy as np
    import pyarrow as pa
    import ray

    ds = ray.data.range(n, override_num_blocks=max(8, n // 256))

    def _gen(batch: pa.Table) -> pa.Table:
        from solaris_ray.raster.codec import encode
        from solaris_ray.raster.jpeg import jpeg_encode

        ids = batch["id"].to_numpy().astype(np.int64)
        bufs, fmts = [], []
        for mid in ids.tolist():
            base, v = mid // 3, mid % 3
            # per-base random low-frequency block pattern: unlike a
            # sinusoid phase family (2*base mod 2pi nearly repeats at
            # base-diff 22), random grids stay far apart at ANY count
            rng = np.random.default_rng((base * 2654435761) % (1 << 32))
            grid = rng.integers(40, 216, (8, 12)).astype(np.uint8)
            gray = np.kron(grid, np.ones((8, 8), np.uint8))
            img = np.stack([gray] * 3, -1)
            if v == 1:
                img = np.clip(img.astype(np.int16) + 10, 0, 255).astype(np.uint8)
                bufs.append(encode(img, "png"))
                fmts.append("png")
            elif v == 2:
                bufs.append(jpeg_encode(img, quality=85))
                fmts.append("jpeg")
            else:
                bufs.append(encode(img, "png"))
                fmts.append("png")
        return pa.table(
            {
                "image_id": pa.array(ids, pa.int64()),
                "bytes": pa.array(bufs, pa.binary()),
                "fmt": pa.array(fmts, pa.string()),
            }
        )

    return ds.map_batches(_gen, batch_format="pyarrow")


def run_leg(n: int, cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from solaris_ray.runtime import tune_data_context

    tune_data_context()
    from solaris_ray.stages.components import image_dedup
    from solaris_ray.stages.phash import PhashImages

    # warm the worker pool so the timed leg measures the engine
    ray.data.range(4 * cpus, override_num_blocks=2 * cpus).map_batches(
        lambda b: b, batch_format="pyarrow").materialize()

    t0 = time.time()
    hashed = synth_images(n).map_batches(PhashImages(),
                                         batch_format="pyarrow",
                                         batch_size=64)
    out = image_dedup(hashed, hash_col="phash", id_col="image_id",
                      max_dist=3, n_bands=4).materialize()
    s = out.sum("keep")
    n_keep = int(s["sum(keep)"] if isinstance(s, dict) else s)
    n_rows = out.count()
    wall = round(time.time() - t0, 3)
    ray.shutdown()
    return {"n": n, "cpus": cpus, "wall_s": wall, "rows": n_rows,
            "groups": n_keep, "expected_groups": n // 3,
            "exact": n_keep == n // 3 and n_rows == n,
            "rows_per_s": round(n / wall, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", type=int, default=0)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--sizes", default="600,6000")
    args = ap.parse_args()
    if args.leg:
        print(json.dumps(run_leg(args.leg, args.cpus)))
        return
    results = []
    for n in (int(s) for s in args.sizes.split(",")):
        for cpus in (4, 16):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--leg", str(n), "--cpus", str(cpus)],
                capture_output=True, text=True, timeout=1800)
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
            r = json.loads(line)
            results.append(r)
            print(json.dumps(r), flush=True)
    by = {(r["n"], r["cpus"]): r for r in results}
    for n in sorted({r["n"] for r in results}):
        lo, hi = by.get((n, 4)), by.get((n, 16))
        if lo and hi:
            eff = round(hi["rows_per_s"] / (4 * lo["rows_per_s"]), 3)
            print(json.dumps({"n": n, "eff_4_to_16": eff,
                              "all_exact": lo["exact"] and hi["exact"]}))


if __name__ == "__main__":
    main()
