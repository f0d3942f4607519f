"""`ray job submit` entrypoint for the flagship tiles+join pipeline.

On a real cluster (the north_rule's fixed-size N / 4N deployments):

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python jobs/flagship_job.py \
        --n-images 1000000 --output /mnt/out/run1 --partitions 4096

The job connects to the submitting cluster (``RAY_ADDRESS`` is set by
the job supervisor; ``address="auto"`` inside a cluster, ``"local"``
when run standalone — this script works identically in the sandbox),
runs the resumable partitioned flagship (per-partition lineage +
checksums via ``state.manifest``), and prints one JSON line with
row counts, per-partition metrics, and throughput.  Re-submitting
with the same ``--output`` resumes: finished partitions are skipped
from the manifest, so a preempted job converges over retries.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=400)
    ap.add_argument("--output", default=None,
                    help="partitioned output dir (enables resume); "
                         "omit for a throughput-only run")
    ap.add_argument("--partitions", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # inside a `ray job submit` container RAY_ADDRESS points at the
        # cluster; standalone it falls back to a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")

    t0 = time.perf_counter()
    if args.output:
        from solaris_ray.pipelines.flagship import flagship_resumable

        result = flagship_resumable(args.output, n_images=args.n_images,
                                    n_partitions=args.partitions)
    else:
        from solaris_ray.pipelines.flagship import flagship

        result = flagship(n_images=args.n_images)
    result["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(result))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
