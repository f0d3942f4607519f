"""Engine CLI — the reference's six console scripts collapsed into one
``python -m solaris_ray`` entry with subcommands (SURVEY.md §2.11:
"one engine CLI with subcommands driving ray job submit"; locally the
session is created here, on a cluster this module is the
``ray job submit`` target).

  run      config-driven pipeline -> parquet (pipelines.builder)
  tile     flagship generate->tile->join once, print counts
  resume   checkpoint-resumable flagship into a partitioned directory
  bench    delegate to bench.py semantics (one JSON line)
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> bool:
    """Returns True when this call created the session (then we own
    shutdown; an embedding caller keeps its session)."""
    import ray

    created = not ray.is_initialized()
    if created:
        ray.init(
            address="local",
            num_cpus=num_cpus or int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from .runtime import tune_data_context

    tune_data_context()
    return created


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="solaris_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_run = sub.add_parser("run", help="config-driven pipeline -> parquet")
    p_run.add_argument("--config", required=True)
    p_run.add_argument("--output", required=True)

    p_tile = sub.add_parser("tile", help="flagship tiles+join, print counts")
    p_tile.add_argument("--n-images", type=int, default=400)

    p_res = sub.add_parser("resume", help="resumable partitioned flagship")
    p_res.add_argument("--output", required=True)
    p_res.add_argument("--n-images", type=int, default=400)
    p_res.add_argument("--partitions", type=int, default=8)

    p_warp = sub.add_parser("warp", help="reproject an images parquet to a dst CRS")
    p_warp.add_argument("--input", required=True)
    p_warp.add_argument("--output", required=True)
    p_warp.add_argument("--dst-epsg", type=int, required=True)
    p_warp.add_argument("--method", default="bilinear", choices=["bilinear", "nearest"])

    p_eval = sub.add_parser(
        "eval", help="proposals x truth greedy IoU eval (spacenet_eval analogue)"
    )
    p_eval.add_argument("--proposals", required=True)
    p_eval.add_argument("--truth", required=True)
    p_eval.add_argument("--output", required=True)
    p_eval.add_argument("--miniou", type=float, default=0.5)
    p_eval.add_argument("--by-class", action="store_true")

    args = ap.parse_args(argv)
    owns_session = _init_ray(args.num_cpus)
    import ray

    if args.cmd == "run":
        from .pipelines.builder import build_pipeline

        ds = build_pipeline(args.config)
        os.makedirs(args.output, exist_ok=True)
        ds.write_parquet(args.output)
        print(json.dumps({"output": args.output, "rows": _count_dir(args.output)}))
    elif args.cmd == "tile":
        from .pipelines.flagship import flagship

        print(json.dumps(flagship(n_images=args.n_images)))
    elif args.cmd == "resume":
        from .pipelines.flagship import flagship_resumable

        print(json.dumps(flagship_resumable(args.output, n_images=args.n_images,
                                            n_partitions=args.partitions)))
    elif args.cmd == "warp":
        from .raster.warp import reproject_raster

        ds = ray.data.read_parquet(args.input)
        out = reproject_raster(ds, args.dst_epsg, method=args.method)
        os.makedirs(args.output, exist_ok=True)
        out.write_parquet(args.output)
        print(json.dumps({"output": args.output, "rows": _count_dir(args.output),
                          "dst_epsg": args.dst_epsg}))
    elif args.cmd == "eval":
        from .stages.evaluate import eval_scores

        scores = eval_scores(
            ray.data.read_parquet(args.proposals),
            ray.data.read_parquet(args.truth),
            miniou=args.miniou,
            by_class=args.by_class,
        )
        os.makedirs(args.output, exist_ok=True)
        scores.write_parquet(args.output)
        # summary = sum counts then recompute (challenges.py:62-87 rule)
        import pyarrow.parquet as _pq

        tot = {"tp": 0, "fp": 0, "fn": 0}
        for name in os.listdir(args.output):
            if name.endswith(".parquet"):
                t = _pq.read_table(os.path.join(args.output, name), columns=["tp", "fp", "fn"])
                for k in tot:
                    tot[k] += sum(t[k].to_pylist())
        prec = tot["tp"] / (tot["tp"] + tot["fp"]) if tot["tp"] + tot["fp"] else 0.0
        rec = tot["tp"] / (tot["tp"] + tot["fn"]) if tot["tp"] + tot["fn"] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        print(json.dumps({"output": args.output, **tot, "precision": prec,
                          "recall": rec, "f1": f1}))
    if owns_session:
        ray.shutdown()
    return 0


def _count_dir(d: str) -> int:
    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


if __name__ == "__main__":
    sys.exit(main())
