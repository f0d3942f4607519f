"""Config-driven pipeline builder + CLI tests."""

from __future__ import annotations

import numpy as np
import pytest

from solaris_ray.pipelines.builder import build_pipeline, register_step


CONFIG = {
    "source": {"kind": "synth", "n_images": 8, "seed": 42, "size": 256},
    "steps": [
        {"op": "tile_cut", "tile_size": 128},
        {"op": "clip_join", "features": {"kind": "synth", "n_images": 8}},
        {"op": "masks"},
        {"op": "drop_columns", "columns": ["footprint", "boundary", "contact", "road"]},
    ],
}


def test_build_pipeline_end_to_end(ray_session):
    ds = build_pipeline(CONFIG)
    df = ds.to_pandas()
    assert len(df) > 0
    assert "n_features" in df.columns


def test_build_pipeline_from_yaml_string(ray_session):
    yaml_text = """
source: {kind: synth, n_images: 4, seed: 42, size: 256}
steps:
  - op: tile_cut
  - op: select_columns
    columns: [tile_id, image_id, nodata_frac]
  - op: limit
    n: 5
"""
    df = build_pipeline(yaml_text).to_pandas()
    assert len(df) == 5
    assert list(df.columns) == ["tile_id", "image_id", "nodata_frac"]


def test_builder_validates_before_running():
    with pytest.raises(ValueError, match="unknown op"):
        build_pipeline({"source": {"kind": "synth"}, "steps": [{"op": "nope"}]})
    with pytest.raises(ValueError, match="missing 'op'"):
        build_pipeline({"source": {"kind": "synth"}, "steps": [{"tile_size": 1}]})


def test_register_custom_step(ray_session):
    @register_step("double_rows")
    def _double(ds, ctx, **kw):
        import pyarrow as pa

        return ds.map_batches(
            lambda b: pa.concat_tables([b, b]), batch_format="pyarrow"
        )

    cfg = {
        "source": {"kind": "synth", "n_images": 2},
        "steps": [
            {"op": "tile_cut"},
            {"op": "select_columns", "columns": ["tile_id"]},
            {"op": "double_rows"},
        ],
    }
    df = build_pipeline(cfg).to_pandas()
    assert len(df) == 2 * 2 * 4  # 2 images x 4 tiles, doubled


def _sorted_df(ds, by):
    return ds.to_pandas().sort_values(by).reset_index(drop=True)


def test_conditional_matches_handbuilt_chain(ray_session):
    """A conditional-branch config reproduces the equivalent hand-built
    Dataset chain bit-exactly (pipesegment Conditional analogue)."""
    import pandas as pd
    import pyarrow.compute as pc

    from solaris_ray.pipelines.builder import _load_source, BuildContext
    from solaris_ray.stages import tiler

    cfg = {
        "source": {"kind": "synth", "n_images": 6, "seed": 7, "size": 256},
        "steps": [
            {"op": "tile_cut", "tile_size": 128},
            {
                "op": "conditional",
                "when": {"col": "nodata_frac", "op": "<=", "value": 0.25},
                "then": [{"op": "select_columns", "columns": ["tile_id", "nodata_frac"]}],
                "else": [
                    {"op": "select_columns", "columns": ["tile_id", "nodata_frac"]},
                    {"op": "limit", "n": 3},
                ],
            },
        ],
    }
    got = _sorted_df(build_pipeline(cfg), "tile_id")

    ctx = BuildContext(cfg)
    base = tiler.cut_tiles(_load_source(cfg["source"], ctx), tile_size=128)
    keep = base.map_batches(
        lambda t: t.filter(pc.less_equal(t["nodata_frac"], 0.25)),
        batch_format="pyarrow",
    ).select_columns(["tile_id", "nodata_frac"])
    other = base.map_batches(
        lambda t: t.filter(pc.greater(t["nodata_frac"], 0.25)),
        batch_format="pyarrow",
    ).select_columns(["tile_id", "nodata_frac"]).limit(3)
    want = _sorted_df(keep.union(other), "tile_id")
    pd.testing.assert_frame_equal(got, want)


def test_conditional_no_else_drops_rows(ray_session):
    cfg = {
        "source": {"kind": "synth", "n_images": 4, "seed": 3},
        "steps": [
            {"op": "tile_cut"},
            {"op": "conditional",
             "when": {"col": "nodata_frac", "op": "==", "value": 0.0},
             "then": []},
        ],
    }
    df = build_pipeline(cfg).to_pandas()
    assert (df["nodata_frac"] == 0.0).all()


def test_foreach_param_sweep_unions_and_tags(ray_session):
    cfg = {
        "source": {"kind": "synth", "n_images": 2, "seed": 5},
        "steps": [
            {"op": "foreach",
             "over": [{"tile_size": 128}, {"tile_size": 64}],
             "steps": [{"op": "tile_cut"},
                       {"op": "select_columns", "columns": ["tile_id"]}],
             "tag": "branch"},
        ],
    }
    df = build_pipeline(cfg).to_pandas()
    # 2 images x (4 tiles @128 + 16 tiles @64)
    assert len(df) == 2 * (4 + 16)
    counts = df.groupby("branch").size()
    assert counts[0] == 8 and counts[1] == 32


def test_while_bounded_iteration(ray_session):
    """While halves the stream until count <= 4 (bounded by max_iters)."""

    @register_step("keep_even_rank")
    def _keep_even(ds, ctx, **kw):
        import pyarrow as pa

        def _f(t):
            return t.filter(
                pa.array([i % 2 == 0 for i in range(len(t))], pa.bool_())
            )

        return ds.map_batches(_f, batch_format="pyarrow", batch_size=None)

    cfg = {
        "source": {"kind": "synth", "n_images": 4, "seed": 1},
        "steps": [
            {"op": "tile_cut"},  # 16 tiles
            {"op": "select_columns", "columns": ["tile_id"]},
            {"op": "repartition_one"},
            {"op": "while",
             "cond": {"agg": "count", "op": ">", "value": 4},
             "steps": [{"op": "keep_even_rank"}],
             "max_iters": 10},
        ],
    }

    @register_step("repartition_one")
    def _rep1(ds, ctx, **kw):
        return ds.repartition(1)

    n = build_pipeline(cfg).count()
    assert n == 4  # 16 -> 8 -> 4, loop exits at cond false


def test_validate_recurses_into_branches():
    with pytest.raises(ValueError, match=r"steps\[0\].then\[0\]: unknown op"):
        build_pipeline({
            "source": {"kind": "synth"},
            "steps": [{"op": "conditional",
                       "when": {"col": "x", "value": 1},
                       "then": [{"op": "bogus"}]}],
        })
    with pytest.raises(ValueError, match="unknown predicate op"):
        build_pipeline({
            "source": {"kind": "synth", "n_images": 1},
            "steps": [{"op": "filter",
                       "when": {"col": "x", "op": "~", "value": 1}}],
        }).count()


def test_filter_step_in_predicate(ray_session):
    cfg = {
        "source": {"kind": "synth", "n_images": 3, "seed": 2},
        "steps": [
            {"op": "tile_cut"},
            {"op": "filter",
             "when": {"col": "image_id", "op": "in",
                      "value": ["img_00000000", "img_00000002"]}},
            {"op": "select_columns", "columns": ["image_id"]},
        ],
    }
    df = build_pipeline(cfg).to_pandas()
    assert set(df["image_id"]) == {"img_00000000", "img_00000002"}


def test_cli_run_and_resume(ray_session, tmp_path):
    from solaris_ray.__main__ import main

    cfg = tmp_path / "cfg.yml"
    cfg.write_text(
        "source: {kind: synth, n_images: 4}\n"
        "steps:\n"
        "  - op: tile_cut\n"
        "  - op: select_columns\n"
        "    columns: [tile_id, image_id, nodata_frac]\n"
    )
    out = tmp_path / "out"
    assert main(["run", "--config", str(cfg), "--output", str(out)]) == 0
    import pyarrow.parquet as pq
    import os

    rows = sum(
        pq.ParquetFile(os.path.join(out, f)).metadata.num_rows
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    assert rows == 16


def test_cli_warp_subcommand(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from solaris_ray.raster import codec
    from solaris_ray.geom.affine import Affine

    img = np.full((32, 32), 99, dtype=np.uint8)
    t = Affine.from_origin(733601.0, 3725139.0, 0.5, 0.5)
    tbl = pa.table(
        {
            "image_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([codec.encode(img, "png")], pa.binary()),
            "fmt": pa.array(["png"], pa.string()),
            "epsg": pa.array([32616], pa.int32()),
            "w": pa.array([32], pa.int32()),
            "h": pa.array([32], pa.int32()),
            **{f"gt_{k}": pa.array([float(v)]) for k, v in zip("abcdef", t)},
        }
    )
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(tbl, src / "part-0.parquet")
    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "-m", "solaris_ray", "--num-cpus", "2", "warp",
         "--input", str(src), "--output", str(out_dir), "--dst-epsg", "4326"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["rows"] == 1 and res["dst_epsg"] == 4326
    got = pq.read_table(str(out_dir))
    assert got["epsg"][0].as_py() == 4326


def test_cli_eval_subcommand(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def sq(x, y, s=10.0):
        return ([x, x + s, x + s, x], [y, y, y + s, y + s])

    props, truth = [], []
    for i in range(4):
        xs, ys = sq(i * 50.0, 0.0)
        truth.append({"feature_id": i, "image_id": "a", "class": "b", "xs": xs, "ys": ys})
        # proposals: 3 matches (1-unit shift) + 1 far miss
        dx = 1.0 if i < 3 else 30.0
        pxs, pys = sq(i * 50.0 + dx, 0.0)
        props.append({"proposal_id": i, "image_id": "a", "class": "b",
                      "xs": pxs, "ys": pys, "conf": 0.9})
    pd_, td_ = tmp_path / "p", tmp_path / "t"
    pd_.mkdir(); td_.mkdir()
    pq.write_table(pa.Table.from_pylist(props), pd_ / "p.parquet")
    pq.write_table(pa.Table.from_pylist(truth), td_ / "t.parquet")
    r = subprocess.run(
        [sys.executable, "-m", "solaris_ray", "--num-cpus", "2", "eval",
         "--proposals", str(pd_), "--truth", str(td_),
         "--output", str(tmp_path / "scores")],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["tp"] == 3 and res["fp"] == 1 and res["fn"] == 1
    assert abs(res["f1"] - 0.75) < 1e-12
