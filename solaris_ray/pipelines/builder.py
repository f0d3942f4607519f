"""Config-driven pipeline builder — the YAML extension surface.

Reference (/root/reference/solaris, SURVEY.md §2.11): a YAML config
validated by ``utils/config.py`` drives train/infer pipelines, with
augmentation subdicts instantiated by NAME via ``process_aug_dict``
and models resolved from a registry dict (nets/zoo/__init__.py:12-53).

Here the same shape drives a Ray Data plan: a ``source`` plus an
ordered list of ``steps``, each a registry name + kwargs.  The
registry maps names to functions ``(ds, ctx, **kwargs) -> ds`` so user
extensions register the same way (``register_step``).

Example config (YAML or dict):

    source: {kind: synth, n_images: 16}
    steps:
      - op: tile_cut
        tile_size: 128
      - op: clip_join
        features: {kind: synth}
      - op: masks
      - op: drop_columns
        columns: [footprint, boundary, contact, road]
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa

STEP_REGISTRY: dict[str, Callable] = {}


def register_step(name: str):
    def _wrap(fn):
        STEP_REGISTRY[name] = fn
        return fn

    return _wrap


class BuildContext:
    """Carries config-level state between steps (seed, corpus params)."""

    def __init__(self, config: dict):
        self.config = config
        src = config.get("source", {})
        self.seed = int(src.get("seed", 42))
        self.n_images = int(src.get("n_images", 16))
        self.size = int(src.get("size", 256))


def _load_source(spec: dict, ctx: BuildContext):
    import ray

    kind = spec.get("kind", "synth")
    if kind == "synth":
        from ..sources import synth

        images, _ = synth.gen_shard(
            np.arange(int(spec.get("n_images", ctx.n_images))),
            int(spec.get("n_images", ctx.n_images)),
            int(spec.get("seed", ctx.seed)),
            int(spec.get("size", ctx.size)),
        )
        return ray.data.from_arrow(images)
    if kind in ("parquet", "lance"):
        from ..sources.reader import read_images

        return read_images(spec["path"], columns=spec.get("columns"))
    raise ValueError(f"unknown source kind {kind!r}")


def _load_features(spec: dict | None, ctx: BuildContext) -> pa.Table:
    from ..sources import synth

    spec = spec or {"kind": "synth"}
    if spec.get("kind", "synth") == "synth":
        return synth.gen_features_shard(
            np.arange(int(spec.get("n_images", ctx.n_images))),
            int(spec.get("n_images", ctx.n_images)),
            int(spec.get("seed", ctx.seed)),
            int(spec.get("size", ctx.size)),
        )
    import pyarrow.parquet as pq

    return pq.read_table(spec["path"])


@register_step("tile_plan")
def _tile_plan(ds, ctx, **kw):
    from ..stages import tiler

    return tiler.plan_tiles_ds(ds, tile_size=int(kw.get("tile_size", 128)))


@register_step("tile_cut")
def _tile_cut(ds, ctx, **kw):
    from ..stages import tiler

    return tiler.cut_tiles(
        ds,
        tile_size=int(kw.get("tile_size", 128)),
        nodata_threshold=kw.get("nodata_threshold"),
    )


@register_step("clip_join")
def _clip_join(ds, ctx, **kw):
    from ..stages.joins import broadcast_spatial_join

    feats = _load_features(kw.get("features"), ctx)
    cols = [c for c in ("tile_id", "image_id", "cell", "x0", "y0", "x1", "y1") if c in ds.schema().names]
    return broadcast_spatial_join(
        ds.select_columns(cols), feats,
        min_partial_perc=float(kw.get("min_partial_perc", 0.0)),
    )


@register_step("masks")
def _masks(ds, ctx, **kw):
    from ..stages import masks

    return masks.masks_from_join(ds, tile_size=int(kw.get("tile_size", 128)))


@register_step("polygonize")
def _polygonize(ds, ctx, **kw):
    from ..stages import polygonize

    return polygonize.masks_to_polygons(
        ds, mask_col=kw.get("mask_col", "footprint"), min_area=float(kw.get("min_area", 0.0))
    )


@register_step("augment")
def _augment(ds, ctx, **kw):
    from ..stages import augment

    return augment.augment(ds, kw.get("augmentations", {}), seed=int(kw.get("seed", ctx.seed)))


@register_step("resize")
def _resize(ds, ctx, **kw):
    from ..stages import multimodal

    return ds.map_batches(
        multimodal.ImageResizer(int(kw["w"]), int(kw["h"])),
        batch_format="pyarrow", batch_size=8,
    )


@register_step("embed")
def _embed(ds, ctx, **kw):
    from ..stages import multimodal

    return multimodal.extract_embeddings(ds, dim=int(kw.get("dim", 64)))


@register_step("fill_nodata")
def _fill(ds, ctx, **kw):
    from ..stages import fill

    if kw.get("mode", "mean") == "mean":
        return fill.fill_nodata_mean(ds, nodata=float(kw.get("nodata", 0.0)))
    return fill.fill_nodata_constant(ds, value=float(kw["value"]), nodata=float(kw.get("nodata", 0.0)))


@register_step("drop_columns")
def _drop(ds, ctx, **kw):
    return ds.drop_columns(list(kw["columns"]))


@register_step("select_columns")
def _select(ds, ctx, **kw):
    return ds.select_columns(list(kw["columns"]))


@register_step("limit")
def _limit(ds, ctx, **kw):
    return ds.limit(int(kw["n"]))


def build_pipeline(config: dict | str):
    """Config (dict or YAML string/path) -> lazy Ray Dataset plan."""
    if isinstance(config, str):
        import os

        import yaml

        if os.path.exists(config):
            with open(config) as f:
                config = yaml.safe_load(f)
        else:
            config = yaml.safe_load(config)
    _validate(config)
    ctx = BuildContext(config)
    ds = _load_source(config.get("source", {}), ctx)
    for step in config.get("steps", []):
        kw = dict(step)
        op = kw.pop("op")
        ds = STEP_REGISTRY[op](ds, ctx, **kw)
    return ds


def _validate(config: dict) -> None:
    """Schema validation — the utils/config.parse analogue: unknown
    step names and missing ops fail BEFORE execution starts."""
    if not isinstance(config, dict):
        raise ValueError("config must be a mapping")
    for i, step in enumerate(config.get("steps", [])):
        if "op" not in step:
            raise ValueError(f"step {i} missing 'op'")
        if step["op"] not in STEP_REGISTRY:
            raise ValueError(
                f"step {i}: unknown op {step['op']!r}; known: {sorted(STEP_REGISTRY)}"
            )
