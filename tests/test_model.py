"""Weights-file lifecycle (model_io.py analogue) + int-MLP scorer."""

import os

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.raster import codec
from solaris_ray.stages.model import (
    IntMLPScorer,
    _fetch_int_mlp,
    get_weights,
    model_registry,
    score_images,
)


def test_fetch_on_miss_then_cache_hit(tmp_path):
    wdir = str(tmp_path / "weights")
    w = get_weights("int_mlp_16x8", weights_dir=wdir)
    assert set(w) == {"w1", "b1", "w2", "b2"}
    path = os.path.join(wdir, "int_mlp_16x8.npz")
    assert os.path.exists(path)
    # second resolve is a pure cache hit: corrupt the fetcher's source
    # of truth by deleting nothing — just assert mtime stability
    m0 = os.path.getmtime(path)
    w2 = get_weights("int_mlp_16x8", weights_dir=wdir)
    assert os.path.getmtime(path) == m0
    assert np.array_equal(w["w1"], w2["w1"])


def test_explicit_path_wins(tmp_path):
    p = str(tmp_path / "custom.npz")
    np.savez(p, w1=np.ones((16, 8), np.int64), b1=np.zeros(8, np.int64),
             w2=np.ones(8, np.int64), b2=np.int64(0))
    w = get_weights("int_mlp_16x8", model_path=p,
                    weights_dir=str(tmp_path / "empty"))
    assert (w["w1"] == 1).all()


def test_unknown_model_raises(tmp_path):
    with pytest.raises(ValueError):
        get_weights("no_such_model", weights_dir=str(tmp_path))


def test_missing_weights_no_fetcher_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        get_weights("x", custom_model_dict={"weight_path": "x.npz"},
                    weights_dir=str(tmp_path))


def test_registry_weights_deterministic(tmp_path):
    a = get_weights("int_mlp_16x8", weights_dir=str(tmp_path / "a"))
    b = _fetch_int_mlp()
    for k in ("w1", "b1", "w2"):
        assert np.array_equal(a[k], b[k])
    assert "rproj64" in model_registry()


def _img_batch(ids, size=64):
    rows = []
    for k in ids:
        yy, xx = np.indices((size, size))
        v = ((xx * 7 + yy * 13 + k * 31) % 251).astype(np.uint8)
        rows.append({"image_id": f"img_{k}", "bytes": codec.encode(v, "png"),
                     "fmt": "png"})
    return pa.Table.from_pylist(rows)


def test_int_mlp_scorer_matches_manual(tmp_path):
    scorer = IntMLPScorer(weights_dir=str(tmp_path))
    out = scorer(_img_batch([0, 3, 17]))
    w = _fetch_int_mlp()
    for i, k in enumerate([0, 3, 17]):
        yy, xx = np.indices((64, 64))
        img = ((xx * 7 + yy * 13 + k * 31) % 251).astype(np.int64)
        feats = img.reshape(4, 16, 4, 16).sum(axis=(1, 3)).ravel()
        h = np.maximum(feats @ w["w1"] + w["b1"], 0)
        want = int(h @ w["w2"] + w["b2"])
        assert out["score"][i].as_py() == want


def test_score_images_actor_pool(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_arrow(_img_batch(list(range(8))))
    out = score_images(ds, batch_size=4, concurrency=2,
                       weights_dir=str(tmp_path)).to_pandas()
    assert len(out) == 8
    ref = IntMLPScorer(weights_dir=str(tmp_path))(_img_batch(list(range(8))))
    want = dict(zip(ref["image_id"].to_pylist(), ref["score"].to_pylist()))
    got = dict(zip(out.image_id, out.score))
    assert got == want
