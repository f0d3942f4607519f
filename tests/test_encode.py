"""Target encoding and reliability-bin calibration counts."""

import numpy as np
import pyarrow as pa

from solaris_ray.stages.encode import (
    reliability_bins,
    score_micro,
    target_encode,
)


def _ds(tbl: pa.Table):
    import ray.data

    return ray.data.from_arrow(tbl)


def test_target_encode_smoothing(ray_session):
    # cat a: 3 rows 2 pos; cat b: 1 row 0 pos; global mean = 0.5
    tbl = pa.table({
        "cat": ["a", "a", "a", "b"],
        "hit": pa.array([1, 1, 0, 0], pa.int64()),
    })
    out = target_encode(_ds(tbl), "cat", "hit", m=2.0).to_pandas()
    out = out.set_index("cat")
    assert out.loc["a", "cnt"] == 3 and out.loc["a", "pos"] == 2
    assert out.loc["a", "enc6"] == round((2 + 2.0 * 0.5) / (3 + 2.0), 6)
    # rare category shrinks to the global mean
    assert out.loc["b", "enc6"] == round((0 + 2.0 * 0.5) / (1 + 2.0), 6)


def test_target_encode_rare_category_shrinks_harder(ray_session):
    tbl = pa.table({
        "cat": ["big"] * 100 + ["rare"],
        "hit": pa.array([1] * 100 + [1], pa.int64()),
    })
    out = target_encode(_ds(tbl), "cat", "hit", m=50.0).to_pandas().set_index("cat")
    # both are all-positive, but the rare one sits closer to global 1.0
    # by less: with global mean 1.0 both encode to 1.0 exactly
    assert out.loc["big", "enc6"] == 1.0 and out.loc["rare", "enc6"] == 1.0


def test_score_micro_matches_manual():
    import hashlib

    for k in ["1", "42"]:
        want = int.from_bytes(
            hashlib.md5(("cal" + k).encode()).digest()[:8], "little"
        ) % 1_000_000
        assert score_micro([k], "cal")[0] == want


def test_reliability_bins_counts(ray_session):
    keys = [str(i) for i in range(500)]
    lab = np.array([i % 3 == 0 for i in range(500)], dtype=np.int64)
    tbl = pa.table({"k": pa.array(keys, pa.string()), "label": lab})
    out = reliability_bins(_ds(tbl), "k", "label", n_bins=10).to_pandas()
    s = score_micro(keys, "cal")
    bins = s * 10 // 1_000_000
    assert out["n"].sum() == 500
    assert out["pos"].sum() == lab.sum()
    for b in out.itertuples():
        mask = bins == b.bin
        assert b.n == mask.sum()
        assert b.pos == lab[mask].sum()
        assert b.score_sum == s[mask].sum()
