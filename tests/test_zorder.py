"""Z-order partitioner: Morton key exactness, boundary semantics,
balance, and co-location of equal keys."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.zorder import morton_key, zorder_assign


def _ref_morton(x, y, bits):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    return z


def test_morton_matches_bitloop():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 12, 500)
    y = rng.integers(0, 1 << 12, 500)
    z = morton_key(x, y, 12)
    ref = np.array([_ref_morton(int(a), int(b), 12) for a, b in zip(x, y)])
    assert (z == ref).all()


def test_morton_21_bits_max():
    m = (1 << 21) - 1
    z = morton_key(np.array([m]), np.array([m]), 21)
    assert int(z[0]) == (1 << 42) - 1


def test_morton_rejects_out_of_range():
    with pytest.raises(ValueError):
        morton_key(np.array([4096]), np.array([0]), 12)
    with pytest.raises(ValueError):
        morton_key(np.array([0.5]), np.array([0.0]), 12)


def test_zorder_assign_balance_and_contiguity(ray_session):
    rng = np.random.default_rng(11)
    n = 4000
    t = pa.table(
        {
            "point_id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.integers(0, 3200, n).astype(np.float64)),
            "y": pa.array(rng.integers(0, 3200, n).astype(np.float64)),
        }
    )
    out = (
        zorder_assign(ray.data.from_arrow(t), n_parts=8, bits=12)
        .sort("zkey")
        .to_pandas()
    )
    # partition ids are non-decreasing in zkey (contiguous ranges)
    assert (np.diff(out["part"].to_numpy()) >= 0).all()
    # balanced within one tie-mass of n/P
    sizes = out.groupby("part").size()
    assert sizes.size == 8
    assert sizes.max() - sizes.min() <= max(8, n // 8 // 4)
    # equal zkeys share a partition
    g = out.groupby("zkey")["part"].nunique()
    assert (g == 1).all()


def test_zorder_single_partition(ray_session):
    t = pa.table(
        {
            "point_id": pa.array([1, 2, 3], pa.int64()),
            "x": pa.array([0.0, 1.0, 2.0]),
            "y": pa.array([0.0, 1.0, 2.0]),
        }
    )
    out = zorder_assign(ray.data.from_arrow(t), n_parts=1).to_pandas()
    assert (out["part"] == 0).all()
