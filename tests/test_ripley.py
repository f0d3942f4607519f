"""ripley_pair_counts: exact multi-radius pair counting."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.ripley import ripley_pair_counts


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _rows(ds):
    tbls = list(ds.iter_batches(batch_format="pyarrow"))
    out = pa.concat_tables(tbls).to_pylist() if tbls else []
    return {r["r"]: (r["n_pairs"], r["n_points"]) for r in out}


def _brute(x, y, radii):
    n = len(x)
    want = {}
    for r in radii:
        c = 0
        for i in range(n):
            for j in range(i + 1, n):
                if (x[i] - x[j]) ** 2 + (y[i] - y[j]) ** 2 <= r * r:
                    c += 1
        want[r] = (c, n)
    return want


def test_matches_bruteforce_random(ray_session):
    rng = np.random.RandomState(5)
    n = 300
    x = rng.randint(0, 700, n).astype(np.int64)
    y = rng.randint(0, 700, n).astype(np.int64)
    radii = [10, 40, 120]
    got = _rows(ripley_pair_counts(
        _ds(pa.table({"x": pa.array(x), "y": pa.array(y)})), radii))
    assert got == _brute(x, y, radii)


def test_cross_cell_pairs_and_duplicates(ray_session):
    # points straddling cell borders at exactly the radius, plus
    # coincident points (distance 0 pairs count)
    x = np.array([99, 199, 0, 100, 5, 5], np.int64)
    y = np.array([0, 0, 250, 250, 400, 400], np.int64)
    got = _rows(ripley_pair_counts(
        _ds(pa.table({"x": pa.array(x), "y": pa.array(y)})), [100]))
    assert got == _brute(x, y, [100])


def test_dense_cell_guard_raises(ray_session):
    x = np.zeros(50, np.int64)
    y = np.zeros(50, np.int64)
    with pytest.raises(Exception, match="max_cell_points"):
        _rows(ripley_pair_counts(
            _ds(pa.table({"x": pa.array(x), "y": pa.array(y)})), [10],
            max_cell_points=40))


def test_bad_inputs(ray_session):
    t = _ds(pa.table({"x": pa.array([1], pa.int64()),
                      "y": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        ripley_pair_counts(t, [])
    with pytest.raises(ValueError):
        ripley_pair_counts(t, [0])
