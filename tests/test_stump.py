"""stump_split_scores: exact integer Gini split evaluation."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.stump import stump_split_scores


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _rows(ds):
    tbls = list(ds.iter_batches(batch_format="pyarrow"))
    out = pa.concat_tables(tbls).to_pylist() if tbls else []
    return {(r["feature"], r["threshold"]): r for r in out}


def test_perfect_split(ray_session):
    # values 1,2 -> label 0; values 3,4 -> label 1: threshold 2 is pure
    pts = _ds(pa.table({
        "feature": pa.array(["f"] * 4),
        "value": pa.array([1, 2, 3, 4], pa.int64()),
        "label": pa.array([0, 0, 1, 1], pa.int64()),
    }))
    got = _rows(stump_split_scores(pts))
    assert got[("f", 2)]["gini_num"] == 0
    assert got[("f", 2)]["n_le"] == 2 and got[("f", 2)]["pos_gt"] == 2
    # threshold 1: left (1 row, 0 pos) pure, right (3 rows, 2 pos) mixed
    r = got[("f", 1)]
    n_le, pos_le, n_gt, pos_gt = r["n_le"], r["pos_le"], r["n_gt"], r["pos_gt"]
    assert (n_le, pos_le, n_gt, pos_gt) == (1, 0, 3, 2)
    assert r["gini_num"] == 2 * (0 * 1 * 3 + 2 * 1 * 1)
    assert r["gini_den"] == 1 * 3 * 4


def test_matches_bruteforce(ray_session):
    rng = np.random.RandomState(11)
    n = 500
    v = rng.randint(0, 12, n).astype(np.int64)
    lab = (v + rng.randint(0, 6, n) > 8).astype(np.int64)
    pts = _ds(pa.table({
        "feature": pa.array(["x"] * n),
        "value": pa.array(v),
        "label": pa.array(lab),
    }))
    got = _rows(stump_split_scores(pts))
    for t in np.unique(v)[:-1]:
        le = v <= t
        n_le, pos_le = int(le.sum()), int(lab[le].sum())
        n_gt, pos_gt = n - n_le, int(lab.sum()) - pos_le
        r = got[("x", int(t))]
        assert (r["n_le"], r["pos_le"], r["n_gt"], r["pos_gt"]) == \
            (n_le, pos_le, n_gt, pos_gt)
        assert r["gini_num"] == 2 * (pos_le * (n_le - pos_le) * n_gt
                                     + pos_gt * (n_gt - pos_gt) * n_le)
        assert r["gini_den"] == n_le * n_gt * n
    assert len(got) == len(np.unique(v)) - 1


def test_single_value_feature_emits_nothing(ray_session):
    pts = _ds(pa.table({
        "feature": pa.array(["c"] * 3),
        "value": pa.array([7, 7, 7], pa.int64()),
        "label": pa.array([0, 1, 0], pa.int64()),
    }))
    assert _rows(stump_split_scores(pts)) == {}
