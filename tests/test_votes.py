"""Majority-vote label resolution vs a brute-force python scorer."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.votes import resolve_labels


def _votes_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "item_id": pa.array([r[0] for r in rows], pa.int64()),
                "label": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(4)


def _brute(rows):
    byi = {}
    for i, lab in rows:
        byi.setdefault(i, []).append(lab)
    out = {}
    for i, labs in byi.items():
        c = Counter(labs)
        win = min(c, key=lambda l: (-c[l], l))  # max votes, min label
        out[i] = (win, c[win], len(labs), len(c), round(c[win] / len(labs), 6))
    return out


def test_resolve_labels_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    labels = ["cat", "dog", "bird", "fish"]
    rows = []
    for i in range(200):
        for _ in range(int(rng.integers(1, 9))):
            rows.append((i, labels[int(rng.integers(0, 4))]))
    got = resolve_labels(_votes_ds(rows)).to_pandas()
    exp = _brute(rows)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        w, v, tot, nl, sh = exp[r["item_id"]]
        assert (r["label"], r["votes"], r["total"], r["n_labels"], r["share6"]) == (
            w, v, tot, nl, sh
        ), r["item_id"]


def test_resolve_labels_tie_breaks_lexicographic(ray_session):
    rows = [(1, "zebra"), (1, "apple"), (2, "b"), (2, "b"), (2, "a")]
    got = resolve_labels(_votes_ds(rows)).to_pandas().set_index("item_id")
    assert got.loc[1, "label"] == "apple"  # 1-1 tie -> smallest label
    assert got.loc[2, "label"] == "b"      # 2 votes beat 1
    assert got.loc[2, "share6"] == round(2 / 3, 6)


def test_resolve_labels_huge_item_ids(ray_session):
    """Item ids near 2^62: the old composite key (item * n_labels +
    code) would wrap int64 and collide; the lexsort-segment pass must
    not."""
    base = np.int64(2**62)
    rows = [(int(base + 1), "a"), (int(base + 1), "a"), (int(base + 1), "b"),
            (int(base + 3), "b"), (int(base + 3), "c")]
    got = resolve_labels(_votes_ds(rows)).to_pandas().set_index("item_id")
    assert len(got) == 2
    assert got.loc[base + 1, "label"] == "a"
    assert got.loc[base + 1, "votes"] == 2 and got.loc[base + 1, "total"] == 3
    assert got.loc[base + 3, "label"] == "b"
    assert got.loc[base + 3, "n_labels"] == 2
