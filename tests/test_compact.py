"""Tests for hierarchical cell compaction (H3 compact/uncompact
analogue): brute-force set recursion oracle + exact roundtrip."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages import compact as K

BASE = 262144  # grid offset at res 19 (2^23 / 32)
MASK = (1 << 29) - 1


def _mk(res: int, x: int, y: int) -> int:
    return (res << 58) | (x << 29) | y


def _decode(c: int) -> tuple[int, int, int]:
    c = int(np.uint64(c))
    return c >> 58, (c >> 29) & MASK, c & MASK


def _brute_compact(ids, base_res, min_res):
    cur = {_decode(c) for c in ids}
    final = set()
    for r in range(base_res, min_res, -1):
        par = defaultdict(set)
        for (rr, x, y) in cur:
            par[(r - 1, x // 2, y // 2)].add((rr, x, y))
        nxt = set()
        for p, kids in par.items():
            if len(kids) == 4:
                nxt.add(p)
            else:
                final |= kids
        cur = nxt
    return final | cur


@pytest.fixture(scope="module")
def mixed_cover(ray_session):
    """Full 8x8 res-19 block (-> one res-16 cell), an aligned 2x2
    (-> res 18), and a stray singleton (stays at 19)."""
    ids = [
        _mk(19, BASE + x, BASE + y) for x in range(8) for y in range(8)
    ] + [
        _mk(19, BASE + 16, BASE + 0),
        _mk(19, BASE + 17, BASE + 0),
        _mk(19, BASE + 16, BASE + 1),
        _mk(19, BASE + 17, BASE + 1),
        _mk(19, BASE + 20, BASE + 5),
    ]
    return np.array(ids, dtype=np.uint64)


def test_compact_matches_brute_force(ray_session, mixed_cover):
    import ray

    ds = ray.data.from_arrow(
        pa.table({"cell": pa.array(mixed_cover.astype(np.int64))})
    )
    out = K.compact_cells(ds, base_res=19, min_res=16).to_pandas()
    got = {_decode(c) for c in out.cell.astype("uint64")}
    assert got == _brute_compact(mixed_cover.tolist(), 19, 16)
    assert out.groupby("res").size().to_dict() == {16: 1, 18: 1, 19: 1}


def test_compact_idempotent_on_sparse_set(ray_session):
    import ray

    # no complete sibling quartets anywhere -> output == input at base res
    ids = np.array(
        [_mk(19, BASE + 4 * i, BASE + 4 * i) for i in range(10)], dtype=np.uint64
    )
    ds = ray.data.from_arrow(pa.table({"cell": pa.array(ids.astype(np.int64))}))
    out = K.compact_cells(ds, base_res=19, min_res=16).to_pandas()
    assert set(out.cell.astype("uint64")) == set(ids.tolist())
    assert (out.res == 19).all()


def test_compact_dedups_input(ray_session):
    import ray

    quad = [_mk(19, BASE + dx, BASE + dy) for dx in (0, 1) for dy in (0, 1)]
    ids = np.array(quad * 3, dtype=np.uint64)  # each child 3 times
    ds = ray.data.from_arrow(pa.table({"cell": pa.array(ids.astype(np.int64))}))
    out = K.compact_cells(ds, base_res=19, min_res=16).to_pandas()
    assert len(out) == 1 and out.res.iloc[0] == 18


def test_uncompact_roundtrip(ray_session, mixed_cover):
    import ray

    ds = ray.data.from_arrow(
        pa.table({"cell": pa.array(mixed_cover.astype(np.int64))})
    )
    compacted = K.compact_cells(ds, base_res=19, min_res=16)
    back = K.uncompact_cells(compacted, 19).to_pandas()
    assert set(back.cell.astype("uint64")) == set(mixed_cover.tolist())
    assert len(back) == len(mixed_cover)  # no duplicates emitted
