"""Tests for the Bloom-filter semi-join."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from solaris_ray.stages import bloom


def _pos(key, m, k):
    return [
        int.from_bytes(
            hashlib.md5((str(key) + "#" + str(i)).encode()).digest()[:8], "little"
        )
        % m
        for i in range(k)
    ]


def test_bloom_semi_join_matches_simulation(ray_session):
    import ray

    m, k = 512, 3  # small filter -> guaranteed false positives to check
    ref_keys = list(range(0, 100, 7))
    probe_keys = list(range(0, 400))
    ref = ray.data.from_arrow(
        pa.table({"key": pa.array(ref_keys, pa.int64())})
    )
    probe = ray.data.from_arrow(
        pa.table(
            {
                "row": pa.array(range(len(probe_keys)), pa.int64()),
                "key": pa.array(probe_keys, pa.int64()),
            }
        )
    ).repartition(3)
    out = bloom.bloom_semi_join(probe, ref, key_col="key", m=m, k=k).to_pandas()

    bits = set()
    for rk in ref_keys:
        bits.update(_pos(rk, m, k))
    want = {pk for pk in probe_keys if all(p in bits for p in _pos(pk, m, k))}
    assert set(out.key.tolist()) == want
    # no false negatives, ever
    assert set(ref_keys) <= want


def test_bloom_empty_reference_matches_nothing(ray_session):
    import ray

    ref = ray.data.from_arrow(pa.table({"key": pa.array([], pa.int64())}))
    probe = ray.data.from_arrow(pa.table({"key": pa.array([1, 2, 3], pa.int64())}))
    out = bloom.bloom_semi_join(probe, ref, key_col="key").to_pandas()
    assert len(out) == 0
