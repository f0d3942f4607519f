

def test_feature_hash_counts_basic():
    import hashlib

    import numpy as np
    import pyarrow as pa

    from solaris_ray.stages.text import feature_hash_counts

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a b a", "  b c  "]),
    })
    out = feature_hash_counts(t, n_buckets=8).to_pylist()

    def bucket(w):
        return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little") % 8

    got = {(r["doc_id"], r["bucket"]): r["cnt"] for r in out}
    want = {}
    for d, words in [(1, ["a", "b", "a"]), (2, ["b", "c"])]:
        for w in words:
            key = (d, bucket(w))
            want[key] = want.get(key, 0) + 1
    assert got == want


def test_feature_hash_empty():
    import pyarrow as pa

    from solaris_ray.stages.text import feature_hash_counts

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    assert feature_hash_counts(t).num_rows == 0
