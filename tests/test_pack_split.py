"""Training-data layout operators: hash_split + pack_sequences.

hash_split — salted-md5 bucket split, a pure function of (key, salt):
stable under repartitioning and dataset growth (a new document never
moves an old one between splits).  Reference analogue: the train/test
CSV split of make_dataset_csv (solaris/utils/data.py).

pack_sequences — concat-and-chunk token spans via a distributed
two-pass prefix sum (one int per block to the driver).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _docs(n: int, tok=lambda i: (i * 13) % 40):
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "n_tokens": pa.array([tok(i) for i in range(n)], pa.int64()),
        }
    )


class TestHashSplit:
    def test_bucket_matches_reference_md5(self, ray_session):
        import ray
        from solaris_ray.stages.split import hash_split

        ds = ray.data.from_arrow(_docs(200))
        out = hash_split(ds, key_col="doc_id").to_pandas().sort_values("doc_id")
        for did, b in zip(out["doc_id"], out["bucket"]):
            expect = int.from_bytes(hashlib.md5(str(did).encode()).digest()[:8], "little") % 100
            assert b == expect

    def test_split_edges_and_weights(self, ray_session):
        import ray
        from solaris_ray.stages.split import hash_split

        ds = ray.data.from_arrow(_docs(500))
        out = hash_split(ds, key_col="doc_id", weights={"train": 0.8, "val": 0.2}).to_pandas()
        assert set(out["split"]) <= {"train", "val"}
        assert ((out["bucket"] < 80) == (out["split"] == "train")).all()

    def test_stable_under_repartition_and_growth(self, ray_session):
        import ray
        from solaris_ray.stages.split import hash_split

        small = hash_split(ray.data.from_arrow(_docs(100)).repartition(7), key_col="doc_id")
        big = hash_split(ray.data.from_arrow(_docs(300)).repartition(2), key_col="doc_id")
        s = small.to_pandas().set_index("doc_id")["split"]
        b = big.to_pandas().set_index("doc_id")["split"]
        assert (b.loc[s.index] == s).all()

    def test_salt_changes_assignment(self, ray_session):
        import ray
        from solaris_ray.stages.split import hash_split

        a = hash_split(ray.data.from_arrow(_docs(200)), key_col="doc_id").to_pandas()
        c = hash_split(ray.data.from_arrow(_docs(200)), key_col="doc_id", salt="v2").to_pandas()
        assert not (a.sort_values("doc_id")["bucket"].values
                    == c.sort_values("doc_id")["bucket"].values).all()


class TestPackSequences:
    def _oracle(self, n_tok: np.ndarray, seq_len: int):
        start = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
        end = start + n_tok
        first = start // seq_len
        last = np.where(n_tok > 0, (end - 1) // seq_len, first)
        return start, first, last

    @pytest.mark.parametrize("nblocks", [1, 5])
    def test_spans_match_numpy_prefix_sum(self, ray_session, nblocks):
        import ray
        from solaris_ray.stages.pack import pack_sequences

        tbl = _docs(257)
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        out = (
            pack_sequences(ds, seq_len=64)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        n = tbl["n_tokens"].to_numpy()
        start, first, last = self._oracle(n, 64)
        assert (out["start_tok"].values == start).all()
        assert (out["bin_first"].values == first).all()
        assert (out["bin_last"].values == last).all()
        assert (out["n_bins"].values == last - first + 1).all()

    def test_zero_token_docs_pin_to_start_bin(self, ray_session):
        import ray
        from solaris_ray.stages.pack import pack_sequences

        tbl = _docs(10, tok=lambda i: 0 if i % 2 else 50)
        out = pack_sequences(ray.data.from_arrow(tbl), seq_len=32).to_pandas()
        z = out[out["n_tokens"] == 0]
        assert (z["n_bins"] == 1).all()
        assert (z["bin_first"] == z["bin_last"]).all()

    def test_layout_invariant_to_input_partitioning(self, ray_session):
        import ray
        from solaris_ray.stages.pack import pack_sequences

        tbl = _docs(123)
        a = pack_sequences(ray.data.from_arrow(tbl).repartition(3), seq_len=100).to_pandas()
        b = pack_sequences(ray.data.from_arrow(tbl).repartition(11), seq_len=100).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


def test_mix_sources_rates_and_subset_stability(ray_session):
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray

    from solaris_ray.stages.split import mix_sources

    n = 2000
    ids = np.arange(n, dtype=np.int64)
    src = np.array([f"s{i % 2}" for i in range(n)], object)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "source": pa.array(src)})
    ).repartition(4)
    got = mix_sources(ds, {"s0": 1000, "s1": 250}).to_pandas()
    # s0 kept fully; s1 at ~25%
    assert (got[got.source == "s0"].shape[0]) == n // 2
    k1 = got[got.source == "s1"].shape[0]
    assert 0.18 * n / 2 < k1 < 0.32 * n / 2
    # exact rule per row
    for r in got.itertuples(index=False):
        b = int.from_bytes(
            hashlib.md5(str(r.doc_id).encode()).digest()[:8], "little") % 1000
        assert b == r.bucket
        assert b < (1000 if r.source == "s0" else 250)
    # subset stability: halving a rate keeps a subset
    lower = mix_sources(ds, {"s0": 1000, "s1": 125}).to_pandas()
    assert set(lower[lower.source == "s1"].doc_id) <= set(
        got[got.source == "s1"].doc_id)
