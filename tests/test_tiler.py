"""Corpus generation + raster tiler tests.

Mirrors the reference tiling test style
(/root/reference/tests/test_tile/test_tile.py: tile a known image,
check every tile's pixels) but against our deterministic synthetic
corpus: tiles must slice back to exactly the decoded source pixels
(lossless) or within PSNR >= 40 dB (lossy), and captions must be
byte-equal per row.
"""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.raster import codec
from solaris_ray.sources.synth import gen_image, gen_proposals, gen_shard
from solaris_ray.stages.tiler import TileCutter, plan_tiles, tile_grid_counts


class TestSynth:
    def test_deterministic(self):
        r1, f1 = gen_image(3, 16, seed=42, size=64)
        r2, f2 = gen_image(3, 16, seed=42, size=64)
        assert r1["bytes"] == r2["bytes"]
        assert r1["caption"] == r2["caption"]
        assert [f["wkt_pix"] for f in f1] == [f["wkt_pix"] for f in f2]

    def test_shard_split_invariant(self):
        """Generating [0..8) in one shard == two shards of 4 — the
        property that makes 10^12-image generation embarrassingly
        parallel."""
        a_img, a_feat = gen_shard(np.arange(8), 8, 42, size=64)
        b1, f1 = gen_shard(np.arange(4), 8, 42, size=64)
        b2, f2 = gen_shard(np.arange(4, 8), 8, 42, size=64)
        assert a_img.equals(pa.concat_tables([b1, b2]))
        assert a_feat.equals(pa.concat_tables([f1, f2]))

    def test_phash_duplicates_planted(self):
        imgs, _ = gen_shard(np.arange(40), 40, 42, size=64)
        ph = imgs["phash"].to_pylist()
        assert ph[17] == ph[16] and ph[34] == ph[33]

    def test_decode_roundtrip_and_psnr(self):
        imgs, _ = gen_shard(np.arange(4), 4, 42, size=64)
        for row in imgs.to_pylist():
            arr = codec.decode(row["bytes"], row["fmt"])
            assert arr.shape == (row["h"], row["w"], 3)

    def test_proposals(self):
        _, feats = gen_shard(np.arange(6), 6, 42, size=64)
        props = gen_proposals(feats, seed=42)
        assert props.num_rows > 0
        assert set(props.column_names) == {
            "proposal_id", "image_id", "class", "xs", "ys", "conf",
        }


class TestPlanTiles:
    def test_grid_counts(self):
        nx, ny = tile_grid_counts(np.array([256, 300]), np.array([256, 100]), 128)
        assert nx.tolist() == [2, 3] and ny.tolist() == [2, 1]

    def test_plan_matches_cut(self):
        imgs, _ = gen_shard(np.arange(3), 3, 42, size=200)  # 200/128 → 2x2 padded
        plan = plan_tiles(imgs, tile_size=128)
        cut = TileCutter(tile_size=128)(imgs)
        assert plan.num_rows == cut.num_rows == 3 * 4
        assert plan["tile_id"].to_pylist() == cut["tile_id"].to_pylist()
        for col in ("x0", "y0", "x1", "y1", "cell"):
            assert plan[col].to_pylist() == cut[col].to_pylist(), col


class TestTileCutter:
    def test_pixels_roundtrip(self):
        imgs, _ = gen_shard(np.arange(2), 2, 42, size=256)
        tiles = TileCutter(tile_size=128)(imgs)
        src = {
            r["image_id"]: codec.decode(r["bytes"], r["fmt"])
            for r in imgs.to_pylist()
        }
        fmts = dict(zip(imgs["image_id"].to_pylist(), imgs["fmt"].to_pylist()))
        for t in tiles.to_pylist():
            want = src[t["image_id"]][
                t["row"] * 128 : (t["row"] + 1) * 128,
                t["col"] * 128 : (t["col"] + 1) * 128,
            ]
            got = codec.decode(t["bytes"], t["fmt"])
            if fmts[t["image_id"]] == "png":
                assert np.array_equal(got, want)
            else:
                assert codec.psnr(got, want) >= 40.0

    def test_caption_byte_equal(self):
        imgs, _ = gen_shard(np.arange(2), 2, 42, size=256)
        tiles = TileCutter(tile_size=128)(imgs)
        caps = dict(zip(imgs["image_id"].to_pylist(), imgs["caption"].to_pylist()))
        for t in tiles.to_pylist():
            assert t["caption"] == caps[t["image_id"]]

    def test_edge_padding_and_nodata_frac(self):
        imgs, _ = gen_shard(np.arange(1), 1, 42, size=200)
        tiles = TileCutter(tile_size=128)(imgs)
        by_rc = {(t["col"], t["row"]): t for t in tiles.to_pylist()}
        corner = by_rc[(1, 1)]
        arr = codec.decode(corner["bytes"], corner["fmt"])
        assert arr.shape[:2] == (128, 128)
        # padded region is nodata=0 on all bands
        assert (arr[72:, :, :] == 0).all() and (arr[:, 72:, :] == 0).all()
        assert corner["nodata_frac"] >= 1.0 - (72 * 72) / (128 * 128) - 1e-9

    def test_nodata_threshold_filter(self):
        imgs, _ = gen_shard(np.arange(1), 1, 42, size=200)
        kept = TileCutter(tile_size=128, nodata_threshold=0.5)(imgs)
        allt = TileCutter(tile_size=128)(imgs)
        dropped = allt.num_rows - kept.num_rows
        assert dropped == sum(
            1 for t in allt.to_pylist() if t["nodata_frac"] >= 0.5
        )


@pytest.mark.usefixtures("ray_session")
class TestTilerOnRay:
    def test_cut_tiles_dataset(self):
        import ray.data as rd

        from solaris_ray.stages.tiler import cut_tiles, plan_tiles_ds

        imgs, _ = gen_shard(np.arange(6), 6, 42, size=256)
        ds = rd.from_arrow(imgs)
        tiles = cut_tiles(ds, tile_size=128)
        plan = plan_tiles_ds(ds, tile_size=128)
        assert tiles.count() == plan.count() == 6 * 4
        got = tiles.take_all()
        assert {t["tile_id"] for t in got} == set(
            plan.to_pandas()["tile_id"].tolist()
        )
