"""MJPEG-AVI codec + video stages (solaris_ray/stages/video.py)."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages import multimodal, video


def _frames(k: int, n: int, w: int = 48, h: int = 32):
    out = []
    for f in range(n):
        yy, xx = np.indices((h, w), dtype=np.float64)
        a = 128 + 90 * np.sin(xx / 23 + k + 0.3 * f) * np.cos(yy / 17 + 0.5 * k)
        b = 128 + 80 * np.cos(xx / 31 + k) * np.sin(yy / 13 + k + 0.2 * f)
        c = 128 + 70 * np.sin((xx + yy) / 19 + 2 * k + 0.1 * f)
        out.append(np.stack([a, b, c], -1).clip(0, 255).astype(np.uint8))
    return out


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_avi_roundtrip_color():
    frames = _frames(3, 7)
    buf = video.avi_encode(frames, fps=5, quality=95)
    info = video.avi_info(buf)
    assert info == {"n_frames": 7, "w": 48, "h": 32,
                    "us_per_frame": 200000, "fps": 5}
    dec = video.avi_decode(buf)
    assert len(dec) == 7
    for ref, d in zip(frames, dec):
        assert d.shape == (32, 48, 3)
        assert _psnr(ref, d) >= 40.0


def test_avi_roundtrip_gray_and_frame_seek():
    frames = [f[:, :, 0] for f in _frames(1, 4)]
    buf = video.avi_encode(frames, fps=2)
    assert video.avi_info(buf)["n_frames"] == 4
    ranges = video.avi_frame_ranges(buf)
    assert len(ranges) == 4
    # per-index decode agrees with the full decode
    full = video.avi_decode(buf)
    one = video.avi_decode_frame(buf, 2, ranges)
    assert one.shape == (32, 48, 1)
    assert np.array_equal(one, full[2])


def test_avi_garbage_and_mismatched_frames_raise():
    with pytest.raises(ValueError):
        video.avi_info(b"not an avi")
    with pytest.raises(ValueError):
        video.avi_encode([])
    with pytest.raises(ValueError):
        video.avi_encode([np.zeros((32, 48, 3), np.uint8),
                          np.zeros((16, 48, 3), np.uint8)])


def test_video_stats_exact():
    tbl = pa.table(
        {
            "media_id": pa.array(["v0", "v1"]),
            "bytes": pa.array([video.avi_encode(_frames(0, 5), fps=5),
                               video.avi_encode(_frames(1, 3), fps=10)]),
        }
    )
    out = video.VideoStats()(tbl).to_pylist()
    assert out[0]["n_frames"] == 5 and out[0]["fps"] == 5
    assert out[0]["w"] == 48 and out[0]["h"] == 32
    assert out[0]["duration6"] == 1.0
    assert out[1]["n_frames"] == 3 and out[1]["duration6"] == 0.3
    assert out[1]["frame_bytes"] > 0


def test_frame_sampler_real_path_decodes_only_sampled(monkeypatch):
    frames = _frames(2, 10)
    tbl = pa.table(
        {
            "media_id": pa.array(["v"]),
            "bytes": pa.array([video.avi_encode(frames, fps=5, quality=95)]),
            "fmt": pa.array(["avi"]),
            "n_frames": pa.array([10], pa.int32()),
            "w": pa.array([48], pa.int32()),
            "h": pa.array([32], pa.int32()),
        }
    )
    calls = []
    real = video.jpeg_decode
    monkeypatch.setattr(video, "jpeg_decode",
                        lambda b: (calls.append(1), real(b))[1])
    out = multimodal.FrameSampler(every_k=3, strict=True)(tbl).to_pandas()
    # frames 0, 3, 6, 9 sampled; ONLY those four JPEG payloads decoded
    assert list(out["frame_idx"]) == [0, 3, 6, 9]
    assert len(calls) == 4
    from solaris_ray.raster import codec

    for _, row in out.iterrows():
        dec = codec.decode(row["bytes"], "png")
        assert dec.shape == (32, 48, 3)
        assert _psnr(frames[row["frame_idx"]], dec) >= 40.0


def test_frame_sampler_strict_still_raises_on_foreign_codec():
    tbl = pa.table(
        {
            "media_id": pa.array(["v"]),
            "bytes": pa.array([b"\x00" * 64]),
            "fmt": pa.array(["h264"]),
            "n_frames": pa.array([4], pa.int32()),
            "w": pa.array([8], pa.int32()),
            "h": pa.array([8], pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError):
        multimodal.FrameSampler(every_k=2, strict=True)(tbl)
    # non-strict keeps the documented fake fan-out plumbing
    out = multimodal.FrameSampler(every_k=2, strict=False)(tbl)
    assert out.num_rows == 2


def test_scene_changes_static_shots_and_cuts():
    from solaris_ray.stages.video import SceneChanges, avi_encode

    def scene_frame(s, w=48, h=32):
        yy, xx = np.indices((h, w), dtype=np.float64)
        a = 128 + 90 * np.sin(xx / 7 + 3 * s) * np.cos(yy / 5 + s)
        b = 128 + 80 * np.cos(xx / 9 + 2 * s)
        c = 128 + 70 * np.sin((xx + yy) / 6 + s)
        return np.stack([a, b, c], -1).clip(0, 255).astype(np.uint8)

    frames = [scene_frame(0)] * 3 + [scene_frame(1)] * 2 + [scene_frame(2)] * 3
    buf = avi_encode(np.stack(frames), fps=5)
    tbl = pa.table({"media_id": pa.array(["v"]), "bytes": pa.array([buf])})
    out = SceneChanges(threshold=8.0)(tbl).to_pandas()
    assert list(out["is_cut"]) == [1, 0, 0, 1, 0, 1, 0, 0]
    assert list(out["scene_idx"]) == [0, 0, 0, 1, 1, 2, 2, 2]
    # identical frames decode identically -> MAD exactly 0 inside shots
    assert (out.loc[out["is_cut"] == 0, "mad6"] == 0.0).all()
    assert (out.loc[out["frame_idx"].isin([3, 5]), "mad6"] > 30).all()
