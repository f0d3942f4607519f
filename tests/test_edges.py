"""Sobel gradient stats and Otsu threshold kernels."""

import numpy as np
import pyarrow as pa

from solaris_ray.raster import codec
from solaris_ray.stages.edges import OtsuThreshold, SobelStats


def _img_batch(arr: np.ndarray, image_id: str = "t0") -> pa.Table:
    h, w = arr.shape
    return pa.table({
        "image_id": pa.array([image_id], pa.string()),
        "bytes": pa.array([codec.encode(arr.astype(np.uint8), "png")], pa.binary()),
        "w": pa.array([w], pa.int32()),
        "h": pa.array([h], pa.int32()),
        "fmt": pa.array(["png"], pa.string()),
    })


def test_sobel_constant_image_is_flat():
    out = SobelStats()(_img_batch(np.full((8, 8), 77)))
    assert out["g_sum"][0].as_py() == 0
    assert out["g_max"][0].as_py() == 0
    assert out["edge_px"][0].as_py() == 0


def test_sobel_vertical_step_edge():
    # columns 0..3 are 0, columns 4..7 are 100: gx fires on the two
    # columns straddling the step, gy everywhere 0
    arr = np.zeros((8, 8), np.int64)
    arr[:, 4:] = 100
    out = SobelStats(thresh=128)(_img_batch(arr))
    # interior 6x6; columns x=3 and x=4 have |gx| = 400 each (weights
    # 1+2+1 times the 100 step), 6 rows each
    assert out["g_max"][0].as_py() == 400
    assert out["g_sum"][0].as_py() == 400 * 6 * 2
    assert out["edge_px"][0].as_py() == 12


def test_sobel_matches_bruteforce_on_formula_image():
    yy, xx = np.indices((16, 16))
    arr = (xx * 7 + yy * 13 + 31) % 251
    out = SobelStats()(_img_batch(arr))
    g_sum = 0
    g_max = 0
    for y in range(1, 15):
        for x in range(1, 15):
            gx = sum(
                wy * (int(arr[y + dy, x + 1]) - int(arr[y + dy, x - 1]))
                for dy, wy in ((-1, 1), (0, 2), (1, 1))
            )
            gy = sum(
                wx * (int(arr[y + 1, x + dx]) - int(arr[y - 1, x + dx]))
                for dx, wx in ((-1, 1), (0, 2), (1, 1))
            )
            g = abs(gx) + abs(gy)
            g_sum += g
            g_max = max(g_max, g)
    assert out["g_sum"][0].as_py() == g_sum
    assert out["g_max"][0].as_py() == g_max


def test_otsu_bimodal_splits_between_modes():
    # half the pixels at 10, half at 200: any t in [10, 199] separates
    # them perfectly; smallest-t tie-break must return 10
    arr = np.zeros((8, 8), np.int64)
    arr[:, 4:] = 200
    arr[:, :4] = 10
    out = OtsuThreshold()(_img_batch(arr))
    assert out["otsu_t"][0].as_py() == 10
    assert out["n_below"][0].as_py() == 32
    assert out["sum_below"][0].as_py() == 320


def test_otsu_matches_bruteforce_fraction_ranking():
    rng = np.random.default_rng(7)
    arr = np.concatenate([
        rng.integers(0, 80, 100), rng.integers(150, 256, 156)
    ]).reshape(16, 16)
    out = OtsuThreshold()(_img_batch(arr))
    hist = np.bincount(arr.ravel().astype(np.int64), minlength=256)
    n_total, s_total = int(hist.sum()), int((hist * np.arange(256)).sum())
    best_t, best = -1, -1
    n0 = s0 = 0
    for t in range(255):
        n0 += int(hist[t])
        s0 += int(hist[t]) * t
        if n0 == 0 or n0 == n_total:
            continue
        num = s0 * n_total - s_total * n0
        score = num * num * 1_000_000 // (n0 * (n_total - n0))
        if score > best:
            best, best_t = score, t
    assert out["otsu_t"][0].as_py() == best_t
    # and the chosen threshold sits between the two modes
    assert 79 <= best_t <= 149
