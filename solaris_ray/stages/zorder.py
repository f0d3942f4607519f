"""Z-order (Morton) spatial partitioner: locality-preserving range
partitioning of point rows for downstream cell/tile work.

The north-star pipeline shuffles image rows by spatial cell; a naive
hash of (cell) scatters NEIGHBOURING cells across the cluster, so every
window/halo/compaction stage pays a full all-to-all.  Interleaving the
quantized x/y bits into one Morton key makes spatial neighbours
key-space neighbours, and EXACT rank boundaries over that key yield
balanced, CONTIGUOUS spatial ranges — the classic Z-order layout
(Morton 1966; the same layout DeltaLake/Iceberg use for data skipping).
Reference analogue: the tile grid iteration order of
/root/reference/solaris/tile/raster_tile.py:266-299 is row-major —
this is its scale-aware replacement.

Pipeline shape (all exact, no sampling):

1. map-only: zkey = interleave(x, y) per row (uint64 SWAR spread — five
   mask-shift ops per axis, no per-row loop);
2. boundary selection at ranks floor(j*(n-1)/P), j=1..P-1, via
   ``exact_quantiles`` (histogram + single-bucket refinement — work on
   the full data is one partial-count pass);
3. map-only: part = searchsorted(boundaries, zkey, right) — the count
   of boundaries <= zkey, so EQUAL keys always land in one partition
   (NTILE would split them), and every partition covers a contiguous
   zkey range.

Skew note: boundary ranks are exact, so partition sizes differ only by
key-tie mass; a pathological all-one-key input degrades to one hot
partition — the honest behaviour for a spatial layout (it IS one
location), logged by the balance check in the partition helper.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)


def _spread_bits(v: np.ndarray) -> np.ndarray:
    """uint64 SWAR spread: place the low 32 bits of ``v`` at even bit
    positions (bit i -> bit 2i) — the 2-D interleave constants."""
    x = v.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton_key(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Interleave the low ``bits`` bits of integer coords x, y into one
    int64 Morton key; x occupies the ODD (higher) bit of each pair.

    Inputs must be integer-valued and inside [0, 2**bits) — raises
    instead of silently wrapping (the votes.py overflow lesson)."""
    if bits < 1 or bits > 21:
        raise ValueError("morton_key: bits must be in [1, 21]")
    xi = np.asarray(x)
    yi = np.asarray(y)
    if xi.dtype.kind == "f":
        if xi.size and (xi != np.floor(xi)).any():
            raise ValueError("morton_key: x has non-integer values")
        xi = xi.astype(np.int64)
    if yi.dtype.kind == "f":
        if yi.size and (yi != np.floor(yi)).any():
            raise ValueError("morton_key: y has non-integer values")
        yi = yi.astype(np.int64)
    hi = np.int64(1) << np.int64(bits)
    if xi.size and (
        (xi < 0).any() or (xi >= hi).any() or (yi < 0).any() or (yi >= hi).any()
    ):
        raise ValueError(f"morton_key: coords outside [0, 2**{bits})")
    z = (_spread_bits(xi) << np.uint64(1)) | _spread_bits(yi)
    return z.astype(np.int64)


def zorder_assign(
    ds,
    n_parts: int,
    id_col: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    bits: int = 12,
):
    """-> (id, zkey, part): Morton key per row plus a balanced
    contiguous-range partition id in [0, n_parts).

    Boundary j (j=1..P-1) is the zkey at exact ascending 0-based rank
    floor(j*(n-1)/(P)); part = #{boundaries <= zkey}.  Equal keys share
    a partition by construction."""
    if n_parts < 1:
        raise ValueError("zorder_assign: n_parts must be >= 1")
    from .quantiles import exact_rank_select

    def _key(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "zkey": pa.array(morton_key(x, y, bits), pa.int64()),
            }
        )

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    if n_parts == 1:
        bounds = np.empty(0, np.int64)
    else:
        keyed = keyed.materialize()  # consumed twice: boundaries + assign
        n = keyed.count()  # metadata-only on a materialized Dataset
        # distinct ranks: with n < ~2P two j's can hit the same rank —
        # a rank contributes ONE boundary (SQL-twin IN semantics)
        ranks = sorted({j * (n - 1) // n_parts for j in range(1, n_parts)})
        vals = exact_rank_select(keyed, "zkey", ranks)
        # zkey < 2**(2*bits) <= 2**42 — exact in float64, cast back
        bounds = np.asarray(vals, np.float64).astype(np.int64)

    def _assign(batch: pa.Table) -> pa.Table:
        z = batch["zkey"].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bounds, z, side="right").astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "zkey": batch["zkey"],
                "part": pa.array(part, pa.int64()),
            }
        )

    return keyed.map_batches(_assign, batch_format="pyarrow")


_GH32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", np.uint8)


def geohash_encode(x: np.ndarray, y: np.ndarray, x_max: int, y_max: int,
                   chars: int = 6) -> np.ndarray:
    """Geohash strings for integer grid coords in [0, x_max) x [0, y_max).

    ``x`` plays longitude (the first / most significant interleaved
    bit, per the geohash spec), ``y`` latitude.  ``chars`` must be
    even (2/4/6/8) so both axes carry chars*5/2 bits and the existing
    ``morton_key`` interleave (x on the high bit of each pair) IS the
    geohash bit layout.  Fully vectorized: one Morton pass, one
    alphabet gather, one (n, chars) uint8 view to strings.
    """
    if chars not in (2, 4, 6, 8):
        raise ValueError("geohash_encode: chars must be even (2, 4, 6 or 8)")
    bits = chars * 5 // 2
    xi = np.asarray(x, np.int64)
    yi = np.asarray(y, np.int64)
    if xi.size and ((xi < 0).any() or (xi >= x_max).any()
                    or (yi < 0).any() or (yi >= y_max).any()):
        raise ValueError("geohash_encode: coords outside the stated grid")
    scale = np.int64(1) << np.int64(bits)
    lon = xi * scale // np.int64(x_max)
    lat = yi * scale // np.int64(y_max)
    code = morton_key(lon, lat, bits)
    cols = [
        _GH32[(code >> np.int64(5 * (chars - 1 - j))) & np.int64(31)]
        for j in range(chars)
    ]
    mat = np.ascontiguousarray(np.stack(cols, axis=1))
    return mat.view(f"S{chars}").ravel().astype(f"U{chars}")
