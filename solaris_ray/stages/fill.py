"""Nodata filling — fill_all_nodata re-expressed.

Reference (/root/reference/solaris/tile/raster_tile.py:461-502): after
tiling, nodata pixels are filled with a constant or with the
channel-wise MEAN of the source image's valid pixels.

Ray mapping (SURVEY.md §2.2/§2.5): the mean variant is the classic
partial+final grouped aggregate — pass 1 computes per-tile channel
sums/counts of valid pixels, ``groupby(image_id)`` sums them, and the
small per-image mean table is broadcast into the pass-2 fill kernel.
The image is never re-read globally; both passes stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..raster import codec


def fill_nodata_constant(tiles, value: float, nodata: float = 0.0, fmt_col: str = "fmt"):
    """Constant fill: one stateless map_batches pass."""

    def _fill(batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            img = codec.decode(batch["bytes"][i].as_py(), batch[fmt_col][i].as_py())
            if img.ndim == 2:
                img = img[:, :, None]
            mask = np.all(img == nodata, axis=-1)
            img = img.copy()
            img[mask] = value
            out.append(codec.encode(img.squeeze(-1) if img.shape[2] == 1 else img, batch[fmt_col][i].as_py()))
        return batch.set_column(
            batch.schema.get_field_index("bytes"), "bytes", pa.array(out, pa.binary())
        )

    return tiles.map_batches(_fill, batch_format="pyarrow", batch_size=16)


def channel_stats_partial(batch: pa.Table, nodata: float = 0.0, n_bands: int = 3) -> pa.Table:
    """Per-tile valid-pixel channel sums + counts (pass 1 partials)."""
    ids, sums, counts = [], [], []
    for i in range(batch.num_rows):
        img = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
        if img.ndim == 2:
            img = img[:, :, None]
        valid = ~np.all(img == nodata, axis=-1)
        ids.append(batch["image_id"][i].as_py())
        sums.append(img[valid].sum(axis=0).astype(np.float64).tolist())
        counts.append(int(valid.sum()))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "band_sums": pa.array(sums, pa.list_(pa.float64())),
            "n_valid": pa.array(counts, pa.int64()),
        }
    )


def fill_nodata_mean(tiles, nodata: float = 0.0):
    """Mean fill: grouped per-image channel means, broadcast to pass 2.

    Mirrors raster_tile.py:479-483 (np.nanmean over the whole image)
    but computed distributed: sum/count partials -> groupby(image_id)
    -> broadcast dict {image_id: [band means]}.
    """
    import ray

    partial = tiles.map_batches(
        lambda b: channel_stats_partial(b, nodata), batch_format="pyarrow", batch_size=16
    )
    df = partial.to_pandas()
    g: dict[str, np.ndarray] = {}
    for iid, sub in df.groupby("image_id"):
        sums = np.sum(np.stack(sub["band_sums"].values), axis=0)
        n = sub["n_valid"].sum()
        g[iid] = (sums / n) if n else sums * 0.0
    means_ref = ray.put(g)

    class MeanFiller:
        def __init__(self, means_ref):
            self.means = ray.get(means_ref) if not isinstance(means_ref, dict) else means_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for i in range(batch.num_rows):
                fmt = batch["fmt"][i].as_py()
                img = codec.decode(batch["bytes"][i].as_py(), fmt)
                if img.ndim == 2:
                    img = img[:, :, None]
                mask = np.all(img == nodata, axis=-1)
                if mask.any():
                    mean = self.means.get(batch["image_id"][i].as_py())
                    if mean is not None:
                        img = img.copy()
                        img[mask] = np.clip(np.rint(mean), 0, 255).astype(img.dtype)
                out.append(codec.encode(img.squeeze(-1) if img.shape[2] == 1 else img, fmt))
            return batch.set_column(
                batch.schema.get_field_index("bytes"), "bytes", pa.array(out, pa.binary())
            )

    return tiles.map_batches(
        MeanFiller,
        fn_constructor_kwargs={"means_ref": means_ref},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=2,
    )
