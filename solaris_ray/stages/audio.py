"""Audio columns — WAV/PCM codec + actor-pool analysis stages.

The driver mandate treats audio as opaque ``binary`` + typed metadata
with decode / feature-extract as actor-pool ``map_batches`` stages.
No audio library exists in this container, but RIFF/WAVE PCM is a
pure-struct container (same discipline as ``raster/gtiff.py`` and
``raster/jpeg.py``), so WAV decodes for REAL here:

- ``wav_encode`` / ``wav_decode``: PCM 16-bit (and 8-bit unsigned /
  32-bit float on decode), mono or multi-channel, standard 44-byte
  header plus arbitrary extra chunks skipped on read.
- ``AudioStats``: per-row n_samples / rate / duration / RMS / peak.
- ``AudioClips``: fixed-length window fan-out (1 row -> n clip rows),
  each clip re-encoded as a standalone WAV — the audio twin of the
  image chipper.

Compressed codecs (mp3/flac/ogg/aac) remain honestly stubbed in
``stages/multimodal.py`` — no wheel exists here and a DCT/entropy
audio decoder is out of scope; the seam upgrades the same way the
jpeg one did.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """[n] or [n, ch] int16 (or float in [-1, 1]) -> WAV PCM16 bytes."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.dtype != np.int16:
        if np.issubdtype(s.dtype, np.floating):
            s = np.clip(np.round(s * 32767.0), -32768, 32767).astype(np.int16)
        else:
            s = np.clip(s, -32768, 32767).astype(np.int16)
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    block_align = ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, block_align, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ([n, ch] int16 samples, rate).

    PCM16 native; PCM8 (unsigned) and IEEE float32 are converted to
    int16.  Unknown chunks are skipped per the RIFF spec.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos = 12
    fmt_code = channels = rate = bits = None
    data = None
    n = len(buf)
    while pos + 8 <= n:
        tag = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            fmt_code, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
        elif tag == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt_code is None or data is None:
        raise ValueError("truncated WAV (no fmt/data chunk)")
    if fmt_code == 1 and bits == 16:
        s = np.frombuffer(data, "<i2")
    elif fmt_code == 1 and bits == 8:
        s = (np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8
    elif fmt_code == 3 and bits == 32:
        f = np.frombuffer(data, "<f4").astype(np.float64)
        s = np.clip(np.round(f * 32767.0), -32768, 32767).astype(np.int16)
    else:
        raise ValueError(f"unsupported WAV format code={fmt_code} bits={bits}")
    ch = max(1, int(channels))
    return s.reshape(-1, ch), int(rate)


class AudioStats:
    """Actor-pool stage: (media_id, bytes) -> per-row audio stats.

    Output: media_id, n_samples (per channel), channels, rate,
    duration6 (s), rms6 (int16 units), peak (max |sample|).  RMS uses
    an exact integer sum of squares before one float sqrt, so the
    6-dp rounding is reproducible in SQL.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, chs, rates, durs, rmss, peaks = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            s, rate = wav_decode(batch["bytes"][i].as_py())
            n, ch = s.shape
            sq = int((s.astype(np.int64) ** 2).sum())
            ids.append(batch["media_id"][i].as_py())
            ns.append(n)
            chs.append(ch)
            rates.append(rate)
            durs.append(round(n / rate, 6))
            rmss.append(round(float(np.sqrt(sq / (n * ch))), 6) if n else 0.0)
            peaks.append(int(np.abs(s.astype(np.int64)).max()) if n else 0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "n_samples": pa.array(ns, pa.int64()),
                "channels": pa.array(chs, pa.int64()),
                "rate": pa.array(rates, pa.int64()),
                "duration6": pa.array(durs, pa.float64()),
                "rms6": pa.array(rmss, pa.float64()),
                "peak": pa.array(peaks, pa.int64()),
            }
        )


class AudioClips:
    """Actor-pool stage: window fan-out (1 row -> n standalone clips).

    ``clip_s`` seconds per clip, ``hop_s`` hop (defaults to clip_s —
    tumbling); ragged tail kept iff >= ``min_frac`` of a clip.  Each
    output row re-encodes its window as a standalone WAV plus an
    integer sample-sum column (cheap content fingerprint for gates).
    """

    def __init__(self, clip_s: float = 1.0, hop_s: float | None = None,
                 min_frac: float = 0.5):
        self.clip_s = clip_s
        self.hop_s = hop_s if hop_s is not None else clip_s
        self.min_frac = min_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "clip_idx": [], "n_samples": [],
               "sample_sum": [], "bytes": []}
        for i in range(batch.num_rows):
            s, rate = wav_decode(batch["bytes"][i].as_py())
            mid = batch["media_id"][i].as_py()
            clip = int(round(self.clip_s * rate))
            hop = int(round(self.hop_s * rate))
            n = s.shape[0]
            idx = 0
            for start in range(0, n, hop):
                piece = s[start:start + clip]
                if piece.shape[0] < max(1, int(clip * self.min_frac)):
                    break
                out["media_id"].append(mid)
                out["clip_idx"].append(idx)
                out["n_samples"].append(piece.shape[0])
                out["sample_sum"].append(int(piece.astype(np.int64).sum()))
                out["bytes"].append(wav_encode(piece, rate))
                idx += 1
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "clip_idx": pa.array(out["clip_idx"], pa.int64()),
                "n_samples": pa.array(out["n_samples"], pa.int64()),
                "sample_sum": pa.array(out["sample_sum"], pa.int64()),
                "bytes": pa.array(out["bytes"], pa.binary()),
            }
        )
