"""Property-based codec invariants (hypothesis).

Every codec in the audio/raster stack has a hard invariant — lossless
roundtrip exactness, quantization-error bounds, or reference-table
idempotence — that must hold for ARBITRARY inputs, not just the seeded
fixtures.  Hypothesis hunts the edges (empty-adjacent lengths, extreme
values, constant runs, alternating signs).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from solaris_ray.stages import audio
from solaris_ray.stages.flac import flac_decode, flac_encode

int16s = st.integers(min_value=-32768, max_value=32767)


@settings(max_examples=40, deadline=None)
@given(arrays(np.int16, st.integers(1, 3000), elements=int16s))
def test_flac_roundtrip_lossless(s):
    back, rate = flac_decode(flac_encode(s, 8000))
    assert rate == 8000
    assert back.shape == (len(s), 1)
    assert np.array_equal(back[:, 0], s)


@settings(max_examples=20, deadline=None)
@given(arrays(np.int16, st.tuples(st.integers(1, 800), st.integers(1, 3)),
              elements=int16s))
def test_flac_multichannel_roundtrip(s):
    back, _ = flac_decode(flac_encode(s, 16000))
    assert np.array_equal(back, s)


@settings(max_examples=40, deadline=None)
@given(arrays(np.int16, st.integers(1, 2000), elements=int16s))
def test_wav_pcm_roundtrip(s):
    back, rate = audio.wav_decode(audio.wav_encode(s, 22050))
    assert rate == 22050 and np.array_equal(back[:, 0], s)


@settings(max_examples=30, deadline=None)
@given(arrays(np.int16, st.integers(1, 2000), elements=int16s))
def test_g711_quantization_bounds(s):
    for law, bound in (("ulaw", 1024), ("alaw", 512)):
        back, _ = audio.wav_decode(audio.wav_encode_g711(s, 8000, law))
        err = np.abs(back[:, 0].astype(np.int32) - s.astype(np.int32))
        assert err.max() <= bound


@settings(max_examples=30, deadline=None)
@given(arrays(np.int16, st.integers(1, 2000), elements=int16s))
def test_adpcm_shape_and_first_sample(s):
    back, rate = audio.wav_decode(audio.wav_encode_adpcm(s, 8000))
    assert rate == 8000 and back.shape[0] == len(s)
    assert back[0, 0] == s[0]  # block headers carry the seed exactly


@settings(max_examples=25, deadline=None)
@given(arrays(np.int16, st.integers(1, 1500), elements=int16s),
       st.sampled_from([(8000, 16000), (16000, 8000), (44100, 16000),
                        (22050, 8000)]))
def test_resample_output_length(s, rates):
    import math

    src, dst = rates
    y = audio.resample_audio(s, src, dst)
    g = math.gcd(src, dst)
    assert y.shape == (-(-len(s) * (dst // g) // (src // g)), 1)
    assert y.dtype == np.int16


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 199), st.data())
def test_truncated_containers_raise_cleanly(cut_pct, data):
    """Any prefix/corruption of a valid container either raises
    ValueError or returns a well-formed result — never an IndexError,
    infinite loop, or crash."""
    s = (np.arange(1500) % 601 - 300).astype(np.int16)
    which = data.draw(st.sampled_from(["wav", "flac", "g711", "adpcm"]))
    if which == "wav":
        buf = audio.wav_encode(s, 8000)
    elif which == "flac":
        buf = flac_encode(s, 8000)
    elif which == "g711":
        buf = audio.wav_encode_g711(s, 8000, "ulaw")
    else:
        buf = audio.wav_encode_adpcm(s, 8000)
    cut = max(1, len(buf) * cut_pct // 200)  # prefixes up to ~full
    trunc = buf[:cut]
    try:
        out, rate = (flac_decode(trunc) if which == "flac"
                     else audio.wav_decode(trunc))
        assert out.ndim == 2 and rate > 0  # short-but-valid prefix is ok
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 10**6), st.integers(0, 255))
def test_byte_flip_never_crashes(pos_seed, newbyte):
    s = (np.arange(2000) % 997 - 498).astype(np.int16)
    buf = bytearray(flac_encode(s, 16000))
    buf[pos_seed % len(buf)] = newbyte
    try:
        out, _ = flac_decode(bytes(buf))
        assert out.ndim == 2
    except ValueError:
        pass
