"""Property-based tests for the round-3 codec surface: arbitrary
inputs, not just the fixture distribution — PDF LZW, G.711 companding,
IMA ADPCM, progressive JPEG, RunLength, ASCIIHex/85 chains, MP4
metadata."""

import numpy as np
from hypothesis import given, settings, strategies as st

from effocr_spark.functions.pdftext import (ascii85_decode,
                                            ascii_hex_decode, lzw_decode,
                                            lzw_encode,
                                            run_length_decode)
from effocr_spark.synth.wavcodec import (ALAW2LIN, ULAW2LIN, _lin2alaw,
                                         _lin2ulaw, decode_wav,
                                         encode_wav_adpcm)

blobs = st.binary(min_size=0, max_size=4000)


@settings(max_examples=60, deadline=None)
@given(blobs)
def test_lzw_roundtrip(data):
    assert lzw_decode(lzw_encode(data)) == data


@settings(max_examples=60, deadline=None)
@given(blobs)
def test_ascii_filters_roundtrip(data):
    import base64

    assert ascii_hex_decode(data.hex().encode() + b">") == data
    assert ascii85_decode(base64.a85encode(data) + b"~>") == data


@settings(max_examples=60, deadline=None)
@given(blobs)
def test_runlength_roundtrip(data):
    out = bytearray()
    for s in range(0, len(data), 128):
        chunk = data[s:s + 128]
        out += bytes([len(chunk) - 1]) + chunk
    out += bytes([128])
    assert run_length_decode(bytes(out)) == data


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-32768, max_value=32767))
def test_g711_quantization_error_bounds(v):
    """Companded value decodes within the segment's quantization step of
    the input (the G.711 accuracy contract)."""
    du = int(ULAW2LIN[_lin2ulaw(v)])
    seg_step = max(16, abs(v) >> 3)  # u-law step grows ~ magnitude/8
    assert abs(du - max(min(v, 32635), -32635)) <= seg_step
    da = int(ALAW2LIN[_lin2alaw(v)])
    assert abs(da - v) <= max(32, abs(v) >> 3)


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=2 ** 30), st.integers(1, 2),
       st.integers(min_value=60, max_value=900))
def test_ima_adpcm_tracks_smooth_signals(seed, ch, n):
    rng = np.random.RandomState(seed % (2 ** 31))
    sig = np.cumsum(rng.standard_normal((n, ch)) * 120, axis=0)
    sig = np.clip(sig, -30000, 30000).astype(np.int16)
    out, _ = decode_wav(encode_wav_adpcm(sig, rate=8000,
                                         samples_per_block=129))
    assert out.shape == sig.shape
    # step-adaptive 4-bit quantization tracks a random walk closely
    assert float(np.abs(out.astype(float) - sig.astype(float)).mean()) < 700


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=2 ** 30),
       st.integers(min_value=8, max_value=40),
       st.integers(min_value=8, max_value=40),
       st.booleans())
def test_progressive_jpeg_equals_baseline(seed, h, w, sub):
    from effocr_spark.synth.jpegcodec import (decode_jpeg, encode_jpeg,
                                              encode_jpeg_progressive)

    rng = np.random.RandomState(seed % (2 ** 31))
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    base = decode_jpeg(encode_jpeg(img, subsample=sub))
    prog = decode_jpeg(encode_jpeg_progressive(img, subsample=sub))
    assert np.array_equal(base, prog)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=8192),
       st.integers(min_value=1, max_value=8192),
       st.floats(min_value=0.001, max_value=86400, allow_nan=False),
       st.booleans())
def test_mp4_metadata_roundtrip(w, h, dur, audio):
    from effocr_spark.synth.mp4box import make_mp4, parse_mp4_meta

    m = parse_mp4_meta(make_mp4(w, h, dur, timescale=1000,
                                with_audio=audio))
    assert (m["width"], m["height"]) == (w, h)
    assert abs(m["duration_s"] - dur) <= 0.001  # timescale rounding
    assert m["n_tracks"] == (2 if audio else 1)


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_jp2_lossless_property(seed):
    """Property: ANY uint8 image (random size/content) survives the
    full JPEG2000 reversible pipeline bit-exactly — wavelet, EBCOT,
    tier-2, markers, boxes."""
    import numpy as np
    from effocr_spark.synth.jp2codec import decode_jp2, encode_jp2

    rng = np.random.default_rng(seed)
    h = int(rng.integers(1, 40))
    w = int(rng.integers(1, 40))
    color = bool(rng.integers(0, 2))
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    levels = int(rng.integers(1, 4))
    out = decode_jp2(encode_jp2(img, levels=levels,
                                cblk_exp=(4, 4)))
    if color:
        assert (out == img).all()
    else:
        assert (out[:, :, 0] == img).all()


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_jbig2_huffman_tables_property(seed):
    """Property: every value a standard table B.1-B.6 can represent
    roundtrips through its canonical codes."""
    import numpy as np
    from effocr_spark.synth.jbig2huff import (BitReader, BitWriter,
                                              standard_table)

    rng = np.random.default_rng(seed)
    n = int(standard_table(1) is not None)  # warm cache
    tab_id = int(rng.integers(1, 7))
    tab = standard_table(tab_id)
    lows = {1: 0, 2: 0, 3: -5000, 4: 1, 5: -5000, 6: -50000}
    vals = [int(v) for v in
            rng.integers(lows[tab_id], 100000, size=25)]
    w = BitWriter()
    for v in vals:
        tab.encode(w, v)
    r = BitReader(w.getvalue())
    assert [tab.decode(r) for _ in vals] == vals


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=12, deadline=None)
def test_jp2_full_surface_property(seed):
    """Property: random size/content/levels/layers/progression/
    precincts/offsets/SOP-EPH all compose bit-exactly on the
    reversible path."""
    import numpy as np
    from effocr_spark.synth.jp2codec import decode_jp2, encode_jp2

    rng = np.random.default_rng(seed)
    h = int(rng.integers(8, 60))
    w = int(rng.integers(8, 60))
    color = bool(rng.integers(0, 2))
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    levels = int(rng.integers(1, 4))
    prog = ["LRCP", "RLCP", "RPCL", "PCRL", "CPRL"][
        int(rng.integers(0, 5))]
    kw = dict(levels=levels, cblk_exp=(4, 4),
              n_layers=int(rng.integers(1, 4)), progression=prog,
              sop_eph=bool(rng.integers(0, 2)))
    if rng.integers(0, 2):
        kw["precincts"] = (int(rng.integers(3, 6)),
                           int(rng.integers(3, 6)))
    if rng.integers(0, 2):
        a = 1 << levels
        kw["offsets"] = (a * int(rng.integers(0, 4)),
                         a * int(rng.integers(0, 4)))
    out = decode_jp2(encode_jp2(img, **kw))
    if color:
        assert (out == img).all(), kw
    else:
        assert (out[:, :, 0] == img).all(), kw
