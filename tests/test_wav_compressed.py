"""Compressed WAV decode paths (synth/wavcodec.py): G.711 μ-law/A-law
and IMA ADPCM — the compressed audio a web corpus actually contains —
plus their integration through the audio_features operator."""

import numpy as np
import pytest

from effocr_spark.synth.wavcodec import (ALAW2LIN, ULAW2LIN, _lin2alaw,
                                         _lin2ulaw, decode_wav,
                                         encode_wav, encode_wav_adpcm,
                                         encode_wav_alaw, encode_wav_ulaw)


def _sig(n=4000, seed=3):
    rng = np.random.RandomState(seed)
    return (np.sin(np.linspace(0, 40, n)) * 12000
            + rng.standard_normal(n) * 300).astype(np.int16)


def test_g711_byte_roundtrip_invariants():
    """encode(decode(b)) == b for every byte — the strongest
    self-consistency pin for a companded codec. μ-law byte 0x7F is the
    spec's negative zero: it decodes to 0, which canonically re-encodes
    to 0xFF."""
    for b in range(256):
        if b != 0x7F:
            assert _lin2ulaw(int(ULAW2LIN[b])) == b
        assert _lin2alaw(int(ALAW2LIN[b])) == b
    assert _lin2ulaw(int(ULAW2LIN[0x7F])) == 0xFF
    # known G.711 extremes
    assert ULAW2LIN[0x00] == -32124 and ULAW2LIN[0x80] == 32124
    assert ULAW2LIN[0xFF] == 0


@pytest.mark.parametrize("enc,maxrel", [(encode_wav_ulaw, 0.05),
                                        (encode_wav_alaw, 0.07)])
def test_g711_signal_roundtrip(enc, maxrel):
    sig = _sig()
    out, rate = decode_wav(enc(sig, rate=8000))
    assert rate == 8000 and out.shape == (len(sig), 1)
    rel = (np.abs(out[:, 0].astype(float) - sig.astype(float))
           / np.maximum(np.abs(sig), 256))
    assert float(rel.max()) < maxrel  # companding tolerance


@pytest.mark.parametrize("ch", [1, 2])
def test_ima_adpcm_roundtrip(ch):
    sig = _sig()
    s = np.stack([sig, (sig // 2).astype(np.int16)], axis=1) if ch == 2 \
        else sig
    blob = encode_wav_adpcm(s, rate=16000)
    out, rate = decode_wav(blob)
    assert rate == 16000 and out.shape == (len(sig), ch)
    ref = s if ch == 2 else s[:, None]
    err = np.abs(out.astype(float) - ref.astype(float))
    # 4-bit ADPCM on a smooth-ish signal: small mean error, bounded peaks
    assert float(err.mean()) < 120.0
    assert float(err.max()) < 4000.0


def test_ima_adpcm_fact_trims_padding():
    """A signal that doesn't fill the last block: the fact chunk must
    trim the decoder output to the true sample count."""
    sig = _sig(1234)
    out, _ = decode_wav(encode_wav_adpcm(sig, rate=8000,
                                         samples_per_block=249))
    assert out.shape[0] == 1234


def test_corrupt_adpcm_quarantines():
    blob = bytearray(encode_wav_adpcm(_sig(600), rate=8000))
    i = blob.find(b"data") + 8 + 2  # step-index byte of block 0
    blob[i + 0] = 200  # out-of-range step index
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(blob))


def test_float_pcm_still_a_seam():
    blob = bytearray(encode_wav(np.ones(100, np.int16), rate=8000))
    blob[20] = 3  # IEEE float tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(blob))


def test_audio_features_decodes_compressed(spark):
    from effocr_spark.operators.multimodal import audio_features

    sig = _sig(1600)
    rows = [(0, bytearray(encode_wav(sig, rate=16000))),
            (1, bytearray(encode_wav_ulaw(sig, rate=8000))),
            (2, bytearray(encode_wav_alaw(sig, rate=8000))),
            (3, bytearray(encode_wav_adpcm(sig, rate=16000)))]
    df = spark.createDataFrame(rows, "id long, media binary")
    out = {r["id"]: r for r in audio_features(df).collect()}
    assert all(out[i]["ok"] for i in range(4))
    assert out[1]["sample_rate"] == 8000 and out[3]["sample_rate"] == 16000
    # compressed paths land within companding error of the PCM truth
    for i in (1, 2, 3):
        assert abs(out[i]["rms"] - out[0]["rms"]) / out[0]["rms"] < 0.05
