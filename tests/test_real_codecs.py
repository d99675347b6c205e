"""Real-container codecs (r5): baseline T.81 JPEG, MJPEG marker walk,
RIFF/WAVE PCM — planted-content tests proving the bytes are genuine
containers parsed by genuine parsers, not stand-ins."""

import struct

import numpy as np
import pytest

import nessie_spark.lakehouse.kernels as K
from nessie_spark import synth
from nessie_spark.lakehouse import jpegcodec as J


def _img(seed=3, h=24, w=40):
    return synth.make_pixels(seed, 1, h, w)


# --- JPEG -------------------------------------------------------------------


def test_jpeg_stream_structure():
    """The bytes are a structurally valid JFIF file: SOI, APP0/JFIF, two
    DQTs, SOF0 with the true dimensions, four DHTs, SOS, EOI."""
    px = _img(h=23, w=41)
    data = K.encode_jpeg(px)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert data[2:4] == b"\xff\xe0" and data[6:11] == b"JFIF\x00"
    # find SOF0 and read dims straight from the header
    i = data.index(b"\xff\xc0")
    prec, h, w, nc = data[i + 4], *struct.unpack(">HH", data[i + 5 : i + 9]), data[i + 9]
    assert (prec, h, w, nc) == (8, 23, 41, 3)
    assert data.count(b"\xff\xc4") >= 4  # DHT segments
    assert b"\xff\xda" in data  # SOS


def test_jpeg_roundtrip_psnr_gate():
    for seed, h, w in ((1, 16, 16), (2, 33, 47), (3, 64, 64), (4, 9, 21)):
        px = _img(seed, h, w)
        dec = K.decode_jpeg(K.encode_jpeg(px))
        assert dec.shape == px.shape
        assert K.psnr(px, dec) >= 40.0, (seed, h, w)


def test_jpeg_planted_solid_color_survives():
    """A solid-color image must decode to (nearly) the same solid color —
    DC-only content has no quantization loss beyond rounding."""
    px = np.full((16, 16, 3), (200, 40, 90), dtype=np.uint8)
    dec = K.decode_jpeg(K.encode_jpeg(px))
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


def test_jpeg_decoder_reads_tables_from_stream():
    """The decoder dequantizes with the DQT values carried IN the stream:
    re-encoding at two qualities decodes to different files that each
    roundtrip — impossible if tables were hardcoded module constants."""
    px = _img()
    lo = J.encode_jpeg_real(px, quality=60)
    hi = J.encode_jpeg_real(px, quality=99)
    assert lo != hi and len(lo) < len(hi)
    p_lo = K.psnr(px, J.decode_jpeg_real(lo))
    p_hi = K.psnr(px, J.decode_jpeg_real(hi))
    assert p_hi > p_lo > 20.0


def test_jpeg_rejects_progressive_and_garbage():
    px = _img()
    data = bytearray(K.encode_jpeg(px))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        J.decode_jpeg_real(bytes(data))
    with pytest.raises(NotImplementedError):
        K.decode_jpeg(b"RIFFxxxxWAVE")


def test_legacy_njpg_still_decodable():
    px = _img()
    legacy = (
        K._NJPG_MAGIC
        + struct.pack(">HH", px.shape[0], px.shape[1])
        + __import__("zlib").compress(
            (px.astype(np.int32) // 4 * 4 + 2).clip(0, 255).astype(np.uint8).tobytes()
        )
    )
    dec = K.decode_jpeg(legacy)
    assert dec.shape == px.shape and K.psnr(px, dec) >= 40.0


# --- MJPEG ------------------------------------------------------------------


def test_mjpeg_marker_walk_and_sampling():
    frames = [_img(s, 16, 16) for s in range(6)]
    mj = J.encode_mjpeg(frames)
    assert J.mjpeg_frame_count(mj) == 6
    sampled = K.decode_video_frames(mj, every_k=3)  # kernel FFD8 dispatch
    assert len(sampled) == 2
    for got, want in zip(sampled, (frames[0], frames[3])):
        assert K.psnr(want, got) >= 40.0


def test_mjpeg_walk_is_not_substring_split():
    """Plant FFD8 inside a COM segment payload of frame 0 — a naive
    substring split would see 3 frames; the marker walk sees 2."""
    f0 = bytearray(J.encode_jpeg_real(_img(1, 8, 8)))
    com = b"\xff\xfe" + struct.pack(">H", 6) + b"\xff\xd8\xff\xd9"
    f0 = f0[:2] + com + f0[2:]
    mj = bytes(f0) + J.encode_jpeg_real(_img(2, 8, 8))
    assert mj.count(b"\xff\xd8") >= 3
    assert J.mjpeg_frame_count(mj) == 2


def test_legacy_nvid_still_decodable():
    frames = [_img(s, 8, 8) for s in range(4)]
    data = K.encode_video(frames)
    out = K.decode_video_frames(data, every_k=2)
    assert len(out) == 2 and (out[0] == frames[0]).all()


# --- WAV --------------------------------------------------------------------


def test_wav_roundtrip_lossless():
    rng = np.random.default_rng(11)
    pcm = rng.integers(-32768, 32768, 4000, dtype=np.int16)
    data = K.encode_wav(pcm, 22050)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    got, rate = K.decode_wav(data)
    assert rate == 22050 and (got == pcm).all()


def test_wav_chunk_walk_tolerates_extra_chunks():
    pcm = np.arange(-100, 100, dtype=np.int16)
    data = bytearray(K.encode_wav(pcm, 8000))
    # splice a LIST chunk (odd-length, so padding is exercised) after fmt
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    data = data[:36] + extra + data[36:]
    data[4:8] = struct.pack("<I", struct.unpack("<I", data[4:8])[0] + len(extra))
    got, rate = K.decode_wav(bytes(data))
    assert rate == 8000 and (got == pcm).all()


def test_wav_stereo_downmix_and_compressed_gate():
    pcm = np.array([100, 300], dtype=np.int16)
    stereo = (
        b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 8)
        + np.array([100, 300, -100, 500], dtype=np.int16).tobytes()
    )
    got, _ = K.decode_wav(stereo)
    assert got.tolist() == [200, 200]
    mp3ish = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 85, 1, 8000, 8000, 1, 16)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        K.decode_wav(mp3ish)


def test_wav_planted_sine_features():
    """A planted full-scale 100-period sine over 4000 samples: RMS within
    1% of 1/sqrt(2); 199 sign changes (2 per period, but sample 0 is +0
    and the 200th crossing lands exactly at t=4000, outside the
    window)."""
    t = np.arange(4000)
    pcm = np.round(np.sin(2 * np.pi * 100 * t / 4000) * 32767.0).astype(np.int16)
    got, rate = K.decode_wav(K.encode_wav(pcm, 16000))
    rms, zc = K.audio_features(got.astype(np.float32) / 32768.0)
    assert abs(rms - 1 / np.sqrt(2)) < 0.01
    assert zc == 199


# --- the multimodal queries over the real bytes -----------------------------


def test_multimodal_queries_real_bytes(spark):
    from nessie_spark.operators.maintenance import (
        multimodal_audio_features, multimodal_frame_sample,
    )

    fs = multimodal_frame_sample(spark, "/root/testdata/sf0.001").collect()
    assert len(fs) == 64
    for r in fs:
        assert r.n_sampled == (r.n_frames + 2) // 3
        assert len(r.digests.split(",")) == r.n_sampled
    af = multimodal_audio_features(spark, "/root/testdata/sf0.001").collect()
    assert len(af) == 64 and all(r.sample_rate == 16000 for r in af)
    # planted amplitude ladder: rms tracks amp/sqrt(2) per id class
    for r in af:
        i = int(r.audio_id.split("-")[1])
        amp = 0.2 + (i % 5) * 0.15
        assert abs(r.rms - amp / np.sqrt(2)) < 0.02, (r.audio_id, r.rms)


def test_encoder_recon_bit_identical_to_decode():
    """The reencode_verify fast path's contract: the encoder's own
    reconstruction equals entropy-decoding the stream, bit for bit."""
    for seed, h, w in ((1, 16, 16), (2, 33, 47), (5, 23, 41), (9, 64, 64)):
        px = _img(seed, h, w)
        data, recon = J.encode_jpeg_with_recon(px)
        assert (J.decode_jpeg_real(data) == recon).all()
        assert J.encode_jpeg_real(px) == data  # same bytes either way


def test_reencode_verify_jpeg_uses_gate():
    datas, fmts = [], []
    for s in range(20):
        px = _img(s, 24, 24)
        datas.append(K.encode_jpeg(px))
        fmts.append("jpeg")
    out, mn = K.reencode_verify(datas, fmts)
    assert mn >= 40.0 and len(out) == 20
    for e in out:
        assert e[:2] == b"\xff\xd8"
