"""Pure-numpy baseline JPEG codec (functions/jpeg.py): exact-pixel
decode against the in-repo encoder's mathematically expected
reconstruction (4:4:4, 4:2:2, 4:2:0), loud refusal outside the
baseline envelope, and the real_decode mapInPandas pipeline over
mixed PNG+JPEG blobs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparkcrawler.functions.jpeg import (
    decode_jpeg_py,
    encode_jpeg_py,
    encode_jpeg_with_expected,
)


def _rgb_pattern(h, w, seed=0):
    y, x, c = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(3), indexing="ij"
    )
    return ((7 * x + 13 * y + 29 * c + seed) % 256).astype(np.uint8)


def test_gray_roundtrip_exact():
    g = (
        (np.arange(24)[:, None] * 3 + np.arange(40)[None, :] * 2) % 256
    ).astype(np.uint8)
    for q in (50, 75, 90, 100):
        blob, expected = encode_jpeg_with_expected(g, quality=q)
        got = decode_jpeg_py(blob)
        assert got.shape == g.shape
        assert np.array_equal(got, expected), f"quality={q}"


def test_rgb_roundtrip_exact_non_multiple_of_8():
    rgb = _rgb_pattern(19, 37)
    blob, expected = encode_jpeg_with_expected(rgb, quality=75)
    got = decode_jpeg_py(blob)
    assert got.shape == (19, 37, 3)
    assert np.array_equal(got, expected)


def test_smooth_image_near_lossless_at_q100():
    """The codec is lossy by quantization only: at quality 100 a smooth
    gradient must come back (nearly) unchanged — this pins dequant/IDCT
    against the ORIGINAL pixels, not just the encoder's reconstruction."""
    sm = np.clip(
        np.round(
            128.0
            + 40 * np.sin(np.arange(32) / 9.0)[:, None]
            + 30 * np.cos(np.arange(48) / 11.0)[None, :]
        ),
        0,
        255,
    ).astype(np.uint8)
    got = decode_jpeg_py(encode_jpeg_py(sm, quality=100))
    assert int(np.abs(got.astype(int) - sm.astype(int)).max()) <= 1


def test_byte_stuffing_roundtrip():
    """Find an image whose entropy stream contains a stuffed 0xFF byte
    (high-contrast noise makes one quickly) and pin that the decode of a
    stuffed stream is still exact."""
    rng = np.random.RandomState(7)
    for _ in range(64):
        img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
        blob, expected = encode_jpeg_with_expected(img, quality=100)
        if b"\xff\x00" in blob.split(b"\xff\xda", 1)[1]:
            assert np.array_equal(decode_jpeg_py(blob), expected)
            return
    pytest.fail("no test image produced a stuffed entropy byte")


def test_progressive_roundtrip_exact():
    """SOF2 progressive (spectral selection + one successive-
    approximation level: DC Al=1 → DC refine → per-component AC first
    Al=1 → AC refine) decodes bit-exactly to the SAME expected
    reconstruction as the baseline encoding of the same coefficients —
    the refinement machinery must reassemble every coefficient
    exactly, not approximately."""
    for samp in ("444", "422", "420"):
        for h, w in ((16, 16), (17, 23), (33, 31)):
            img = _rgb_pattern(h, w, seed=h + w)
            blob, expected = encode_jpeg_with_expected(
                img, quality=80, subsampling=samp, progressive=True
            )
            base_blob, base_expected = encode_jpeg_with_expected(
                img, quality=80, subsampling=samp
            )
            assert np.array_equal(expected, base_expected)
            got = decode_jpeg_py(blob)
            assert got.shape == (h, w, 3)
            assert np.array_equal(got, expected), f"prog {samp} {h}x{w}"


def test_progressive_gray_and_eob_runs():
    """Grayscale progressive, plus a flat image whose AC scans are one
    long EOB run — exercises the EOBn (run>1) decode path — plus
    high-frequency noise at q95 (dense refinement correction bits)."""
    g = (
        (np.arange(24)[:, None] * 3 + np.arange(40)[None, :] * 2) % 256
    ).astype(np.uint8)
    flat = np.full((64, 64), 130, dtype=np.uint8)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    for img, q in ((g, 75), (flat, 75), (noise, 95)):
        blob, expected = encode_jpeg_with_expected(
            img, quality=q, progressive=True
        )
        assert np.array_equal(decode_jpeg_py(blob), expected)


def test_refuses_arithmetic_sof9():
    blob = encode_jpeg_py(_rgb_pattern(8, 8))
    broken = blob.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg_py(broken)


def test_refuses_multiscan_sequential():
    """A second SOS in a BASELINE (SOF0) stream is out of envelope —
    refused loudly, not misparsed."""
    blob = encode_jpeg_py(_rgb_pattern(8, 8))
    i = blob.find(b"\xff\xda")
    seg_len = int.from_bytes(blob[i + 2 : i + 4], "big")
    sos = blob[i : i + 2 + seg_len]
    doubled = blob[:-2] + sos + b"\x00" + blob[-2:]
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg_py(doubled)


def test_subsampled_roundtrip_exact():
    """4:2:2 and 4:2:0 MCU-interleaved streams decode bit-exactly
    against the encoder's expected reconstruction (box-mean downsample,
    sample-replication upsample), including non-MCU-multiple sizes."""
    for samp in ("422", "420"):
        for h, w in ((16, 16), (17, 23), (3, 5), (33, 31)):
            img = _rgb_pattern(h, w, seed=h + w)
            blob, expected = encode_jpeg_with_expected(
                img, quality=80, subsampling=samp
            )
            got = decode_jpeg_py(blob)
            assert got.shape == (h, w, 3)
            assert np.array_equal(got, expected), f"{samp} {h}x{w}"


def test_refuses_sampling_factors_above_two():
    blob = bytearray(encode_jpeg_py(_rgb_pattern(8, 8)))
    i = bytes(blob).find(b"\xff\xc0")
    blob[i + 11] = 0x33  # first component sampling factors 3x3
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg_py(bytes(blob))


def test_refuses_restart_intervals():
    blob = encode_jpeg_py(_rgb_pattern(8, 8))
    i = blob.find(b"\xff\xda")
    with_dri = blob[:i] + b"\xff\xdd\x00\x04\x00\x10" + blob[i:]
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_py(with_dri)


def test_refuses_truncated_entropy():
    blob = encode_jpeg_py(_rgb_pattern(24, 24))
    with pytest.raises(ValueError):
        decode_jpeg_py(blob[: len(blob) // 2])


def test_real_decode_pipeline_mixed_png_jpeg(spark):
    """real_decode=True through mapInPandas over a corpus mixing full
    PNGs and full baseline JPEGs: every row decodes for real, and the
    feature values match a driver-side decode of the same blobs."""
    from sparkcrawler.functions.jpeg import decode_jpeg_py as dec_j
    from sparkcrawler.functions.media import (
        _pixel_feature,
        decode_media,
        decode_png_py,
        png_full_bytes,
    )

    blobs = {
        "p0": png_full_bytes(12, 9, channels=3, seed=1),
        "p1": png_full_bytes(17, 8, channels=4, seed=2),
        "j0": encode_jpeg_py(_rgb_pattern(14, 11, seed=3), quality=85),
        "j1": encode_jpeg_py(
            ((np.arange(9)[:, None] + np.arange(21)[None, :]) % 256).astype(
                np.uint8
            ),
            quality=95,
        ),
        # progressive (SOF2) rides the same real_decode path
        "j2": encode_jpeg_with_expected(
            _rgb_pattern(13, 18, seed=5), quality=80, progressive=True
        )[0],
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": list(blobs), "blob": list(blobs.values())}
        )
    )
    got = {
        r["media_id"]: (r["format"], r["feat_norm"])
        for r in decode_media(df, real_decode=True).collect()
    }
    assert set(got) == set(blobs)
    for mid, blob in blobs.items():
        px = decode_png_py(blob) if mid.startswith("p") else dec_j(blob)
        feat = _pixel_feature(px, 16)
        expect_norm = sum(v * v for v in feat) ** 0.5
        fmt, norm = got[mid]
        assert fmt == ("png" if mid.startswith("p") else "jpeg")
        assert norm == pytest.approx(expect_norm, abs=1e-12)
