"""Multimodal media operators: header sniffing (real), the
mapInPandas decode pipeline (schema/batching real, pixel decode
stubbed), and the synthetic media table round-trip."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from sparkcrawler.functions.media import (
    DECODE_SCHEMA,
    decode_image_batches,
    decode_media,
    gif_bytes,
    png_bytes,
    sniff_media_py,
    sniff_media_udf,
    synth_media_rows,
    wav_bytes,
)

# ------------------------------------------------------------- sniffer --


def test_sniff_png():
    m = sniff_media_py(png_bytes(640, 480))
    assert (m["format"], m["width"], m["height"]) == ("png", 640, 480)


def test_sniff_gif():
    m = sniff_media_py(gif_bytes(320, 200))
    assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)


def test_sniff_wav():
    m = sniff_media_py(wav_bytes(44100))
    assert (m["format"], m["sample_rate"]) == ("wav", 44100)
    assert m["width"] is None


def test_sniff_jpeg_sof_walk():
    # FFD8 + APP0 segment + SOF0 with height=77 width=99
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", 77, 99
    ) + b"\x03" + b"\x00" * 9
    m = sniff_media_py(b"\xff\xd8" + app0 + sof0)
    assert (m["format"], m["width"], m["height"]) == ("jpeg", 99, 77)


def test_sniff_bmp():
    hdr = b"BM" + b"\x00" * 16 + struct.pack("<ii", 120, -60)
    m = sniff_media_py(hdr)
    assert (m["format"], m["width"], m["height"]) == ("bmp", 120, 60)


def test_sniff_garbage_and_null():
    assert sniff_media_py(b"\x00\x01\x02")["format"] == "unknown"
    assert sniff_media_py(None) == {
        "format": "unknown", "width": None, "height": None,
        "sample_rate": None, "byte_len": 0,
    }


def test_sniff_udf_batched(spark):
    rows = synth_media_rows(60)
    df = spark.createDataFrame(
        [(r["media_id"], r["blob"]) for r in rows],
        "media_id string, blob binary",
    )
    got = {
        r["media_id"]: r["m"]["format"]
        for r in df.select("media_id", sniff_media_udf("blob").alias("m")).collect()
    }
    for i, r in enumerate(rows):
        want = ["png", "gif", "wav", "jpeg"][i % 4]
        assert got[r["media_id"]] == want


def test_sniff_jpeg_fill_bytes_and_standalone_markers():
    """Real JPEGs pad with 0xFF fill bytes and contain length-less
    standalone markers (TEM, RST0-7); the walk must skip both."""
    from sparkcrawler.functions.media import jpeg_bytes

    m = sniff_media_py(jpeg_bytes(99, 77))
    assert (m["format"], m["width"], m["height"]) == ("jpeg", 99, 77)
    # RST marker + multiple fill bytes between segments
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof2 = b"\xff\xc2" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", 11, 22
    ) + b"\x03" + b"\x00" * 9
    blob = b"\xff\xd8" + app0 + b"\xff\xff\xff\xd3" + sof2
    m = sniff_media_py(blob)
    assert (m["width"], m["height"]) == (22, 11)
    # truncated after a fill byte: no crash, no dims
    m = sniff_media_py(b"\xff\xd8\xff")
    assert m["format"] == "jpeg" and m["width"] is None


def test_sniff_wav_fmt_not_first_chunk():
    """WAVs with a JUNK/LIST chunk before 'fmt ' must still parse the
    sample rate (fixed-offset reads fail on these)."""
    junk = b"JUNK" + struct.pack("<I", 5) + b"\x00" * 5 + b"\x00"  # odd size → pad byte
    fmt = b"fmt " + struct.pack("<IHHI", 16, 1, 2, 22050)
    blob = b"RIFF" + struct.pack("<I", 50) + b"WAVE" + junk + fmt
    m = sniff_media_py(blob)
    assert (m["format"], m["sample_rate"]) == ("wav", 22050)
    # no fmt chunk at all → wav with NULL rate, no crash
    m = sniff_media_py(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    assert (m["format"], m["sample_rate"]) == ("wav", None)


# ------------------------------------------------------ decode pipeline --


def test_decode_media_schema_and_determinism(spark):
    rows = synth_media_rows(40)
    df = spark.createDataFrame(
        [(r["media_id"], r["blob"]) for r in rows],
        "media_id string, blob binary",
    ).repartition(4)
    out = decode_media(df)
    assert out.schema == DECODE_SCHEMA
    got = {r["media_id"]: r for r in out.collect()}
    assert len(got) == 40  # one feature row per media row, across partitions
    # deterministic: driver-side recompute of one batch matches
    local = next(
        decode_image_batches(
            iter([pd.DataFrame({"media_id": [rows[0]["media_id"]],
                                "blob": [rows[0]["blob"]]})])
        )
    )
    r0 = got[rows[0]["media_id"]]
    assert r0["feat_dim"] == int(local["feat_dim"].iloc[0]) == 16
    assert r0["feat_norm"] == pytest.approx(float(local["feat_norm"].iloc[0]))
    assert r0["format"] == "png"


def test_real_decode_stubbed_for_codec_formats():
    """Variants outside the implemented codec envelopes (here:
    arithmetic-coded JPEG, SOF9) must still refuse a real decode
    loudly — never approximate silently."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof9 = (
        b"\xff\xc9" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", 8, 8) + b"\x03" + b"\x00" * 9
    )
    arith = b"\xff\xd8" + app0 + sof9 + b"\xff\xd9"
    pdf = pd.DataFrame({"media_id": ["p0"], "blob": [arith]})
    with pytest.raises(NotImplementedError):
        next(decode_image_batches(iter([pdf]), real_decode=True))


def test_real_decode_gif_exact_feature():
    """GIF real decode through the mapInPandas body: the average-pool
    feature of decode(encode(px)) must equal the feature computed from
    the source pixels directly (GIF is lossless)."""
    import numpy as np

    from sparkcrawler.functions.gif import encode_gif_py
    from sparkcrawler.functions.media import _pixel_feature

    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    px = pal[rng.integers(0, 16, (24, 33))]
    pdf = pd.DataFrame(
        {"media_id": ["g0"], "blob": [encode_gif_py(px, interlace=True)]}
    )
    out = next(decode_image_batches(iter([pdf]), real_decode=True, dim=8))
    want = _pixel_feature(px, 8)
    norm = sum(x * x for x in want) ** 0.5
    assert out.iloc[0]["format"] == "gif"
    assert abs(out.iloc[0]["feat_norm"] - norm) < 1e-9


# --------------------------- round 4: real PNG pixel decode (zlib) -------


def test_png_decode_exact_pixels_all_filters():
    """decode_png_py must invert every scanline filter (0..4) exactly:
    encode the deterministic pattern with each filter cycling, decode,
    compare pixel-for-pixel."""
    import numpy as np

    from sparkcrawler.functions.media import (
        decode_png_py, png_full_bytes, png_pixels,
    )

    for channels in (3, 4):
        for filters in (None, [0], [1], [2], [3], [4], [4, 3, 1]):
            blob = png_full_bytes(23, 17, channels, seed=5, filters=filters)
            px = decode_png_py(blob)
            assert px.shape == (17, 23, channels)
            assert np.array_equal(px, png_pixels(23, 17, channels, seed=5)), (
                channels, filters,
            )


def test_png_full_bytes_sniffs_like_a_png():
    from sparkcrawler.functions.media import png_full_bytes, sniff_media_py

    meta = sniff_media_py(png_full_bytes(40, 30))
    assert (meta["format"], meta["width"], meta["height"]) == ("png", 40, 30)


def test_png_decode_refuses_unsupported_variants():
    import struct as _s

    from sparkcrawler.functions.media import _PNG_SIG, decode_png_py

    # palette color type (3) → explicit refusal, not garbage pixels
    ihdr = _s.pack(">II", 4, 4) + bytes([8, 3, 0, 0, 0])
    blob = _PNG_SIG + _s.pack(">I", 13) + b"IHDR" + ihdr + b"\x00" * 4
    with pytest.raises(NotImplementedError):
        decode_png_py(blob)
    with pytest.raises(ValueError):
        decode_png_py(b"NOTAPNG")


def test_real_decode_pipeline_over_spark(spark):
    """End-to-end: real_decode=True through mapInPandas on a PNG-only
    table — features are the average-pool of the true pixels."""
    import numpy as np

    from sparkcrawler.functions.media import (
        decode_media, png_full_bytes, png_pixels, _pixel_feature,
    )

    rows = [
        {"media_id": f"p{i}", "blob": png_full_bytes(16 + i, 12 + i, 3, seed=i)}
        for i in range(6)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows), "media_id string, blob binary"
    ).repartition(3)
    got = {
        r["media_id"]: r
        for r in decode_media(df, real_decode=True).collect()
    }
    assert len(got) == 6
    for i in range(6):
        feat = _pixel_feature(png_pixels(16 + i, 12 + i, 3, seed=i), 16)
        want = float(np.sqrt(sum(x * x for x in feat)))
        assert got[f"p{i}"]["feat_norm"] == pytest.approx(want, abs=1e-12)
        assert got[f"p{i}"]["format"] == "png"
