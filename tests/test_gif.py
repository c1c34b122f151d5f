"""Pure-python GIF codec tests — exact-pixel, no Spark session needed.

GIF is lossless, so decode(encode(px)) == px is exact; the canonical
1×1 sample pins interop with bytes this repo did not produce."""

import numpy as np
import pytest

from sparkcrawler.functions.gif import (
    decode_gif_py,
    encode_gif_py,
)


def _pal_image(rng, shape, ncolors):
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncolors, shape)]


@pytest.mark.parametrize(
    "shape,ncolors,interlace",
    [
        ((9, 13), 5, False),
        ((16, 16), 250, False),
        ((23, 17), 3, True),
        ((1, 1), 1, False),
        ((64, 48), 256, True),
    ],
)
def test_roundtrip_exact(shape, ncolors, interlace):
    rng = np.random.default_rng(7)
    px = _pal_image(rng, shape, ncolors)
    out = decode_gif_py(encode_gif_py(px, interlace=interlace))
    assert out.dtype == np.uint8 and out.shape == px.shape
    assert (out == px).all()


def test_roundtrip_dictionary_reset():
    """200×300 random indices push the LZW dictionary through every code
    width up to 12 bits and at least one 4096-entry reset."""
    rng = np.random.default_rng(7)
    px = _pal_image(rng, (200, 300), 250)
    assert (decode_gif_py(encode_gif_py(px)) == px).all()


def _split_stream(b: bytes):
    """(header+LSD, palette, image descriptor [10B], lzw+trailer) of an
    encode_gif_py stream."""
    bits = (b[10] & 0x07) + 1
    n_pal = 1 << bits
    pal_end = 13 + 3 * n_pal
    assert b[pal_end] == 0x2C
    return b[:13], b[13:pal_end], b[pal_end : pal_end + 10], b[pal_end + 10 :]


def test_extension_blocks_skipped():
    """A graphic-control extension between the palette and the image
    descriptor must be skipped per spec, not break the frame walk."""
    rng = np.random.default_rng(7)
    px = _pal_image(rng, (10, 10), 250)
    head, pal, desc, data = _split_stream(encode_gif_py(px))
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert (decode_gif_py(head + pal + gce + desc + data) == px).all()


def test_canonical_1x1_sample():
    """The public-domain 1×1 'transparent pixel' GIF89a (GCE + 2-bit
    LZW): decodes to a single black pixel — interop evidence against
    bytes produced by a third-party encoder."""
    tiny = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\xff\xff\xff"
        b"\x21\xf9\x04\x01\x00\x00\x00\x00"
        b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02\x44\x01\x00\x3b"
    )
    out = decode_gif_py(tiny)
    assert out.shape == (1, 1, 3)
    assert (out == 0).all()


def test_local_color_table_follows_descriptor():
    """Move the palette from global to local: the frame must decode
    identically through the local-table path."""
    rng = np.random.default_rng(11)
    px = _pal_image(rng, (6, 6), 4)
    b = encode_gif_py(px)
    head, pal, desc, data = _split_stream(b)
    bits = (head[10] & 0x07) + 1
    head2 = head[:10] + bytes([head[10] & 0x78]) + head[11:13]  # GCT off
    desc2 = desc[:9] + bytes([desc[9] | 0x80 | (bits - 1)])  # LCT on
    assert (decode_gif_py(head2 + desc2 + pal + data) == px).all()


def test_no_palette_refused():
    blob = (
        b"GIF89a" + b"\x02\x00\x02\x00\x00\x00\x00"
        + b"\x2c\x00\x00\x00\x00\x02\x00\x02\x00\x00\x02\x02\x44\x01\x00\x3b"
    )
    with pytest.raises(NotImplementedError):
        decode_gif_py(blob)


def test_not_a_gif_refused():
    with pytest.raises(ValueError):
        decode_gif_py(b"PNG???whatever")


def test_too_many_colors_refused_by_encoder():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(px.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError):
        encode_gif_py(px)
