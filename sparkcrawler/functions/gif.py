"""Pure-python GIF codec — no external image libraries.

Decode (:func:`decode_gif_py`) is REAL for the envelope it claims:
GIF87a/GIF89a, first image frame, global or local color table, optional
interlace, any extension blocks skipped per spec. The LZW stream is
fully decompressed (variable code width 3-12 bits, little-endian bit
packing, clear/EOI codes, dictionary growth + reset). Outside the
envelope — a stream with no color table at all, or a corrupt LZW code —
raises loudly; nothing is approximated (same real-or-refused discipline
as the PNG/JPEG paths).

Encode (:func:`encode_gif_py`) is the test oracle: a complete valid
GIF89a stream (logical screen descriptor + global palette + image
descriptor + LZW-compressed indices with sub-block framing + trailer).
GIF is lossless, so tests pin ``decode(encode(px)) == px`` exact-pixel.

Reference behavior anchor: the reference crawler stores media blobs as
opaque bytes and never decodes them (simple_crawler has no image code
path); this module extends the training-data pipeline's mapInPandas
decode stage (SURVEY.md multimodal columns) with a third real codec
beside PNG and baseline JPEG.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- decode --


class _BitReader:
    """LSB-first bit reader over the concatenated LZW sub-block bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0          # bit position
        self.nbits = 8 * len(data)

    def read(self, width: int) -> int | None:
        if self.pos + width > self.nbits:
            return None
        v = 0
        for i in range(width):
            byte = self.data[(self.pos + i) >> 3]
            if byte >> ((self.pos + i) & 7) & 1:
                v |= 1 << i
        self.pos += width
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: codes start at min_code_size+1 bits, dictionary
    seeded with 2^min_code_size roots + CLEAR + EOI, grows to 12 bits,
    resets on CLEAR."""
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _BitReader(data)
    out = bytearray()

    def reset() -> tuple[list[bytes | None], int]:
        table: list[bytes | None] = [bytes([i]) for i in range(clear)]
        table += [None, None]  # CLEAR, EOI placeholders
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = reader.read(width)
        if code is None:
            break  # truncated stream: spec-tolerant, emit what we have
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwK special case
        else:
            raise ValueError(
                f"corrupt GIF LZW stream: code {code} with table size "
                f"{len(table)}"
            )
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _deinterlace(idx: "np.ndarray", h: int) -> "np.ndarray":
    """GIF 4-pass interlace: rows 0,8,16.. then 4,12.. then 2,6.. then
    odd rows."""
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    out = np.empty_like(idx)
    out[order] = idx
    return out


def decode_gif_py(blob: bytes) -> "np.ndarray":
    """First frame of a GIF87a/89a stream as an (h, w, 3) uint8 RGB
    array. Extensions are skipped; interlace is undone; a local color
    table overrides the global one. Raises on anything outside the
    envelope (no palette anywhere, corrupt LZW) — real or refused."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    pos = 6
    _, _, flags, _, _ = struct.unpack_from("<HHBBB", blob, pos)
    pos += 7
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(blob):
        block = blob[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        _, _, w, h, iflags = struct.unpack_from("<HHHHB", blob, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(blob, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise NotImplementedError(
                "GIF frame with neither global nor local color table"
            )
        min_code_size = blob[pos]
        pos += 1
        lzw = bytearray()
        while blob[pos]:
            size = blob[pos]
            lzw += blob[pos + 1 : pos + 1 + size]
            pos += 1 + size
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(min_code_size, bytes(lzw), w * h), np.uint8
        )
        if len(idx) < w * h:  # truncated: pad with background (index 0)
            idx = np.concatenate(
                [idx, np.zeros(w * h - len(idx), np.uint8)]
            )
        idx = idx.reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx, h)
        return ct[np.minimum(idx, len(ct) - 1)]
    raise ValueError("GIF stream contains no image frame")


# ---------------------------------------------------------------- encode --


def _lzw_encode(min_code_size: int, indices: "np.ndarray") -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    codes: list[tuple[int, int]] = []  # (code, width)
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    codes.append((clear, width))
    run = b""
    for v in indices.tobytes():
        cand = run + bytes([v])
        if cand in table:
            run = cand
            continue
        codes.append((table[run], width))
        if next_code < 4096:
            # encoder bumps width when it DEFINES entry 2^w; the decoder
            # (one definition behind at the same stream position) bumps
            # when it defines entry 2^w - 1 — both switch for the same
            # emitted code
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # table full: reset (keeps the decoder's growth in sync)
            codes.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([v])
    if run:
        codes.append((table[run], width))
    codes.append((eoi, width))
    # LSB-first bit packing
    acc = 0
    nbits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif_py(px: "np.ndarray", interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → a complete GIF89a stream. The palette is
    built from the image's distinct colors (≤256 required — this is the
    oracle encoder, not a quantizer)."""
    px = np.asarray(px, np.uint8)
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("encode_gif_py requires <=256 distinct colors")
    bits = max(1, int(len(colors) - 1).bit_length())
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), np.uint8)
    pal[: len(colors)] = colors
    idx = idx.astype(np.uint8).reshape(h, w)
    lzw_rows = idx
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        lzw_rows = idx[order]
    min_code_size = max(2, bits)
    data = _lzw_encode(min_code_size, lzw_rows.reshape(-1))
    sub = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        sub.append(len(chunk))
        sub += chunk
    sub.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
        + pal.tobytes()
        + b"\x2c"
        + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
        )
        + bytes([min_code_size])
        + bytes(sub)
        + b"\x3b"
    )
