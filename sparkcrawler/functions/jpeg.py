"""Pure-numpy JPEG (JFIF) codec — no external image libraries.

The decode side (:func:`decode_jpeg_py`) is the REAL thing for the
envelope it claims: baseline sequential DCT (SOF0, single interleaved
scan) AND progressive DCT (SOF2, Huffman — spectral selection and
successive approximation, DC and AC first + refinement scans, EOB
runs, per T.81 G.1.2 with the same control flow libjpeg's phuff
decoder pins), 8-bit samples, 1-component grayscale or 3-component
YCbCr with sampling factors 1..2 per axis (4:4:4, 4:2:2, 4:4:0,
4:2:0 — MCU-interleaved per T.81 A.2.3, non-interleaved progressive
AC scans over each component's own ceil-block grid per A.2.2;
subsampled chroma upsamples by sample replication). Everything
outside that envelope — arithmetic coding, sampling factors above 2,
restart markers, 12-bit, multi-scan SEQUENTIAL streams — raises
``NotImplementedError`` loudly: the decode is real or refused, never
approximated (same discipline as the PNG path in
:mod:`sparkcrawler.functions.media`).

The encode side (:func:`encode_jpeg_py`) exists as the test oracle: it
emits a complete valid JFIF stream (DQT + SOF + DHT + SOS + entropy
data with byte stuffing + EOI) for the same envelope — baseline, or
with ``progressive=True`` a SOF2 stream whose scan script exercises
both progressive mechanisms (DC Al=1 first scan → DC refinement →
per-component AC 1..63 at Al=1 → AC refinement with buffered
correction bits and EOB runs, mirroring libjpeg's encode_mcu_AC_*
emission order) — and :func:`encode_jpeg_with_expected` additionally
returns the mathematically expected reconstruction (dequantize + IDCT
+ level shift + color transform of the exact coefficients it
quantized), so tests pin the decoder's output EXACT-PIXEL against an
independent computation of what those bytes mean — JPEG is lossy, but
decode(encode(x)) is deterministic, and progressive/baseline encodings
of the same image share one expected reconstruction.

Reference behavior anchor: the reference crawler stores media blobs as
opaque bytes and never decodes them (simple_crawler has no image code
path at all); this module is part of the training-data-pipeline
extension (SURVEY.md multimodal columns), giving the mapInPandas decode
stage a second real codec beside PNG.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables --

ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex-K luminance/chrominance quantization tables (quality 50 base).
QTABLE_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QTABLE_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)


def scaled_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (1-100) of an Annex-K base table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _dct_basis() -> np.ndarray:
    """M[u, x] = c(u)/2 · cos((2x+1)uπ/16): F = M f Mᵀ, f = Mᵀ F M."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_M = _dct_basis()


def _idct_block(coeffs: np.ndarray) -> np.ndarray:
    """8×8 dequantized coefficients → spatial samples (float64)."""
    return _M.T @ coeffs.astype(np.float64) @ _M


# -------------------------------------------------------------- huffman --


class _CanonicalHuffman:
    """Canonical Huffman table from a DHT (bits, huffval) spec — exactly
    the construction of ITU T.81 Annex C."""

    def __init__(self, bits: list[int], huffval: list[int]):
        assert len(bits) == 16
        self.lookup: dict[tuple[int, int], int] = {}
        self.encode: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                sym = huffval[k]
                self.lookup[(length, code)] = sym
                self.encode[sym] = (length, code)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a de-stuffed entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted mid-symbol")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _CanonicalHuffman) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG entropy data")


def _extend(v: int, size: int) -> int:
    """DIFF/AC value extension (T.81 F.2.2.1): ``size``-bit magnitude
    bits → signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --------------------------------------------------------------- decoder --


def _ac_refine_block(
    reader: "_BitReader",
    ac_table: "_CanonicalHuffman",
    zz: np.ndarray,
    lo: int,
    hi: int,
    al: int,
    eobrun: int,
) -> int:
    """Progressive AC successive-approximation refinement for one block
    (T.81 G.1.2.3; control flow mirrors libjpeg's decode_mcu_AC_refine).
    ``zz`` holds the block's zigzag-order coefficients and is refined in
    place; returns the updated EOB run count. Within an EOB run,
    already-nonzero coefficients still consume one correction bit each."""
    p1, m1 = 1 << al, -(1 << al)
    k = lo
    if eobrun == 0:
        while k <= hi:
            rs = reader.decode_symbol(ac_table)
            r, s = rs >> 4, rs & 0x0F
            v = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                v = p1 if reader.read_bit() else m1
            # advance over already-nonzero coefficients, appending their
            # correction bits; count down r zero-history positions
            while k <= hi:
                if zz[k] != 0:
                    if reader.read_bit() and (zz[k] & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if v and k <= hi:
                zz[k] = v
            k += 1
    if eobrun > 0:
        # remainder of the band inside an EOB run: correction bits only
        while k <= hi:
            if zz[k] != 0 and reader.read_bit() and (zz[k] & p1) == 0:
                zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def decode_jpeg_py(blob: bytes) -> np.ndarray:
    """Decode a baseline JFIF blob to an (h, w) uint8 array (grayscale)
    or (h, w, 3) uint8 RGB array. See the module docstring for the
    envelope; anything outside it raises ``NotImplementedError``,
    malformed bytes raise ``ValueError``."""
    b = bytes(blob)
    if not b.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")

    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _CanonicalHuffman] = {}
    ac_tables: dict[int, _CanonicalHuffman] = {}
    frame = None        # (height, width, comps, progressive)
    scans: list = []    # (scan_comps, Ss, Se, Ah, Al, entropy) per SOS

    i = 2
    while i + 1 < len(b):
        if b[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        while i < len(b) and b[i] == 0xFF:
            i += 1
        marker = b[i]
        i += 1
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", b[i : i + 2])
        seg = b[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                qtables[tq] = q.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                huffval = list(seg[p + 17 : p + 17 + n])
                table = _CanonicalHuffman(bits, huffval)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG samples")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            comps = []
            for c in range(ncomp):
                cid, hv, qid = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if ncomp == 1:
                    # single-component scans are non-interleaved (T.81
                    # A.2.2): the MCU is one block, factors are moot
                    hs = vs = 1
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hs}x{vs} — only 1..2 "
                        "(4:4:4 / 4:2:2 / 4:4:0 / 4:2:0) are implemented"
                    )
                comps.append((cid, qid, hs, vs))
            frame = (height, width, comps, marker == 0xC2)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}: extended/"
                "lossless/arithmetic) — only SOF0 baseline and SOF2 "
                "progressive (Huffman) are implemented"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
            if ri != 0:
                raise NotImplementedError("JPEG restart intervals")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid = seg[1 + 2 * c]
                dc_id, ac_id = seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 0x0F
                scan.append((cid, dc_id, ac_id))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            # entropy data runs to the next real marker (un-stuff FF00)
            p = i + seglen
            raw = bytearray()
            while p < len(b) - 1:
                if b[p] == 0xFF:
                    if b[p + 1] == 0x00:
                        raw.append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= b[p + 1] <= 0xD7:
                        raise NotImplementedError("JPEG restart markers")
                    break
                raw.append(b[p])
                p += 1
            scans.append((scan, ss, se, ah, al, bytes(raw)))
            i = p
            continue
        i += seglen

    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS/entropy data")
    height, width, comps, progressive = frame
    if not progressive and len(scans) > 1:
        raise NotImplementedError(
            "multi-scan sequential JPEG — baseline decode expects one "
            "interleaved scan (progressive SOF2 multi-scan is supported)"
        )
    qid_of = {cid: qid for cid, qid, _, _ in comps}
    factors = {cid: (hs, vs) for cid, _, hs, vs in comps}
    ncomp = len(comps)
    hmax = max(hs for _, _, hs, _ in comps)
    vmax = max(vs for _, _, _, vs in comps)
    for cid, (hs, vs) in factors.items():
        if hmax % hs or vmax % vs:
            raise NotImplementedError(
                f"non-integer JPEG subsampling ratio ({hs}x{vs} vs "
                f"max {hmax}x{vmax})"
            )
    # MCU grid covers the image at max-factor resolution; each MCU
    # carries hs*vs blocks of each component, row-major (T.81 A.2.3)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    # coefficient accumulation (zigzag order) per component over the
    # MCU-padded block grid; progressive scans refine these in place,
    # the single baseline scan fills them in one pass — one shared
    # dequantize+IDCT tail either way
    coeff = {
        cid: np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
        for cid, (hs, vs) in factors.items()
    }

    def _blocks_of(scan_comps, interleaved):
        """Block traversal order for one scan: MCU-interleaved (T.81
        A.2.3) or single-component raster over its OWN ceil-block grid
        (A.2.2 — non-interleaved dims are NOT MCU-padded)."""
        if interleaved:
            for my in range(mcuy):
                for mx in range(mcux):
                    for cid, dc_id, ac_id in scan_comps:
                        hs, vs = factors[cid]
                        for vy in range(vs):
                            for vx in range(hs):
                                yield cid, dc_id, ac_id, my * vs + vy, mx * hs + vx
        else:
            cid, dc_id, ac_id = scan_comps[0]
            hs, vs = factors[cid]
            ch = (height * vs + vmax - 1) // vmax
            cw = (width * hs + hmax - 1) // hmax
            for by in range((ch + 7) // 8):
                for bx in range((cw + 7) // 8):
                    yield cid, dc_id, ac_id, by, bx

    for scan_comps, ss, se, ah, al, entropy in scans:
        if not progressive:
            ss, se, ah, al = 0, 63, 0, 0
        if ss > 0 and len(scan_comps) > 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError(f"bad spectral selection {ss}..{se}")
        if progressive and ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        reader = _BitReader(entropy)
        pred = {cid: 0 for cid, _, _ in scan_comps}
        eobrun = 0
        is_dc = ss == 0
        interleaved = len(scan_comps) > 1 or (not progressive)
        # sequential scans code DC+AC together; progressive DC scans
        # stop at Se=0 and AC scans start at Ss>=1
        for cid, dc_id, ac_id, by, bx in _blocks_of(scan_comps, interleaved):
            zz = coeff[cid][by, bx]
            if is_dc and ah == 0:
                t = reader.decode_symbol(dc_tables[dc_id])
                diff = _extend(reader.read_bits(t), t)
                pred[cid] += diff
                zz[0] = pred[cid] << al
            elif is_dc:
                # DC successive-approximation refinement: one bit/block
                if reader.read_bit():
                    zz[0] |= 1 << al
            if not progressive:
                lo, hi = 1, 63
            elif is_dc:
                continue
            else:
                lo, hi = ss, se
            if progressive and ah > 0:
                eobrun = _ac_refine_block(
                    reader, ac_tables[ac_id], zz, lo, hi, al, eobrun
                )
                continue
            # first (or sequential full) AC pass
            if eobrun > 0:
                eobrun -= 1
                continue
            k = lo
            while k <= hi:
                rs = reader.decode_symbol(ac_tables[ac_id])
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:  # ZRL: sixteen zeros
                        k += 16
                        continue
                    if progressive:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                    break  # EOB
                k += r
                if k > hi:
                    raise ValueError("AC run past band end")
                zz[k] = _extend(reader.read_bits(s), s) << al
                k += 1

    planes = {}
    for cid, (hs, vs) in factors.items():
        plane = np.zeros((mcuy * vs * 8, mcux * hs * 8))
        q = qtables[qid_of[cid]]
        for by in range(mcuy * vs):
            for bx in range(mcux * hs):
                block = np.zeros(64, dtype=np.int64)
                block[ZIGZAG] = coeff[cid][by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct_block(block.reshape(8, 8) * q) + 128.0
                )
        planes[cid] = plane

    # crop each component to its own resolution, then upsample by
    # sample replication (the encoder's expected-reconstruction uses
    # the identical np.repeat, so round-trips are exact-pixel)
    full = []
    for cid, _, hs, vs in comps:
        ch = (height * vs + vmax - 1) // vmax
        cw = (width * hs + hmax - 1) // hmax
        p = planes[cid][:ch, :cw]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:height, :width])
    if ncomp == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(np.stack(full, axis=-1))


# --------------------------------------------------------------- encoder --


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF color transform (float64 in, float64 out, NOT rounded — the
    encoder rounds once when it level-shifts into blocks)."""
    r, g, b = (rgb[..., 0].astype(np.float64),
               rgb[..., 1].astype(np.float64),
               rgb[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF inverse color transform → rounded, clamped uint8 RGB."""
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _size_of(v: int) -> int:
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s (T.81)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _flat_tables():
    """Valid (deliberately simple) canonical Huffman specs: all 12 DC
    size categories at 4 bits; every (run, size) AC symbol plus EOB and
    ZRL at 9 bits. Suboptimal compression, fully valid JPEG — the
    decoder reads whatever DHT declares."""
    dc_bits = [0] * 16
    dc_bits[3] = 12  # twelve 4-bit codes (12 <= 2^4 - 1, all-ones unused)
    dc_vals = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ] + [
        r << 4 for r in range(1, 15)  # EOBn (progressive EOB runs of 2^r..)
    ]
    ac_syms = sorted(set(ac_syms))
    ac_bits = [0] * 16
    ac_bits[8] = len(ac_syms)  # 176 nine-bit codes (<= 2^9 - 1)
    return (dc_bits, dc_vals), (ac_bits, ac_syms)


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    zz = table.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz


_SUBSAMPLING_FACTORS = {
    # component (h, v) sampling factors for (Y, Cb, Cr)
    "444": [(1, 1), (1, 1), (1, 1)],
    "422": [(2, 1), (1, 1), (1, 1)],
    "420": [(2, 2), (1, 1), (1, 1)],
}


def _box_downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Mean over fh×fv windows (edge-replicated to whole windows) —
    the chroma downsample for 4:2:2 / 4:2:0 encoding."""
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fv) * fv, -(-w // fh) * fh
    padded = np.zeros((ph, pw))
    padded[:h, :w] = plane
    if w < pw:
        padded[:h, w:] = plane[:, -1:]
    if h < ph:
        padded[h:, :] = padded[h - 1 : h, :]
    return padded.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))


def _emit_eobrun(writer: _BitWriter, ac_table: _CanonicalHuffman,
                 state: dict) -> None:
    """Flush a pending progressive EOB run (EOBn symbol + extension
    bits) followed by the correction bits buffered during the run."""
    run = state["eobrun"]
    if run > 0:
        r = run.bit_length() - 1
        length, code = ac_table.encode[r << 4]
        writer.write(code, length)
        if r:
            writer.write(run - (1 << r), r)
        state["eobrun"] = 0
    for bit in state["pending"]:
        writer.write(bit, 1)
    state["pending"] = []


def _encode_ac_first_scan(
    writer: _BitWriter, ac_table: _CanonicalHuffman,
    blocks: list, lo: int, hi: int, al: int, state: dict,
) -> None:
    """Progressive AC first scan for one component (T.81 G.1.2.2)."""
    for zz in blocks:
        r = 0
        wrote = False
        for k in range(lo, hi + 1):
            v = int(zz[k])
            a = abs(v) >> al
            if a == 0:
                r += 1
                continue
            if not wrote:
                _emit_eobrun(writer, ac_table, state)
                wrote = True
            while r > 15:
                length, code = ac_table.encode[0xF0]
                writer.write(code, length)
                r -= 16
            s = a.bit_length()
            length, code = ac_table.encode[(r << 4) | s]
            writer.write(code, length)
            sv = a if v > 0 else -a
            writer.write(sv if sv > 0 else sv + (1 << s) - 1, s)
            r = 0
        if r > 0 or not wrote:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(writer, ac_table, state)


def _encode_ac_refine_scan(
    writer: _BitWriter, ac_table: _CanonicalHuffman,
    blocks: list, lo: int, hi: int, al: int, state: dict,
) -> None:
    """Progressive AC successive-approximation refinement scan (T.81
    G.1.2.3; mirrors libjpeg's encode_mcu_AC_refine: newly-nonzero
    coefficients code as (run,1)+sign, already-nonzero ones buffer one
    correction bit that is emitted after the next code)."""
    for zz in blocks:
        absv = [abs(int(zz[k])) >> al for k in range(lo, hi + 1)]
        eob = -1
        for idx, a in enumerate(absv):
            if a == 1:
                eob = idx
        r = 0
        br: list[int] = []
        for idx, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            while r > 15 and idx <= eob:
                _emit_eobrun(writer, ac_table, state)
                length, code = ac_table.encode[0xF0]
                writer.write(code, length)
                r -= 16
                for bit in br:
                    writer.write(bit, 1)
                br = []
            if a > 1:  # already nonzero at the previous precision
                br.append(a & 1)
                continue
            _emit_eobrun(writer, ac_table, state)
            length, code = ac_table.encode[(r << 4) | 1]
            writer.write(code, length)
            writer.write(1 if int(zz[lo + idx]) >= 0 else 0, 1)
            for bit in br:
                writer.write(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            state["eobrun"] += 1
            state["pending"].extend(br)
            if state["eobrun"] == 0x7FFF:
                _emit_eobrun(writer, ac_table, state)


def encode_jpeg_with_expected(
    img: np.ndarray, quality: int = 75, subsampling: str = "444",
    progressive: bool = False,
) -> tuple[bytes, np.ndarray]:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as
    baseline JFIF and return ``(blob, expected)`` where ``expected``
    is the exact uint8 image those bytes decode to (dequantize + IDCT
    of the very coefficients that were written, chroma upsampled by
    sample replication where subsampled, cropped, color-transformed,
    rounded, clamped). ``subsampling``: "444" (default), "422"
    (chroma halved horizontally, Y 2x1) or "420" (chroma halved both
    ways, Y 2x2) — color images only; entropy data is MCU-interleaved
    per T.81 A.2.3."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if subsampling not in _SUBSAMPLING_FACTORS:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    qy = scaled_qtable(QTABLE_LUMA, quality)
    qc = scaled_qtable(QTABLE_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        qids, qtabs = [0], {0: qy}
        comp_factors = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qids, qtabs = [0, 1, 1], {0: qy, 1: qc}
        comp_factors = _SUBSAMPLING_FACTORS[subsampling]
    hmax = max(fh for fh, _ in comp_factors)
    vmax = max(fv for _, fv in comp_factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    per_comp = []
    recon_planes = []
    comp_dims = []
    for plane, qid, (fh, fv) in zip(planes, qids, comp_factors):
        sub = _box_downsample(plane, hmax // fh, vmax // fv)
        ch, cw = (h * fv + vmax - 1) // vmax, (w * fh + hmax - 1) // hmax
        assert sub.shape == (ch, cw), (sub.shape, ch, cw)
        blocks, recon = _encode_plane_zigzag(
            sub, qtabs[qid], pad_to=(mcuy * fv * 8, mcux * fh * 8)
        )
        per_comp.append(blocks)
        recon_planes.append(recon[:ch, :cw])
        comp_dims.append((ch, cw))

    (dc_bits, dc_vals), (ac_bits, ac_vals) = _flat_tables()
    dc_table = _CanonicalHuffman(dc_bits, dc_vals)
    ac_table = _CanonicalHuffman(ac_bits, ac_vals)

    ncomp = len(planes)
    # MCU-interleaved block order (T.81 A.2.3): per MCU, each
    # component contributes its fh*fv blocks row-major
    order = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fh, fv) in enumerate(comp_factors):
                for vy in range(fv):
                    for vx in range(fh):
                        order.append(
                            (ci, (my * fv + vy) * (mcux * fh) + mx * fh + vx)
                        )

    def _sos_segment(comp_ids: list[int], ss: int, se: int,
                     ah: int, al: int) -> bytes:
        sos_comps = b"".join(bytes([ci + 1, 0x00]) for ci in comp_ids)
        return (
            b"\xff\xda"
            + struct.pack(">H", 6 + 2 * len(comp_ids))
            + bytes([len(comp_ids)])
            + sos_comps
            + bytes([ss, se, (ah << 4) | al])
        )

    def _dc_diff_bits(writer, diff):
        t = _size_of(diff)
        length, code = dc_table.encode[t]
        writer.write(code, length)
        if t:
            writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)

    scan_bytes = []
    if not progressive:
        writer = _BitWriter()
        pred = [0] * ncomp
        for ci, bi in order:
            zz = per_comp[ci][bi]
            _dc_diff_bits(writer, int(zz[0]) - pred[ci])
            pred[ci] = int(zz[0])
            # AC coefficients with run-length coding
            k = 1
            run = 0
            while k < 64:
                v = int(zz[k])
                if v == 0:
                    run += 1
                else:
                    while run > 15:
                        length, code = ac_table.encode[0xF0]
                        writer.write(code, length)
                        run -= 16
                    s = _size_of(v)
                    length, code = ac_table.encode[(run << 4) | s]
                    writer.write(code, length)
                    writer.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                k += 1
            if run:
                length, code = ac_table.encode[0x00]  # EOB
                writer.write(code, length)
        scan_bytes.append(
            _sos_segment(list(range(ncomp)), 0, 63, 0, 0) + writer.flush()
        )
    else:
        # spectral selection + one level of successive approximation:
        #   DC(Al=1) → DC refine → per-component AC 1..63 (Al=1)
        #   → per-component AC refine (Ah=1, Al=0)
        writer = _BitWriter()
        pred = [0] * ncomp
        for ci, bi in order:  # DC first scan, interleaved, Al=1
            shifted = int(per_comp[ci][bi][0]) >> 1
            _dc_diff_bits(writer, shifted - pred[ci])
            pred[ci] = shifted
        scan_bytes.append(
            _sos_segment(list(range(ncomp)), 0, 0, 0, 1) + writer.flush()
        )
        writer = _BitWriter()
        for ci, bi in order:  # DC refinement: one bit per block
            writer.write(int(per_comp[ci][bi][0]) & 1, 1)
        scan_bytes.append(
            _sos_segment(list(range(ncomp)), 0, 0, 1, 0) + writer.flush()
        )
        # non-interleaved AC scans traverse the component's OWN
        # ceil-block grid (T.81 A.2.2), not the MCU-padded grid
        def _ac_blocks(ci):
            fh, fv = comp_factors[ci]
            ch, cw = comp_dims[ci]
            bw = mcux * fh
            return [
                per_comp[ci][by * bw + bx]
                for by in range((ch + 7) // 8)
                for bx in range((cw + 7) // 8)
            ]

        for ci in range(ncomp):
            writer = _BitWriter()
            state = {"eobrun": 0, "pending": []}
            _encode_ac_first_scan(
                writer, ac_table, _ac_blocks(ci), 1, 63, 1, state
            )
            _emit_eobrun(writer, ac_table, state)
            scan_bytes.append(_sos_segment([ci], 1, 63, 0, 1) + writer.flush())
        for ci in range(ncomp):
            writer = _BitWriter()
            state = {"eobrun": 0, "pending": []}
            _encode_ac_refine_scan(
                writer, ac_table, _ac_blocks(ci), 1, 63, 0, state
            )
            _emit_eobrun(writer, ac_table, state)
            scan_bytes.append(_sos_segment([ci], 1, 63, 1, 0) + writer.flush())
    sof_comps = b"".join(
        bytes([
            cid + 1,
            (comp_factors[cid][0] << 4) | comp_factors[cid][1],
            qids[cid],
        ])
        for cid in range(ncomp)
    )
    sof = (
        (b"\xff\xc2" if progressive else b"\xff\xc0")
        + struct.pack(">H", 8 + 3 * ncomp)
        + bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([ncomp])
        + sof_comps
    )
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + b"\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    blob = (
        b"\xff\xd8" + app0
        + _dqt_segment(0, qy)
        + (b"" if gray else _dqt_segment(1, qc))
        + sof
        + _dht_segment(0, 0, dc_bits, dc_vals)
        + _dht_segment(1, 0, ac_bits, ac_vals)
        + b"".join(scan_bytes)
        + b"\xff\xd9"
    )

    if gray:
        expected = np.clip(np.round(recon_planes[0]), 0, 255).astype(np.uint8)
    else:
        # subsampled chroma upsamples by sample replication — the exact
        # inverse the decoder applies, so expected is pixel-exact
        up = []
        for recon, (fh, fv) in zip(recon_planes, comp_factors):
            if fh != hmax or fv != vmax:
                recon = np.repeat(
                    np.repeat(recon, vmax // fv, axis=0), hmax // fh, axis=1
                )
            up.append(recon[:h, :w])
        expected = ycbcr_to_rgb(np.stack(up, axis=-1))
    return blob, expected


def _encode_plane_zigzag(
    plane: np.ndarray, q: np.ndarray,
    pad_to: tuple[int, int] | None = None,
) -> tuple[list[np.ndarray], np.ndarray]:
    """Blocks of ZIGZAG-ordered quantized coefficients + the expected
    reconstruction for one component plane. ``pad_to`` overrides the
    padded plane size (multiples of 8; MCU-interleaved scans need a
    component padded to whole MCUs, not just whole blocks)."""
    h, w = plane.shape
    if pad_to is None:
        bh, bw = (h + 7) // 8, (w + 7) // 8
    else:
        ph, pw = pad_to
        if ph % 8 or pw % 8 or ph < h or pw < w:
            raise ValueError(f"bad pad_to {pad_to} for plane {plane.shape}")
        bh, bw = ph // 8, pw // 8
    padded = np.zeros((bh * 8, bw * 8))
    padded[:h, :w] = plane
    if w < bw * 8:
        padded[:h, w:] = padded[:h, w - 1 : w]
    if h < bh * 8:
        padded[h:, :] = padded[h - 1 : h, :]
    blocks = []
    recon = np.zeros_like(padded)
    for by in range(bh):
        for bx in range(bw):
            f = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coeffs = _M @ f @ _M.T
            quant = np.round(coeffs / q).astype(np.int64)
            blocks.append(quant.reshape(-1)[ZIGZAG])
            recon[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _idct_block(quant * q) + 128.0
            )
    return blocks, recon


def encode_jpeg_py(img: np.ndarray, quality: int = 75) -> bytes:
    blob, _ = encode_jpeg_with_expected(img, quality)
    return blob
