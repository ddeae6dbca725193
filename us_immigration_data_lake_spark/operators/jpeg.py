"""Baseline JPEG (ITU-T T.81 sequential DCT) codec — pure numpy +
stdlib, no codec library.

Scope (declared, not silently degraded):
- 8-bit baseline sequential (SOF0), Huffman entropy coding
- grayscale and color with ANY integer-ratio sampling factors —
  4:4:4, 4:2:2 and 4:2:0 (what real cameras emit) round-trip through
  both sides; box-mean downsample on encode, nearest upsample on
  decode
- restart markers: encoder emits DRI/RSTn on request, decoder resyncs
  and resets DC predictors at every interval
- progressive (SOF2) and 16-bit-quantizer streams raise with the
  exact unsupported feature named

Design notes for verifiability:
- The zigzag permutation is GENERATED (diagonal walk), not
  transcribed, so it cannot be mistyped.
- Quantization/Huffman tables are EMBEDDED IN THE STREAM (DQT/DHT),
  per spec — the decoder always uses the transmitted tables, so
  interop does not depend on both sides sharing constants.
- FDCT/IDCT are the orthonormal DCT-II matrix pair; their identities
  (IDCT∘FDCT = id to float precision, constant block → DC-only) are
  unit-tested independently of the container format.

The multimodal dispatch (operators/multimodal.py:decode_image) routes
``\\xff\\xd8`` payloads here.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """The 8×8 zigzag scan as (index_in_scan → (row, col)), generated
    by the diagonal walk so it is correct by construction."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(max(0, s - 7), min(8, s + 1))]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left → top-right
        order.extend(diag)
    return np.array(order)  # shape (64, 2)


_ZIGZAG = _zigzag_order()
_ZZ_ROWS = _ZIGZAG[:, 0]
_ZZ_COLS = _ZIGZAG[:, 1]

# base quantization tables (Annex-K-style; transmitted in DQT, so the
# decoder never assumes them)
_Q_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

_Q_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)

# Huffman table specs: (bits[16], values). DC tables code the 12 size
# categories; AC tables code (run<<4 | size) symbols. These are the
# standard-layout tables; they ride in DHT segments either way.
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))


def _ac_table_symbols() -> list[int]:
    """All 162 AC symbols in a deterministic generated order:
    EOB, then (run, size) for run 0-15 / size 1-10, ZRL.
    Used with GENERATED code lengths (below), so nothing is
    transcribed from memory; the table still ships in DHT."""
    syms = [0x00]  # EOB
    for run in range(16):
        for size in range(1, 11):
            syms.append((run << 4) | size)
    syms.append(0xF0)  # ZRL
    return syms


def _ac_table_spec() -> tuple[list[int], list[int]]:
    """A valid canonical-Huffman (bits, values) spec covering all 162
    AC symbols: frequent symbols (low run/size) get short codes. Built
    from a fixed length assignment that satisfies the Kraft inequality
    with the all-ones-longest-code JPEG constraint."""
    syms = _ac_table_symbols()
    # length heuristic: 2 + run//2 + size, clamped to [2, 16]
    def length(sym: int) -> int:
        if sym == 0x00:
            return 4
        if sym == 0xF0:
            return 11
        run, size = sym >> 4, sym & 0xF
        return min(16, max(2, 2 + run + size))

    pairs = sorted(((length(s), i, s) for i, s in enumerate(syms)))
    # greedy canonical assignment: walk lengths ascending and give
    # each symbol the shortest length ≥ its heuristic that still has
    # Kraft room when all remaining symbols take 16 bits
    bits = [0] * 17
    assigned: list[tuple[int, int]] = []  # (length, sym)
    remaining = len(pairs)
    used = 0.0
    for l, _, s in pairs:
        L = l
        while L <= 16:
            if used + 2.0 ** -L + (remaining - 1) * 2.0 ** -16 <= 1.0:
                break
            L += 1
        if L > 16:
            raise AssertionError("AC table construction overflow")
        assigned.append((L, s))
        used += 2.0 ** -L
        remaining -= 1
    assigned.sort()
    for L, _ in assigned:
        bits[L] += 1
    values = [s for _, s in assigned]
    return bits[1:], values


_AC_BITS, _AC_VALS = _ac_table_spec()


def _dct_matrix() -> np.ndarray:
    d = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            d[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return d


_DCT = _dct_matrix()


def fdct2(block: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II of an 8×8 block."""
    return _DCT @ block @ _DCT.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """Inverse of fdct2 (orthonormal, so the transpose pair)."""
    return _DCT.T @ coef @ _DCT


# ---------------------------------------------------------------------------
# canonical Huffman
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """(bits, values) → {symbol: (code, length)} canonical assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(bits, values) → {(length, code): symbol} for bit-serial decode."""
    return {
        (length, code): sym
        for sym, (code, length) in _build_codes(bits, values).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data truncated")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated at 0xFF")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{marker:02X} in entropy data "
                    "(RSTn markers are consumed only at declared "
                    "restart-interval boundaries)"
                )
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def expect_restart(self) -> None:
        """Drop the current byte's padding bits and consume the next
        RSTn marker (T.81 §E.1.4: entropy segments are byte-aligned
        before each restart marker)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not (0xD0 <= self.data[self.pos + 1] <= 0xD7)
        ):
            raise ValueError(
                f"expected restart marker at entropy offset {self.pos}"
            )
        self.pos += 2

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map the ``size``-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    """Size category of a coefficient (bits needed for |v|)."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_SUBSAMPLING = {
    "4:4:4": ((1, 1), (1, 1), (1, 1)),
    "4:2:2": ((2, 1), (1, 1), (1, 1)),
    "4:2:0": ((2, 2), (1, 1), (1, 1)),
}


def _scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _box_downsample(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Mean over fy×fx boxes (edge-padded to factor multiples)."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    ph, pw = (h + fy - 1) // fy * fy, (w + fx - 1) // fx * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qtable: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    coef = fdct2(block.astype(np.float64) - 128.0)
    quant = np.round(coef / qtable).astype(np.int64)
    zz = quant[_ZZ_ROWS, _ZZ_COLS]
    # DC
    diff = int(zz[0]) - pred
    size = _category(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        mag = diff if diff >= 0 else diff + (1 << size) - 1
        writer.write(mag, size)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, l = ac_codes[0xF0]  # ZRL
            writer.write(c, l)
            run -= 16
        size = _category(v)
        c, l = ac_codes[(run << 4) | size]
        writer.write(c, l)
        mag = v if v >= 0 else v + (1 << size) - 1
        writer.write(mag, size)
        run = 0
    if run:
        c, l = ac_codes[0x00]  # EOB
        writer.write(c, l)
    return int(zz[0])


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes.

    ``subsampling``: 4:4:4 (default, exact chroma), 4:2:2, or 4:2:0
    (box-mean chroma downsample — the format real cameras emit).
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every N MCUs (the stream-resync feature real decoders rely on).
    """
    if pixels.dtype != np.uint8:
        raise ValueError("expected uint8 pixels")
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if not gray and pixels.shape[2] != 3:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB")
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLING)}")
    factors = ((1, 1),) if gray else _SUBSAMPLING[subsampling]
    h_max = max(f[0] for f in factors)
    v_max = max(f[1] for f in factors)
    qy = _scale_qtable(_Q_LUMA, quality)
    qc = _scale_qtable(_Q_CHROMA, quality)

    full = (
        [pixels.astype(np.float64)]
        if gray
        else list(np.moveaxis(_rgb_to_ycbcr(pixels), -1, 0))
    )
    mcux = (w + 8 * h_max - 1) // (8 * h_max)
    mcuy = (h + 8 * v_max - 1) // (8 * v_max)
    planes = []
    for ci, (hi, vi) in enumerate(factors):
        p = _box_downsample(full[ci], h_max // hi, v_max // vi)
        th, tw = mcuy * vi * 8, mcux * hi * 8
        planes.append(
            np.pad(
                p,
                ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                mode="edge",
            )
        )

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"

    def dqt(tid: int, q: np.ndarray) -> bytes:
        zz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz

    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)

    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = factors[ci]
        qid = 0 if ci == 0 else 1
        sof += struct.pack(">BBB", ci + 1, (hi << 4) | vi, qid)
    out += b"\xff\xc0" + sof

    def dht(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        payload = bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_BITS, _AC_VALS)
    if not gray:
        out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += dht(1, 1, _AC_BITS, _AC_VALS)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        tid = 0 if cid == 1 else 1
        sos += struct.pack(">BB", cid, tid << 4 | tid)
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos

    dc_y = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac = _build_codes(_AC_BITS, _AC_VALS)
    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for m in range(mcuy * mcux):
        if restart_interval and m and m % restart_interval == 0:
            out += writer.flush()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            writer = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            hi, vi = factors[ci]
            q = qy if ci == 0 else qc
            dc = dc_y if ci == 0 else dc_c
            for byy in range(vi):
                for bxx in range(hi):
                    r0 = (my * vi + byy) * 8
                    c0 = (mx * hi + bxx) * 8
                    block = planes[ci][r0 : r0 + 8, c0 : c0 + 8]
                    preds[ci] = _encode_block(writer, block, q, preds[ci], dc, ac)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_block(reader, dc_tab, ac_tab, q, pred: int):
    zz = np.zeros(64, dtype=np.int64)
    size = reader.read_symbol(dc_tab)
    pred += _extend(reader.read_bits(size), size)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = reader.read_symbol(ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, size = sym >> 4, sym & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.read_bits(size), size)
        k += 1
    coef = np.zeros((8, 8))
    coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
    return idct2(coef) + 128.0, pred


def decode_jpeg(content: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array (h, w) or (h, w, 3). Tables
    are read from the stream. Supports 4:4:4 / 4:2:2 / 4:2:0 (any
    integer-ratio sampling factors), restart intervals, grayscale;
    progressive/16-bit variants raise with the feature named."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan = None
    restart_interval = 0
    while pos < len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"marker expected at offset {pos}")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        seg = content[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                q = np.zeros((8, 8), dtype=np.int64)
                q[_ZZ_ROWS, _ZZ_COLS] = zz
                qtables[tid] = q
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tclass, tid)] = _build_decoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            depth, fh, fw, ncomp = struct.unpack(">BHHB", seg[:6])
            if depth != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(ncomp):
                cid, sampling, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, sampling >> 4, sampling & 0xF, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ncomp_s = seg[0]
            mapping = []
            for i in range(ncomp_s):
                cid, tids = seg[1 + 2 * i : 3 + 2 * i]
                mapping.append((cid, tids >> 4, tids & 0xF))
            scan = (mapping, pos + seglen)
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    fh, fw, comps = frame
    mapping, data_start = scan
    end = content.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG missing EOI")
    reader = _BitReader(content[data_start:end])

    by_cid = {cid: (hi, vi, qid) for cid, hi, vi, qid in comps}
    h_max = max(hi for _, hi, _, _ in comps)
    v_max = max(vi for _, _, vi, _ in comps)
    for cid, hi, vi, _ in comps:
        if not (1 <= hi <= 4 and 1 <= vi <= 4):
            raise ValueError(
                f"invalid sampling factors {hi}x{vi} for component {cid} "
                "(T.81 allows 1-4)"
            )
        if h_max % hi or v_max % vi:
            raise ValueError(
                f"non-integer sampling ratio for component {cid} "
                f"({hi}x{vi} vs max {h_max}x{v_max})"
            )
    mcux = (fw + 8 * h_max - 1) // (8 * h_max)
    mcuy = (fh + 8 * v_max - 1) // (8 * v_max)
    planes = {
        cid: np.zeros((mcuy * vi * 8, mcux * hi * 8))
        for cid, hi, vi, _ in comps
    }
    preds = {cid: 0 for cid, *_ in comps}
    if len(mapping) == 1 and len(comps) > 1:
        # only the first SOS is parsed, so per-component scans of a
        # multi-component frame cannot be fully decoded
        raise ValueError(
            "multi-scan baseline JPEG (separate per-component scans) "
            "unsupported"
        )
    if len(mapping) == 1:
        # Non-interleaved scan (T.81 §A.2.2): one block per MCU in the
        # component's own raster order over ceil(cw/8)×ceil(ch/8)
        # blocks — NOT the hi×vi interleaved tiling, even when the
        # component declares sampling factors > 1.
        cid, dc_id, ac_id = mapping[0]
        hi, vi, qid = by_cid[cid]
        cw = -((-fw * hi) // h_max)
        chh = -((-fh * vi) // v_max)
        bw, bh = (cw + 7) // 8, (chh + 7) // 8
        plane = np.zeros((bh * 8, bw * 8))
        pred = 0
        for b in range(bh * bw):
            if restart_interval and b and b % restart_interval == 0:
                reader.expect_restart()
                pred = 0
            byy, bxx = divmod(b, bw)
            block, pred = _decode_block(
                reader, huff[(0, dc_id)], huff[(1, ac_id)], qtables[qid],
                pred,
            )
            plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = block
        planes[cid] = plane
    else:
        for m in range(mcuy * mcux):
            if restart_interval and m and m % restart_interval == 0:
                reader.expect_restart()
                preds = {cid: 0 for cid, *_ in comps}
            my, mx = divmod(m, mcux)
            for cid, dc_id, ac_id in mapping:
                hi, vi, qid = by_cid[cid]
                q = qtables[qid]
                for byy in range(vi):
                    for bxx in range(hi):
                        block, preds[cid] = _decode_block(
                            reader, huff[(0, dc_id)], huff[(1, ac_id)], q,
                            preds[cid],
                        )
                        r0 = (my * vi + byy) * 8
                        c0 = (mx * hi + bxx) * 8
                        planes[cid][r0 : r0 + 8, c0 : c0 + 8] = block
    # upsample each component back to full resolution and crop
    full = []
    for cid, hi, vi, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, v_max // vi, axis=0), h_max // hi, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    if len(full) == 3:
        return _ycbcr_to_rgb(np.stack(full, axis=-1))
    raise ValueError(f"unsupported component count {len(full)}")
