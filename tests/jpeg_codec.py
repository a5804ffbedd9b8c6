"""Minimal baseline-JPEG (SOF0) codec — a TEST FIXTURE, not a product path.

Purpose: prove the `decode_fn` plug-in contract of
`operators.multimodal.decode_media_features` with a codec that is NOT the
stdlib PNG/WAV path (the sandbox ships no PIL/libav, so the "external
codec" is this from-spec implementation). Scope is deliberately tiny:
8-bit grayscale, single component, no subsampling, baseline DCT, standard
Annex-K luminance Huffman tables, no restart markers, no progressive.

Both directions are implemented so the round-trip is self-checking:
`encode_gray_jpeg` produces a spec-valid interchange stream that any real
JPEG decoder accepts; `decode_gray_jpeg` walks markers → builds canonical
Huffman tables → entropy-decodes DC diffs + AC run-lengths per 8x8 block →
dequantizes → inverse-zigzags → float IDCT → level-shift/clamp.
"""

from __future__ import annotations

import math
import struct

# Annex K.3 typical luminance tables (public JPEG spec content)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = []
for s in range(15):
    d = range(s + 1)
    for i in (reversed(d) if s % 2 == 0 else d):
        j = s - i
        if i < 8 and j < 8:
            _ZZ.append((i, j))
assert len(_ZZ) == 64


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """val -> (code, length) per the JPEG canonical code construction."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_tables(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> val, for the decoder's bit-at-a-time walk."""
    return {
        (length, code): v
        for v, (code, length) in _canonical_codes(bits, vals).items()
    }


def _fdct(block: list[list[float]]) -> list[list[float]]:
    out = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x][y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u][v] = 0.25 * cu * cv * s
    return out


def _idct(coef: list[list[float]]) -> list[list[float]]:
    out = [[0.0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u][v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x][y] = 0.25 * s
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, appended bits)."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def encode_gray_jpeg(pixels: list[list[int]], quant: int = 1) -> bytes:
    """Encode a grayscale image (rows of 0-255 ints, any size; edge blocks
    are padded by edge replication) as baseline JFIF with a flat quant
    table of value `quant`."""
    h = len(pixels)
    w = len(pixels[0])
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (table 0, 8-bit, zigzag order — flat so order is moot)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes([quant]) * 64
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])  # comp 1, no subsampling, quant table 0
    # DHT DC then AC
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(DC_VALS))
    out += bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(AC_VALS))
    out += bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    bw = _BitWriter()
    pred = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = [
                [
                    float(pixels[min(by + i, h - 1)][min(bx + j, w - 1)]) - 128.0
                    for j in range(8)
                ]
                for i in range(8)
            ]
            coef = _fdct(block)
            q = [
                [int(round(coef[i][j] / quant)) for j in range(8)]
                for i in range(8)
            ]
            zz = [q[i][j] for i, j in _ZZ]
            # DC
            s, bits_v = _magnitude(zz[0] - pred)
            pred = zz[0]
            code, ln = dc_codes[s]
            bw.put(code, ln)
            if s:
                bw.put(bits_v, s)
            # AC with run-lengths
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    bw.put(code, ln)
                    run -= 16
                s, bits_v = _magnitude(zz[k])
                code, ln = ac_codes[(run << 4) | s]
                bw.put(code, ln)
                bw.put(bits_v, s)
                run = 0
            if run:
                code, ln = ac_codes[0x00]  # EOB
                bw.put(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy data")
                self.pos += 1  # skip stuffed zero
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_gray_jpeg(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """Decode the subset written by encode_gray_jpeg (baseline, grayscale,
    tables 0, no restarts): returns (width, height, pixel rows)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    quant = None
    w = h = None
    dc_tab = ac_tab = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        seglen = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            if seg[0] != 0x00:
                raise ValueError("only 8-bit quant table 0 supported")
            quant = list(seg[1:65])
        elif marker == 0xC0:  # SOF0
            _, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if ncomp != 1 or seg[7] != 0x11:
                raise ValueError("fixture decodes single-component 1x1 only")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise NotImplementedError("baseline SOF0 only")
        elif marker == 0xC4:  # DHT
            tc, th = seg[0] >> 4, seg[0] & 0xF
            if th != 0:
                raise ValueError("tables 0 only")
            bits = list(seg[1:17])
            vals = list(seg[17 : 17 + sum(bits)])
            if tc == 0:
                dc_tab = _decode_tables(bits, vals)
            else:
                ac_tab = _decode_tables(bits, vals)
        elif marker == 0xDA:  # SOS — entropy data follows to EOI
            scan = payload[pos + 2 + seglen : -2]
            break
        pos += 2 + seglen
    if None in (quant, w, h, dc_tab, ac_tab) or scan is None:
        raise ValueError("missing JPEG segments")

    def read_code(tab: dict[tuple[int, int], int], br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            if (length, code) in tab:
                return tab[(length, code)]
        raise ValueError("invalid Huffman code")

    br = _BitReader(scan)
    img = [[0] * w for _ in range(h)]
    pred = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            zz = [0] * 64
            s = read_code(dc_tab, br)
            diff = _extend(br.bits(s), s) if s else 0
            pred += diff
            zz[0] = pred
            k = 1
            while k < 64:
                rs = read_code(ac_tab, br)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                k += rs >> 4
                s = rs & 0xF
                zz[k] = _extend(br.bits(s), s)
                k += 1
            coef = [[0.0] * 8 for _ in range(8)]
            for k in range(64):
                i, j = _ZZ[k]
                coef[i][j] = zz[k] * quant[k]
            px = _idct(coef)
            for i in range(8):
                for j in range(8):
                    y, x = by + i, bx + j
                    if y < h and x < w:
                        img[y][x] = max(
                            0, min(255, int(round(px[i][j] + 128.0)))
                        )
    return w, h, img
