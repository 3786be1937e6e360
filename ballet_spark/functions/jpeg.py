"""Pure-Python baseline JPEG codec (numpy DCT, stdlib only).

The round-4 gap: the multimodal surface decoded PPM/PGM and PNG
in-container but env-gated JPEG behind Pillow/opencv. This module
closes it with a from-scratch BASELINE-sequential codec (ITU-T T.81):

- :func:`decode_jpeg`: SOF0/SOF1 huffman-coded sequential JPEG →
  2-D float luma. JPEG stores YCbCr (JFIF/BT.601), so the Y component
  IS the luma the pipeline's :func:`...multimodal.image_features`
  consumes — chroma blocks are entropy-decoded (the huffman stream is
  serial; they cannot be skipped) but not reconstructed, saving 2/3 of
  the dequant+IDCT work. Supports any sampling factors (4:4:4, 4:2:2,
  4:2:0, grayscale), restart intervals, multi-table DHT/DQT segments,
  16-bit quant tables. Progressive (SOF2), arithmetic coding, and
  12-bit precision raise :class:`NotImplementedError` naming the
  feature, matching the multimodal module's gating discipline.
- :func:`encode_jpeg`: the matching encoder (grayscale 4:4:4 or RGB
  4:2:0, Annex-K standard huffman tables) so the decoder is
  roundtrip-testable in a container with no image library: with a
  flat quant table the DCT roundtrip is near-lossless, pinning
  huffman/zigzag/dequant/IDCT/MCU assembly against ground truth.

Performance honesty: bit-by-bit Python huffman decode is fine for the
test/CI path this exists for; a production corpus should route
through Pillow/turbojpeg when available (gate on import, keep this as
the fallback) — same policy as decode_png.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan → position in the 8x8 block
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 2-D DCT basis: F = C @ f @ C.T, f = C.T @ F @ C
_C = np.array([
    [(np.sqrt(1.0 / 8) if k == 0 else 0.5)
     * np.cos((2 * n + 1) * k * np.pi / 16.0) for n in range(8)]
    for k in range(8)
])

# Annex K.3 "typical" huffman tables: (bits[1..16], values)
_STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _build_decode_table(bits, values):
    """Canonical huffman: map (length, code) → symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits, values):
    """Canonical huffman: map symbol → (code, length)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            table[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    byte-unstuffing; stops at any real marker (restart handled by the
    caller via :meth:`sync_restart`)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read_bit(self) -> int:
        d = self.data
        while True:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    pass  # stuffed 0xFF: consume bits of this byte
                else:
                    raise ValueError("hit marker inside entropy read")
            b = (byte >> (7 - self.bit)) & 1
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
                if byte == 0xFF:
                    self.pos += 1  # skip the stuffed 0x00
            return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self):
        """Skip the 1-padding bits to the next byte boundary (T.81:
        the encoder pads with 1s before a restart marker)."""
        if self.bit:
            d, p = self.data, self.pos
            # mid-byte inside a stuffed 0xFF: skip the 0x00 too
            if d[p] == 0xFF and p + 1 < len(d) and d[p + 1] == 0x00:
                self.pos += 2
            else:
                self.pos += 1
            self.bit = 0

    def at_restart(self):
        """If positioned at an RSTn marker (after byte-align), return
        its index 0-7 else None."""
        self.byte_align()
        d, p = self.data, self.pos
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            return d[p + 1] - 0xD0
        return None

    def sync_restart(self):
        self.bit = 0
        self.pos += 2  # consume FF Dn


def _huff_decode(reader: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size`` magnitude bits to a signed
    coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline/extended-sequential huffman JPEG → 2-D float luma
    (the Y component; JFIF Y is BT.601 luma, the same quantity
    decode_png/decode_ppm return). See module docstring for scope."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError(
            f"unsupported image magic {data[:4]!r}: expected JPEG SOI"
        )
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → table
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker code; skip them (some encoders/cameras pad segments)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):
            # a stream ending in 0xFF fill bytes: the decoder's
            # contract for malformed input is ValueError, not the
            # IndexError the bare data[pos + 1] would raise
            raise ValueError("truncated JPEG: fill bytes run to EOF")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        # same malformed-input contract as the fill-byte check above:
        # a stream truncated inside the length header (struct.error)
        # or the segment body must raise ValueError, not leak a parse
        # primitive's own exception
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: segment length runs past EOF")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated JPEG: segment body runs past EOF")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec:
                    tbl = np.frombuffer(
                        seg[p:p + 128], dtype=">u2"
                    ).astype(np.int64)
                    p += 128
                else:
                    tbl = np.frombuffer(
                        seg[p:p + 64], dtype=np.uint8
                    ).astype(np.int64)
                    p += 64
                qt[tid] = tbl
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = [0] + list(seg[p + 1:p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17:p + 17 + nvals])
                huff[(cls, tid)] = _build_decode_table(bits, values)
                p += 17 + nvals
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError(
                "progressive JPEG (SOF2) not supported by the pure-"
                "Python baseline decoder — use Pillow/turbojpeg"
            )
        elif marker in (0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic-coded JPEG not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS → entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff, restart_interval
            )
        pos += seglen
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    h, w = frame["h"], frame["w"]
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    y_comp = comps[0]
    yw, yv = y_comp["h"], y_comp["v"]
    yplane = np.zeros((mcuy * 8 * yv, mcux * 8 * yw))
    yq = qt[y_comp["tq"]]
    reader = _BitReader(data, pos)
    dc_pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                r = reader.at_restart()
                if r is None:
                    raise ValueError("expected restart marker")
                reader.sync_restart()
                dc_pred = {c["id"]: 0 for c in comps}
            for ci, c in enumerate(comps):
                dc_t = huff[(0, scan[c["id"]][0])]
                ac_t = huff[(1, scan[c["id"]][1])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        size = _huff_decode(reader, dc_t)
                        diff = _extend(reader.read_bits(size), size)
                        dc_pred[c["id"]] += diff
                        coef[0] = dc_pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        if ci == 0:
                            # only Y reconstructs: dequant → zigzag →
                            # IDCT → level shift
                            blk = np.zeros(64)
                            blk[ZIGZAG] = coef * yq
                            f = _C.T @ blk.reshape(8, 8) @ _C
                            py = (my * yv + by) * 8
                            px = (mx * yw + bx) * 8
                            yplane[py:py + 8, px:px + 8] = f + 128.0
            mcu_count += 1
    return np.clip(yplane[:h, :w], 0.0, 255.0)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _encode_block(wtr, coef_zz, dc_pred, dc_tab, ac_tab):
    """Encode one zigzag-ordered quantized block; returns its DC."""
    diff = int(coef_zz[0]) - dc_pred
    size = int(diff).bit_length() if diff != 0 else 0
    mag = diff if diff >= 0 else diff + (1 << size) - 1
    code, ln = dc_tab[size]
    wtr.write(code, ln)
    if size:
        wtr.write(mag & ((1 << size) - 1), size)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            wtr.write(code, ln)
            run -= 16
        size = abs(v).bit_length()
        mag = v if v >= 0 else v + (1 << size) - 1
        code, ln = ac_tab[(run << 4) | size]
        wtr.write(code, ln)
        wtr.write(mag & ((1 << size) - 1), size)
        run = 0
    if run:
        code, ln = ac_tab[0x00]
        wtr.write(code, ln)
    return int(coef_zz[0])


def _fdct_quant(plane, qtbl):
    """8x8-tiled forward DCT + quantization → per-block zigzag coefs.
    ``plane`` must already be padded to multiples of 8."""
    hh, ww = plane.shape
    out = []
    for py in range(0, hh, 8):
        row = []
        for px in range(0, ww, 8):
            f = plane[py:py + 8, px:px + 8] - 128.0
            F_ = _C @ f @ _C.T
            q = np.round(F_.reshape(-1)[ZIGZAG] / qtbl.astype(float))
            row.append(q.astype(np.int64))
        out.append(row)
    return out


def _pad8(plane, mult=8):
    h, w = plane.shape
    ph, pw = -(-h // mult) * mult, -(-w // mult) * mult
    out = np.empty((ph, pw))
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1:h, :]  # edge replicate
    out[:, w:] = out[:, w - 1:w]
    return out


def encode_jpeg(
    arr: np.ndarray, quant: int = 1, restart_interval: int = 0
) -> bytes:
    """Baseline JPEG encoder: a 2-D uint8-ish array → grayscale JPEG,
    a 3-D ``(h, w, 3)`` RGB array → 4:2:0 color JPEG (BT.601 full-range
    YCbCr). ``quant`` is a flat quantization value (1 = near-lossless
    — the roundtrip test setting; larger = real compression).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (tests the decoder's resync path). Annex-K standard huffman
    tables."""
    if not 1 <= int(quant) <= 255:
        # the 8-bit DQT cannot represent values outside 1..255; >255
        # would silently wrap in the written table while the forward
        # quantizer used the true value (all-zero reconstruction)
        raise ValueError(f"quant must be in 1..255, got {quant}")
    arr = np.asarray(arr, dtype=float)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy = np.full(64, int(quant), dtype=np.int64)
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes(qy[np.argsort(ZIGZAG)].astype(np.uint8)))
    # NOTE: DQT stores the table in zigzag order; qy is flat so any
    # permutation equals itself — the argsort is for shape-parity with
    # non-flat tables if quant ever becomes one
    comps = 1 if gray else 3
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([comps])
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        sof += bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    seg(0xC0, bytes(sof))

    def dht(cls, tid, bits, values):
        seg(0xC4, bytes([cls << 4 | tid]) + bytes(bits[1:]) + bytes(values))

    dht(0, 0, *_STD_DC_LUMA)
    dht(1, 0, *_STD_AC_LUMA)
    if not gray:
        dht(0, 1, *_STD_DC_CHROMA)
        dht(1, 1, *_STD_AC_CHROMA)

    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    if gray:
        sos = bytes([1, 1, 0x00, 0, 63, 0])
    else:
        sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    seg(0xDA, sos)

    dc_y = _build_encode_table(*_STD_DC_LUMA)
    ac_y = _build_encode_table(*_STD_AC_LUMA)
    wtr = _BitWriter()
    mcu_count = 0
    rst_n = 0

    def maybe_restart():
        nonlocal mcu_count, rst_n, preds
        mcu_count += 1
        if restart_interval and mcu_count % restart_interval == 0:
            wtr.flush()
            wtr.out.extend(bytes([0xFF, 0xD0 + rst_n]))
            rst_n = (rst_n + 1) % 8
            for k in preds:
                preds[k] = 0

    preds = {"y": 0, "cb": 0, "cr": 0}
    if gray:
        blocks = _fdct_quant(_pad8(arr), qy)
        for row in blocks:
            for b in row:
                preds["y"] = _encode_block(wtr, b, preds["y"], dc_y, ac_y)
                maybe_restart()
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        ypad = _pad8(y, 16)
        # 2x2 box-mean subsample AFTER padding to the MCU grid
        cbp = _pad8(cb, 16)
        crp = _pad8(cr, 16)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        yb = _fdct_quant(ypad, qy)
        cbb = _fdct_quant(cbs, qy)
        crb = _fdct_quant(crs, qy)
        dc_c = _build_encode_table(*_STD_DC_CHROMA)
        ac_c = _build_encode_table(*_STD_AC_CHROMA)
        for my in range(ypad.shape[0] // 16):
            for mx in range(ypad.shape[1] // 16):
                for by in range(2):
                    for bx in range(2):
                        preds["y"] = _encode_block(
                            wtr, yb[my * 2 + by][mx * 2 + bx],
                            preds["y"], dc_y, ac_y,
                        )
                preds["cb"] = _encode_block(wtr, cbb[my][mx], preds["cb"], dc_c, ac_c)
                preds["cr"] = _encode_block(wtr, crb[my][mx], preds["cr"], dc_c, ac_c)
                maybe_restart()
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
