"""Baseline JPEG (ITU-T T.81) codec in pure numpy + stdlib — no external
codec library.

Closes the engine's last multimodal decode gap: real compressed JPEG images
now take the REAL path through ``DecodeImage`` (multimodal.py) instead of the
deterministic-fake stub. Scope is baseline sequential DCT, 8-bit, Huffman
entropy coding — the overwhelmingly dominant JPEG flavor in web corpora —
with 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, grayscale, restart markers,
and multi-segment DQT/DHT. Progressive (SOF2) streams dispatch to the
multi-scan decoder in ``stages/jpeg_progressive.py`` (spectral selection +
successive approximation — also REAL); only arithmetic coding and
lossless/hierarchical modes raise ``NotImplementedError``.

Design for the actor-pool hot path:

- Huffman decode uses a 16-bit peek LUT (symbol + code length per 65536
  prefixes) built once per (bits, values) table and CACHED by table bytes —
  web corpora overwhelmingly reuse the Annex K tables, so an actor decodes
  thousands of images against one cached LUT (state in ``__init__`` /
  first use, per the actor-stage contract).
- The per-coefficient symbol loop is inherent to baseline Huffman (each
  code's length depends on the decoded prefix — a true data dependency);
  everything after entropy decode is vectorized over ALL blocks at once:
  dequantize (one multiply), inverse zigzag (one fancy index), IDCT (one
  einsum pair against the 8×8 DCT-II matrix), level shift/clip, chroma
  upsample, YCbCr→RGB.
- The bit reader peeks 32 bits with ``int.from_bytes`` on the destuffed
  scan — O(1) per symbol, no per-bit Python.

The encoder exists so tests can roundtrip without any external JPEG source
(same pattern as png.py's independent encoder): it shares only the constant
tables with the decoder — block split, forward DCT, quantization, run-length
and bit packing are written independently of the decode path.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K — public standard)
# ---------------------------------------------------------------------------

# zigzag scan order, generated (not typed) to avoid transcription slips
_ZZ: list[tuple[int, int]] = []
for _s in range(15):
    _rows = list(range(max(0, _s - 7), min(_s, 7) + 1))
    for _r in (_rows if _s % 2 else reversed(_rows)):
        _ZZ.append((_r, _s - _r))
ZIGZAG_ROW = np.array([r for r, _ in _ZZ], dtype=np.int64)
ZIGZAG_COL = np.array([c for _, c in _ZZ], dtype=np.int64)
# inverse permutation: natural (row-major) index of zigzag position k
ZIGZAG_FLAT = ZIGZAG_ROW * 8 + ZIGZAG_COL

QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II matrix: forward F = M @ B @ M.T, inverse B = M.T @ F @ M
_k = np.arange(8, dtype=np.float64)
DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0) * 0.5
DCT_M[0, :] *= 1.0 / np.sqrt(2.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> list[tuple[int, int, int]]:
    """(code, length, symbol) triples in canonical Huffman order (T.81 C.2)."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length, vals[k]))
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_LUT_CACHE: dict[bytes, list[int]] = {}


def _build_lut(bits: list[int], vals: list[int]) -> list[int]:
    """16-bit-peek LUT: for every 16-bit window, ``(symbol << 5) | length``
    (0 = invalid prefix), as a plain Python list — list indexing is several
    times faster than numpy scalar indexing in the per-symbol decode loop.
    Cached by table bytes — one build serves every image that ships the same
    table (virtually all of the web)."""
    key = bytes(bits) + bytes(vals)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    packed = np.zeros(1 << 16, dtype=np.int32)
    for code, length, symbol in _canonical_codes(bits, vals):
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        packed[lo:hi] = (symbol << 5) | length
    lut = packed.tolist()
    _LUT_CACHE[key] = lut
    return lut


# sign-extension constants (T.81 F.2.2.1): an s-bit magnitude v decodes to
# v - _EXT[s] when v < _HALF[s]
_HALF = [0] + [1 << (s - 1) for s in range(1, 16)]
_EXT = [0] + [(1 << s) - 1 for s in range(1, 16)]


def _destuff(scan: bytes) -> tuple[bytes, list[int], int]:
    """Remove 0xFF00 byte stuffing; return clean bytes, restart boundaries
    (offsets into the CLEAN stream where an RSTn sat), and the number of
    ORIGINAL bytes consumed (so a multi-scan parser can resume at the next
    marker — progressive streams carry one entropy segment per scan)."""
    out = bytearray()
    restarts = []
    i = 0
    n = len(scan)
    while i < n:
        b = scan[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        nxt = scan[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            restarts.append(len(out))
            i += 2
        else:  # EOI or next marker — scan ends
            break
    return bytes(out), restarts, i


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "td", "ta", "blocks", "bw", "bh")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.td = self.ta = 0
        self.blocks: np.ndarray | None = None  # (n_blocks, 64) zigzag coefs
        self.bw = self.bh = 0  # blocks per row / column across the image


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) RGB uint8 (grayscale replicated to 3
    channels, matching the other decoders' contract)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}  # id → (64,) zigzag-order table
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps: list[_Component] = []
    w = h = 0
    restart_interval = 0
    i = 2
    n = len(payload)
    scan_start = -1
    while i < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(body):
                pq, tq_id = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq:
                    tbl = np.frombuffer(body[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    tbl = np.frombuffer(body[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                qt[tq_id] = tbl
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline(+extended) sequential
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq_id = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq_id))
        elif marker == 0xC2:  # SOF2 progressive → the multi-scan decoder
            from pagerank_ray.stages.jpeg_progressive import decode_progressive

            return decode_progressive(payload)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02x} (arithmetic/lossless/hierarchical) "
                "is beyond this decoder"
            )
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _build_lut(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                for comp in comps:
                    if comp.cid == cid:
                        comp.td, comp.ta = tt >> 4, tt & 0x0F
            scan_start = i + 2 + seglen
            break
        i += 2 + seglen
    if scan_start < 0 or not comps:
        raise ValueError("no SOS/SOF in JPEG stream")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.bw = mcux * c.h
        c.bh = mcuy * c.v
        c.blocks = np.zeros((c.bw * c.bh, 64), dtype=np.int32)

    clean, restarts, _consumed = _destuff(payload[scan_start:])
    # The symbol loop below is the one inherently serial part of JPEG decode
    # (each Huffman code's length is known only after decoding its prefix).
    # It is written for CPython speed: one packed list-LUT hit per symbol,
    # 32-bit windows via int.from_bytes (no per-bit work), all reader state
    # in locals, and coefficients accumulated into flat lists that are
    # scattered into the block arrays with ONE numpy fancy-index per
    # component afterwards.
    data = clean + b"\x00\x00\x00\x00"  # padding so windows never IndexError
    from_bytes = int.from_bytes
    half, ext = _HALF, _EXT
    pos = 0
    restarts_iter = iter(restarts)
    next_restart = next(restarts_iter, None)
    preds = [0] * len(comps)
    n_mcus = mcux * mcuy
    fills = [([], [], []) for _ in comps]  # per comp: block idx, zigzag k, value

    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            # byte-align at the recorded RSTn boundary, reset DC predictors
            if next_restart is not None:
                pos = next_restart * 8
                next_restart = next(restarts_iter, None)
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            dc_lut = huff[(0, c.td)]
            ac_lut = huff[(1, c.ta)]
            fb, fk, fv = fills[ci]
            pred = preds[ci]
            for by in range(c.v):
                row_base = (my * c.v + by) * c.bw + mx * c.h
                for bx in range(c.h):
                    block_idx = row_base + bx
                    # --- DC
                    byte = pos >> 3
                    window = from_bytes(data[byte : byte + 4], "big")
                    e = dc_lut[(window >> (16 - (pos & 7))) & 0xFFFF]
                    ln = e & 31
                    if not ln:
                        raise ValueError("invalid Huffman prefix (DC)")
                    s = e >> 5
                    pos += ln
                    if s:
                        byte = pos >> 3
                        window = from_bytes(data[byte : byte + 4], "big")
                        v = (window >> (32 - (pos & 7) - s)) & ext[s]
                        pos += s
                        if v < half[s]:
                            v -= ext[s]
                        pred += v
                    fb.append(block_idx)
                    fk.append(0)
                    fv.append(pred)
                    # --- AC
                    k = 1
                    while k < 64:
                        byte = pos >> 3
                        window = from_bytes(data[byte : byte + 4], "big")
                        e = ac_lut[(window >> (16 - (pos & 7))) & 0xFFFF]
                        ln = e & 31
                        if not ln:
                            raise ValueError("invalid Huffman prefix (AC)")
                        rs = e >> 5
                        pos += ln
                        s = rs & 0x0F
                        if not s:
                            if rs == 0xF0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += rs >> 4
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        byte = pos >> 3
                        window = from_bytes(data[byte : byte + 4], "big")
                        v = (window >> (32 - (pos & 7) - s)) & ext[s]
                        pos += s
                        if v < half[s]:
                            v -= ext[s]
                        fb.append(block_idx)
                        fk.append(k)
                        fv.append(v)
                        k += 1
            preds[ci] = pred

    for c, (fb, fk, fv) in zip(comps, fills):
        if fb:
            c.blocks[np.array(fb, dtype=np.int64), np.array(fk, dtype=np.int64)] = np.array(
                fv, dtype=np.int32
            )

    return _reconstruct(comps, qt, w, h, hmax, vmax)


def _reconstruct(comps, qt, w, h, hmax, vmax) -> np.ndarray:
    """Shared decode tail (baseline + progressive): dequantize, inverse
    zigzag, IDCT, upsample, color convert — vectorized over all blocks."""
    planes = []
    for c in comps:
        q = qt[c.tq][None, :]  # zigzag order, matching the coef layout
        deq = (c.blocks * q).astype(np.float64)
        nat = np.zeros_like(deq)
        nat[:, ZIGZAG_FLAT] = deq  # inverse zigzag, one fancy index
        nat = nat.reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", DCT_M, nat, DCT_M, optimize=True)
        spatial = np.clip(np.round(spatial + 128.0), 0, 255).astype(np.uint8)
        plane = (
            spatial.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        # upsample to full-resolution grid (nearest — T.81 leaves the filter open)
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w].astype(np.float64))

    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (independent of the decode path; shares only the constant tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _encode_table(codes: list[tuple[int, int, int]]) -> dict[int, tuple[int, int]]:
    return {symbol: (code, length) for code, length, symbol in codes}


def _magnitude(v: int) -> tuple[int, int]:
    """value → (category s, s-bit code)."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """Full plane (H, W multiple of 8) → (n_blocks, 8, 8) DCT coefficients."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    )
    return np.einsum("ux,nxy,vy->nuv", DCT_M, blocks, DCT_M, optimize=True)


def _pad_edge(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    ph = (-plane.shape[0]) % mult_y
    pw = (-plane.shape[1]) % mult_x
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    img: np.ndarray,
    *,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF JPEG bytes. ``subsampling`` is
    "4:4:4", "4:2:2" or "4:2:0"; ``restart_interval`` > 0 emits DRI + RSTn."""
    h, w = img.shape[:2]
    sub = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}[subsampling]
    hs, vs = sub
    x = img.astype(np.float64)
    ycc = np.stack(
        [
            0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2],
            -0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2] + 128.0,
            0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2] + 128.0,
        ],
        axis=0,
    )
    y_plane = _pad_edge(ycc[0], 8 * vs, 8 * hs)
    chroma = []
    for p in ycc[1:]:
        p = _pad_edge(p, vs, hs)
        p = p.reshape(p.shape[0] // vs, vs, p.shape[1] // hs, hs).mean(axis=(1, 3))
        chroma.append(_pad_edge(p, 8, 8))
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    comp_blocks = []  # per component: (blocks_zigzag, bw, bh, h_samp, v_samp)
    for plane, q, (ch, cv) in (
        (y_plane, ql, (hs, vs)),
        (chroma[0], qc, (1, 1)),
        (chroma[1], qc, (1, 1)),
    ):
        coefs = _fdct_blocks(plane)
        zz = coefs[:, ZIGZAG_ROW, ZIGZAG_COL]
        quant = np.round(zz / q.reshape(8, 8)[ZIGZAG_ROW, ZIGZAG_COL]).astype(np.int32)
        comp_blocks.append((quant, plane.shape[1] // 8, plane.shape[0] // 8, ch, cv))

    dc_tabs = [_encode_table(_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)),
               _encode_table(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))]
    ac_tabs = [_encode_table(_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)),
               _encode_table(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))]

    wtr = _BitWriter()
    preds = [0, 0, 0]
    mcux = y_plane.shape[1] // (8 * hs)
    mcuy = y_plane.shape[0] // (8 * vs)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.flush()
            wtr.buf += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            preds = [0, 0, 0]
        my, mx = divmod(mcu, mcux)
        for ci, (quant, bw, _bh, ch, cv) in enumerate(comp_blocks):
            dct, act = dc_tabs[min(ci, 1)], ac_tabs[min(ci, 1)]
            for by in range(cv):
                for bx in range(ch):
                    coefs = quant[(my * cv + by) * bw + (mx * ch + bx)]
                    diff = int(coefs[0]) - preds[ci]
                    preds[ci] = int(coefs[0])
                    s, bitsv = _magnitude(diff)
                    code, ln = dct[s]
                    wtr.write(code, ln)
                    wtr.write(bitsv, s)
                    nz = np.flatnonzero(coefs[1:]) + 1
                    k = 1
                    for pos in nz:
                        run = int(pos) - k
                        while run >= 16:
                            code, ln = act[0xF0]
                            wtr.write(code, ln)
                            run -= 16
                        s, bitsv = _magnitude(int(coefs[pos]))
                        code, ln = act[(run << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(bitsv, s)
                        k = int(pos) + 1
                    if k < 64:
                        code, ln = act[0x00]
                        wtr.write(code, ln)
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = ql.reshape(8, 8)[ZIGZAG_ROW, ZIGZAG_COL].astype(np.uint8).tobytes()
    zz_c = qc.reshape(8, 8)[ZIGZAG_ROW, ZIGZAG_COL].astype(np.uint8).tobytes()
    out += seg(0xDB, b"\x00" + zz_l)
    out += seg(0xDB, b"\x01" + zz_c)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
    sof += bytes([1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC0, sof)
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += wtr.buf
    out += b"\xff\xd9"
    return bytes(out)
