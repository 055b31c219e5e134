"""GIF87a/89a codec in pure Python/numpy — REAL LZW, no external libraries.

Decoder: header + logical-screen walk, global/local color tables, extension
skipping (graphic control / comment / application), first image descriptor,
variable-width LSB-first LZW decompression (CLEAR/END, dict growth to 4096,
the KwKwK self-reference case), 4-pass deinterlace, palette mapping →
(h, w, 3) uint8 RGB. Animated GIFs: the FIRST frame is returned.

Encoder (for roundtrip tests and synth_media): images are quantized to a
fixed 6×7×6-level RGB palette (252 entries) and compressed with a real
LZW dictionary (code width growth, CLEAR at dictionary overflow) — the
encoder exists so the decoder can be exercised against independently
constructed streams, mirroring the PNG/JPEG codec pairs in this package
(stages/multimodal.py, stages/jpeg.py).

The per-code LZW loops are Python (like the JPEG entropy decoder before its
LUT pass); fine at thumbnail scale, and the decode runs inside the
DecodeImage actor pool, so the cost is per-payload worker-side compute.
"""

from __future__ import annotations

import struct

import numpy as np

# fixed uniform quantization palette: 6 red × 7 green × 6 blue = 252 entries
_R_LEVELS = np.linspace(0, 255, 6).round().astype(np.uint8)
_G_LEVELS = np.linspace(0, 255, 7).round().astype(np.uint8)
_B_LEVELS = np.linspace(0, 255, 6).round().astype(np.uint8)


def _palette() -> np.ndarray:
    r, g, b = np.meshgrid(_R_LEVELS, _G_LEVELS, _B_LEVELS, indexing="ij")
    pal = np.stack([r.ravel(), g.ravel(), b.ravel()], axis=1)
    return np.concatenate([pal, np.zeros((256 - len(pal), 3), np.uint8)])


_PALETTE = _palette()


def quantize_662(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 → palette indices under the fixed 6/7/6 grid."""
    ri = np.clip((img[..., 0].astype(np.int32) * 6) // 256, 0, 5)
    gi = np.clip((img[..., 1].astype(np.int32) * 7) // 256, 0, 6)
    bi = np.clip((img[..., 2].astype(np.int32) * 6) // 256, 0, 5)
    return (ri * 42 + gi * 6 + bi).astype(np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real GIF LZW: dict of (prefix_code, k) → code, width growth, CLEAR on
    4096 overflow. Emits the code stream as LSB-first packed bytes."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    emit(clear, width)
    prefix = -1
    for k in indices.ravel().tolist():
        if prefix < 0:
            prefix = k
            continue
        got = table.get((prefix, k))
        if got is not None:
            prefix = got
            continue
        emit(prefix, width)
        table[(prefix, k)] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            emit(clear, width)
            table.clear()
            next_code = end + 1
            width = min_code_size + 1
        prefix = k
    if prefix >= 0:
        emit(prefix, width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → single-frame GIF89a (fixed 252-color palette)."""
    h, w = img.shape[:2]
    idx = quantize_662(img)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x07, 0, 0])  # GCT present, 2^8 entries; bg 0
    out += _PALETTE.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # no LCT
    min_code = 8
    out.append(min_code)
    data = _lzw_encode(idx, min_code)
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # dictionary as arrays: prefix link + last byte, standard LZW unrolling
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    length = np.zeros(4096, dtype=np.int32)
    for c in range(clear):
        suffix[c] = c
        length[c] = 1
    next_code = end + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    buf = bytearray()  # scratch for expanding one code

    while n_out < n_pixels:
        while nbits < width:
            if pos >= len(data):
                return out[:n_out]
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = end + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == end:
            break
        if prev < 0:
            out[n_out] = suffix[code]
            n_out += 1
            prev = code
            continue
        if code < next_code:
            cur = code
        elif code == next_code:
            cur = prev  # KwKwK: expand prev then append its first byte
        else:
            raise ValueError("corrupt GIF LZW stream")
        # expand cur back-to-front
        buf.clear()
        c = cur
        while c >= 0:
            buf.append(int(suffix[c]))
            c = int(prefix[c])
        first = buf[-1]
        expanded = bytes(reversed(buf))
        if code == next_code:
            expanded += bytes([first])
        take = min(len(expanded), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(expanded[:take], np.uint8)
        n_out += take
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = first
            length[next_code] = length[prev] + 1
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    return out[:n_out]


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF → (h, w, 3) uint8 RGB of the first image block."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    try:
        return _decode_gif_body(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated GIF stream: {e!r}") from e


def _decode_gif_body(payload: bytes) -> np.ndarray:
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _left, _top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        parts = []
        while payload[pos]:
            ln = payload[pos]
            parts.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(parts), min_code, w * h)
        if len(idx) < w * h:  # tolerate short streams: pad with bg index 0
            idx = np.concatenate([idx, np.zeros(w * h - len(idx), np.uint8)])
        grid = idx.reshape(h, w)
        if ipacked & 0x40:  # deinterlace: 4 passes
            de = np.empty_like(grid)
            rows = np.concatenate(
                [np.arange(0, h, 8), np.arange(4, h, 8),
                 np.arange(2, h, 4), np.arange(1, h, 2)]
            )
            de[rows] = grid[: len(rows)]
            grid = de
        return ct[np.minimum(grid, len(ct) - 1)]
    raise ValueError("GIF contains no image block")
