"""QOI ("Quite OK Image") codec in pure Python/numpy — REAL and LOSSLESS.

Implements the public QOI specification (qoiformat.org, Dominic Szablewski,
2022): 14-byte header, the six chunk ops (RGB, RGBA, INDEX into the 64-entry
running hash table, DIFF, LUMA, RUN), the (r·3+g·5+b·7+a·11) % 64 index hash
and the 8-byte end marker. Unlike GIF/JPEG the roundtrip is bit-exact, which
makes it the strongest correctness gate in the codec suite: the pytest
asserts decode(encode(img)) == img for every pixel.

The per-pixel loops are Python (QOI chunks are inherently sequential —
each op is relative to the previous pixel and the running table); fine at
thumbnail scale inside the DecodeImage actor pool.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def encode_qoi(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → QOI bytes (channels=3, sRGB colorspace)."""
    h, w = img.shape[:2]
    px = img.reshape(-1, 3)
    out = bytearray(_MAGIC + struct.pack(">IIBB", w, h, 3, 0))
    index = [(0, 0, 0, 0)] * 64  # qoi.c inits the table to transparent black
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b in px.tolist():
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        ih = (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
        if index[ih] == (r, g, b, 255):
            out.append(ih)
        else:
            index[ih] = (r, g, b, 255)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif -32 <= dg <= 31 and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7:
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([0xFE, r, g, b])
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(payload: bytes) -> np.ndarray:
    """QOI → (h, w, 3) uint8 RGB (alpha dropped for RGBA files)."""
    if payload[:4] != _MAGIC:
        raise ValueError("not a QOI")
    w, h, channels, _cs = struct.unpack(">IIBB", payload[4:14])
    if channels not in (3, 4):
        raise ValueError(f"bad QOI channel count {channels}")
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64  # matches qoi.c table init
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    data = payload
    while i < n:
        op = data[pos]
        pos += 1
        if op == 0xFE:  # RGB
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif op == 0xFF:  # RGBA
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = op >> 6
            if tag == 0:  # INDEX
                r, g, b, a = index[op & 0x3F]
            elif tag == 1:  # DIFF
                r = (r + ((op >> 4) & 3) - 2) % 256
                g = (g + ((op >> 2) & 3) - 2) % 256
                b = (b + (op & 3) - 2) % 256
            elif tag == 2:  # LUMA
                dg = (op & 0x3F) - 32
                nxt = data[pos]
                pos += 1
                r = (r + dg + ((nxt >> 4) & 0x0F) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (nxt & 0x0F) - 8) % 256
            else:  # RUN
                run = (op & 0x3F) + 1
                out[i : i + run] = (r, g, b, a)
                i += run
                # qoi.c refreshes the table once per chunk, runs included
                index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
                continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    return out[:, :3].reshape(h, w, 3)
