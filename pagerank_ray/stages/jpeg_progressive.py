"""Progressive JPEG (ITU-T T.81 Annex G, SOF2) — pure Python/numpy.

Closes the last JPEG gap the baseline codec (stages/jpeg.py) left open: web
corpora carry a meaningful minority of progressive files, which previously
raised at the decode call site. Scope: spectral selection + successive
approximation, Huffman entropy coding, interleaved DC scans and
single-component AC scans (the only shapes T.81 permits), EOB runs,
refinement correction bits, restart markers, grayscale and color with
subsampling (non-interleaved scans use the component's OWN ceil-divided
block grid, not the MCU-padded one — the classic implementation trap).

The scan algorithms follow the public spec (T.81 figures G.3-G.7) in the
formulation popularized by the open-source decoders (libjpeg jdphuff.c /
stb_image): DC first = diff-decode << Al; DC refine = one raw bit at Al;
AC first = runs + EOBRUN; AC refine = newly-nonzero ±(1<<Al) interleaved
with correction bits for already-nonzero coefficients.

The companion encoder exists for the roundtrip test suite (same pattern as
the baseline encoder): 3-component 4:4:4 or grayscale, a 10-scan script
exercising BOTH successive-approximation directions (Al=1 first scans +
Ah=1→Al=0 refinements), restricted to EOB runs of length 1 so the standard
Annex K Huffman tables suffice. Coefficient state lives in Python lists
during scans (refinement is read-modify-write per coefficient — inherently
scalar); everything after the last scan is the shared vectorized
reconstruction tail (jpeg._reconstruct).
"""

from __future__ import annotations

import numpy as np

from pagerank_ray.stages.jpeg import (
    _EXT,
    _HALF,
    _BitWriter,
    _Component,
    _build_lut,
    _canonical_codes,
    _destuff,
    _encode_table,
    _fdct_blocks,
    _magnitude,
    _pad_edge,
    _reconstruct,
    _scaled_quant,
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_CHROMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG_COL,
    ZIGZAG_ROW,
)


class _Reader:
    """Bit reader over destuffed scan bytes (32-bit windows, no per-bit I/O)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00\x00"
        self.pos = 0

    def huff(self, lut) -> int:
        byte = self.pos >> 3
        window = int.from_bytes(self.data[byte : byte + 4], "big")
        e = lut[(window >> (16 - (self.pos & 7))) & 0xFFFF]
        ln = e & 31
        if not ln:
            raise ValueError("invalid Huffman prefix (progressive scan)")
        self.pos += ln
        return e >> 5

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        byte = self.pos >> 3
        window = int.from_bytes(self.data[byte : byte + 4], "big")
        v = (window >> (32 - (self.pos & 7) - n)) & ((1 << n) - 1)
        self.pos += n
        return v

    def align_to(self, byte_off: int):
        self.pos = byte_off * 8


def _extend(v: int, s: int) -> int:
    return v - _EXT[s] if v < _HALF[s] else v


def decode_progressive(payload: bytes) -> np.ndarray:
    """Progressive JPEG → (h, w, 3) RGB uint8 (same contract as decode_jpeg)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], list[int]] = {}
    comps: list[_Component] = []
    blocks_py: list[list[list[int]]] = []  # per comp: per block: 64 zigzag coefs
    w = h = hmax = vmax = mcux = mcuy = 0
    restart_interval = 0
    i = 2
    n = len(payload)
    saw_sof = False
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
        if marker == 0xDB:
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
        elif marker == 0xC2:  # SOF2
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            comps = []
            for c in range(nc):
                cid, hv, tq_id = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append(_Component(cid, hv >> 4, hv & 0x0F, tq_id))
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            blocks_py = []
            for c in comps:
                c.bw = mcux * c.h
                c.bh = mcuy * c.v
                blocks_py.append([[0] * 64 for _ in range(c.bw * c.bh)])
            saw_sof = True
        elif marker == 0xC4:
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = list(body[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _build_lut(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # one scan of many
            if not saw_sof:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                for ci, comp in enumerate(comps):
                    if comp.cid == cid:
                        scan_comps.append((ci, comp, tt >> 4, tt & 0x0F))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ah_al = body[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 0x0F
            data_start = i + 2 + seglen
            clean, restarts, consumed = _destuff(payload[data_start:])
            _decode_scan(
                clean,
                restarts,
                scan_comps,
                blocks_py,
                ss,
                se,
                ah,
                al,
                huff,
                restart_interval,
                mcux,
                mcuy,
                w,
                h,
                hmax,
                vmax,
            )
            i = data_start + consumed
            continue
        i += 2 + seglen
    if not comps:
        raise ValueError("no SOF2 in progressive stream")
    for c, bp in zip(comps, blocks_py):
        c.blocks = np.array(bp, dtype=np.int32).reshape(len(bp), 64)
    return _reconstruct(comps, qt, w, h, hmax, vmax)


def _nonint_grid(comp: _Component, w: int, h: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Non-interleaved scan block grid: ceil over the component's OWN sampled
    dimensions (T.81 A.2.2) — smaller than the MCU-padded storage grid."""
    cw = (w * comp.h + hmax - 1) // hmax
    ch = (h * comp.v + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _decode_scan(
    clean, restarts, scan_comps, blocks_py, ss, se, ah, al,
    huff, restart_interval, mcux, mcuy, w, h, hmax, vmax,
):
    rd = _Reader(clean)
    restarts_iter = iter(restarts)
    next_restart = next(restarts_iter, None)
    eobrun = 0
    preds = {ci: 0 for ci, *_ in scan_comps}

    def maybe_restart(unit: int):
        nonlocal eobrun, next_restart
        if restart_interval and unit and unit % restart_interval == 0:
            if next_restart is not None:
                rd.align_to(next_restart)
                next_restart = next(restarts_iter, None)
            eobrun = 0
            for k in preds:
                preds[k] = 0

    if ss == 0:  # DC scan (interleaved when ns > 1)
        if se != 0:
            raise ValueError("progressive DC scan must have Se = 0")
        if len(scan_comps) > 1:
            for mcu in range(mcux * mcuy):
                maybe_restart(mcu)
                my, mx = divmod(mcu, mcux)
                for ci, comp, td, _ta in scan_comps:
                    bp = blocks_py[ci]
                    for by in range(comp.v):
                        row_base = (my * comp.v + by) * comp.bw + mx * comp.h
                        for bx in range(comp.h):
                            _dc_block(rd, bp[row_base + bx], huff[(0, td)], ah, al, preds, ci)
        else:
            ci, comp, td, _ta = scan_comps[0]
            bw_n, bh_n = _nonint_grid(comp, w, h, hmax, vmax)
            bp = blocks_py[ci]
            for unit in range(bw_n * bh_n):
                maybe_restart(unit)
                row, col = divmod(unit, bw_n)
                _dc_block(rd, bp[row * comp.bw + col], huff[(0, td)], ah, al, preds, ci)
        return

    # AC scan — T.81 G.1: always a single component, non-interleaved
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must contain exactly one component")
    ci, comp, _td, ta = scan_comps[0]
    lut = huff[(1, ta)]
    bw_n, bh_n = _nonint_grid(comp, w, h, hmax, vmax)
    bp = blocks_py[ci]
    p1 = 1 << al
    for unit in range(bw_n * bh_n):
        maybe_restart(unit)
        row, col = divmod(unit, bw_n)
        blk = bp[row * comp.bw + col]
        if ah == 0:  # ------- first scan of this band (G.1.2.2)
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = rd.huff(lut)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:  # EOBn: current block ends; r more bits of run
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.bits(r)
                        break
                    k += 16  # ZRL
                else:
                    k += r
                    if k > se:
                        raise ValueError("AC run past spectral band")
                    blk[k] = _extend(rd.bits(s), s) << al
                    k += 1
        else:  # ------- refinement scan (G.1.2.3)
            if eobrun:
                for k in range(ss, se + 1):
                    if blk[k]:
                        if rd.bits(1):
                            if (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] > 0 else -p1
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = rd.huff(lut)
                r, s = rs >> 4, rs & 15
                v = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.bits(r)
                        r = 64  # no new coefficient; correct to end of band
                else:
                    if s != 1:
                        raise ValueError("refinement magnitude must be 1")
                    v = p1 if rd.bits(1) else -p1
                while k <= se:
                    if blk[k]:
                        if rd.bits(1):
                            if (blk[k] & p1) == 0:
                                blk[k] += p1 if blk[k] > 0 else -p1
                    else:
                        if r == 0:
                            if v:
                                blk[k] = v
                            k += 1
                            break
                        r -= 1
                    k += 1


def _dc_block(rd, blk, dc_lut, ah, al, preds, ci):
    if ah == 0:  # first DC scan: diff-decode the point-transformed value
        s = rd.huff(dc_lut)
        diff = _extend(rd.bits(s), s) if s else 0
        preds[ci] += diff
        blk[0] = preds[ci] << al
    else:  # refinement: one raw bit at position Al
        if rd.bits(1):
            blk[0] += 1 << al


# ---------------------------------------------------------------------------
# progressive encoder (test-suite companion; 4:4:4 color or grayscale)
# ---------------------------------------------------------------------------


def encode_jpeg_progressive(img: np.ndarray, *, quality: int = 90) -> bytes:
    """(h, w, 3) RGB or (h, w) grayscale uint8 → progressive JPEG bytes.

    Ten-scan script (color; grayscale uses the luma subset): DC first
    (Al=1, interleaved), per-component AC first scans over two luma bands +
    full chroma bands (Al=1), then DC and AC refinement scans (Ah=1, Al=0) —
    both successive-approximation directions and spectral selection are
    exercised. EOB runs are capped at one block so the Annex K Huffman
    tables (no EOBn symbols beyond 0x00) encode every scan."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [_pad_edge(img.astype(np.float64), 8, 8)]
        quants = [_scaled_quant(QUANT_LUMA, quality)]
    else:
        x = img.astype(np.float64)
        ycc = [
            0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2],
            -0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2] + 128.0,
            0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2] + 128.0,
        ]
        planes = [_pad_edge(p, 8, 8) for p in ycc]
        quants = [
            _scaled_quant(QUANT_LUMA, quality),
            _scaled_quant(QUANT_CHROMA, quality),
            _scaled_quant(QUANT_CHROMA, quality),
        ]
    comp_blocks = []
    for plane, q in zip(planes, quants):
        coefs = _fdct_blocks(plane)
        zz = coefs[:, ZIGZAG_ROW, ZIGZAG_COL]
        quant = np.round(zz / q.reshape(8, 8)[ZIGZAG_ROW, ZIGZAG_COL]).astype(np.int64)
        comp_blocks.append((quant.tolist(), plane.shape[1] // 8, plane.shape[0] // 8))

    dc_tabs = [
        _encode_table(_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)),
        _encode_table(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)),
    ]
    ac_tabs = [
        _encode_table(_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)),
        _encode_table(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)),
    ]

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    nc = 1 if gray else 3
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(
        0xDB,
        b"\x00" + quants[0].reshape(8, 8)[ZIGZAG_ROW, ZIGZAG_COL].astype(np.uint8).tobytes(),
    )
    if not gray:
        out += seg(
            0xDB,
            b"\x01" + quants[1].reshape(8, 8)[ZIGZAG_ROW, ZIGZAG_COL].astype(np.uint8).tobytes(),
        )
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    if gray:
        sof += bytes([1, 0x11, 0])
    else:
        sof += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC2, sof)
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        if gray and th == 1:
            continue
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    def sos_header(comp_specs, ss_, se_, ah_, al_) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, td, ta in comp_specs:
            body += bytes([cid, (td << 4) | ta])
        return seg(0xDA, body + bytes([ss_, se_, (ah_ << 4) | al_]))

    # ---- scan 1: DC first, all components interleaved, Al = 1
    wtr = _BitWriter()
    preds = [0] * nc
    mcux = comp_blocks[0][1]
    mcuy = comp_blocks[0][2]
    for mcu in range(mcux * mcuy):
        for ci in range(nc):
            blk = comp_blocks[ci][0][mcu]
            val = int(blk[0]) >> 1  # point transform (arithmetic shift)
            diff = val - preds[ci]
            preds[ci] = val
            s, bitsv = _magnitude(diff)
            code, ln = dc_tabs[min(ci, 1)][s]
            wtr.write(code, ln)
            wtr.write(bitsv, s)
    wtr.flush()
    out += sos_header([(ci + 1, min(ci, 1), 0) for ci in range(nc)], 0, 0, 0, 1)
    out += wtr.buf

    # ---- AC first scans, Al = 1
    luma_bands = [(1, 5), (6, 63)]
    ac_scans = [(0, b) for b in luma_bands]
    for ci in range(1, nc):
        ac_scans.append((ci, (1, 63)))
    for ci, (ss_, se_) in ac_scans:
        act = ac_tabs[min(ci, 1)]
        wtr = _BitWriter()
        blocks = comp_blocks[ci][0]
        for blk in blocks:
            vals = [
                (v >> 1) if v >= 0 else -((-v) >> 1) for v in blk[ss_ : se_ + 1]
            ]
            k = ss_
            for off, v in enumerate(vals):
                if v == 0:
                    continue
                pos = ss_ + off
                run = pos - k
                while run >= 16:
                    code, ln = act[0xF0]
                    wtr.write(code, ln)
                    run -= 16
                s, bitsv = _magnitude(v)
                code, ln = act[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(bitsv, s)
                k = pos + 1
            if k <= se_:  # EOB run of exactly one block (Annex-K-compatible)
                code, ln = act[0x00]
                wtr.write(code, ln)
        wtr.flush()
        out += sos_header([(ci + 1, 0, min(ci, 1))], ss_, se_, 0, 1)
        out += wtr.buf

    # ---- DC refinement: one raw bit (bit 0) per block, interleaved
    wtr = _BitWriter()
    for mcu in range(mcux * mcuy):
        for ci in range(nc):
            wtr.write(int(comp_blocks[ci][0][mcu][0]) & 1, 1)
    wtr.flush()
    out += sos_header([(ci + 1, min(ci, 1), 0) for ci in range(nc)], 0, 0, 1, 0)
    out += wtr.buf

    # ---- AC refinement scans, Ah = 1, Al = 0 (libjpeg jcphuff G.1.2.3)
    for ci, (ss_, se_) in ac_scans:
        act = ac_tabs[min(ci, 1)]
        wtr = _BitWriter()
        blocks = comp_blocks[ci][0]
        for blk in blocks:
            absv = [abs(int(v)) for v in blk[ss_ : se_ + 1]]
            eob = ss_ - 1
            for off, t in enumerate(absv):
                if t == 1:
                    eob = ss_ + off
            r = 0
            br: list[int] = []
            for off, t in enumerate(absv):
                k = ss_ + off
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    code, ln = act[0xF0]
                    wtr.write(code, ln)
                    r -= 16
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                if t > 1:  # already nonzero at the previous level → correction bit
                    br.append(t & 1)
                    continue
                code, ln = act[(r << 4) | 1]
                wtr.write(code, ln)
                wtr.write(1 if blk[k] > 0 else 0, 1)
                for b in br:
                    wtr.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                code, ln = act[0x00]  # EOB run of one block
                wtr.write(code, ln)
                for b in br:
                    wtr.write(b, 1)
        wtr.flush()
        out += sos_header([(ci + 1, 0, min(ci, 1))], ss_, se_, 1, 0)
        out += wtr.buf

    out += b"\xff\xd9"
    return bytes(out)
