"""ANN similarity search + multimodal plumbing tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pagerank_ray.stages.knn import build_ivf, knn_bruteforce, knn_ivf, train_centroids
from pagerank_ray.stages.multimodal import (
    DecodeImage,
    image_features,
    sample_frames,
    synth_media,
)


def _vectors(n=300, d=24, seed=1):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d))
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(tab), vecs


def _numpy_topk(vecs, queries, qids, k):
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qu = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = unit @ qu.T
    rows = []
    for qi, qid in enumerate(qids):
        s = sims[:, qi].copy()
        s[qid] = -np.inf  # exclude self
        order = np.lexsort((np.arange(len(s)), -s))[:k]
        for r, v in enumerate(order):
            rows.append((qid, v, r + 1))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "rank"])


def test_knn_bruteforce_matches_numpy(ray_session):
    ds, vecs = _vectors()
    qids = np.array([0, 5, 17])
    # float32 storage: query with the same rounded vectors the dataset holds
    stored = vecs.astype(np.float32).astype(np.float64)
    out = knn_bruteforce(ds, stored[qids], qids, k=8)
    expected = _numpy_topk(stored, stored[qids], qids, 8)
    got = out[["query_id", "vec_id", "rank"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expected.astype(got.dtypes.to_dict()))


def test_knn_ivf_recall(ray_session):
    ds, vecs = _vectors(n=400)
    stored = vecs.astype(np.float32).astype(np.float64)
    qids = np.array([3, 42, 99, 250])
    cents = train_centroids(ds, 8)
    ivf = build_ivf(ds, cents).materialize()
    approx = knn_ivf(ivf, cents, stored[qids], qids, k=10, nprobe=3)
    exact = knn_bruteforce(ds, stored[qids], qids, k=10)
    # recall@10 of the approximate index vs exact
    recalls = []
    for qid in qids:
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        recalls.append(len(a & e) / len(e))
    assert np.mean(recalls) >= 0.5  # nprobe=3 of 8 buckets


def test_image_features_plumbing(ray_session):
    media = rd.from_arrow(synth_media(30))
    feats = image_features(media, embed_dim=16, concurrency=2).to_pandas()
    assert len(feats) == 30
    assert all(len(e) == 16 for e in feats["embedding"])
    # deterministic per content: same payload → same features on a second run
    feats2 = image_features(rd.from_arrow(synth_media(30)), embed_dim=16, concurrency=2).to_pandas()
    a = np.stack(feats.sort_values("media_id")["embedding"].map(np.asarray))
    b = np.stack(feats2.sort_values("media_id")["embedding"].map(np.asarray))
    np.testing.assert_array_equal(a, b)


def test_frame_sampler_real_ppm_stream(ray_session):
    from pagerank_ray.stages.multimodal import ppm_stream_frames

    media_tab = synth_media(12)
    media = rd.from_arrow(media_tab)
    frames = sample_frames(media, every_ms=1000, concurrency=2).to_pandas()
    # reference: every frame's ts (uniform over duration), sampled at >= 1000ms
    expected = 0
    for ty, payload, dur in zip(
        media_tab.column("media_type").to_pylist(),
        media_tab.column("payload").to_pylist(),
        media_tab.column("duration_ms").to_pylist(),
    ):
        if ty != "video":
            continue
        n = len(ppm_stream_frames(payload))
        ts = [int(i * dur / n) for i in range(n)]
        last, cnt = None, 0
        for t in ts:
            if last is None or t - last >= 1000:
                cnt, last = cnt + 1, t
        expected += cnt
    vids = frames[frames["media_id"].isin(
        [i for i, t in enumerate(media_tab.column("media_type").to_pylist()) if t == "video"]
    )]
    assert len(vids) == expected
    # emitted frames are REAL P6 images, decodable back to (24, 32, 3)
    from pagerank_ray.stages.multimodal import decode_ppm

    img = decode_ppm(vids.iloc[0]["frame"])
    assert img.shape == (24, 32, 3)


def test_real_decode_path_raises():
    import pyarrow as pa

    dec = DecodeImage(deterministic_fake=False)
    # WebP is genuinely unsupported (VP8 codec not implementable here) → stub
    # raise; malformed GIF/JPEG take their REAL decode paths and fail parsing
    webp = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([b"RIFF\x00\x00\x00\x00WEBPVP8 junk"], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        dec(webp)
    bad_gif = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([b"GIF87a not a real gif stream"], pa.binary()),
        }
    )
    with pytest.raises(ValueError):
        dec(bad_gif)
    truncated_jpeg = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([b"\xff\xd8\xff\xe0 not a real jpeg"], pa.binary()),
        }
    )
    with pytest.raises(ValueError):
        dec(truncated_jpeg)


def test_image_decode_roundtrip_and_embedding():
    from pagerank_ray.stages.multimodal import (
        decode_bmp, decode_ppm, encode_ppm, image_embedding, resize_nearest,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(img)), img)
    # hand-built 2x2 24-bit BMP (bottom-up, BGR, stride padded to 8)
    import struct

    px = {(0, 0): (255, 0, 0), (0, 1): (0, 255, 0), (1, 0): (0, 0, 255), (1, 1): (9, 8, 7)}
    rows = b""
    for y in (1, 0):  # bottom-up
        r = b""
        for x in (0, 1):
            rr, gg, bb = px[(y, x)]
            r += bytes([bb, gg, rr])
        rows += r + b"\x00\x00"  # pad 6 -> 8
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
    bmp = hdr + info + rows
    out = decode_bmp(bmp)
    for (y, x), v in px.items():
        assert tuple(out[y, x]) == v
    # embedding: real, deterministic, unit-norm
    e = image_embedding(img, 16)
    assert e.shape == (16,) and abs(float(np.linalg.norm(e)) - 1.0) < 1e-5
    # resize: nearest keeps corner pixels
    rs = resize_nearest(img, (8, 8))
    assert rs.shape == (8, 8, 3) and tuple(rs[0, 0]) == tuple(img[0, 0])


def test_audio_wav_features(ray_session):
    from pagerank_ray.stages.multimodal import audio_features, decode_wav, encode_wav

    rate = 8000
    t = np.arange(rate, dtype=np.float64) / rate
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    wav = encode_wav(x, rate)
    dec, r = decode_wav(wav)
    assert r == rate and len(dec) == rate
    np.testing.assert_allclose(dec, x / 32768.0, atol=1e-4)
    media = rd.from_arrow(synth_media(20))
    audio_ids = [i for i in range(20) if i % 5 == 4]
    feats = audio_features(media, n_windows=8, concurrency=2).to_pandas()
    feats = feats[feats["media_id"].isin(audio_ids)]
    assert len(feats) == len(audio_ids)
    for v in feats["audio_features"]:
        arr = np.asarray(v)
        assert arr.shape == (9,)
        # pure-ish sine at 0.5 amplitude: every RMS window near 0.35
        assert np.all(arr[:8] > 0.2) and np.all(arr[:8] < 0.5)


def test_knn_bruteforce_duplicate_vector_ties(ray_session):
    """Regression: tie groups at the k boundary must resolve by smallest
    vec_id (the SQL oracle's ORDER BY sim DESC, vec_id), not by whatever
    argpartition kept."""
    from pagerank_ray.stages.knn import knn_bruteforce
    import pandas as pd

    rng = np.random.default_rng(2)
    base = rng.standard_normal(8)
    # 6 identical vectors (exact cosine ties) + 20 random ones
    vecs = [base.copy() for _ in range(6)] + [rng.standard_normal(8) for _ in range(20)]
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": [v.tolist() for v in vecs]}
    )
    got = knn_bruteforce(
        rd.from_pandas(df), np.asarray([base]), np.asarray([999]), k=3, exclude_self=False
    )
    # all 6 duplicates tie at cosine 1.0; the 3 smallest ids must win, in order
    assert got["vec_id"].tolist() == [0, 1, 2]


def test_png_roundtrip_all_filters_and_color_types():
    """encode_png's five forward filters are written independently of the
    decoder's unfiltering, so a roundtrip match checks both directions."""
    from pagerank_ray.stages.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    for c in (1, 3, 4):  # gray / RGB / RGBA containers
        for filt in (0, 1, 2, 3, 4, "mix"):
            h, w = int(rng.integers(5, 40)), int(rng.integers(5, 40))
            img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
            f = [i % 5 for i in range(h)] if filt == "mix" else filt
            png = encode_png(img if c > 1 else img[:, :, 0], filters=f)
            dec = decode_png(png)
            if c == 1:
                exp = np.repeat(img, 3, axis=2)
            elif c == 4:
                exp = img[:, :, :3]  # decode drops alpha
            else:
                exp = img
            np.testing.assert_array_equal(dec, exp, err_msg=f"c={c} filt={filt}")


def test_png_palette_gray_alpha_and_rejects():
    import struct
    import zlib

    from pagerank_ray.stages.multimodal import _PNG_SIG, decode_png

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    def build(w, h, ctype, raw_rows, extra=b"", depth=8, interlace=0):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        return (
            _PNG_SIG
            + chunk(b"IHDR", ihdr)
            + extra
            + chunk(b"IDAT", zlib.compress(raw_rows))
            + chunk(b"IEND", b"")
        )

    rng = np.random.default_rng(1)
    w, h = 7, 5
    # color type 3: palette indices -> PLTE rows
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(h, w), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    dec = decode_png(build(w, h, 3, raw, extra=chunk(b"PLTE", plte.tobytes())))
    np.testing.assert_array_equal(dec, plte[idx])
    # color type 4: gray+alpha -> gray replicated to RGB
    ga = rng.integers(0, 256, size=(h, w, 2), dtype=np.uint8)
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(h))
    dec = decode_png(build(w, h, 4, raw))
    np.testing.assert_array_equal(dec, np.repeat(ga[:, :, :1], 3, axis=2))
    # 16-bit depth and Adam7 interlace are out of scope and must raise
    with pytest.raises(ValueError):
        decode_png(build(w, h, 0, b"\x00" * (h * (2 * w + 1)), depth=16))
    with pytest.raises(ValueError):
        decode_png(build(w, h, 0, b"\x00" * (h * (w + 1)), interlace=1))
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_decode_image_dispatches_png(ray_session):
    """DecodeImage (real mode) must decode PNG payloads end-to-end — PNG is a
    REAL compressed codec path (stdlib zlib), not a stub."""
    from pagerank_ray.stages.multimodal import encode_png

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    tab = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([encode_png(img, filters=4)], pa.binary()),
        }
    )
    out = DecodeImage(deterministic_fake=False)(tab)
    assert out.num_rows == 1
    assert out.column("decoded_w")[0].as_py() == 30
    assert out.column("decoded_h")[0].as_py() == 20
    emb = np.asarray(out.column("embedding")[0].as_py())
    assert abs(float(np.linalg.norm(emb)) - 1.0) < 1e-5


# ---------------------------------------------------------------------------
# baseline JPEG codec (stages/jpeg.py)
# ---------------------------------------------------------------------------


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 255 // max(w + h - 2, 1)], axis=2
    ).astype(np.uint8)


def test_jpeg_roundtrip_subsampling_quality_restarts():
    """Encode→decode across 4:4:4/4:2:2/4:2:0, two qualities, with and
    without restart markers, on odd (non-multiple-of-16) dimensions. Error
    bounds are the expected lossy-DCT profile, far below any plumbing bug."""
    from pagerank_ray.stages.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(41, 57)
    bounds = {"4:4:4": 4, "4:2:2": 10, "4:2:0": 12}
    for sub, bound in bounds.items():
        for ri in (0, 3):
            dec = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub,
                                          restart_interval=ri))
            assert dec.shape == img.shape
            err = np.abs(dec.astype(int) - img.astype(int))
            assert err.max() <= bound, (sub, ri, err.max())
            assert err.mean() < 3.0


def test_jpeg_uniform_image_is_exact_dc_only():
    """A flat image has only DC energy: the file must be small and decode to
    (nearly) the exact color — catches any zigzag/quant indexing slip that a
    noisy roundtrip could hide inside its error budget."""
    from pagerank_ray.stages.jpeg import decode_jpeg, encode_jpeg

    img = np.full((24, 24, 3), (200, 64, 120), dtype=np.uint8)
    enc = encode_jpeg(img, quality=95, subsampling="4:4:4")
    assert len(enc) < 900, len(enc)
    dec = decode_jpeg(enc)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_dct_matrix_and_huffman_tables_are_valid():
    """Independent structural checks that don't rely on the roundtrip:
    orthonormal DCT basis; Annex K tables form prefix-free canonical codes
    that exactly tile the 16-bit LUT they claim."""
    from pagerank_ray.stages import jpeg as J

    assert np.allclose(J.DCT_M @ J.DCT_M.T, np.eye(8), atol=1e-12)
    for bits, vals in (
        (J.DC_LUMA_BITS, J.DC_LUMA_VALS), (J.DC_CHROMA_BITS, J.DC_CHROMA_VALS),
        (J.AC_LUMA_BITS, J.AC_LUMA_VALS), (J.AC_CHROMA_BITS, J.AC_CHROMA_VALS),
    ):
        assert sum(bits) == len(vals)
        codes = J._canonical_codes(bits, vals)
        covered = 0
        for code, length, _sym in codes:
            assert code < (1 << length), "code overflows its length"
            covered += 1 << (16 - length)
        assert covered <= 1 << 16  # prefix-free ⇒ windows never overlap
    assert len(J.AC_LUMA_VALS) == 162 and len(J.AC_CHROMA_VALS) == 162
    # zigzag is a permutation visiting neighbours diagonally
    assert sorted(J.ZIGZAG_FLAT.tolist()) == list(range(64))
    assert J.ZIGZAG_FLAT[0] == 0 and J.ZIGZAG_FLAT[1] == 1 and J.ZIGZAG_FLAT[2] == 8


def test_jpeg_rejects_unsupported_sof():
    from pagerank_ray.stages.jpeg import decode_jpeg, encode_jpeg

    enc = bytearray(encode_jpeg(_gradient(16, 16)))
    # rewrite the SOF0 marker to SOF9 (arithmetic coding — genuinely out of scope)
    i = enc.find(b"\xff\xc0")
    assert i > 0
    enc[i + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_jpeg_progressive_matches_baseline_decode():
    """The 10-scan progressive encoding carries EXACTLY the same quantized
    coefficients as the baseline 4:4:4 encoding, so both decodes must be
    bit-identical — gating every scan type (DC first/refine, AC band
    first/refine, EOB, ZRL, correction bits)."""
    from pagerank_ray.stages.jpeg import decode_jpeg, encode_jpeg
    from pagerank_ray.stages.jpeg_progressive import encode_jpeg_progressive

    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 256, (24, 32, 3), dtype=np.uint8),
        _gradient(40, 56),
        np.full((16, 16, 3), 77, np.uint8),
        rng.integers(0, 256, (17, 23, 3), dtype=np.uint8),
    ]
    for q in (20, 90, 98):
        for img in cases:
            dp = decode_jpeg(encode_jpeg_progressive(img, quality=q))
            db = decode_jpeg(encode_jpeg(img, quality=q, subsampling="4:4:4"))
            assert (dp == db).all()
    # sparse-detail image: long zero runs exercise ZRL + per-block EOB paths
    img = np.full((64, 64, 3), 128, np.uint8)
    img[5, 7] = [255, 0, 0]
    img[40, 50] = [0, 255, 0]
    dp = decode_jpeg(encode_jpeg_progressive(img, quality=95))
    db = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:4:4"))
    assert (dp == db).all()


def test_jpeg_progressive_grayscale():
    from pagerank_ray.stages.jpeg import decode_jpeg
    from pagerank_ray.stages.jpeg_progressive import encode_jpeg_progressive

    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, (25, 31), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(g, quality=85))
    assert out.shape == (25, 31, 3)
    assert (out[:, :, 0] == out[:, :, 1]).all() and (out[:, :, 1] == out[:, :, 2]).all()


def test_decode_image_dispatches_jpeg(ray_session):
    """DecodeImage (real mode) decodes JPEG payloads end-to-end, and the
    embedding is close to the same image's lossless-PPM embedding — the two
    container paths must agree up to JPEG loss."""
    from pagerank_ray.stages.jpeg import encode_jpeg
    from pagerank_ray.stages.multimodal import encode_ppm

    img = _gradient(48, 36)
    tab = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [encode_jpeg(img, quality=95, subsampling="4:2:0"), encode_ppm(img)],
                pa.binary(),
            ),
        }
    )
    out = DecodeImage(deterministic_fake=False)(tab)
    assert out.column("decoded_w").to_pylist() == [36, 36]
    assert out.column("decoded_h").to_pylist() == [48, 48]
    e_jpeg = np.asarray(out.column("embedding")[0].as_py())
    e_ppm = np.asarray(out.column("embedding")[1].as_py())
    assert float(e_jpeg @ e_ppm) > 0.999


# ---------------------------------------------------------------------------
# GIF codec (stages/gif.py)
# ---------------------------------------------------------------------------


def test_gif_roundtrip_palette_exact():
    """decode(encode(img)) must equal the quantized-palette reference exactly
    (GIF is palette-lossy but LZW-lossless), across shapes that exercise
    dictionary growth, width increase, and the CLEAR-overflow path."""
    from pagerank_ray.stages.gif import _PALETTE, decode_gif, encode_gif, quantize_662

    rng = np.random.default_rng(11)
    for shape in [(24, 32), (1, 1), (7, 5), (64, 48)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        dec = decode_gif(encode_gif(img))
        ref = _PALETTE[quantize_662(img)]
        assert dec.shape == ref.shape
        assert (dec == ref).all()
    flat = np.zeros((200, 300, 3), np.uint8)  # forces dict overflow → CLEAR
    assert (decode_gif(encode_gif(flat)) == _PALETTE[quantize_662(flat)]).all()


def test_gif_rejects_non_gif():
    from pagerank_ray.stages.gif import decode_gif

    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 40)


def test_decode_image_dispatches_gif(ray_session):
    """DecodeImage (real mode) must decode GIF payloads end-to-end."""
    from pagerank_ray.stages.gif import encode_gif

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    tab = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([encode_gif(img)], pa.binary()),
        }
    )
    out = DecodeImage(deterministic_fake=False)(tab)
    assert out.num_rows == 1
    assert out.column("decoded_w")[0].as_py() == 30
    assert out.column("decoded_h")[0].as_py() == 20
    emb = np.asarray(out.column("embedding")[0].as_py())
    assert abs(float(np.linalg.norm(emb)) - 1.0) < 1e-5


# ---------------------------------------------------------------------------
# QOI codec (stages/qoi.py) — lossless: roundtrip must be bit-exact
# ---------------------------------------------------------------------------


def test_qoi_roundtrip_bit_exact():
    from pagerank_ray.stages.qoi import decode_qoi, encode_qoi

    rng = np.random.default_rng(19)
    for shape in [(24, 32), (1, 1), (7, 5), (64, 48)]:
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        assert (decode_qoi(encode_qoi(img)) == img).all()
    flat = np.zeros((50, 60, 3), np.uint8)  # long RUN chains
    assert (decode_qoi(encode_qoi(flat)) == flat).all()
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)  # INDEX-heavy
    idximg = pal[rng.integers(0, 8, (30, 40))]
    assert (decode_qoi(encode_qoi(idximg)) == idximg).all()
    g = np.tile(np.arange(256, dtype=np.uint8), (20, 1))  # DIFF/LUMA-heavy
    grad = np.stack([g, g // 2, 255 - g], axis=2)
    assert (decode_qoi(encode_qoi(grad)) == grad).all()


def test_qoi_rejects_non_qoi():
    from pagerank_ray.stages.qoi import decode_qoi

    with pytest.raises(ValueError):
        decode_qoi(b"nope" + b"\x00" * 20)


def test_decode_image_dispatches_qoi(ray_session):
    from pagerank_ray.stages.qoi import encode_qoi

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    tab = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([encode_qoi(img)], pa.binary()),
        }
    )
    out = DecodeImage(deterministic_fake=False)(tab)
    assert out.num_rows == 1
    assert out.column("decoded_w")[0].as_py() == 30
    assert out.column("decoded_h")[0].as_py() == 20


def test_gif_truncated_raises_valueerror():
    from pagerank_ray.stages.gif import decode_gif, encode_gif

    rng = np.random.default_rng(29)
    payload = encode_gif(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    for cut in (10, 14, 100, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])


def test_hashing_embedder_matches_per_doc_reference(ray_session):
    """Vectorized batch kernel ≡ per-doc scalar feature hashing; unit norm;
    empty docs → zero vectors; stage plumbing through the actor pool."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.stages.dedup import _hash_tokens
    from pagerank_ray.stages.embed import HashingEmbedder, embed_documents

    docs = ["key agg row scan", "", "a a a", "zz unseen 42 tokens here", "   "]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    out = HashingEmbedder(dim=16)(t)
    emb = np.stack([np.asarray(v) for v in out.column("embedding").to_pylist()])
    for i, d in enumerate(docs):
        raw = np.zeros(16, np.int64)
        for h in _hash_tokens(d.split()):
            b = int(h % np.uint64(16))
            raw[b] += 1 - 2 * int((h >> np.uint64(33)) & np.uint64(1))
        s = int((raw * raw).sum())
        exp = raw * (1.0 / np.sqrt(s)) if s else raw.astype(float)
        exp = np.floor(np.abs(exp) * 1e6 + 0.5) / 1e6 * np.sign(exp)
        np.testing.assert_array_equal(emb[i], exp)
    assert np.allclose(np.linalg.norm(emb[0]), 1.0, atol=2e-5)
    np.testing.assert_array_equal(emb[1], np.zeros(16))
    np.testing.assert_array_equal(emb[4], np.zeros(16))

    ds = embed_documents(rd.from_arrow(t), dim=16, concurrency=(1, 2), batch_size=2)
    got = ds.to_pandas().sort_values("doc_id")
    emb2 = np.stack([np.asarray(v) for v in got["embedding"]])
    np.testing.assert_array_equal(emb, emb2)
