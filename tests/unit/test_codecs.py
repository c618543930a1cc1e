"""Pure-numpy media codec tests: roundtrip properties, committed fixture
decode, and the decode="real" path through the multimodal stages."""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

from pie_ray.functions import codecs as C
from pie_ray.functions.multimodal import (
    DecodeBackend,
    FrameSampler,
    MediaFeaturizer,
    MediaResizer,
    featurize_media,
    hash_media,
    media_near_dups,
    synth_media,
)

FIX = pathlib.Path(__file__).resolve().parents[1] / "fixtures" / "media"
EXPECTED = np.load(FIX / "expected.npz")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse < 1e-9 else 10 * np.log10(255.0**2 / mse)


# ---- core math ------------------------------------------------------------


def test_dct_basis_orthogonal():
    T = C._DCT_T
    np.testing.assert_allclose(T @ T.T, np.eye(8), atol=1e-12)


def test_zigzag_is_permutation_and_standard_prefix():
    assert sorted(C.ZIGZAG.tolist()) == list(range(64))
    # first diagonal walk of the T.81 scan
    assert C.ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    np.testing.assert_array_equal(C.ZIGZAG[C.UNZIGZAG], np.arange(64))


def test_huffman_specs_valid():
    for spec in (C.HUFF_DC_LUMA, C.HUFF_DC_CHROMA, C.HUFF_AC_LUMA, C.HUFF_AC_CHROMA):
        codes = C._canonical_codes(*spec)  # asserts prefix-feasibility
        assert len(codes) == len(spec[1])


# ---- lossless roundtrips ---------------------------------------------------


def test_bmp_roundtrip_exact_odd_stride():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 17, 3), np.uint8)  # 17*3 not 4-aligned
    np.testing.assert_array_equal(C.decode_bmp(C.encode_bmp(img)), img)


def test_bmp_topdown_and_32bit():
    img = EXPECTED["img"]
    b = bytearray(C.encode_bmp(img))
    # flip to top-down by negating height; re-flip rows to compensate
    import struct

    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    flipped = C.decode_bmp(bytes(b))
    np.testing.assert_array_equal(flipped, img[::-1])


def test_ppm_pgm_roundtrip():
    img = EXPECTED["img"]
    np.testing.assert_array_equal(C.decode_ppm(C.encode_ppm(img)), img)
    pgm = b"P5\n# a comment\n4 2\n255\n" + bytes(range(8))
    g = C.decode_ppm(pgm)
    assert g.shape == (2, 4, 3)
    np.testing.assert_array_equal(g[..., 0].ravel(), np.arange(8))


def test_wav_roundtrip_pcm16_and_stereo_mix():
    wav = EXPECTED["wav"]
    back, sr = C.decode_wav(C.encode_wav(wav, 16000))
    assert sr == 16000 and back.shape == wav.shape
    assert np.abs(back - wav).max() < 2e-4  # 16-bit quantization bound
    st = np.stack([wav, -wav], 1)
    mono, _ = C.decode_wav(C.encode_wav(st, 8000))
    assert np.abs(mono).max() < 2e-4  # opposite channels cancel


def test_wav_float32_and_24bit_paths():
    import struct

    x = (np.sin(np.linspace(0, 20, 300)) * 0.7).astype(np.float32)
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    data = x.astype("<f4").tobytes()
    raw = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    back, sr = C.decode_wav(raw)
    assert sr == 44100
    np.testing.assert_allclose(back, x, atol=1e-7)
    # 24-bit PCM
    v = np.round(x * (1 << 23) * 0.99).astype(np.int32)
    b3 = np.zeros((len(v), 3), np.uint8)
    b3[:, 0] = v & 0xFF
    b3[:, 1] = (v >> 8) & 0xFF
    b3[:, 2] = (v >> 16) & 0xFF
    fmt24 = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    d24 = b3.tobytes()
    raw24 = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt24) + 8 + len(d24))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt24))
        + fmt24
        + b"data"
        + struct.pack("<I", len(d24))
        + d24
    )
    back24, _ = C.decode_wav(raw24)
    np.testing.assert_allclose(back24, x * 0.99, atol=1e-6)


# ---- JPEG ------------------------------------------------------------------


def test_jpeg_flat_image_decodes_flat():
    flat = np.full((16, 16, 3), 128, np.uint8)
    out = C.decode_jpeg(C.encode_jpeg(flat, quality=90))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - 128).max() <= 1


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_roundtrip_psnr(subsample):
    img = EXPECTED["img"]
    dec = C.decode_jpeg(C.encode_jpeg(img, quality=92, subsample=subsample))
    assert dec.shape == img.shape
    assert psnr(dec, img) > (26 if subsample else 30)


def test_jpeg_grayscale_single_component():
    gray = EXPECTED["gray"]
    dec = C.decode_jpeg(C.encode_jpeg(gray, quality=92))
    assert dec.shape == (*gray.shape, 3)
    np.testing.assert_array_equal(dec[..., 0], dec[..., 1])
    assert psnr(dec[..., 0], gray) > 30


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn support: splice a restart interval into an encoded stream
    by re-encoding MCU rows... simpler: encode, then verify the decoder
    handles a DRI segment declaring interval 0 (no-op) and rejects
    progressive SOF."""
    img = EXPECTED["img"]
    enc = C.encode_jpeg(img, quality=92)
    # inject DRI(interval=0) right before SOS — decoder must ignore it
    sos = enc.find(b"\xff\xda")
    with_dri = enc[:sos] + b"\xff\xdd\x00\x04\x00\x00" + enc[sos:]
    np.testing.assert_array_equal(C.decode_jpeg(with_dri), C.decode_jpeg(enc))
    # progressive marker rejected
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(C.CodecError):
        C.decode_jpeg(prog)


def test_jpeg_quality_monotone():
    img = EXPECTED["img"]
    lo = C.decode_jpeg(C.encode_jpeg(img, quality=20))
    hi = C.decode_jpeg(C.encode_jpeg(img, quality=95))
    assert psnr(hi, img) > psnr(lo, img)
    assert len(C.encode_jpeg(img, quality=20)) < len(C.encode_jpeg(img, quality=95))


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    body = ctype + data
    return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))


def _png_build(w, h, depth, color, raw_scanlines, plte=None, interlace=0) -> bytes:
    """Spec-constructed PNG stream (independent of encode_png) so the
    decoder's exotic paths are tested against the wire format, not
    against our own writer."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte.astype(np.uint8).tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(raw_scanlines)) + _png_chunk(b"IEND", b"")


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_exact_every_filter(filter_type):
    """PNG is lossless: encode(filter k) -> decode must be bit-exact for
    every scanline filter, for gray / RGB / RGBA (alpha dropped)."""
    rng = np.random.default_rng(100 + filter_type)
    img = rng.integers(0, 256, (21, 29, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    rgba = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    np.testing.assert_array_equal(C.decode_png(C.encode_png(img, filter_type=filter_type)), img)
    np.testing.assert_array_equal(
        C.decode_png(C.encode_png(gray, filter_type=filter_type)),
        np.repeat(gray[..., None], 3, 2),
    )
    np.testing.assert_array_equal(
        C.decode_png(C.encode_png(rgba, filter_type=filter_type)), rgba[..., :3]
    )


def test_png_palette_and_subbyte_depths():
    rng = np.random.default_rng(4)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (7, 5), dtype=np.uint8)
    rows = b"".join(b"\x00" + r.tobytes() for r in idx)
    np.testing.assert_array_equal(
        C.decode_png(_png_build(5, 7, 8, 3, rows, plte=plte)), plte[idx]
    )
    # depth 4: two indices per byte, MSB first; width 5 leaves pad bits
    idx4 = rng.integers(0, 16, (3, 5), dtype=np.uint8)
    packed = []
    for r in idx4:
        p = np.concatenate([r, [0]])
        packed.append(b"\x00" + ((p[0::2] << 4) | p[1::2]).astype(np.uint8).tobytes())
    np.testing.assert_array_equal(
        C.decode_png(_png_build(5, 3, 4, 3, b"".join(packed), plte=plte)), plte[idx4]
    )
    # depth 1 gray scales 0/1 -> 0/255
    g1 = rng.integers(0, 2, (4, 10), dtype=np.uint8)
    rows = b"".join(b"\x00" + np.packbits(r).tobytes() for r in g1)
    np.testing.assert_array_equal(
        C.decode_png(_png_build(10, 4, 1, 0, rows)),
        np.repeat((g1 * 255)[..., None], 3, 2),
    )


def test_png_16bit_and_gray_alpha():
    rng = np.random.default_rng(5)
    hi = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    lo = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    samp = np.stack([hi, lo], -1).reshape(5, -1)
    rows = b"".join(b"\x00" + r.tobytes() for r in samp)
    # 16-bit samples reduce to the high byte
    np.testing.assert_array_equal(C.decode_png(_png_build(4, 5, 16, 2, rows)), hi)
    ga = rng.integers(0, 256, (6, 5, 2), dtype=np.uint8)
    rows = b"".join(b"\x00" + r.tobytes() for r in ga.reshape(6, -1))
    np.testing.assert_array_equal(
        C.decode_png(_png_build(5, 6, 8, 4, rows)), np.repeat(ga[..., :1], 3, 2)
    )


def test_png_adam7_interlace_with_filters():
    """Adam7: 7 independently filtered sub-images scatter back losslessly,
    including non-zero filters WITHIN a pass (Sub here)."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    adam7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    plain, subbed = b"", b""
    for x0, y0, dx, dy in adam7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        flat = sub.reshape(sub.shape[0], -1).astype(np.int32)
        left = np.zeros_like(flat)
        left[:, 3:] = flat[:, :-3]
        for raw, filt in zip(flat, (flat - left) & 0xFF):
            plain += b"\x00" + raw.astype(np.uint8).tobytes()
            subbed += b"\x01" + filt.astype(np.uint8).tobytes()
    np.testing.assert_array_equal(C.decode_png(_png_build(13, 11, 8, 2, plain, interlace=1)), img)
    np.testing.assert_array_equal(C.decode_png(_png_build(13, 11, 8, 2, subbed, interlace=1)), img)


def test_png_malformed_raises():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    good = C.encode_png(img)
    with pytest.raises(C.CodecError):
        C.decode_png(b"\x89PNG\r\n\x1a\nnot-chunks")
    with pytest.raises(C.CodecError):
        C.decode_png(good[:30])  # truncated inside IHDR/IDAT
    rows = b"\x07" + bytes(12)  # filter type 7 is invalid
    with pytest.raises(C.CodecError):
        C.decode_png(_png_build(4, 1, 8, 2, rows))
    with pytest.raises(C.CodecError):
        C.encode_png(img[..., :2])  # 2-channel input unsupported


def test_mjpeg_split_and_frame_decode():
    frames = EXPECTED["frames"]
    stream = (FIX / "tiny.mjpeg").read_bytes()
    parts = C.split_mjpeg(stream)
    assert len(parts) == len(frames)
    for p, f in zip(parts, frames):
        assert psnr(C.decode_jpeg(p), f) > 30
    # poster frame == first frame
    assert psnr(C.decode_image_bytes(stream), frames[0]) > 30


# ---- committed fixtures ------------------------------------------------------


def test_fixture_files_decode():
    img, gray, wav = EXPECTED["img"], EXPECTED["gray"], EXPECTED["wav"]
    np.testing.assert_array_equal(C.decode_bmp((FIX / "tiny.bmp").read_bytes()), img)
    np.testing.assert_array_equal(C.decode_png((FIX / "tiny.png").read_bytes()), img)
    np.testing.assert_array_equal(C.decode_ppm((FIX / "tiny.ppm").read_bytes()), img)
    g = C.decode_ppm((FIX / "tiny.pgm").read_bytes())
    np.testing.assert_array_equal(g[..., 0], gray)
    assert psnr(C.decode_jpeg((FIX / "tiny_444.jpg").read_bytes()), img) > 30
    assert psnr(C.decode_jpeg((FIX / "tiny_420.jpg").read_bytes()), img) > 26
    jg = C.decode_jpeg((FIX / "tiny_gray.jpg").read_bytes())
    assert psnr(jg[..., 0], gray) > 30
    w, sr = C.decode_wav((FIX / "tiny.wav").read_bytes())
    assert sr == 16000 and np.abs(w - wav).max() < 2e-4


def test_fixtures_regenerate_byte_identical(tmp_path):
    """The generator is deterministic: committed bytes == regenerated bytes
    (guards against accidental fixture drift vs codec changes)."""
    import subprocess
    import sys

    src = pathlib.Path(__file__).resolve().parents[2] / "scripts" / "gen_media_fixtures.py"
    before = {p.name: p.read_bytes() for p in FIX.iterdir() if p.suffix != ".npz"}
    subprocess.run([sys.executable, str(src)], check=True, capture_output=True)
    after = {p.name: p.read_bytes() for p in FIX.iterdir() if p.suffix != ".npz"}
    assert before == after


# ---- DecodeBackend real mode -------------------------------------------------


def test_backend_real_decodes_fixtures():
    be = DecodeBackend("real")
    img = EXPECTED["img"]
    np.testing.assert_array_equal(be.decode_image((FIX / "tiny.bmp").read_bytes(), -1, -1), img)
    assert psnr(be.decode_image((FIX / "tiny_444.jpg").read_bytes(), -1, -1), img) > 30
    wav = be.decode_audio((FIX / "tiny.wav").read_bytes(), -1)
    assert np.abs(wav - EXPECTED["wav"]).max() < 2e-4
    # video: frame seek from MJPEG
    stream = (FIX / "tiny.mjpeg").read_bytes()
    f2 = be.decode_frame(stream, 2, 3, -1, -1)
    assert psnr(f2, EXPECTED["frames"][2]) > 30


def test_backend_real_still_raises_on_unknown():
    be = DecodeBackend("real")
    with pytest.raises(NotImplementedError):
        be.decode_image(b"not-a-container", 4, 4)
    with pytest.raises(NotImplementedError):
        be.decode_audio(b"not-a-container", 100)
    with pytest.raises(NotImplementedError):
        be.decode_frame(b"not-a-container", 0, 4, 4, 4)


def test_backend_auto_prefers_real_falls_back_fake():
    be = DecodeBackend("auto")
    img = EXPECTED["img"]
    np.testing.assert_array_equal(be.decode_image((FIX / "tiny.ppm").read_bytes(), -1, -1), img)
    fake = be.decode_image(b"opaque", 8, 8)
    np.testing.assert_array_equal(fake, DecodeBackend("fake").decode_image(b"opaque", 8, 8))


# ---- real decode through the Ray stages --------------------------------------


def test_stages_run_real_decode_e2e(ray_session):
    ds = synth_media(24, real=True)
    feats = featurize_media(ds, mode="real").take_all()
    assert len(feats) == 24
    rs = ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"mode": "real", "target_w": 8, "target_h": 8},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 2),
    ).take_all()
    assert len(rs) == 16  # images + videos only
    assert all(len(r["rgb"]) == 8 * 8 * 3 for r in rs)
    fr = ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"mode": "real"},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 2),
    ).take_all()
    assert len(fr) == 8 * 4  # videos x n_frames


def test_real_video_frames_differ_and_match_source(ray_session):
    """MJPEG frames brighten by +10 per index in synth_media(real=True);
    the sampled real frames must reflect that monotone brightness."""
    ds = synth_media(6, real=True)
    fr = ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"mode": "real"},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=(1, 1),
    ).take_all()
    by_media: dict[str, dict[int, float]] = {}
    for r in fr:
        mean = np.frombuffer(r["rgb"], np.uint8).astype(np.float64).mean()
        by_media.setdefault(r["media_id"], {})[r["frame_idx"]] = mean
    assert by_media
    for mid, frames in by_media.items():
        means = [frames[i] for i in sorted(frames)]
        assert all(b >= a - 0.5 for a, b in zip(means, means[1:])), (mid, means)


def test_planted_dups_hamming_zero_with_real_decode(ray_session):
    base = synth_media(12, real=True)
    import pyarrow as pa

    def plant(t: pa.Table) -> pa.Table:
        imgs = t.filter(pa.compute.equal(t.column("kind"), "image"))
        dup = imgs.slice(0, 2)
        ids = pa.array([f"dup{i}" for i in range(dup.num_rows)], pa.string())
        dup = dup.set_column(dup.schema.get_field_index("media_id"), "media_id", ids)
        return pa.concat_tables([t, dup])

    pairs = media_near_dups(
        hash_media(base.map_batches(plant, batch_format="pyarrow"), mode="real")
    ).take_all()
    zero = {(p["id_a"], p["id_b"]) for p in pairs if p["hamming"] == 0}
    assert any("dup" in a or "dup" in b for a, b in zero), pairs


def test_featurizer_real_image_stats_match_source():
    """Features from a real BMP payload == features computed directly on
    the source pixels (the decode is exact for lossless containers)."""
    img = EXPECTED["img"]
    import pyarrow as pa

    from pie_ray.functions.multimodal import MEDIA_SCHEMA

    t = pa.table(
        {
            "media_id": pa.array(["x"], pa.string()),
            "kind": pa.array(["image"], pa.string()),
            "payload": pa.array([C.encode_bmp(img)], pa.binary()),
            "mime": pa.array(["image/bmp"], pa.string()),
            "width": pa.array([img.shape[1]], pa.int32()),
            "height": pa.array([img.shape[0]], pa.int32()),
            "duration_ms": pa.array([-1], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )
    out = MediaFeaturizer("real")(t)
    feats = np.array(out.column("features").to_pylist()[0])
    flat = img.reshape(-1, 3).astype(np.float64)
    np.testing.assert_allclose(feats[:3], flat.mean(0), rtol=1e-12)
    np.testing.assert_allclose(feats[3:6], flat.std(0), rtol=1e-12)


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_exact(interlace):
    rng = np.random.default_rng(13)
    pal = rng.integers(0, 256, (40, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 40, (23, 31))]
    np.testing.assert_array_equal(
        C.decode_gif(C.encode_gif(img, interlace=interlace)), img
    )


def test_gif_multiframe_and_lzw_table_reset():
    rng = np.random.default_rng(14)
    pal = rng.integers(0, 256, (200, 3), dtype=np.uint8)
    frames = [pal[rng.integers(0, 200, (16, 20))] for _ in range(4)]
    got = C.decode_gif_frames(C.encode_gif(frames))
    assert len(got) == 4
    for g, f in zip(got, frames):
        np.testing.assert_array_equal(g, f)
    # big random-index image forces the 4096-code table reset path
    big = pal[rng.integers(0, 200, (120, 130))]
    np.testing.assert_array_equal(C.decode_gif(C.encode_gif(big)), big)


def test_gif_patch_frame_composites_over_canvas():
    """A frame may be a sub-rectangle at (left, top): it draws over the
    accumulated canvas (spec draw order). Built by hand — encode_gif only
    writes full-canvas frames."""
    import struct as _s

    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250], [9, 9, 9]], np.uint8)
    base = np.zeros((4, 4), np.uint8)  # all color 0
    patch = np.full((2, 2), 1, np.uint8)  # color 1 at (1, 1)

    def frame_block(idx, left, top, w, h):
        lzw = C._lzw_encode(idx.reshape(-1), 2)
        body = _s.pack("<BHHHHB", 0x2C, left, top, w, h, 0) + bytes([2])
        for i in range(0, len(lzw), 255):
            ch = lzw[i : i + 255]
            body += bytes([len(ch)]) + ch
        return body + b"\x00"

    gif = (
        b"GIF89a"
        + _s.pack("<HHBBB", 4, 4, 0x80 | 1, 0, 0)
        + pal.tobytes()
        + frame_block(base, 0, 0, 4, 4)
        + frame_block(patch, 1, 1, 2, 2)
        + b"\x3b"
    )
    frames = C.decode_gif_frames(gif)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[0], pal[base])
    want = pal[base].copy()
    want[1:3, 1:3] = pal[1]
    np.testing.assert_array_equal(frames[1], want)


def test_gif_rejects_overwide_palettes_and_garbage():
    rng = np.random.default_rng(15)
    with pytest.raises(C.CodecError):
        C.encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))
    with pytest.raises(C.CodecError):
        C.decode_gif(b"GIF89a" + b"\x00" * 4)
    good = C.encode_gif(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(C.CodecError):
        C.decode_gif(good[: len(good) // 2])


def test_gif_fixture_and_backend():
    img = EXPECTED["img"]
    post = (img >> 6) << 6
    np.testing.assert_array_equal(
        C.decode_gif((FIX / "tiny.gif").read_bytes()), post
    )
    be = DecodeBackend("real")
    np.testing.assert_array_equal(
        be.decode_image((FIX / "tiny.gif").read_bytes(), -1, -1), post
    )
    # animated fixture: frame seek matches the posterized source frames
    anim = (FIX / "tiny_anim.gif").read_bytes()
    for fi in range(3):
        want = (EXPECTED["frames"][fi] >> 6) << 6
        np.testing.assert_array_equal(be.decode_frame(anim, fi, 3, -1, -1), want)
