"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

``decode="real"`` decodes GENUINE bytes via the pure-numpy codecs in
:mod:`pie_ray.functions.codecs` — BMP, PPM/PGM, baseline JPEG, PNG
(stdlib-zlib DEFLATE), GIF, WAV-PCM, and for video MJPEG
(concatenated-JPEG) or animated GIF — with PIL / soundfile used as an
extra fallback when a cluster image provides them; formats beyond that
set (MP4, MP3, WebP, ...) raise NotImplementedError.
``decode="fake"`` produces a deterministic pseudo-decode (seeded from the
payload hash) for plumbing tests; ``decode="auto"`` tries real and falls
back to fake on unrecognized payloads.

Scale notes: binary payloads dominate block bytes, so stages here use small
``batch_size`` and drop the payload column as soon as features are
extracted (same rule as dropping `html` after text extraction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from pie_ray.util import stable_hash64

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown / n/a
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64


def _probe_pil():
    """Optional-dependency probe, once per process: the PIL image module
    when importable, else None. The sandbox image has no codec libraries,
    so this returns None here — on a provisioned cluster image the real
    branch self-activates with no code change."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except Exception:
        return None


def _probe_soundfile():
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except Exception:
        return None


class DecodeBackend:
    """Pluggable decode seam, probed ONCE at init (actor ``__init__`` —
    never per batch):

    - 'fake' (default): deterministic pseudo-decode keyed on payload bytes
      — keeps plumbing tests/benches reproducible with arbitrary bytes.
    - 'real': pure-numpy codecs (BMP / PPM / baseline JPEG / PNG / GIF / WAV /
      MJPEG, see :mod:`pie_ray.functions.codecs`), then PIL / soundfile when a
      cluster image provides them; raises NotImplementedError for formats
      none of those cover.
    - 'auto': 'real' when the payload is decodable, else 'fake' — the
      self-upgrading mode for mixed/unknown corpora."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real", "auto"):
            raise ValueError(mode)
        self.mode = mode
        self._pil = _probe_pil() if mode in ("real", "auto") else None
        self._sf = _probe_soundfile() if mode in ("real", "auto") else None

    def _fake_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        h = stable_hash64(payload or b"\x00")
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        w = max(width, 1) if width > 0 else 32
        ht = max(height, 1) if height > 0 else 32
        return rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.mode != "fake":
            from pie_ray.functions import codecs

            if codecs.sniff(payload or b"") in ("bmp", "ppm", "jpeg", "png", "gif"):
                return codecs.decode_image_bytes(payload)
            if self._pil is not None:
                import io

                try:
                    with self._pil.open(io.BytesIO(payload)) as im:
                        return np.asarray(im.convert("RGB"), dtype=np.uint8)
                except Exception:
                    if self.mode == "real":
                        raise
            if self.mode == "real":
                raise NotImplementedError(
                    "unsupported image format (numpy codecs cover BMP/PPM/"
                    "JPEG/PNG/GIF; provision PIL on the cluster image for more)"
                )
        return self._fake_image(payload, width, height)

    def decode_audio(self, payload: bytes, duration_ms: int) -> np.ndarray:
        if self.mode != "fake":
            from pie_ray.functions import codecs

            if codecs.sniff(payload or b"") == "wav":
                return codecs.decode_wav(payload)[0]
            if self._sf is not None:
                import io

                try:
                    data, _sr = self._sf.read(io.BytesIO(payload), dtype="float32")
                    return (
                        data if data.ndim == 1 else data.mean(axis=1).astype(np.float32)
                    )
                except Exception:
                    if self.mode == "real":
                        raise
            if self.mode == "real":
                raise NotImplementedError(
                    "unsupported audio format (numpy codec covers WAV-PCM; "
                    "provision soundfile/pyav on the cluster image for more)"
                )
        h = stable_hash64(payload or b"\x00")
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        n = max(duration_ms, 1) * 16  # fake 16 kHz mono
        return rng.standard_normal(n).astype(np.float32)

    def decode_frame(
        self, payload: bytes, frame_idx: int, n_frames: int, width: int, height: int
    ) -> np.ndarray:
        """Video frame seek+decode. Real path: MJPEG stream -> pick the
        frame at the proportional position among the available frames
        (evenly spaced sampling over the stream, like a timestamp seek).
        Fake path: seeded per (payload, frame_idx) so frames differ
        deterministically — byte-identical to the historical behavior."""
        if self.mode != "fake":
            from pie_ray.functions import codecs

            if codecs.sniff(payload or b"") == "jpeg":
                frames = codecs.split_mjpeg(payload)
                if frames:
                    idx = min((frame_idx * len(frames)) // max(n_frames, 1), len(frames) - 1)
                    return codecs.decode_jpeg(frames[idx])
            if codecs.sniff(payload or b"") == "gif":
                frames = codecs.decode_gif_frames(payload)
                idx = min((frame_idx * len(frames)) // max(n_frames, 1), len(frames) - 1)
                return frames[idx]
            if codecs.sniff(payload or b"") in ("bmp", "ppm", "png"):
                # still-image "video": every sampled frame is the image
                return codecs.decode_image_bytes(payload)
            if self.mode == "real":
                raise NotImplementedError(
                    "unsupported video container (numpy codecs cover MJPEG and animated GIF)"
                )
        return self._fake_image(
            (payload or b"") + int(frame_idx).to_bytes(4, "little"), width, height
        )


class MediaFeaturizer:
    """Actor-pool stage: decode → fixed-dim feature vector per media row.

    __init__ once per actor (decoder setup / model load goes here);
    __call__ per batch. Output drops the payload column (bytes don't travel
    past this stage)."""

    def __init__(self, mode: str = "fake"):
        self.backend = DecodeBackend(mode)

    def _features(self, kind: str, payload: bytes, w: int, h: int, dur: int) -> np.ndarray:
        if kind == "image":
            img = self.backend.decode_image(payload, w, h)
            # channel-mean / std pyramid pooled to FEATURE_DIM (cheap, real shape)
            flat = img.reshape(-1, 3).astype(np.float64)
            stats = np.concatenate([flat.mean(0), flat.std(0)])
        elif kind == "audio":
            wav = self.backend.decode_audio(payload, dur)
            # frame-energy histogram
            frames = wav[: len(wav) - len(wav) % 256].reshape(-1, 256)
            en = (frames**2).mean(1)
            stats = np.histogram(en, bins=6)[0].astype(np.float64)
        else:  # video: sample frames = repeated image decode (stub: one frame)
            img = self.backend.decode_image(payload, w, h)
            flat = img.reshape(-1, 3).astype(np.float64)
            stats = np.concatenate([flat.mean(0), flat.std(0)])
        out = np.zeros(FEATURE_DIM)
        out[: len(stats)] = stats[:FEATURE_DIM]
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        kinds = t.column("kind").to_pylist()
        payloads = t.column("payload").to_pylist()
        ws = t.column("width").to_pylist()
        hs = t.column("height").to_pylist()
        durs = t.column("duration_ms").to_pylist()
        feats = [
            self._features(k, p, w, h, d)
            for k, p, w, h, d in zip(kinds, payloads, ws, hs, durs)
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


def _synth_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic structured test image: smooth gradients + seeded
    texture (compresses like a photo, not like white noise)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack(
        [
            (yy * rng.integers(2, 9) + xx * rng.integers(1, 5)) % 256,
            (xx * rng.integers(2, 9)) % 256,
            ((yy + xx) * rng.integers(1, 6)) % 256,
        ],
        axis=-1,
    )
    tex = rng.integers(-12, 13, size=(h, w, 3))
    return np.clip(base + tex, 0, 255).astype(np.uint8)


def _synth_wave(rng: np.random.Generator, duration_ms: int, sr: int = 16000) -> np.ndarray:
    n = max(duration_ms, 1) * sr // 1000
    t = np.arange(n) / sr
    f = float(rng.integers(110, 1760))
    return (
        0.6 * np.sin(2 * np.pi * f * t) + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


def _encode_payload(kind: str, i: int, rng, w: int, h: int, dur: int) -> tuple[bytes, str]:
    """REAL container bytes for a synthetic media row, rotating formats so
    every numpy codec path gets exercised (BMP, PPM, JPEG 4:4:4, PNG, GIF,
    JPEG 4:2:0 for images; WAV for audio; MJPEG and animated GIF for
    video). GIF rows posterize to 64 levels first — GIF is a palette
    format and this codec deliberately does not quantize."""
    from pie_ray.functions import codecs

    if kind == "audio":
        return codecs.encode_wav(_synth_wave(rng, dur)), "audio/wav"
    img = _synth_image(rng, w, h)
    if kind == "video":
        frames = [
            np.clip(img.astype(np.int32) + 10 * fi, 0, 255).astype(np.uint8)
            for fi in range(4)
        ]
        if i % 2:
            frames = [(f >> 6) << 6 for f in frames]
            return codecs.encode_gif(frames), "image/gif"
        return codecs.encode_mjpeg(frames, quality=90), "video/x-motion-jpeg"
    fmt = i % 6
    if fmt == 0:
        return codecs.encode_bmp(img), "image/bmp"
    if fmt == 1:
        return codecs.encode_ppm(img), "image/x-portable-pixmap"
    if fmt == 2:
        return codecs.encode_jpeg(img, quality=90), "image/jpeg"
    if fmt == 3:
        return codecs.encode_png(img), "image/png"
    if fmt == 4:
        return codecs.encode_gif((img >> 6) << 6), "image/gif"
    return codecs.encode_jpeg(img, quality=90, subsample=True), "image/jpeg"


def synth_media(n: int = 64, seed: int = 11, real: bool = False):
    """Deterministic media table for tests. ``real=False``: payload =
    seeded opaque bytes (plumbing-only). ``real=True``: payload = GENUINE
    encoded containers (BMP/PPM/JPEG/WAV/MJPEG via the numpy codecs) so the
    whole stage stack runs with ``decode="real"`` end-to-end."""
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")}
    kinds = ["image", "audio", "video"]
    for i in range(n):
        h = stable_hash64(f"{seed}|media|{i}")
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        kind = kinds[i % 3]
        w = 16 + (i % 4) * 8 if kind != "audio" else -1
        ht = 16 + (i % 3) * 8 if kind != "audio" else -1
        dur = 250 * (1 + i % 4) if kind != "image" else -1
        if real:
            payload, mime = _encode_payload(kind, i, rng, w, ht, dur)
        else:
            payload = rng.integers(0, 256, size=128, dtype=np.uint8).tobytes()
            mime = {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind]
        rows["media_id"].append(f"m{i:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(mime)
        rows["width"].append(w)
        rows["height"].append(ht)
        rows["duration_ms"].append(dur)
    tbl = pa.table(
        {name: pa.array(rows[name], type=MEDIA_SCHEMA.field(name).type) for name in MEDIA_SCHEMA.names},
        schema=MEDIA_SCHEMA,
    )
    return ray.data.from_arrow(tbl)


def featurize_media(ds, mode: str = "fake", batch_size: int = 16, concurrency=(1, 4)):
    """The featurize pipeline: small batches (binary payloads), actor pool."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def q_media_features(sf_dir: str):
    """Featurize a deterministic synthetic media table (sf_dir unused —
    media payloads are generated, not part of the TPC-H-ish testdata).
    Since round 5 the payloads are REAL containers (BMP/PPM/JPEG/WAV/
    MJPEG) decoded by the pure-numpy codecs — decode="real" end-to-end."""
    return featurize_media(synth_media(64, real=True), mode="real")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (H, W, C) -> (out_h, out_w, C).
    Real resize math — index maps computed once, one fancy-index gather —
    independent of whether the pixels came from a real or fake decode."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
    return img[yi[:, None], xi[None, :]]


class MediaResizer:
    """Actor-pool stage: decode image/video-poster -> resize to a fixed
    (target_w, target_h) -> emit raw RGB bytes + dims. Payload bytes in,
    normalized raw frames out (the shape of a training-data image-prep
    stage). Audio rows are FILTERED OUT (no visual frame to resize) — the
    output contains only image/video media_ids."""

    def __init__(self, target_w: int = 32, target_h: int = 32, mode: str = "fake"):
        self.backend = DecodeBackend(mode)
        self.tw = target_w
        self.th = target_h

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, kinds = t.column("media_id").to_pylist(), t.column("kind").to_pylist()
        payloads = t.column("payload").to_pylist()
        ws, hs = t.column("width").to_pylist(), t.column("height").to_pylist()
        out_ids: list[str] = []
        out_bytes: list[bytes] = []
        for mid, kind, p, w, h in zip(ids, kinds, payloads, ws, hs):
            if kind == "audio":
                continue
            img = self.backend.decode_image(p, w, h)
            out_ids.append(mid)
            out_bytes.append(resize_nearest(img, self.tw, self.th).tobytes())
        n = len(out_ids)
        return pa.table(
            {
                "media_id": pa.array(out_ids, pa.string()),
                "rgb": pa.array(out_bytes, pa.binary()),
                "width": pa.array([self.tw] * n, pa.int32()),
                "height": pa.array([self.th] * n, pa.int32()),
            }
        )


class FrameSampler:
    """Actor-pool stage: video rows -> k evenly spaced frames, one OUTPUT
    ROW PER FRAME (flat_map expansion; frame timestamps derived from
    duration). Each frame decodes independently — the real path seeks the
    proportional frame of an MJPEG stream and decodes it; the fake decode
    is seeded per (payload, frame_index) so frames differ
    deterministically."""

    def __init__(self, n_frames: int = 4, mode: str = "fake"):
        self.backend = DecodeBackend(mode)
        self.n_frames = n_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "ts_ms": [], "rgb": []}
        for mid, kind, p, w, h, dur in zip(
            t.column("media_id").to_pylist(),
            t.column("kind").to_pylist(),
            t.column("payload").to_pylist(),
            t.column("width").to_pylist(),
            t.column("height").to_pylist(),
            t.column("duration_ms").to_pylist(),
        ):
            if kind != "video":
                continue
            dur = max(dur, 1)
            for fi in range(self.n_frames):
                ts = (fi * dur) // self.n_frames
                frame = self.backend.decode_frame(p, fi, self.n_frames, w, h)
                out["media_id"].append(mid)
                out["frame_idx"].append(fi)
                out["ts_ms"].append(ts)
                out["rgb"].append(frame.tobytes())
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "ts_ms": pa.array(out["ts_ms"], pa.int64()),
                "rgb": pa.array(out["rgb"], pa.binary()),
            }
        )


def q_media_resize(sf_dir: str):
    """Resize pipeline over the synthetic media table (rows-only), real
    decode: genuine BMP/PPM/JPEG stills and MJPEG poster frames in."""
    return synth_media(64, real=True).map_batches(
        MediaResizer,
        fn_constructor_kwargs={"mode": "real"},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 4),
    )


def q_media_frames(sf_dir: str):
    """Frame-sampling pipeline over the synthetic media table (rows-only;
    one row per sampled frame of each video), real decode: each frame is
    seek+decoded from a genuine MJPEG stream."""
    return synth_media(64, real=True).map_batches(
        FrameSampler,
        fn_constructor_kwargs={"mode": "real"},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Perceptual image hashing + near-duplicate detection
# ---------------------------------------------------------------------------


def grayscale(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W) float64 luma (ITU-R 601 weights)."""
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def dhash64(img: np.ndarray) -> int:
    """Difference hash (public recipe): 9x8 nearest-neighbor downscale of
    the luma, bit = left pixel brighter than its right neighbor. Robust to
    rescaling/compression; Hamming distance ~ visual difference."""
    g = grayscale(resize_nearest(img, 9, 8).astype(np.uint8)[..., :3]) if img.ndim == 3 else None
    if g is None:
        raise ValueError("expected (H, W, 3) uint8 image")
    bits = (g[:, :-1] > g[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def ahash64(img: np.ndarray) -> int:
    """Average hash: 8x8 luma, bit = pixel above the mean."""
    g = grayscale(resize_nearest(img, 8, 8).astype(np.uint8)[..., :3])
    bits = (g > g.mean()).ravel()
    return int(np.packbits(bits).view(">u8")[0])


def audiohash64(wav: np.ndarray) -> int:
    """Energy-sign fingerprint for audio (the Haitsma-Kalker 2002 shape
    without the FFT — this container has no DSP libs, and frame-energy
    deltas carry the same robust-bit structure): 65 equal frames, bit =
    this frame's energy exceeds the previous frame's."""
    n = len(wav)
    if n == 0:
        return 0
    edges = np.linspace(0, n, 66).astype(np.int64)
    sq = np.concatenate([[0.0], np.cumsum(wav.astype(np.float64) ** 2)])
    en = (sq[edges[1:]] - sq[edges[:-1]]) / np.maximum(np.diff(edges), 1)
    bits = en[1:] > en[:-1]
    return int(np.packbits(bits).view(">u8")[0])


class MediaHasher:
    """Actor-pool stage: 64-bit perceptual fingerprints per modality —
    image/video (first frame) get dHash + aHash over the decoded frame,
    audio gets the frame-energy-sign hash over the decoded waveform
    (carried in ``dhash`` so the banded near-dup pass covers all kinds;
    ``ahash`` is -1 for audio). Payload column dropped on output."""

    def __init__(self, mode: str = "fake"):
        self.backend = DecodeBackend(mode)

    def __call__(self, t: pa.Table) -> pa.Table:
        kinds = t.column("kind").to_pylist()
        payloads = t.column("payload").to_pylist()
        ws = t.column("width").to_pylist()
        hs = t.column("height").to_pylist()
        durs = t.column("duration_ms").to_pylist()

        def wrap(v: int) -> int:
            # two's-complement wrap: int64 column carries the uint64 bits
            return np.array(v, np.uint64).astype(np.int64).item()

        dh, ah = [], []
        for k, p, w, h, dur in zip(kinds, payloads, ws, hs, durs):
            if k == "audio":
                wav = self.backend.decode_audio(p, dur)
                dh.append(wrap(audiohash64(wav)))
                ah.append(-1)
                continue
            img = self.backend.decode_image(p, w, h)
            dh.append(wrap(dhash64(img)))
            ah.append(wrap(ahash64(img)))
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "dhash": pa.array(dh, pa.int64()),
                "ahash": pa.array(ah, pa.int64()),
            }
        )


def hash_media(ds, mode: str = "fake", batch_size: int = 16, concurrency=(1, 4)):
    return ds.map_batches(
        MediaHasher,
        fn_constructor_kwargs={"mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 (numpy 1.x has no bitwise_count)."""
    return (
        np.unpackbits(x.astype(np.uint64).view(np.uint8))
        .reshape(-1, 64)
        .sum(axis=1)
        .astype(np.int64)
    )


NEAR_DUP_BANDS = 4  # 4 x 16-bit bands: hamming <= 3 GUARANTEES a shared band


def media_near_dups(hashes_ds, max_hamming: int = 3, num_buckets: int = 64):
    """Near-duplicate image pairs by banded dHash LSH: split the 64-bit
    hash into NEAR_DUP_BANDS 16-bit bands; any pair within ``max_hamming``
    bit flips shares at least one band whenever max_hamming < bands
    (pigeonhole — candidate generation is COMPLETE for the default 3, the
    same guarantee structure as the MinHash banding in stages/linking).
    One bucketed exchange on (band, value); within-bucket pairs verified
    with a vectorized XOR popcount. Returns (id_a, id_b, hamming) with
    id_a < id_b, distinct."""
    from pie_ray.util import hash64_ints

    def band_tag(t: pa.Table) -> pa.Table:
        # no sentinel filter: every modality carries a real dhash, and an
        # all-ones fingerprint is a LEGITIMATE value that reads back as
        # int64 -1 (e.g. a strict left-to-right luma gradient) — filtering
        # it would break the hamming<=3 completeness guarantee
        h = t.column("dhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids_arr = t.column("media_id").combine_chunks()
        # hash SPACE: audio fingerprints and visual dHashes are different
        # functions — a numeric collision across them is meaningless, so
        # the space id folds into the band key (image+video share one
        # space deliberately: a video's first frame can near-dup an image)
        space = np.asarray(
            pa.compute.equal(t.column("kind"), "audio").to_numpy(zero_copy_only=False),
            np.int64,
        )
        n = len(h)
        if n == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                    "media_id": pa.array([], pa.string()),
                    "dhash": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        band = np.repeat(np.arange(NEAR_DUP_BANDS, dtype=np.int64), n)
        shifts = np.repeat(np.arange(NEAR_DUP_BANDS, dtype=np.uint64) * 16, n)
        h_tiled = np.tile(h, NEAR_DUP_BANDS)
        val = ((h_tiled >> shifts) & np.uint64(0xFFFF)).astype(np.int64)
        ids_tiled = pa.concat_arrays([ids_arr] * NEAR_DUP_BANDS)
        band = band + np.tile(space, NEAR_DUP_BANDS) * NEAR_DUP_BANDS
        key = band * (1 << 16) + val
        bkt = (hash64_ints(key, salt=0x9DA5) % num_buckets).astype(np.int32)
        return pa.table(
            {
                "band": pa.array(band, pa.int64()),
                "val": pa.array(val, pa.int64()),
                "media_id": ids_tiled,
                "dhash": pa.array(h_tiled.astype(np.int64), pa.int64()),
                "bucket": pa.array(bkt, pa.int32()),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        key = (
            g.column("band").to_numpy(zero_copy_only=False) * (1 << 16)
            + g.column("val").to_numpy(zero_copy_only=False)
        )
        ids = np.asarray(g.column("media_id").to_pylist(), dtype=object)
        hs = g.column("dhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(key, kind="stable")
        key, ids, hs = key[order], ids[order], hs[order]
        _, starts, counts = np.unique(key, return_index=True, return_counts=True)
        pa_, pb_ = [], []
        ha_, hb_ = [], []
        for k in np.unique(counts):
            if k < 2:
                continue
            st = starts[counts == k]
            mat_i = ids[st[:, None] + np.arange(k)[None, :]]
            mat_h = hs[st[:, None] + np.arange(k)[None, :]]
            iu, ju = np.triu_indices(int(k), 1)
            pa_.append(mat_i[:, iu].ravel())
            pb_.append(mat_i[:, ju].ravel())
            ha_.append(mat_h[:, iu].ravel())
            hb_.append(mat_h[:, ju].ravel())
        if not pa_:
            return pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "hamming": pa.array([], pa.int64()),
                }
            )
        A = np.concatenate(pa_)
        B = np.concatenate(pb_)
        HA = np.concatenate(ha_)
        HB = np.concatenate(hb_)
        swap = A > B
        A, B = np.where(swap, B, A), np.where(swap, A, B)
        ham = _popcount64(HA ^ HB)
        keep = ham <= max_hamming
        # distinct within bucket (same pair can repeat across bands)
        combo = np.char.add(np.char.add(A[keep].astype(str), "\x1f"), B[keep].astype(str))
        _, first = np.unique(combo, return_index=True)
        return pa.table(
            {
                "id_a": pa.array(A[keep][first], pa.string()),
                "id_b": pa.array(B[keep][first], pa.string()),
                "hamming": pa.array(ham[keep][first], pa.int64()),
            }
        )

    from pie_ray.util import drop_empty_blocks

    # barrier: the pair table is SMALL (verified pairs only) and the next
    # step is another bucketed exchange — two all-to-alls must never share
    # a streaming plan (repo rule: aggregator actors starve at few CPUs)
    paired = drop_empty_blocks(
        hashes_ds.map_batches(band_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .materialize(),
        schema=pa.schema(
            [("id_a", pa.string()), ("id_b", pa.string()), ("hamming", pa.int64())]
        ),
    )

    # cross-bucket dedup: a pair repeats only across bands, and a (band,
    # val) key lands in ONE bucket — but two DIFFERENT shared bands can
    # hash to different buckets, so one more tiny exchange dedups pairs
    def pair_tag(t: pa.Table) -> pa.Table:
        from pie_ray.util import bucket_hash_strings

        key = pa.compute.binary_join_element_wise(
            t.column("id_a"), t.column("id_b"), "\x1f"
        )
        b = (bucket_hash_strings(key, salt=0x77A1) % num_buckets).astype("int32")
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def pair_dedup(g: pa.Table) -> pa.Table:
        from pie_ray.util import rename_grouped

        gb = g.drop_columns(["bucket"]).group_by(["id_a", "id_b"]).aggregate(
            [("hamming", "min")]
        )
        return rename_grouped(gb, ["id_a", "id_b"], ["id_a", "id_b", "hamming"])

    return (
        paired.map_batches(pair_tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pair_dedup, batch_format="pyarrow")
    )


def q_media_phash(sf_dir: str):
    """Driver entry: perceptual hashes + near-dup pairs over a synthetic
    media table with PLANTED exact duplicates (copies of existing payloads
    under new ids — same payload => same decode => hamming 0). Real decode
    since round 5 (payloads are genuine containers). Returns the pair
    table (rows-only; gated by brute-force-hamming parity tests)."""
    base = synth_media(64, real=True)

    def plant(t: pa.Table) -> pa.Table:
        imgs = t.filter(pa.compute.equal(t.column("kind"), "image"))
        k = min(8, imgs.num_rows)
        dup = imgs.slice(0, k)
        ids = pa.array([f"dup{i:04d}" for i in range(k)], pa.string())
        dup = dup.set_column(dup.schema.get_field_index("media_id"), "media_id", ids)
        return pa.concat_tables([t, dup])

    planted = base.map_batches(plant, batch_format="pyarrow")
    return media_near_dups(hash_media(planted, mode="real"))
