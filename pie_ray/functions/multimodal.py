"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
container — see `DecodeBackend`): `decode=\"fake\"` produces a deterministic
fake decode (seeded from the payload hash) so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and tested;
`decode=\"real\"` raises NotImplementedError until a codec library (PIL /
soundfile / pyav) is provisioned on the cluster image.

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
      — keeps tests/benches reproducible even where codecs exist.
    - 'real': decode with PIL / soundfile when importable; raises
      NotImplementedError otherwise (this sandbox has neither).
    - 'auto': 'real' per modality when its library is present, else 'fake'
      — the self-upgrading mode for cluster images."""

    def __init__(self, mode: str = "fake"):
        if mode not in ("fake", "real", "auto"):
            raise ValueError(mode)
        self.mode = mode
        self._pil = _probe_pil() if mode in ("real", "auto") else None
        self._sf = _probe_soundfile() if mode in ("real", "auto") else None

    def decode_image(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self._pil is not None:
            import io

            with self._pil.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("RGB"), dtype=np.uint8)
        if self.mode == "real":
            raise NotImplementedError(
                "real image decode requires PIL/opencv on the cluster image"
            )
        h = stable_hash64(payload or b"\x00")
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        w = max(width, 1) if width > 0 else 32
        ht = max(height, 1) if height > 0 else 32
        return rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)

    def decode_audio(self, payload: bytes, duration_ms: int) -> np.ndarray:
        if self._sf is not None:
            import io

            data, _sr = self._sf.read(io.BytesIO(payload), dtype="float32")
            return data if data.ndim == 1 else data.mean(axis=1).astype(np.float32)
        if self.mode == "real":
            raise NotImplementedError("real audio decode requires soundfile/pyav")
        h = stable_hash64(payload or b"\x00")
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        n = max(duration_ms, 1) * 16  # fake 16 kHz mono
        return rng.standard_normal(n).astype(np.float32)


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


def synth_media(n: int = 64, seed: int = 11):
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")}
    kinds = ["image", "audio", "video"]
    for i in range(n):
        h = stable_hash64(f"{seed}|media|{i}")
        rng = np.random.default_rng(h & 0xFFFFFFFF)
        kind = kinds[i % 3]
        rows["media_id"].append(f"m{i:06d}")
        rows["kind"].append(kind)
        rows["payload"].append(rng.integers(0, 256, size=128, dtype=np.uint8).tobytes())
        rows["mime"].append({"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(16 + (i % 4) * 8 if kind != "audio" else -1)
        rows["height"].append(16 + (i % 3) * 8 if kind != "audio" else -1)
        rows["duration_ms"].append(250 * (1 + i % 4) if kind != "image" else -1)
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
    media payloads are generated, not part of the TPC-H-ish testdata)."""
    return featurize_media(synth_media(64))


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
    duration). Each frame decodes independently — with a real codec this is
    a seek+decode per timestamp; the fake decode is seeded per
    (payload, frame_index) so frames differ deterministically."""

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
                frame = self.backend.decode_image(
                    (p or b"") + fi.to_bytes(4, "little"), w, h
                )
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
    """Resize pipeline over the synthetic media table (rows-only)."""
    return synth_media(64).map_batches(
        MediaResizer, batch_format="pyarrow", batch_size=16, concurrency=(1, 4)
    )


def q_media_frames(sf_dir: str):
    """Frame-sampling pipeline over the synthetic media table (rows-only;
    one row per sampled frame of each video)."""
    return synth_media(64).map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=(1, 4)
    )
