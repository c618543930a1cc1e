"""Generate the committed tiny media fixtures under tests/fixtures/media/.

Deterministic (fixed seed, pure-numpy encoders from pie_ray.functions.codecs)
so re-running reproduces byte-identical files. expected.npz carries the
exact source arrays: lossless formats (BMP/PPM/PGM/WAV) must roundtrip
bit-exact-or-quantization-bounded; JPEG fixtures are checked by PSNR.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pie_ray.functions import codecs  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "media"


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260819)

    yy, xx = np.mgrid[0:21, 0:29].astype(np.float64)
    img = np.clip(
        np.stack([yy * 7 % 256, xx * 6 % 256, (yy + xx) * 4 % 256], -1)
        + rng.integers(-10, 11, (21, 29, 3)),
        0,
        255,
    ).astype(np.uint8)
    gray = img[..., 0]

    t = np.arange(4000) / 16000.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(4000)).astype(
        np.float32
    )

    frames = [np.clip(img.astype(np.int32) + 15 * i, 0, 255).astype(np.uint8) for i in range(3)]

    (OUT / "tiny.bmp").write_bytes(codecs.encode_bmp(img))
    (OUT / "tiny.ppm").write_bytes(codecs.encode_ppm(img))
    (OUT / "tiny.pgm").write_bytes(b"P5\n29 21\n255\n" + gray.tobytes())
    (OUT / "tiny_444.jpg").write_bytes(codecs.encode_jpeg(img, quality=92))
    (OUT / "tiny_420.jpg").write_bytes(codecs.encode_jpeg(img, quality=92, subsample=True))
    (OUT / "tiny_gray.jpg").write_bytes(codecs.encode_jpeg(gray, quality=92))
    (OUT / "tiny.png").write_bytes(codecs.encode_png(img))
    (OUT / "tiny.gif").write_bytes(codecs.encode_gif((img >> 6) << 6))
    (OUT / "tiny_anim.gif").write_bytes(
        codecs.encode_gif([(f >> 6) << 6 for f in frames])
    )
    (OUT / "tiny.wav").write_bytes(codecs.encode_wav(wav, 16000))
    (OUT / "tiny.mjpeg").write_bytes(codecs.encode_mjpeg(frames, quality=92))
    np.savez(
        OUT / "expected.npz",
        img=img,
        gray=gray,
        wav=wav,
        frames=np.stack(frames),
    )
    print(f"wrote fixtures to {OUT}")


if __name__ == "__main__":
    main()
