"""Pure-numpy media codecs — the real-decode backend for multimodal stages.

This container has no codec libraries (no PIL / soundfile / pyav), so the
``decode="real"`` seam in :mod:`pie_ray.functions.multimodal` is backed by
self-contained numpy implementations of public formats:

- **BMP** (Windows DIB, uncompressed BI_RGB 24/32-bit, bottom-up or top-down)
- **PPM/PGM** (netpbm P6/P5 binary, maxval <= 255)
- **baseline JPEG** (ITU-T T.81 sequential DCT: SOF0, Huffman, DQT/DHT/DRI,
  sampling factors 1-2, 1- or 3-component) — both decode AND encode, so
  test fixtures are generated in-repo and every roundtrip property is
  checkable without external files
- **PNG** (ISO 15948: stdlib-zlib DEFLATE, all five scanline filters,
  color types gray/RGB/palette/gray+alpha/RGBA, bit depths 1-16,
  Adam7 interlace) — decode AND encode (8-bit, single-filter rows)
- **GIF** (87a/89a: variable-width LZW, global/local palettes, interlace,
  multi-frame draw-over compositing) — decode AND encode (≤256-color
  frames; quantization is deliberately out of scope)
- **WAV** (RIFF PCM integer 8/16/24/32-bit and IEEE float 32/64-bit)
- **MJPEG** (concatenated JPEG frames — the minimal real *video* container:
  frame sampling seeks to the i-th SOI..EOI segment)

Everything here is deterministic (no RNG), vectorized where it matters
(block DCT/IDCT as one einsum over all blocks; per-symbol Huffman loops are
Python but bounded by the tiny-image payloads these stages carry), and
shared constant tables between encoder and decoder (ITU T.81 Annex K
quantization + Huffman tables), so a transcription slip cannot silently
break roundtrips.
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    """Malformed or unsupported payload for a recognized container."""


# ---------------------------------------------------------------------------
# format sniffing
# ---------------------------------------------------------------------------


def sniff(payload: bytes) -> str | None:
    """Best-effort container sniff by magic bytes; None when unrecognized."""
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "ppm"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


# ---------------------------------------------------------------------------
# BMP (uncompressed BI_RGB)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM" or len(payload) < 54:
        raise CodecError("not a BMP")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise CodecError("BMP core headers unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        raise CodecError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        raise CodecError("BMP truncated")
    rows = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
    px = rows[:, : w * nb].reshape(h, w, nb)
    rgb = px[..., 2::-1]  # BGR(A) -> RGB
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, 2::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


# ---------------------------------------------------------------------------
# netpbm P5 / P6
# ---------------------------------------------------------------------------


def _pnm_tokens(payload: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integers after the magic, skipping
    '#' comments; returns (values, offset-of-first-raster-byte)."""
    vals: list[int] = []
    i = 2
    while len(vals) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise CodecError("PNM header truncated")
        vals.append(int(payload[i:j]))
        i = j
    return vals, i + 1  # exactly ONE whitespace byte separates header/raster


def decode_ppm(payload: bytes) -> np.ndarray:
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise CodecError("not a binary PNM")
    (w, h, maxval), off = _pnm_tokens(payload, 3)
    if maxval > 255 or maxval <= 0 or w <= 0 or h <= 0:
        raise CodecError(f"unsupported PNM maxval={maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    if len(payload) < off + need:
        raise CodecError("PNM truncated")
    arr = np.frombuffer(payload, np.uint8, need, off).reshape(h, w, ch)
    if maxval != 255:
        arr = (arr.astype(np.uint16) * 255 // maxval).astype(np.uint8)
    if ch == 1:
        arr = np.repeat(arr, 3, axis=2)
    return np.ascontiguousarray(arr)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=2)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF PCM / IEEE float)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE -> (mono float32 in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise CodecError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise CodecError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, sr, _brate, _balign, bits = fmt
    if n_ch < 1:
        raise CodecError("WAV channels < 1")
    if audio_fmt == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8, len(data) - len(data) % 3)
            b3 = raw.reshape(-1, 3).astype(np.int32)
            v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / float(1 << 31)
        else:
            raise CodecError(f"unsupported PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, "<f4").astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(data, "<f8").astype(np.float32)
        else:
            raise CodecError(f"unsupported float bit depth {bits}")
    else:
        raise CodecError(f"unsupported WAV format tag {audio_fmt}")
    x = x[: len(x) - len(x) % n_ch]
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1).astype(np.float32)
    return x, sr


def encode_wav(wav: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono (or (N, C)) float in [-1, 1] -> 16-bit PCM WAV bytes."""
    x = np.asarray(wav, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n_ch = x.shape[1]
    pcm = np.clip(np.rint(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, sample_rate, sample_rate * 2 * n_ch, 2 * n_ch, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# baseline JPEG (ITU-T T.81 sequential DCT)
# ---------------------------------------------------------------------------

# zigzag scan: position k in the scan -> index into the natural-order 8x8
# block (generated, not transcribed: diagonal s=r+c, odd diagonals walk
# row-ascending, even diagonals row-descending)
def _zigzag() -> np.ndarray:
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(7, s) + 1)
        for r in (rng if s % 2 == 1 else reversed(rng)):
            order.append(r * 8 + (s - r))
    return np.array(order, np.int64)


ZIGZAG = _zigzag()
UNZIGZAG = np.argsort(ZIGZAG)

# ITU T.81 Annex K quantization tables (natural row-major order)
QUANT_LUMA = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99],
    np.int32,
)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    np.int32,
)

# ITU T.81 Annex K Huffman specs: (BITS[1..16], HUFFVAL). Shared by encoder
# and decoder, so roundtrips hold independent of the exact byte values.
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
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
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman (T.81 C.2): symbol -> (code, length)."""
    assert sum(bits) == len(vals), "corrupt Huffman spec"
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            assert code < (1 << length), "over-subscribed Huffman spec"
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_lut(bits: list[int], vals: list[int]) -> np.ndarray:
    """16-bit-window lookup table: row i = (symbol, code_length) for any
    bitstream whose next 16 bits equal i. One array index per symbol —
    no bit-by-bit tree walk."""
    lut = np.zeros((1 << 16, 2), np.int32)
    lut[:, 1] = -1
    for sym, (code, length) in _canonical_codes(bits, vals).items():
        base = code << (16 - length)
        lut[base : base + (1 << (16 - length))] = (sym, length)
    return lut


class _BitReader:
    """MSB-first bit reader over UNSTUFFED entropy bytes (plain ints —
    payloads here are small; the heavy math is in the vectorized IDCT)."""

    __slots__ = ("data", "n", "bytepos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.bytepos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.bytepos] if self.bytepos < self.n else 0
            self.bytepos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def peek16(self) -> int:
        self._fill(16)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.nbits -= k
        self.acc &= (1 << self.nbits) - 1

    def read(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill(k)
        v = (self.acc >> (self.nbits - k)) & ((1 << k) - 1)
        self.skip(k)
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: t-bit magnitude -> signed value."""
    return v - (1 << t) + 1 if t > 0 and v < (1 << (t - 1)) else v


def _idct_mat() -> np.ndarray:
    """8x8 DCT-III basis T with pixel = T.T @ C @ T, coeff = T @ x @ T.T."""
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    T = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    T[0] *= 1 / np.sqrt(2)
    return T


_DCT_T = _idct_mat()


def _idct_blocks(coef: np.ndarray) -> np.ndarray:
    """(N, 8, 8) dequantized coefficients -> (N, 8, 8) pixel values
    (still centered at 0; caller adds 128 and clips)."""
    return np.einsum("ux,nuv,vy->nxy", _DCT_T, coef.astype(np.float64), _DCT_T)


def _fdct_blocks(px: np.ndarray) -> np.ndarray:
    return np.einsum("ux,nxy,vy->nuv", _DCT_T, px.astype(np.float64), _DCT_T)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (H, W, 3) uint8 RGB (grayscale images
    are replicated to 3 channels). Progressive (SOF2) and arithmetic
    coding are rejected with CodecError."""
    if payload[:2] != b"\xff\xd8":
        raise CodecError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], np.ndarray] = {}  # (class, id) -> decode LUT
    frame = None  # (H, W, comps) with comps = [(cid, h, v, tq)]
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise CodecError("marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD8:  # stray SOI
            pos += 2
            continue
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec == 0:
                    tab = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tab = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                qtabs[tid] = tab[UNZIGZAG]  # store natural order
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17 : i + 17 + cnt])
                htabs[(cls, tid)] = _decode_lut(bits, vals)
                i += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            _prec, H, W, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (H, W, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise CodecError(f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDA:  # SOS: entropy data follows until EOI
            if frame is None:
                raise CodecError("SOS before SOF")
            ns = body[0]
            scan = []  # (comp_idx, dc_lut, ac_lut)
            for s in range(ns):
                cs, tt = body[1 + 2 * s], body[2 + 2 * s]
                ci = next(i for i, c in enumerate(frame[2]) if c[0] == cs)
                scan.append((ci, htabs[(0, tt >> 4)], htabs[(1, tt & 0xF)]))
            return _decode_scan(payload, pos, frame, scan, qtabs, restart_interval)
        # else: APPn / COM / others — skipped
    raise CodecError("JPEG truncated (no SOS)")


def _decode_scan(payload, pos, frame, scan, qtabs, restart_interval):
    H, W, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    n_mcu = mcux * mcuy

    # split entropy data into restart intervals, unstuffing FF00 -> FF
    segs: list[bytes] = []
    cur = bytearray()
    i, n = pos, len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF and i + 1 < n:
            m = payload[i + 1]
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            if m == 0xD9:  # EOI
                break
            i += 2  # stray marker inside scan: skip
            continue
        cur.append(b)
        i += 1
    segs.append(bytes(cur))

    # per-component quantized coefficient store, zigzag layout
    blocks_per_mcu = [c[1] * c[2] for c in comps]
    coef = [np.zeros((n_mcu * bpm, 64), np.int32) for bpm in blocks_per_mcu]
    per_seg = restart_interval if restart_interval else n_mcu
    pred = [0] * len(comps)
    for mcu in range(n_mcu):
        seg_i, off = divmod(mcu, per_seg)
        if off == 0:
            if seg_i >= len(segs):
                raise CodecError("JPEG entropy data truncated")
            reader = _BitReader(segs[seg_i])
            pred = [0] * len(comps)
        for ci, dc_lut, ac_lut in scan:
            for blk in range(blocks_per_mcu[ci]):
                row = coef[ci][mcu * blocks_per_mcu[ci] + blk]
                # DC
                sym, ln = dc_lut[reader.peek16()]
                if ln < 0:
                    raise CodecError("invalid Huffman code")
                reader.skip(int(ln))
                diff = _extend(reader.read(int(sym)), int(sym))
                pred[ci] += diff
                row[0] = pred[ci]
                # AC
                k = 1
                while k < 64:
                    sym, ln = ac_lut[reader.peek16()]
                    if ln < 0:
                        raise CodecError("invalid Huffman code")
                    reader.skip(int(ln))
                    run, size = int(sym) >> 4, int(sym) & 0xF
                    if size == 0:
                        if run == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += run
                    if k > 63:
                        raise CodecError("AC run past block end")
                    row[k] = _extend(reader.read(size), size)
                    k += 1

    # dequantize + dezigzag + IDCT, one einsum per component
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        deq = coef[ci] * qtabs[tq][ZIGZAG][None, :]
        blocks = _idct_blocks(deq[:, UNZIGZAG].reshape(-1, 8, 8)) + 128.0
        # assemble: MCU-major, then v*h blocks row-major within the MCU
        bw, bh = mcux * ch, mcuy * cv
        plane = np.zeros((bh * 8, bw * 8))
        b = blocks.reshape(mcuy, mcux, cv, ch, 8, 8)
        plane = b.transpose(0, 2, 4, 1, 3, 5).reshape(bh * 8, bw * 8)
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // cv, 0), hmax // ch, 1)
        planes.append(plane[:H, :W])

    if len(planes) == 1:
        y = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[..., None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---- JPEG encoder ---------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per T.81
        return bytes(self.out)


def _quality_scale(tab: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex K table."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((tab * scale + 50) // 100, 1, 255).astype(np.int32)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _size_cat(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    nz = np.nonzero(zz[1:])[0] + 1
    prev = 0
    for k in nz:
        run = int(k) - prev - 1
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        v = int(zz[k])
        s = _size_cat(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        prev = int(k)
    if len(nz) == 0 or int(nz[-1]) != 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float -> (n_blocks, 8, 8) with edge replication padding,
    blocks in row-major block order."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if (ph, pw) != (h, w):
        plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def encode_jpeg(img: np.ndarray, quality: int = 90, subsample: bool = False) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> baseline JPEG bytes. ``subsample=True``
    emits 4:2:0 chroma (2x2 box-filtered); default is 4:4:4. Grayscale
    input emits a 1-component stream."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise CodecError("empty image")
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        x = img.astype(np.float64)
        y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
        cb = -0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2] + 128.0
        cr = 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2] + 128.0
        if subsample:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            def half(p):
                p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
                return p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [y, half(cb), half(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    # quantized zigzag blocks per component (row-major block grid)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    zz_blocks, grids = [], []
    for p, (sh, sv), qs in zip(planes, samp, qsel):
        # pad the plane so its block grid covers the full MCU grid
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        bw_, bh_ = mcux * sh, mcuy * sv
        ph, pw = bh_ * 8, bw_ * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        blocks = _plane_blocks(pp) - 128.0
        q = (ql if qs == 0 else qc).astype(np.float64)
        coef = _fdct_blocks(blocks).reshape(-1, 64) / q[None, :]
        zz = np.rint(coef[:, ZIGZAG]).astype(np.int32)
        zz_blocks.append(zz)
        grids.append((bw_, bh_, sh, sv))

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    bw = _BitWriter()
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    pred = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, ((gw, _gh, sh, sv), (dct, act)) in enumerate(zip(grids, tables)):
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * gw + (mx * sh + bx)
                        pred[ci] = _encode_block(bw, zz_blocks[ci][bi], pred[ci], dct, act)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += seg(0xC0, sof)

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos) + entropy + b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MJPEG (concatenated JPEG frames) — the minimal real video container
# ---------------------------------------------------------------------------


def split_mjpeg(payload: bytes) -> list[bytes]:
    """Split a concatenated-JPEG stream into individual frame byte strings.
    EOI (FFD9) cannot occur inside entropy data (FF is always stuffed or a
    restart marker there), so SOI..EOI slicing is exact for baseline
    streams."""
    frames = []
    i = 0
    while True:
        s = payload.find(b"\xff\xd8", i)
        if s < 0:
            break
        e = payload.find(b"\xff\xd9", s + 2)
        if e < 0:
            break
        frames.append(payload[s : e + 2])
        i = e + 2
    return frames


def encode_mjpeg(frames: list[np.ndarray], quality: int = 90) -> bytes:
    return b"".join(encode_jpeg(f, quality=quality) for f in frames)


# ---------------------------------------------------------------------------
# PNG (ISO/IEC 15948 / RFC 2083 — stdlib zlib carries the DEFLATE layer)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Adam7 pass grid: (x0, y0, dx, dy) per pass, spec order
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor over int32 lanes (spec §9.4, exact integer ties)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_unfilter(raw: np.ndarray, h: int, rowbytes: int, bpp: int) -> np.ndarray:
    """Invert per-scanline filtering: ``raw`` is h rows of (1 filter byte +
    rowbytes) from the inflated stream; returns (h, rowbytes) uint8.

    Sub is inverted as a strided cumsum (vectorized); Up as a row add;
    Average/Paeth depend on the RECONSTRUCTED left byte so they walk the
    row — but over bpp-wide lanes with numpy ops, so the Python loop is
    rowbytes/bpp long, not rowbytes × h."""
    rows = raw.reshape(h, 1 + rowbytes)
    ftypes = rows[:, 0]
    if (ftypes > 4).any():
        raise CodecError(f"bad PNG filter type {int(ftypes.max())}")
    out = np.zeros((h, rowbytes), np.int32)
    prior = np.zeros(rowbytes, np.int32)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y, 1:].astype(np.int32)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: cumsum over each bpp lane
            rec = cur.reshape(-1, bpp).cumsum(axis=0).reshape(-1) & 0xFF
        elif f == 2:  # Up
            rec = (cur + prior) & 0xFF
        else:  # Average / Paeth: sequential in x over bpp lanes
            rec = np.zeros(rowbytes, np.int32)
            left = np.zeros(bpp, np.int32)
            upleft = np.zeros(bpp, np.int32)
            for x in range(0, rowbytes, bpp):
                up = prior[x : x + bpp]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    pred = _paeth_vec(left, up, upleft)
                left = (cur[x : x + bpp] + pred) & 0xFF
                rec[x : x + bpp] = left
                upleft = up
        out[y] = rec
        prior = rec
    return out.astype(np.uint8)


def _png_samples(recon: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(h, rowbytes) reconstructed bytes -> (h, w, channels) uint8 samples
    (16-bit samples keep the high byte — the standard 8-bit reduction)."""
    h = recon.shape[0]
    if depth == 8:
        return recon[:, : w * channels].reshape(h, w, channels)
    if depth == 16:
        return recon[:, : w * channels * 2].reshape(h, w, channels, 2)[..., 0]
    # sub-byte depths (1/2/4): unpack bits, MSB first, then regroup
    bits = np.unpackbits(recon, axis=1)
    vals = bits.reshape(h, -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    packed = (vals * weights).sum(axis=2)
    scale = 255 // ((1 << depth) - 1)
    return (packed[:, : w * channels].reshape(h, w, channels) * scale).astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG to (H, W, 3) uint8 RGB. Supports color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); bit depths 1/2/4/8/16
    (16-bit reduced to the high byte; palette indices are never scaled);
    both interlace methods (none + Adam7). Alpha is dropped, matching
    PIL's ``convert("RGB")`` on straight-alpha sources."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise CodecError("not a PNG")
    pos, n = 8, len(payload)
    ihdr: tuple | None = None
    plte: np.ndarray | None = None
    idat: list[bytes] = []
    while pos + 8 <= n:
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        if len(data) != clen:
            raise CodecError("truncated PNG chunk")
        pos += 12 + clen  # skip CRC (zlib layer has its own adler32)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise CodecError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise CodecError("unsupported PNG compression/filter/interlace method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise CodecError(f"unsupported PNG color type {color}")
    if depth not in (1, 2, 4, 8, 16) or (depth < 8 and color in (2, 4, 6)):
        raise CodecError(f"unsupported PNG bit depth {depth} for color type {color}")
    if w == 0 or h == 0:
        raise CodecError("empty PNG")
    stream = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    bpp = max(1, channels * depth // 8)

    def rowbytes_for(width: int) -> int:
        return (width * channels * depth + 7) // 8

    if interlace == 0:
        rb = rowbytes_for(w)
        if stream.size != h * (1 + rb):
            raise CodecError("PNG data size mismatch")
        samples = _png_samples(_png_unfilter(stream, h, rb, bpp), w, channels, depth)
    else:  # Adam7: 7 independently filtered sub-images, scattered back
        samples = np.zeros((h, w, channels), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rb = rowbytes_for(pw)
            chunk = stream[off : off + ph * (1 + rb)]
            if chunk.size != ph * (1 + rb):
                raise CodecError("PNG interlaced data size mismatch")
            off += ph * (1 + rb)
            sub = _png_samples(_png_unfilter(chunk, ph, rb, bpp), pw, channels, depth)
            samples[y0::dy, x0::dx] = sub
        if off != stream.size:
            raise CodecError("PNG interlaced data size mismatch")

    if color == 3:
        if plte is None:
            raise CodecError("palette PNG without PLTE")
        idx = samples[..., 0]
        if depth < 8:
            # _png_samples scaled sub-byte values for gray; palette wants raw indices
            idx = idx // (255 // ((1 << depth) - 1))
        if int(idx.max()) >= len(plte):
            raise CodecError("PNG palette index out of range")
        return plte[idx]
    if color == 0:
        return np.repeat(samples, 3, axis=2)
    if color == 2:
        return np.ascontiguousarray(samples)
    if color == 4:
        return np.repeat(samples[..., :1], 3, axis=2)
    return np.ascontiguousarray(samples[..., :3])  # 6: RGBA -> RGB


def encode_png(img: np.ndarray, filter_type: int = 1) -> bytes:
    """Encode (H, W) gray, (H, W, 3) RGB, or (H, W, 4) RGBA uint8 as an
    8-bit non-interlaced PNG. ``filter_type`` (0..4) applies ONE spec
    filter to every scanline — deterministic output, and it lets tests
    exercise every unfilter path with exact roundtrips (the default Sub
    compresses gradients well without per-row heuristics)."""
    import zlib

    img = np.asarray(img, np.uint8)
    if img.ndim == 2:
        color, channels = 0, 1
        img = img[..., None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, channels = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise CodecError("expected (H,W), (H,W,3) or (H,W,4) uint8")
    if not 0 <= filter_type <= 4:
        raise CodecError(f"bad PNG filter type {filter_type}")
    h, w = img.shape[:2]
    raw = img.reshape(h, w * channels).astype(np.int32)
    bpp = channels
    left = np.zeros_like(raw)
    left[:, bpp:] = raw[:, :-bpp]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    upleft = np.zeros_like(raw)
    upleft[1:, bpp:] = raw[:-1, :-bpp]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - ((left + up) >> 1)
    else:
        filt = raw - _paeth_vec(left, up, upleft)
    lines = np.concatenate(
        [np.full((h, 1), filter_type, np.uint8), (filt & 0xFF).astype(np.uint8)], axis=1
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(lines.tobytes(), 9)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a: LZW, palette, interlace, multi-frame with compositing)
# ---------------------------------------------------------------------------

_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # interlace start/step rows


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width from min_code_size+1 up to 12
    bits, CLEAR resets the table, codes emit prior-string + first-symbol
    growth per the spec. Per-code Python loop — bounded by the tiny
    payloads these stages carry (same budget note as the JPEG Huffman)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = np.empty(n_pixels, np.uint8)
    n_out = 0
    bitpos = 0
    nbits = len(data) * 8
    buf = int.from_bytes(data, "little")

    def reset():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while n_out < n_pixels:
        if bitpos + width > nbits:
            raise CodecError("truncated GIF LZW stream")
        code = (buf >> bitpos) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == len(table) + 2 and prev is not None:
            entry = prev + prev[:1]
        else:
            raise CodecError("bad GIF LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], np.uint8)
        n_out += take
        if prev is not None:
            table[len(table) + 2] = prev + entry[:1]
        prev = entry
        if len(table) + 2 >= (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise CodecError("GIF LZW stream ended early")
    return out


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Encoder twin: emits CLEAR up front and whenever the table reaches
    4096 codes (the simple always-reset strategy every decoder accepts)."""
    clear = 1 << min_code_size
    end = clear + 1
    out_bits: list[tuple[int, int]] = []

    def reset():
        return {bytes([i]): i for i in range(clear)}, min_code_size + 1, clear + 2

    table, width, nxt = reset()
    out_bits.append((clear, width))
    run = b""
    for sym in indices.tobytes():
        cand = run + bytes([sym])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], width))
        table[cand] = nxt
        nxt += 1
        if nxt > (1 << width) and width < 12:
            width += 1
        if nxt >= 4096:
            out_bits.append((clear, width))
            table, width, nxt = reset()
        run = bytes([sym])
    if run:
        out_bits.append((table[run], width))
    out_bits.append((end, width))
    buf = 0
    bitpos = 0
    for code, w in out_bits:
        buf |= code << bitpos
        bitpos += w
    return buf.to_bytes((bitpos + 7) // 8, "little")


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(payload):
            raise CodecError("truncated GIF sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        pos += n


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """All frames of a GIF as (H, W, 3) uint8 RGB, composited onto the
    canvas per the spec's draw order (a frame may be a patch at
    (left, top) — it renders over the accumulated canvas; disposal modes
    beyond draw-over and transparency are ignored, documented). Supports
    87a/89a, global + local color tables, and interlaced frames."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise CodecError("not a GIF")
    w, h, flags = struct.unpack("<HHB", payload[6:11])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        if pos + 3 * n > len(payload):
            raise CodecError("truncated GIF color table")
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None:
        canvas[:] = gct[(payload[11]) if payload[11] < len(gct) else 0]
    frames: list[np.ndarray] = []
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks, all skipped
            pos += 1
            _, pos = _gif_subblocks(payload, pos)
            continue
        if b0 != 0x2C:
            raise CodecError(f"unexpected GIF block 0x{b0:02x}")
        if pos + 9 > len(payload):
            raise CodecError("truncated GIF image descriptor")
        left, top, fw, fh, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            if pos + 3 * n > len(payload):
                raise CodecError("truncated GIF color table")
            ct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise CodecError("GIF frame without a color table")
        if pos >= len(payload):
            raise CodecError("truncated GIF frame")
        min_code = payload[pos]
        pos += 1
        data, pos = _gif_subblocks(payload, pos)
        idx = _lzw_decode(data, min_code, fw * fh)
        if int(idx.max(initial=0)) >= len(ct):
            raise CodecError("GIF palette index out of range")
        px = ct[idx].reshape(fh, fw, 3)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            de = np.empty_like(px)
            src = 0
            for start, step in _GIF_PASSES:
                rows = range(start, fh, step)
                de[list(rows)] = px[src : src + len(rows)]
                src += len(rows)
            px = de
        canvas[top : top + fh, left : left + fw] = px
        frames.append(canvas.copy())
    if not frames:
        raise CodecError("GIF carries no image data")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame (the poster-frame read)."""
    return decode_gif_frames(payload)[0]


def encode_gif(frames: list[np.ndarray] | np.ndarray, interlace: bool = False) -> bytes:
    """Encode full-canvas frame(s) as GIF89a with ONE global color table
    built from the distinct colors across all frames (> 256 distinct
    colors raise — GIF is a palette format; quantization is a modeling
    choice this codec deliberately does not make)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise CodecError("no frames")
    h, w = frames[0].shape[:2]
    stack = np.concatenate([np.asarray(f, np.uint8).reshape(-1, 3) for f in frames])
    colors, inv = np.unique(stack, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise CodecError(f"{len(colors)} distinct colors exceed GIF's 256")
    depth = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros(((1 << depth), 3), np.uint8)
    pal[: len(colors)] = colors
    out = [
        b"GIF89a",
        struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0),
        pal.tobytes(),
    ]
    min_code = max(2, depth)
    per = w * h
    for fi, f in enumerate(frames):
        if f.shape[:2] != (h, w):
            raise CodecError("all GIF frames must share the canvas size")
        idx = inv[fi * per : (fi + 1) * per].astype(np.uint8)
        if interlace:
            rows = idx.reshape(h, w)
            order = [r for start, step in _GIF_PASSES for r in range(start, h, step)]
            idx = rows[order].reshape(-1)
        out.append(
            struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
        )
        out.append(bytes([min_code]))
        lzw = _lzw_encode(idx, min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(bytes([len(chunk)]) + chunk)
        out.append(b"\x00")
    out.append(b"\x3b")
    return b"".join(out)


# ---------------------------------------------------------------------------
# top-level dispatch
# ---------------------------------------------------------------------------


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """Sniff + decode any supported still-image container to (H, W, 3)
    uint8 RGB. For an MJPEG stream this returns the FIRST frame (a valid
    poster-frame decode for video payloads). Raises CodecError when the
    format is unrecognized or unsupported."""
    kind = sniff(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "jpeg":
        return decode_jpeg(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "gif":
        return decode_gif(payload)
    raise CodecError("unrecognized image format")
