"""Pure-Python media codecs for the multimodal path.

The container images for a real fleet carry PIL/ffmpeg; this
environment doesn't, so the REAL decode path covers the formats a
standard library + numpy can handle bit-exactly:

- **BMP** (24-bit uncompressed BI_RGB): full encode/decode with the
  canonical 54-byte header, bottom-up rows, 4-byte row padding, BGR
  order — plus nearest-neighbor resize on the decoded array.
- **WAV** (PCM 16-bit mono/stereo): RIFF chunk walk (unknown chunks
  skipped per spec), samples as int16 numpy arrays.

Compressed formats (JPEG/PNG/MP3/H.264) genuinely need external
libraries and stay behind ``NotImplementedError`` in
``ext/multimodal.py`` — the dispatch there sniffs magic bytes and
routes BMP/WAV here.
"""

from __future__ import annotations

import struct

import numpy as np

# --- BMP ---------------------------------------------------------------------

_BMP_FILE_HEADER = "<2sIHHI"  # magic, file size, reserved x2, pixel offset
_BMP_INFO_HEADER = "<IiiHHIIiiII"  # 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB array -> 24-bit uncompressed BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB array, got {pixels.shape}")
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    image_size = row_size * h
    header = struct.pack(_BMP_FILE_HEADER, b"BM", 54 + image_size, 0, 0, 54)
    info = struct.pack(
        _BMP_INFO_HEADER, 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    body = bytearray(image_size)
    bgr = pixels[:, :, ::-1].astype(np.uint8)  # BMP stores BGR
    for row in range(h):
        src = bgr[h - 1 - row]  # bottom-up row order
        start = row * row_size
        body[start : start + w * 3] = src.tobytes()
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> HxWx3 uint8 RGB array."""
    magic, _, _, _, offset = struct.unpack_from(_BMP_FILE_HEADER, data, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h, _, bpp, compression, *_rest) = struct.unpack_from(
        _BMP_INFO_HEADER, data, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={compression})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for row in range(h):
        start = offset + row * row_size
        bgr = np.frombuffer(data, np.uint8, w * 3, start).reshape(w, 3)
        target = h - 1 - row if bottom_up else row
        out[target] = bgr[:, ::-1]
    return out


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an HxWxC array to height x width."""
    h, w = pixels.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[rows][:, cols]


def dhash(pixels: np.ndarray, hash_size: int = 8) -> int:
    """Difference hash (perceptual fingerprint): integer-exact
    grayscale, nearest-neighbor resize to (hash_size+1) x hash_size,
    one bit per horizontally adjacent pixel pair (left < right).
    hash_size=8 -> 64 bits. Deterministic (no float rounding), robust
    to re-encoding/small edits, flips few bits under local changes —
    the image-side analog of SimHash for banded near-dup search."""
    gray = (
        299 * pixels[:, :, 0].astype(np.int64)
        + 587 * pixels[:, :, 1].astype(np.int64)
        + 114 * pixels[:, :, 2].astype(np.int64)
    ) // 1000
    small = resize_nearest(gray[:, :, None], hash_size + 1, hash_size)[:, :, 0]
    bits = (small[:, :-1] < small[:, 1:]).flatten()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h


# --- WAV ---------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 numpy array (n,) mono or (n, 2) stereo -> PCM WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.tobytes()
    block_align = 2 * channels
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_size = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_size, b"WAVE") + fmt + data_chunk


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM-16 WAV bytes -> (int16 samples [n] or [n, ch], sample_rate).

    Walks RIFF chunks per spec (skipping LIST/INFO etc.), so files
    from arbitrary writers parse.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, channels, rate, bits = 12, None, None, None
    samples = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, body
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(data, "<i2", size // 2, body).copy()
        pos = body + size + (size & 1)  # chunks pad to even offsets
    if samples is None or channels is None:
        raise ValueError("WAV missing fmt/data chunk")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples, rate


def wav_features(samples: np.ndarray, rate: int) -> list[float]:
    """Audio summary features: duration, RMS, peak, zero-cross rate."""
    mono = samples.astype(np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = len(mono)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) / max(n - 1, 1)
    return [
        n / float(rate),
        float(np.sqrt(np.mean(mono**2))),
        float(np.max(np.abs(mono))),
        zc,
    ]


def audio_fingerprint(samples: np.ndarray, rate: int, n_frames: int = 65) -> int:
    """64-bit energy-envelope difference fingerprint of an audio clip.

    The audio analog of ``dhash``: frame the mono signal into
    ``n_frames`` equal windows, take per-frame RMS energy, and emit
    bit i = 1 iff energy[i] > energy[i+1]. Difference coding makes
    the fingerprint invariant to overall gain (a volume-scaled copy
    keeps every inequality) and robust to codec-level noise —
    re-encoded or re-leveled copies of a clip collide, unrelated
    audio does not. Deterministic pure-numpy arithmetic.
    """
    mono = samples.astype(np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if len(mono) < n_frames:
        mono = np.pad(mono, (0, n_frames - len(mono)))
    # equal-size frames via truncation (tail samples beyond an exact
    # multiple are dropped — stable across equal-length near-dups)
    per = len(mono) // n_frames
    framed = mono[: per * n_frames].reshape(n_frames, per)
    energy = np.sqrt(np.mean(framed**2, axis=1))
    bits = energy[:-1] > energy[1:]  # n_frames-1 = 64 bits
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h
