"""Deterministic image codec, PSNR and perceptual hash.

Real PNG/JPEG codecs (PIL / cv2) are not available in this container, so
per the task contract the *codec* is a deterministic stand-in while the
Ray-side plumbing (binary columns, actor-pool decode stages, PSNR
verification) is real:

- ``"png"``  → lossless: raw RGB bytes, zlib-compressed.
- ``"jpeg"`` → lossy: uniform quantization (step 6 → PSNR ≈ 43 dB, above
  the 40 dB gate) then zlib. Re-encoding a decoded jpeg is idempotent
  (quantized values are fixed points), mirroring the reference's
  re-encode-path invariant (BASELINE.json input_hint: PSNR≥40dB lossy).

Container layout: ``MRP1|MRJ1`` magic + ``<HH`` (h, w) + zlib payload.
A real deployment would swap ``encode_image``/``decode_image`` for
PIL/turbojpeg inside the same actor-pool stage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_LOSSLESS = b"MRP1"
MAGIC_LOSSY = b"MRJ1"
_QSTEP = 6  # uniform quantizer step → PSNR ≈ 43 dB on uniform noise


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt ∈ {"png", "jpeg"}."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 array")
    h, w = arr.shape[:2]
    if fmt == "png":
        return MAGIC_LOSSLESS + struct.pack("<HH", h, w) + zlib.compress(arr.tobytes(), 1)
    if fmt == "jpeg":
        q = ((arr.astype(np.uint16) // _QSTEP) * _QSTEP + _QSTEP // 2).astype(np.uint8)
        return MAGIC_LOSSY + struct.pack("<HH", h, w) + zlib.compress(q.tobytes(), 1)
    raise NotImplementedError(f"unsupported fmt {fmt!r} (real codecs are stubbed)")


def decode_image(data: bytes) -> np.ndarray:
    """Decode container bytes back to an (h, w, 3) uint8 array."""
    magic, (h, w) = data[:4], struct.unpack("<HH", data[4:8])
    if magic not in (MAGIC_LOSSLESS, MAGIC_LOSSY):
        raise NotImplementedError("real PNG/JPEG decode is stubbed in this container")
    arr = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8)
    return arr.reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


_PHASH_WEIGHTS = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def phash64(arr: np.ndarray) -> int:
    """64-bit average-hash of decoded pixels (block-sum 8×8, threshold by
    the global sum) — a DCT-free perceptual-hash-like value as specified
    in FIXTURES.md; deterministic so Z-order clustering on it is
    meaningful. Integer-only on purpose: a float64 gray conversion costs
    8× the image's bytes in memory traffic, and this hash runs over
    every decoded pixel in verify scans. Requires h, w divisible by 8."""
    h, w = arr.shape[:2]
    # one fused reduction: block sum over rows, cols AND channels (the
    # trailing channel axis folds into the block's column span)
    blocks = arr.reshape(8, h // 8, 8, w // 8, 3).sum(axis=(1, 3, 4),
                                                      dtype=np.uint64)
    bits = (blocks.ravel() * np.uint64(64) > blocks.sum(dtype=np.uint64))
    val = np.bitwise_or.reduce(bits.astype(np.uint64) * _PHASH_WEIGHTS)
    return int(val.astype(np.int64))  # stored as arrow int64
