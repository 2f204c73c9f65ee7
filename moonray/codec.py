"""Image codecs (real PPM/BMP + deterministic PNG/JPEG stand-ins),
PSNR and perceptual hash.

Real PNG/JPEG codecs (PIL / cv2) are not available in this container,
so per the task contract the *compressed* codecs are deterministic
stand-ins while the Ray-side plumbing (binary columns, actor-pool
decode stages, PSNR verification) is real:

- ``"png"``  → lossless: raw RGB bytes, zlib-compressed.
- ``"jpeg"`` → lossy: uniform quantization (step 6 → PSNR ≈ 43 dB, above
  the 40 dB gate) then zlib. Re-encoding a decoded jpeg is idempotent
  (quantized values are fixed points), mirroring the reference's
  re-encode-path invariant (BASELINE.json input_hint: PSNR≥40dB lossy).

Stand-in container layout: ``MRP1|MRJ1`` magic + ``<HH`` (h, w) + zlib
payload. A real deployment would swap the png/jpeg branches for
PIL/turbojpeg inside the same actor-pool stage.

The UNCOMPRESSED formats are the real thing, pure numpy, no stand-in:

- ``"ppm"`` → binary PPM (P6, maxval 255): any netpbm tool reads these.
- ``"bmp"`` → Windows BMP, 24-bit BI_RGB (BITMAPINFOHEADER, bottom-up
  BGR rows, 4-byte row padding): any image viewer reads these.

``decode_image`` sniffs the magic, so a pipeline over a mixed-format
``bytes`` column (the ``fmt`` metadata column stays advisory) decodes
every row through the same stage.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_LOSSLESS = b"MRP1"
MAGIC_LOSSY = b"MRJ1"
_QSTEP = 6  # uniform quantizer step → PSNR ≈ 43 dB on uniform noise


def _encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _decode_ppm(data: bytes) -> np.ndarray:
    # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
    # (netpbm allows '#' comments anywhere in the header whitespace)
    pos, fields = 2, []
    while len(fields) < 3:
        while data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while not data[end:end + 1].isspace():
            end += 1
        fields.append(int(data[pos:end]))
        pos = end
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"PPM maxval {maxval} unsupported (8-bit only)")
    pos += 1  # exactly one whitespace byte before the raster
    arr = np.frombuffer(data, dtype=np.uint8, count=h * w * 3, offset=pos)
    return arr.reshape(h, w, 3)


def _encode_bmp(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    stride = (3 * w + 3) & ~3  # rows padded to 4 bytes
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)  # bottom-up BGR
    body = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                            2835, 2835, 0, 0))
    return header + body


def _decode_bmp(data: bytes) -> np.ndarray:
    offset, = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression, = struct.unpack_from("<I", data, 30)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"BMP variant unsupported (need 24-bit BI_RGB, got bpp={bpp} "
            f"compression={compression})")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    stride = (3 * w + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=h * stride,
                         offset=offset).reshape(h, stride)
    arr = rows[:, :3 * w].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return np.ascontiguousarray(arr[::-1] if flip else arr)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode an (h, w, 3) uint8 array. fmt ∈ {"png", "jpeg", "ppm",
    "bmp"} — ppm/bmp are real interchange formats, png/jpeg are the
    container's deterministic stand-ins (module doc)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 array")
    h, w = arr.shape[:2]
    if fmt == "png":
        return MAGIC_LOSSLESS + struct.pack("<HH", h, w) + zlib.compress(arr.tobytes(), 1)
    if fmt == "jpeg":
        q = ((arr.astype(np.uint16) // _QSTEP) * _QSTEP + _QSTEP // 2).astype(np.uint8)
        return MAGIC_LOSSY + struct.pack("<HH", h, w) + zlib.compress(q.tobytes(), 1)
    if fmt == "ppm":
        return _encode_ppm(arr)
    if fmt == "bmp":
        return _encode_bmp(arr)
    raise NotImplementedError(
        f"unsupported fmt {fmt!r} (png/jpeg are stand-ins; ppm/bmp are "
        "real; other compressed codecs need PIL/turbojpeg)")


def decode_image(data: bytes) -> np.ndarray:
    """Decode image bytes to an (h, w, 3) uint8 array, sniffing the
    format from the magic bytes (stand-in containers, PPM P6, BMP)."""
    magic = data[:4]
    if magic in (MAGIC_LOSSLESS, MAGIC_LOSSY):
        h, w = struct.unpack("<HH", data[4:8])
        arr = np.frombuffer(zlib.decompress(data[8:]), dtype=np.uint8)
        return arr.reshape(h, w, 3)
    if data[:2] == b"P6":
        return _decode_ppm(data)
    if data[:2] == b"BM":
        return _decode_bmp(data)
    raise NotImplementedError(
        "unrecognized image bytes (real PNG/JPEG decode is stubbed in "
        "this container; PPM/BMP/stand-in containers are supported)")


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
