import numpy as np
import pytest

from moonray.codec import decode_image, encode_image, phash64, psnr
from moonray.fixtures import image_row


def test_lossless_roundtrip():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    out = decode_image(encode_image(arr, "png"))
    assert np.array_equal(arr, out)


def test_lossy_psnr_above_gate():
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
    dec = decode_image(encode_image(arr, "jpeg"))
    assert psnr(arr, dec) >= 40.0


def test_lossy_reencode_idempotent():
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    once = decode_image(encode_image(arr, "jpeg"))
    twice = decode_image(encode_image(once, "jpeg"))
    assert np.array_equal(once, twice)


def test_unknown_fmt_stubbed():
    with pytest.raises(NotImplementedError):
        encode_image(np.zeros((8, 8, 3), np.uint8), "webp")


def test_phash_deterministic():
    rng = np.random.default_rng(10)
    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert phash64(arr) == phash64(arr.copy())


def test_image_row_deterministic():
    a = image_row("img-000000000042")
    b = image_row("img-000000000042")
    assert a == b
    c = image_row("img-000000000042", sub_seed=5)
    assert c["caption"] != a["caption"]


def test_ppm_roundtrip_and_spec_bytes():
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (16, 21, 3), dtype=np.uint8)  # odd width
    data = encode_image(arr, "ppm")
    assert data.startswith(b"P6\n21 16\n255\n")
    assert len(data) == len(b"P6\n21 16\n255\n") + 16 * 21 * 3
    assert np.array_equal(decode_image(data), arr)


def test_ppm_header_comments_and_whitespace():
    # netpbm allows comments + arbitrary whitespace in the header; a
    # file written by another tool must decode identically
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    data = b"P6 # written by xv\n# comment line\n 3\t2 \n255 " + arr.tobytes()
    assert np.array_equal(decode_image(data), arr)


def test_bmp_roundtrip_spec_header_and_padding():
    import struct

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, (8, 5, 3), dtype=np.uint8)  # stride pad 1
    data = encode_image(arr, "bmp")
    assert data[:2] == b"BM"
    assert struct.unpack_from("<I", data, 10)[0] == 54          # pixel offset
    assert struct.unpack_from("<Iii", data, 14) == (40, 5, 8)   # w, h
    assert struct.unpack_from("<HH", data, 26) == (1, 24)       # planes, bpp
    assert struct.unpack_from("<I", data, 30)[0] == 0           # BI_RGB
    stride = (3 * 5 + 3) & ~3
    assert len(data) == 54 + 8 * stride
    # bottom-up BGR: the FIRST raster row is the image's LAST row, blue
    # channel first
    assert data[54] == arr[-1, 0, 2] and data[55] == arr[-1, 0, 1]
    assert np.array_equal(decode_image(data), arr)


def test_bmp_top_down_variant_decodes():
    import struct

    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    data = bytearray(encode_image(arr, "bmp"))
    # rewrite as a top-down file (negative height, rows reversed)
    struct.pack_into("<i", data, 22, -4)
    rows = np.frombuffer(bytes(data[54:]), np.uint8).reshape(4, 12)
    data[54:] = rows[::-1].tobytes()
    assert np.array_equal(decode_image(bytes(data)), arr)


def test_real_formats_through_downsample_stage():
    # the multimodal decode/downsample plumbing must treat real-format
    # bytes exactly like stand-in containers (magic sniffing)
    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    for fmt in ("ppm", "bmp"):
        small = decode_image(encode_image(arr, fmt))[::2, ::2]
        again = decode_image(encode_image(small, fmt))
        assert np.array_equal(again, arr[::2, ::2])
        assert psnr(again, arr[::2, ::2]) == float("inf")
