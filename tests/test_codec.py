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
