"""Multimodal plumbing: decode-stats, 2× downsample round-trip, video
frame sampling (deterministic stand-in container per the task contract;
real codecs raise NotImplementedError)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from moonray.codec import decode_image, psnr
from moonray.functions.multimodal import (
    FrameSample,
    encode_video,
    downsample2x,
    sample_frames,
)


def _video(video_id: str, n_frames: int, seed: int):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (32, 64, 3), dtype=np.uint8)
              for _ in range(n_frames)]
    return {"video_id": video_id, "video": encode_video(frames, "png")}, frames


def test_frame_sampling_every_other():
    row, frames = _video("v0", 7, seed=1)
    ds = rd.from_items([row])
    out = pa.concat_tables([b for b in sample_frames(ds, stride=2).iter_batches(
        batch_format="pyarrow", batch_size=64)])
    assert out["frame_idx"].to_pylist() == [0, 2, 4, 6]
    assert out["w"].to_pylist() == [64] * 4 and out["h"].to_pylist() == [32] * 4
    # sampled frame pixels round-trip exactly (png path is lossless)
    got = decode_image(out["bytes"][0].as_py())
    assert np.array_equal(got, frames[0])


def test_real_video_container_is_stubbed():
    fs = FrameSample()
    batch = pa.table({"video_id": ["x"], "video": [b"\x00\x00\x00\x18ftypmp4"]})
    with pytest.raises(NotImplementedError):
        fs(batch)


def test_downsample2x_halves_and_stays_decodable():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (64, 128, 3), dtype=np.uint8)
    from moonray.codec import encode_image

    ds = rd.from_items([{
        "image_id": "i0", "bytes": encode_image(arr, "jpeg"),
        "w": 128, "h": 64, "fmt": "jpeg",
    }])
    out = pa.concat_tables([b for b in downsample2x(ds).iter_batches(
        batch_format="pyarrow", batch_size=8)])
    assert out["w"].to_pylist() == [64] and out["h"].to_pylist() == [32]
    small = decode_image(out["bytes"][0].as_py())
    assert small.shape == (32, 64, 3)
    # lossy path: the re-encoded downsample stays within codec tolerance
    ref = decode_image(encode_image(arr, "jpeg")).reshape(32, 2, 64, 2, 3).mean(
        axis=(1, 3)).astype(np.uint8)
    assert psnr(small, ref) >= 40.0


def test_wav_roundtrip_and_audio_features():
    import numpy as np

    from moonray.fixtures import make_audio_dataset
    from moonray.functions.multimodal import (audio_features, decode_wav,
                                              encode_wav)

    sr = 8000
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * 440.0 * t) * 16384).astype(np.int16)
    back, sr2 = decode_wav(encode_wav(tone, sr))
    assert sr2 == sr and np.array_equal(back, tone)

    ds = audio_features(make_audio_dataset(20, seed=7))
    rows = ds.take_all()
    assert len(rows) == 20
    for r in rows:
        # spectral centroid of a tone+noise clip tracks its f0 loosely;
        # ZCR of a sine ≈ 2*f0/sr
        assert 0.1 < r["duration_s"] < 1.0
        assert 0.2 < r["rms"] < 0.6
        assert abs(r["zcr"] - 2 * r["f0_hz"] / r["sample_rate"]) < 0.15
    # unsupported container raises (stub contract for real codecs)
    import pytest

    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x03...mp3 data...")


def test_make_video_dataset_frame_sampling_e2e():
    from moonray.fixtures import make_video_dataset
    from moonray.functions.multimodal import sample_frames

    out = pa.concat_tables([b for b in sample_frames(
        make_video_dataset(6, seed=7, n_frames=8), stride=2).iter_batches(
            batch_format="pyarrow", batch_size=256)])
    # 6 clips x frames {0,2,4,6}
    assert len(out) == 24
    assert sorted(set(out["frame_idx"].to_pylist())) == [0, 2, 4, 6]
    assert set(out["w"].to_pylist()) == {64} and set(out["h"].to_pylist()) == {32}
    # determinism: same seed → byte-identical first frame
    a = pa.concat_tables([b for b in sample_frames(
        make_video_dataset(1, seed=7, n_frames=8), stride=2).iter_batches(
            batch_format="pyarrow", batch_size=256)])
    assert a["bytes"][0].as_py() == out.filter(
        pa.compute.equal(out["video_id"], "vid-00000000"))["bytes"][0].as_py()
