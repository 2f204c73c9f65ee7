"""Multimodal (image) actor-pool stages over binary columns.

The Ray-side plumbing — schema (opaque ``binary`` + typed metadata
columns), actor-pool signatures, batch sizing for wide binary rows,
output layout — is real and tested; the codec underneath is the
deterministic stand-in from moonray.codec (real PIL/turbojpeg/ffmpeg
are absent from this container; swapping them in changes ONE import).
Unsupported real formats raise NotImplementedError, as the task
contract specifies for stubbed decoders.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.codec import decode_image, encode_image, phash64


class DecodeStats:
    """Actor-pool stage: decode each image, verify the (w, h) metadata
    columns against the decoded pixels, append mean-luma + recomputed
    phash. Small batch_size is the knob for wide binary rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        luma, ph, ok = [], [], []
        ws = batch["w"].to_pylist()
        hs = batch["h"].to_pylist()
        for data, w, h in zip(batch["bytes"].to_pylist(), ws, hs):
            arr = decode_image(data)
            ok.append(arr.shape[1] == w and arr.shape[0] == h)
            luma.append(float(arr.astype(np.float64).mean()))
            ph.append(phash64(arr))
        return (batch
                .append_column("meta_ok", pa.array(ok, pa.bool_()))
                .append_column("mean_luma", pa.array(luma, pa.float64()))
                .append_column("phash_recomputed", pa.array(ph, pa.int64())))


class Downsample2x:
    """Actor-pool stage: 2× block-mean downsample + re-encode, updating
    (bytes, w, h). Requires even dims (all fixture sizes are)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, out_w, out_h = [], [], []
        fmts = batch["fmt"].to_pylist()
        for data, fmt in zip(batch["bytes"].to_pylist(), fmts):
            arr = decode_image(data)
            h, w = arr.shape[:2]
            small = arr.reshape(h // 2, 2, w // 2, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
            out_bytes.append(encode_image(small, fmt))
            out_w.append(w // 2)
            out_h.append(h // 2)
        idx_w = batch.column_names.index("w")
        idx_h = batch.column_names.index("h")
        idx_b = batch.column_names.index("bytes")
        return (batch
                .set_column(idx_b, "bytes", pa.array(out_bytes, pa.binary()))
                .set_column(idx_w, "w", pa.array(out_w, pa.int32()))
                .set_column(idx_h, "h", pa.array(out_h, pa.int32())))


VIDEO_MAGIC = b"MRV1"


def encode_video(frames, fmt: str = "png") -> bytes:
    """Deterministic stand-in video container: ``MRV1`` + frame count +
    length-prefixed encoded frames (real mp4/ffmpeg is absent from this
    container — the task contract says stub the codec, keep the Ray-side
    plumbing real)."""
    import struct

    payload = b"".join(
        struct.pack("<I", len(e)) + e
        for e in (encode_image(f, fmt) for f in frames))
    return VIDEO_MAGIC + struct.pack("<I", len(frames)) + payload


def _iter_video_frames(data: bytes):
    import struct

    if data[:4] != VIDEO_MAGIC:
        raise NotImplementedError(
            "real video containers (mp4/webm) need ffmpeg, absent here — "
            "swap _iter_video_frames for an ffmpeg/PyAV demuxer")
    (n,) = struct.unpack("<I", data[4:8])
    off = 8
    for _ in range(n):
        (ln,) = struct.unpack("<I", data[off:off + 4])
        off += 4
        yield data[off:off + ln]
        off += ln


class FrameSample:
    """Actor-pool stage over a binary video column: demux, keep every
    ``stride``-th frame, re-emit one row per sampled frame
    (video_id, frame_idx, bytes, w, h). flat_map-shaped: the output has
    more rows than the input — batch_size stays small because one video
    row explodes into many frame rows."""

    def __init__(self, stride: int = 2, video_col: str = "video",
                 id_col: str = "video_id"):
        self.stride = stride
        self.video_col = video_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames, ws, hs = [], [], [], [], []
        for vid, data in zip(batch[self.id_col].to_pylist(),
                             batch[self.video_col].to_pylist()):
            for i, fr in enumerate(_iter_video_frames(data)):
                if i % self.stride:
                    continue
                arr = decode_image(fr)
                ids.append(vid)
                idxs.append(i)
                frames.append(fr)
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
        return pa.table({
            self.id_col: pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "bytes": pa.array(frames, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
        })


def sample_frames(ds, *, stride: int = 2, concurrency=None,
                  batch_size: int = 16):
    from moonray.util import as_fn

    return ds.map_batches(as_fn(FrameSample(stride)),
                          batch_format="pyarrow", concurrency=concurrency,
                          batch_size=batch_size)


def decode_stats(ds, *, concurrency=None, batch_size: int | None = None):
    """batch_size=None → block-native batches: an explicit row-count
    rebatch re-slices and copies the wide binary payload inside every
    task (measured ~3x the bare read cost); blocks are already bounded
    by the upstream reader, so memory stays flat. Task pool: the stage
    holds no state worth an actor pool's spin-up cost (see
    functions/text.py module docstring)."""
    from moonray.util import as_fn

    return ds.map_batches(as_fn(DecodeStats()), batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size)


def downsample2x(ds, *, concurrency=None, batch_size: int | None = None):
    from moonray.util import as_fn

    return ds.map_batches(as_fn(Downsample2x()), batch_format="pyarrow",
                          concurrency=concurrency, batch_size=batch_size)


# ---------------- audio (WAV PCM16 — real codec, pure numpy) ----------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal RIFF/WAVE writer, PCM16 mono — real WAV (readable by any
    audio tool), no external codec needed."""
    import struct

    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                   sample_rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Minimal RIFF/WAVE reader (PCM16 mono). Compressed formats
    (mp3/flac/ogg) need real codecs, absent from this container —
    they raise NotImplementedError per the task's stub contract."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "only WAV containers decode here; mp3/flac/ogg need an audio "
            "codec library — swap decode_wav for soundfile/pydub")
    pos = 12
    sr, samples = None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if cid == b"fmt ":
            fmt_tag, channels, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise NotImplementedError(
                    "only PCM16 mono WAV is decoded here")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        pos += 8 + ln + (ln & 1)
    if sr is None or samples is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    return samples, sr


class AudioFeatures:
    """Actor-pool stage over a binary WAV column: decode, extract
    duration / RMS / zero-crossing rate / spectral centroid (numpy FFT)
    per clip. The per-clip DSP is vectorized; the row loop is inherent
    (variable-length clips)."""

    def __init__(self, audio_col: str = "audio"):
        self.audio_col = audio_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur, rms, zcr, cent, srs = [], [], [], [], []
        for data in batch[self.audio_col].to_pylist():
            x, sr = decode_wav(data)
            xf = x.astype(np.float64) / 32768.0
            n = len(xf)
            dur.append(n / sr)
            rms.append(float(np.sqrt(np.mean(xf * xf))) if n else 0.0)
            zcr.append(float(np.mean(np.signbit(xf[1:]) != np.signbit(xf[:-1])))
                       if n > 1 else 0.0)
            if n:
                spec = np.abs(np.fft.rfft(xf))
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                tot = spec.sum()
                cent.append(float((freqs * spec).sum() / tot) if tot else 0.0)
            else:
                cent.append(0.0)
            srs.append(sr)
        return (batch
                .append_column("duration_s", pa.array(dur, pa.float64()))
                .append_column("sample_rate", pa.array(srs, pa.int32()))
                .append_column("rms", pa.array(rms, pa.float64()))
                .append_column("zcr", pa.array(zcr, pa.float64()))
                .append_column("spectral_centroid_hz", pa.array(cent, pa.float64())))


def audio_features(ds, *, audio_col: str = "audio", concurrency=None,
                   batch_size: int = 64):
    from moonray.util import as_fn

    return ds.map_batches(as_fn(AudioFeatures(audio_col)),
                          batch_format="pyarrow", concurrency=concurrency,
                          batch_size=batch_size)


# ---- perceptual-hash near-duplicate detection ----

_POP_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming_block(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise hamming distances between two uint64 vectors → (|a|,|b|)
    uint16 matrix, vectorized (XOR outer + byte-LUT popcount)."""
    x = np.bitwise_xor(a[:, None], b[None, :])
    return _POP_LUT[x.view(np.uint8).reshape(len(a), len(b), 8)].sum(
        axis=2, dtype=np.uint16)


def phash_near_dups(ds, *, id_col: str = "image_id",
                    phash_col: str = "phash", max_hamming: int = 6,
                    block: int = 2048):
    """Image near-duplicate pairs by perceptual hash: all (a, b) with
    hamming(phash_a, phash_b) ≤ max_hamming — the pHash dedup every
    image-corpus pipeline runs (re-encodes, recompressions, light
    crops hash within a few bits).

    EXACT for max_hamming ≤ 7 by pigeonhole: the 64-bit hash splits
    into 8 byte-bands; ≤7 differing bits leave at least one band
    identical, so banding misses nothing (the byte-band analogue of
    SimHash LSH; same shape as MinHashBands). Scale: only thin
    (band, bucket, id, phash) rows shuffle — 32 bytes/row × 8 bands,
    never pixels; in-bucket verification is a chunked vectorized XOR
    popcount; pair dedup across bands is a tiny pair-key shuffle."""
    if not 0 <= max_hamming <= 7:
        raise ValueError("byte-band LSH is exact only for max_hamming ≤ 7")
    import pyarrow.compute as pc

    def band(b: pa.Table) -> pa.Table:
        ph = b[phash_col].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ph.view(np.uint64)
        n = len(u)
        parts = []
        for t in range(8):
            byte = ((u >> np.uint64(8 * t)) & np.uint64(0xFF)).astype(np.int64)
            parts.append(pa.table({
                "band": pa.array(np.full(n, t, np.int64)),
                "bucket": pa.array(byte),
                "id": b[id_col],
                "ph": pa.array(ph, pa.int64()),
            }))
        return pa.concat_tables(parts)

    band.__name__ = "phash_bands"

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "hamming": pa.array([], pa.int64())})
        n = len(g)
        if n < 2:
            return empty
        s = g.sort_by([("id", "ascending")])
        ids = s["id"].to_pylist()
        ph = s["ph"].to_numpy(zero_copy_only=False).view(np.uint64)
        outs = []
        for i0 in range(0, n, block):
            ai = ph[i0:i0 + block]
            for j0 in range(i0, n, block):
                bj = ph[j0:j0 + block]
                d = _hamming_block(ai, bj)
                ii, jj = np.nonzero(d <= max_hamming)
                gi, gj = ii + i0, jj + j0
                keep = gi < gj        # ordered pairs, no self-pairs
                if keep.any():
                    gi, gj = gi[keep], gj[keep]
                    outs.append(pa.table({
                        "a": pa.array([ids[x] for x in gi], pa.string()),
                        "b": pa.array([ids[x] for x in gj], pa.string()),
                        "hamming": pa.array(
                            d[ii[keep], jj[keep]].astype(np.int64)),
                    }))
        return pa.concat_tables(outs) if outs else empty

    bucket_pairs.__name__ = "phash_bucket_pairs"

    def uniq_pairs(b: pa.Table) -> pa.Table:
        # a pair found in k bands appears ≤8 times with the SAME
        # hamming — vectorized first-occurrence after one sort, in one
        # block (verified near-dup pairs are tiny next to the corpus;
        # a groupby here would invoke Python once per pair, the cost
        # dedup._verify_pairs_broadcast.uniq_block already avoids)
        if len(b) == 0:
            return b
        s = b.sort_by([("a", "ascending"), ("b", "ascending")])
        n = len(s)
        same = np.zeros(n, dtype=bool)
        if n > 1:
            import pyarrow.compute as pc

            same[1:] = (np.asarray(pc.equal(s["a"].slice(0, n - 1),
                                            s["a"].slice(1)))
                        & np.asarray(pc.equal(s["b"].slice(0, n - 1),
                                              s["b"].slice(1))))
        return s.filter(pa.array(~same))

    uniq_pairs.__name__ = "uniq_pairs"

    # the banding exchange carries 8× the corpus in thin rows — route it
    # through the storage-backed shuffle (shuffle.py), not Ray's
    # object-store groupby: the driver owns every shuffle object in
    # local mode and its residency grows O(corpus) under the native
    # path (measured ~1 GB at 280k images), while run files on storage
    # keep the driver O(buckets). Same cost model as MERGE/cluster.
    import ray.data as rd

    from moonray import shuffle as sh
    from moonray.util import default_buckets, new_job_id, scratch_root

    sroot = scratch_root("moonray-phash-")
    job = new_job_id()
    # cpu-scaled bucket count (NOT one per (band, byte) group —
    # 2048 sliver directories dominate wall time at small corpora);
    # each storage bucket holds several (band, byte) groups and the
    # reducer re-splits them before pairing, so banding exactness is
    # untouched
    P = default_buckets()

    def bucket_fn(b: pa.Table) -> np.ndarray:
        g = (b["band"].to_numpy(zero_copy_only=False) * 256
             + b["bucket"].to_numpy(zero_copy_only=False))
        from moonray.util import splitmix64

        return (splitmix64(g.astype(np.uint64))
                % np.uint64(P)).astype(np.int32)

    bands = ds.select_columns([id_col, phash_col]).map_batches(
        band, batch_format="pyarrow")
    buckets = sh.write_runs(bands, sroot, job, "phash", P, bucket_fn,
                            id_cols=("id", "band"))

    def reduce_bucket(b: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string()),
                          "hamming": pa.array([], pa.int64())})
        outs = []
        for bk in b["bucket"].to_pylist():
            g = sh.read_bucket(sroot, job, "phash", int(bk))
            if g is None or not len(g):
                continue
            # split the colocated (band, byte) groups back apart —
            # pairing across groups would only ADD exact-verified
            # candidates, but the per-group blocked hamming is the
            # cost model banding promises
            s = g.sort_by([("band", "ascending"), ("bucket", "ascending")])
            bd = s["band"].to_numpy(zero_copy_only=False)
            bt = s["bucket"].to_numpy(zero_copy_only=False)
            new = np.ones(len(s), dtype=bool)
            new[1:] = (bd[1:] != bd[:-1]) | (bt[1:] != bt[:-1])
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(s))
            for a0, a1 in zip(starts, ends):
                if a1 - a0 >= 2:
                    outs.append(bucket_pairs(s.slice(a0, a1 - a0)))
        return pa.concat_tables(outs) if outs else empty

    reduce_bucket.__name__ = "phash_bucket_pairs"
    cand = rd.from_items([{"bucket": int(b)} for b in buckets],
                         override_num_blocks=max(1, len(buckets))) \
        .map_batches(reduce_bucket, batch_format="pyarrow", batch_size=1) \
        .materialize()
    # the reduces have consumed every run file — reclaim the scratch
    # (tmpfs-backed) now instead of waiting for the 2 h stale-dir GC
    import shutil as _shutil

    _shutil.rmtree(sroot, ignore_errors=True)
    return cand.repartition(1).map_batches(uniq_pairs, batch_format="pyarrow")
