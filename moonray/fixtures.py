"""Deterministic synthetic fixtures (FIXTURES.md F1/F2/F4) — no external data.

F1: base ``images`` table (image_id, bytes, w, h, fmt, caption, phash)
    — BASELINE.json input_hint schema. Synthesis is a *distributed* Ray
    pipeline (``ray.data.range(n).map_batches(GenImages)``) so fixture
    generation itself scales; every row is a pure function of its
    image_id + seed.
F2: CDC change log (op ∈ I/U/D, strictly increasing lsn) mirroring the
    reference's CDC mapping — Update ≡ Delete(old)+Append(new), Upsert ≡
    delete_if_exists+Append (reference:
    src/moonlink_connectors/src/pg_replicate/moonlink_sink.rs:295-326,
    src/moonlink_connectors/src/rest_ingest/moonlink_rest_sink.rs:222-246).
F4: brute-force pandas oracle (dict keyed by image_id, LSN order,
    last-writer-wins) used by the pytest golden tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.codec import decode_image, encode_image, phash64
from moonray.util import stable_hash_str

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

CHANGE_SCHEMA = pa.schema(
    [("op", pa.string()), ("lsn", pa.int64())] + list(IMAGE_SCHEMA)
)

_SIZES = np.array([64, 96, 128, 256], dtype=np.int32)
_FMTS = ["png", "jpeg"]
_WORDS = (
    "amber basalt cedar dune ember fjord garnet harbor iris juniper kelp "
    "lumen marble nectar onyx prism quartz reef sable tundra umber vale "
    "willow xenon yarrow zephyr"
).split()
HOT_PHASH_PREFIX = 0xAB  # hot top-8-bit range for skew-salting tests


def image_row(image_id: str, seed: int = 42, sub_seed: int = 0, hot_pct: int = 5,
              sizes=None) -> dict:
    """One deterministic image row. ``sub_seed`` varies U-op re-encodes
    (FIXTURES.md: update regenerates bytes/caption with sub-seed = lsn).
    ``sizes`` overrides the pixel-dimension choices (default _SIZES) —
    the stress harness uses a thin payload (e.g. [32]) to scale the ROW/
    METADATA axis to 10× without scaling payload bytes; defaults are
    byte-stable."""
    rng = np.random.default_rng(
        (stable_hash_str(image_id) ^ (seed * 0x9E3779B9) ^ (sub_seed * 0x85EBCA6B)) % 2**63
    )
    sz = _SIZES if sizes is None else np.asarray(sizes, dtype=np.int32)
    w = int(sz[rng.integers(0, len(sz))])
    h = int(sz[rng.integers(0, len(sz))])
    fmt = _FMTS[int(rng.integers(0, 2))]
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_image(arr, fmt)
    ph = phash64(decode_image(data))
    if stable_hash_str(image_id + "/hot") % 100 < hot_pct:
        # force a hot top-8-bit phash range (FIXTURES.md skew knob)
        ph = int(
            np.int64(
                (np.uint64(HOT_PHASH_PREFIX) << np.uint64(56))
                | (np.uint64(ph).astype(np.uint64) & np.uint64((1 << 56) - 1))
            )
        )
    toks = [ _WORDS[int(rng.integers(0, len(_WORDS)))] for _ in range(8) ]
    caption = f"caption for {image_id}: " + " ".join(toks) + (f" #{sub_seed}" if sub_seed else "")
    return {
        "image_id": image_id,
        "bytes": data,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption,
        "phash": ph,
    }


class GenImages:
    """Actor-pool batch generator: ray.data.range(n) ids → image rows."""

    def __init__(self, seed: int = 42, hot_pct: int = 5, sizes=None):
        self.seed = seed
        self.hot_pct = hot_pct
        self.sizes = sizes

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            image_row(f"img-{i:012d}", self.seed, 0, self.hot_pct, self.sizes)
            for i in batch["id"].to_pylist()
        ]
        return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)


def make_images_dataset(n: int, *, seed: int = 42, hot_pct: int = 5,
                        concurrency=None, sizes=None):
    """Distributed F1 synthesis → ray.data.Dataset with IMAGE_SCHEMA."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=max(1, n // 256))
    return ds.map_batches(
        GenImages(seed, hot_pct, sizes), batch_format="pyarrow", batch_size=256,
        concurrency=concurrency,
    )


class GenImagesWithDups:
    """Batch generator for the curation fixtures: base rows plus, for
    every ``dup_every``-th base, two near-duplicate variants — phash
    within 1-3 bits (a re-encode/recompress signature), one at 2× the
    base dimensions (the representative a curation pass should keep)
    and one at half. Every ``junk_every``-th base gets a one-token junk
    caption so the quality gate has real work. Deterministic in (seed,
    n); payload bytes are shared with the base (curation never decodes)."""

    def __init__(self, seed: int = 42, dup_every: int = 5,
                 junk_every: int = 7, sizes=None):
        self.seed = seed
        self.dup_every = dup_every
        self.junk_every = junk_every
        self.sizes = sizes

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for i in batch["id"].to_pylist():
            base = image_row(f"img-{i:012d}", self.seed, 0, hot_pct=0,
                             sizes=self.sizes)
            if i % self.junk_every == 3:
                base = dict(base, caption="junk")
            rows.append(base)
            if i % self.dup_every == 0:
                ph = np.uint64(base["phash"])
                hi = dict(base, image_id=base["image_id"] + "-d1",
                          phash=int(np.int64(ph ^ np.uint64(1 << 5))),
                          w=base["w"] * 2, h=base["h"] * 2)
                lo = dict(base, image_id=base["image_id"] + "-d2",
                          phash=int(np.int64(ph ^ np.uint64((1 << 9) | (1 << 33)))),
                          w=max(1, base["w"] // 2), h=max(1, base["h"] // 2))
                rows.extend([hi, lo])
        return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)


def make_images_with_dup_families(n_base: int, *, seed: int = 42,
                                  dup_every: int = 5, junk_every: int = 7,
                                  concurrency=None, sizes=None):
    import ray.data as rd

    ds = rd.range(n_base, override_num_blocks=max(1, n_base // 256))
    return ds.map_batches(GenImagesWithDups(seed, dup_every, junk_every,
                                            sizes=sizes),
                          batch_format="pyarrow", batch_size=256,
                          concurrency=concurrency)


class GenChanges:
    """Change-log batch generator over a range of change sequence numbers.

    Deterministic profile per change index i (lsn = lsn0 + i):
      op: pct_insert/pct_update/pct_delete split by hash(i)
      U/D target existing keys [0, n_base) (D may also target a missing
      key when delete_missing=True — exercises delete_if_exists);
      I creates new keys ≥ n_base. duplicate keys within a batch arise
      naturally from the modular key sampling (last-LSN-wins dedup test).
    """

    def __init__(self, n_base: int, *, seed: int = 42, lsn0: int = 1_000_000,
                 pct_insert: int = 50, pct_update: int = 30, pct_delete: int = 20,
                 delete_missing: bool = True, hot_pct: int = 5, sizes=None):
        self.n_base = n_base
        self.seed = seed
        self.lsn0 = lsn0
        self.pcts = (pct_insert, pct_update, pct_delete)
        self.delete_missing = delete_missing
        self.hot_pct = hot_pct
        self.sizes = sizes

    def _row(self, i: int) -> dict:
        lsn = self.lsn0 + i
        h = stable_hash_str(f"chg-{self.seed}-{i}")
        sel = h % 100
        pi, pu, pd_ = self.pcts
        if sel < pi:
            op = "I"
            key = f"img-{self.n_base + (h // 100) % max(1, self.n_base):012d}"
        elif sel < pi + pu:
            op = "U"
            key = f"img-{(h // 100) % self.n_base:012d}"
        else:
            op = "D"
            span = self.n_base + (self.n_base // 10 if self.delete_missing else 0)
            key = f"img-{(h // 100) % max(1, span):012d}"
        if op == "D":
            row = {c: None for c in IMAGE_SCHEMA.names}
            row["image_id"] = key
        else:
            row = image_row(key, self.seed, sub_seed=lsn, hot_pct=self.hot_pct,
                            sizes=self.sizes)
        row["op"] = op
        row["lsn"] = lsn
        return row

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._row(int(i)) for i in batch["id"].to_pylist()]
        return pa.Table.from_pylist(rows, schema=CHANGE_SCHEMA)


def make_changes_dataset(n_changes: int, n_base: int, **kw):
    import ray.data as rd

    conc = kw.pop("concurrency", None)
    ds = rd.range(n_changes, override_num_blocks=max(1, n_changes // 256))
    return ds.map_batches(
        GenChanges(n_base, **kw), batch_format="pyarrow", batch_size=256,
        concurrency=conc,
    )


def oracle_apply(base: pa.Table, changes: pa.Table, key_col: str = "image_id") -> dict:
    """F4 brute-force oracle: apply changes in LSN order over a dict keyed
    by image_id; last writer wins; D removes (delete_if_exists). Returns
    {key: row-dict} of the expected final state."""
    state = {r[key_col]: r for r in base.to_pylist()}
    chg = changes.to_pylist()
    chg.sort(key=lambda r: r["lsn"])
    for r in chg:
        k = r[key_col]
        if r["op"] == "D":
            state.pop(k, None)
        else:
            row = {c: r[c] for c in base.column_names}
            state[k] = row
    return state


def make_audio_dataset(n: int, *, seed: int = 42, sample_rate: int = 8000):
    """Deterministic synthetic audio clips: sine tones (varying
    frequency/amplitude) + seeded noise, encoded as REAL PCM16 WAV
    (multimodal.encode_wav). Distributed synthesis like
    make_images_dataset — each map task generates its id range."""
    import ray.data as rd

    from moonray.functions.multimodal import encode_wav

    def gen(batch):
        import numpy as np
        import pyarrow as pa

        out_id, out_audio, out_f0 = [], [], []
        for i in batch["id"].to_pylist():
            rng = np.random.default_rng(seed * 1_000_003 + i)
            f0 = float(rng.integers(100, 2000))
            dur = float(rng.uniform(0.2, 0.8))
            t = np.arange(int(sample_rate * dur)) / sample_rate
            wave = (0.6 * np.sin(2 * np.pi * f0 * t)
                    + 0.05 * rng.standard_normal(len(t)))
            pcm = np.clip(wave * 32767, -32768, 32767).astype(np.int16)
            out_id.append(f"aud-{i:08d}")
            out_audio.append(encode_wav(pcm, sample_rate))
            out_f0.append(f0)
        return pa.table({"audio_id": pa.array(out_id, pa.string()),
                         "audio": pa.array(out_audio, pa.binary()),
                         "f0_hz": pa.array(out_f0, pa.float64())})

    return rd.range(n).map_batches(gen, batch_format="pyarrow")


def make_video_dataset(n: int, *, seed: int = 42, n_frames: int = 8,
                       w: int = 64, h: int = 32):
    """Deterministic synthetic videos: ``n_frames`` seeded-noise RGB
    frames per clip in the MRV1 stand-in container
    (multimodal.encode_video — real mp4 demux is stubbed per the task
    contract; the Ray-side plumbing is real). Distributed synthesis like
    make_images_dataset."""
    import ray.data as rd

    from moonray.functions.multimodal import encode_video

    def gen(batch):
        import numpy as np
        import pyarrow as pa

        out_id, out_vid, out_nf = [], [], []
        for i in batch["id"].to_pylist():
            rng = np.random.default_rng(seed * 7_368_787 + i)
            frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                      for _ in range(n_frames)]
            out_id.append(f"vid-{i:08d}")
            out_vid.append(encode_video(frames, "png"))
            out_nf.append(n_frames)
        return pa.table({"video_id": pa.array(out_id, pa.string()),
                         "video": pa.array(out_vid, pa.binary()),
                         "n_frames": pa.array(out_nf, pa.int32())})

    gen.__name__ = "gen_videos"
    # small batches: wide binary rows (task-brief multimodal guidance)
    return rd.range(n).map_batches(gen, batch_format="pyarrow",
                                   batch_size=64)
