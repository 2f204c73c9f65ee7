"""Sequence packing (concat-and-chunk per shard) vs a per-shard
crafted oracle."""

import pyarrow as pa
import ray.data as rd

from moonray.functions.pack import pack_sequences


def test_pack_sequences_crafted():
    docs = rd.from_items([
        # shard A: token counts 3, 4, 2, 5 → budget 6:
        # before = 0,3,7,9 → seq 0,0,1,1
        {"doc_id": 0, "source": "A", "text": "a b c"},
        {"doc_id": 1, "source": "A", "text": "d e f g"},
        {"doc_id": 2, "source": "A", "text": "h i"},
        {"doc_id": 3, "source": "A", "text": "j k l m n"},
        # shard B: one huge doc straddles: counts 8, 1 → seq 0, 1
        {"doc_id": 4, "source": "B", "text": "1 2 3 4 5 6 7 8"},
        {"doc_id": 5, "source": "B", "text": "9"},
    ])
    rows = sorted(
        (r for b in pack_sequences(docs, max_tokens=6).iter_batches(
            batch_format="pyarrow") for r in b.to_pylist()),
        key=lambda r: (r["source"], r["seq_id"]))
    assert rows == [
        {"source": "A", "seq_id": 0, "n_docs": 2, "seq_tokens": 7},
        {"source": "A", "seq_id": 1, "n_docs": 2, "seq_tokens": 7},
        {"source": "B", "seq_id": 0, "n_docs": 1, "seq_tokens": 8},
        {"source": "B", "seq_id": 1, "n_docs": 1, "seq_tokens": 1},
    ]


def test_pack_sequences_deterministic_and_order_independent():
    items = [{"doc_id": i, "source": f"s{i % 3}",
              "text": " ".join(["tok"] * (i % 17 + 1))} for i in range(200)]
    a = pack_sequences(rd.from_items(items), max_tokens=64)
    b = pack_sequences(rd.from_items(list(reversed(items))), max_tokens=64)
    key = lambda r: (r["source"], r["seq_id"])  # noqa: E731
    ra = sorted((r for blk in a.iter_batches(batch_format="pyarrow")
                 for r in blk.to_pylist()), key=key)
    rb = sorted((r for blk in b.iter_batches(batch_format="pyarrow")
                 for r in blk.to_pylist()), key=key)
    assert ra == rb
    assert sum(r["seq_tokens"] for r in ra) == sum(
        i % 17 + 1 for i in range(200))
