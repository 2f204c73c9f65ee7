"""Sequence packing: assemble documents into fixed token-budget
training sequences (the concat-and-chunk packing step between a cleaned
corpus and a training run).

Packing is inherently order-dependent, so the distributed form packs
WITHIN a shard column (``source``, ``lang``, a path prefix — exactly how
production pipelines shard packing): one groupby shuffle of THIN
(shard, id, n_tokens) rows — never the text — then a vectorized cumsum
per shard. Deterministic: docs concatenate in id order inside each
shard; sequence k holds the docs whose preceding-token count falls in
[k·budget, (k+1)·budget). A doc may straddle a boundary (GPT-style
chunking splits it across the two sequences); it is COUNTED in the
sequence where it starts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.functions.text import TOKEN_RE


def pack_sequences(ds, *, shard_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text", max_tokens: int = 512):
    """→ Dataset[(shard, seq_id, n_docs, seq_tokens)]: per shard, the
    packed training sequences with how many docs start in each and
    their total token mass. Token counting matches text_stats
    (TOKEN_RE), so the DuckDB oracle is exact."""
    import re as _re

    tok = _re.compile(TOKEN_RE)

    def count_tokens(b: pa.Table) -> pa.Table:
        n = [len(tok.findall(t)) for t in b[text_col].to_pylist()]
        return pa.table({shard_col: b[shard_col], id_col: b[id_col],
                         "n": pa.array(n, pa.int64())})

    count_tokens.__name__ = "count_tokens"

    def pack_shard(g: pa.Table) -> pa.Table:
        s = g.sort_by([(id_col, "ascending")])
        n = s["n"].to_numpy(zero_copy_only=False)
        before = np.cumsum(n) - n
        seq = before // max_tokens
        # aggregate per sequence id (seq is sorted — reduceat)
        cuts = np.flatnonzero(np.diff(seq, prepend=seq[0] - 1))
        return pa.table({
            shard_col: pa.array([s[shard_col][0].as_py()] * len(cuts)),
            "seq_id": pa.array(seq[cuts], pa.int64()),
            "n_docs": pa.array(np.diff(np.append(cuts, len(seq))), pa.int64()),
            "seq_tokens": pa.array(np.add.reduceat(n, cuts), pa.int64()),
        })

    pack_shard.__name__ = "pack_shard"
    thin = ds.select_columns([shard_col, id_col, text_col]).map_batches(
        count_tokens, batch_format="pyarrow")
    return thin.groupby(shard_col).map_groups(pack_shard,
                                              batch_format="pyarrow")


def pack_sequences_oracle_sql(*, shard_col: str = "source",
                              max_tokens: int = 512) -> str:
    return f"""
        WITH toks AS (
          SELECT {shard_col}, doc_id,
                 CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT)
                     AS n
          FROM documents),
        cum AS (
          SELECT {shard_col}, n,
                 sum(n) OVER (PARTITION BY {shard_col} ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) - n AS before
          FROM toks)
        SELECT {shard_col},
               CAST(before // {max_tokens} AS BIGINT) AS seq_id,
               count(*) AS n_docs,
               CAST(sum(n) AS BIGINT) AS seq_tokens
        FROM cum GROUP BY 1, 2
    """
