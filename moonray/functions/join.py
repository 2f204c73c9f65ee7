"""General row-level equi-joins (inner/outer/semi/anti).

pipelines/joins.py carries the doctrine shapes (broadcast dim join,
pre-aggregated big-big, as-of, band); this module is the general
row-preserving equi-join for when the query genuinely needs matched
ROWS, not aggregates. It rides Ray Data's native hash-shuffle join
(``Dataset.join``, available since 2.46) rather than re-implementing
the exchange: both sides hash-partition on the key into
``num_partitions`` aggregator actors, each partition joins locally —
the same plan our bucket machinery would build by hand.

When to NOT use this: if one side fits in memory, the broadcast join
(pipelines/joins.broadcast_region_enrich pattern) does zero shuffles;
if the probe side is about to be aggregated anyway, pre-aggregate
before the exchange (order_lineitem_revenue pattern). Semi/anti joins
of a SMALL key set against a big table should flow through
``scan(predicate_in=...)`` pruning instead of a full shuffle.
"""

from __future__ import annotations

HOW = ("inner", "left_outer", "right_outer", "full_outer",
       "left_semi", "right_semi", "left_anti", "right_anti")


def equi_join(left, right, on, *, right_on=None, how: str = "inner",
              num_partitions: int | None = None,
              left_suffix: str = "", right_suffix: str = "_r"):
    """Join two Datasets on equality of ``on`` (tuple or single column;
    ``right_on`` when names differ). ``how`` ∈ HOW. Column collisions
    take ``left_suffix``/``right_suffix``. Partition count defaults to
    the engine's bucket heuristic (cores-scaled)."""
    from moonray.util import default_buckets

    if how not in HOW:
        raise ValueError(f"how must be one of {HOW}, got {how!r}")
    on = (on,) if isinstance(on, str) else tuple(on)
    if right_on is not None:
        right_on = ((right_on,) if isinstance(right_on, str)
                    else tuple(right_on))
    return left.join(
        right, join_type=how,
        num_partitions=num_partitions or default_buckets(),
        on=on, right_on=right_on,
        left_suffix=left_suffix or None, right_suffix=right_suffix)
