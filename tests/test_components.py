"""Distributed connected components vs a brute-force BFS oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings, strategies as st

from moonray.functions.components import connected_components


def _bfs_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    adj: dict[int, set] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict[int, int] = {}
    for start in adj:
        if start in out:
            continue
        seen, stack = {start}, [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        rep = min(seen)
        for x in seen:
            out[x] = rep
    return out


def _run(edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    ds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64()),
    }))
    got = connected_components(ds, **kw).take_all()
    return {r["id"]: r["component"] for r in got}


def test_random_graph_matches_bfs():
    rng = np.random.default_rng(11)
    n = 300
    edges = [(int(a), int(b))
             for a, b in rng.integers(0, n, size=(400, 2)).tolist()]
    assert _run(edges, buckets=4) == _bfs_components(edges)


def test_chain_needs_diameter_rounds():
    # a 40-node path: label 0 moves one hop per round, so this exercises
    # true multi-round propagation (and the star/clique fast case would
    # hide a broken iteration)
    edges = [(i, i + 1) for i in range(40)]
    got = _run(edges, max_iters=64, buckets=2)
    assert got == {i: 0 for i in range(41)}


def test_cliques_and_duplicate_edges():
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges = clique + clique + [(100, 101), (101, 100), (7, 7)]
    got = _run(edges, buckets=3)
    assert got == {**{i: 0 for i in range(5)}, 100: 100, 101: 100}


def test_nonconvergence_raises():
    edges = [(i, i + 1) for i in range(30)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _run(edges, max_iters=3, buckets=2)


def test_empty_edges():
    assert _run([]) == {}
    assert _run([(3, 3)]) == {}  # self-loops only → no connected nodes


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                min_size=1, max_size=120))
def test_property_matches_bfs(edges):
    assert _run(edges, max_iters=128, buckets=3) == _bfs_components(edges)
