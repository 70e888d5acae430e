"""Scale stress for functions/graph.triangle_stats (forward algorithm).

Constructs a graph where naive node-iterator triangle counting explodes
but the forward algorithm stays output-linear:
- one dense C-clique (C(c,3) triangles — wedge work equals the OUTPUT
  size, the information-theoretic floor for exact counting), plus
- a sparse Erdos-Renyi-ish background (deterministic hash edges).

Verifies the result against closed-form (clique) + brute force
(background + cross edges are absent by construction) and prints
wall-clock.  Usage: python scripts/stress_triangles.py [clique] [bg_edges]
"""

import sys
import time
from itertools import combinations

import numpy as np
import pyarrow as pa

import ray

sys.path.insert(0, "/root/repo")


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from aushape_ray.functions.graph import triangle_stats

    # clique on [0, c); background on [c, c + 2*n_bg) via a
    # deterministic LCG pairing (disjoint node range -> no cross
    # triangles, so totals decompose)
    ca, cb = map(np.array, zip(*combinations(range(c), 2)))
    rng = np.random.default_rng(7)
    u = rng.integers(c, c + 500_000, n_bg, dtype=np.int64)
    v = rng.integers(c, c + 500_000, n_bg, dtype=np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    a = np.minimum(u, v)
    b = np.maximum(u, v)
    # dedup background edges
    key = a * 1_000_003 + b
    _, idx = np.unique(key, return_index=True)
    a, b = a[idx], b[idx]

    edges = pa.table({
        "doc_a": pa.array(np.concatenate([ca.astype(np.int64), a])),
        "doc_b": pa.array(np.concatenate([cb.astype(np.int64), b])),
    })
    m = edges.num_rows
    ds = ray.data.from_arrow(edges).repartition(32)

    t0 = time.perf_counter()
    out = triangle_stats(ds, n_parts=32)
    dt = time.perf_counter() - t0

    tri = out.column("n_triangles")[0].as_py()
    wed = out.column("n_wedges")[0].as_py()
    ne = out.column("n_edges")[0].as_py()

    # ground truth: clique contributes C(c,3) exactly; background is
    # sparse random over 500k nodes -> count its triangles brute-force
    # over its adjacency (tiny expected count)
    clique_tri = c * (c - 1) * (c - 2) // 6
    es = set(zip(a.tolist(), b.tolist()))
    from collections import defaultdict

    adj = defaultdict(list)
    for x, y in es:
        adj[x].append(y)
    bg_tri = 0
    for x, nbrs in adj.items():
        nbrs = sorted(nbrs)
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                if (nbrs[i], nbrs[j]) in es:
                    bg_tri += 1
    expect = clique_tri + bg_tri
    status = "OK" if tri == expect else f"MISMATCH expect {expect}"
    print(f"edges={m} (clique c={c} -> {clique_tri} tri; bg {len(es)} "
          f"edges -> {bg_tri} tri)")
    print(f"triangle_stats: n_edges={ne} n_wedges={wed} "
          f"n_triangles={tri} [{status}] in {dt:.2f}s")
    ray.shutdown()
    return 0 if tri == expect and ne == m else 1


if __name__ == "__main__":
    sys.exit(main())
