"""Graph-suite scale proof: run the frontier/fixpoint operators over a
deterministic synthetic graph at TWO sizes and report the wall-time ratio —
direct evidence for the cost model the graph suite documents ("one bucketed
exchange per round; round latency is a fixed overhead that amortizes at
volume"). If the claim holds, a 10x-edge graph costs well under 10x the
wall, because the per-round exchange grows while the round count stays
fixed (pagerank) or grows only with diameter (BFS, components).

Graph shape (fully vectorized generation, no Python loop): N nodes,
out-degree k. Node i's out-edges = the ring edge i -> (i+1) % N (keeps ONE
component) plus k-1 splitmix64 chords — a small-world graph with O(log N)
diameter, so BFS settles in a handful of rounds at any size.

Usage:
    python tools/graph_scale_proof.py [n_small] [n_big] [k] [num_cpus]
    # defaults: 200_000 2_000_000 10 32
"""

import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
os.environ["PYTHONPATH"] = os.path.dirname(_TOOLS) + ":" + _TOOLS + ":" \
    + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, _TOOLS)


def edges_batch_factory(n_nodes, k):
    def gen(batch):
        import numpy as np
        import pyarrow as pa

        from dedup_scale_proof import _mix

        ids = batch["id"].to_numpy().astype(np.uint64)
        src = np.repeat(ids, k)
        j = np.tile(np.arange(k, dtype=np.uint64), len(ids))
        dst = (_mix(src * np.uint64(0x100000001B3) + j)
               % np.uint64(n_nodes))
        ring = (j == 0)
        dst[ring] = (src[ring] + np.uint64(1)) % np.uint64(n_nodes)
        return pa.table({"src": pa.array(src.astype(np.int64), pa.int64()),
                         "dst": pa.array(dst.astype(np.int64), pa.int64())})
    return gen


def run_at(n_nodes, k, num_cpus):
    import ray.data as rd

    from raykg.ops.graph import bfs_depths, connected_components, pagerank

    def edges() -> rd.Dataset:
        return rd.range(n_nodes, override_num_blocks=max(8, num_cpus * 4)) \
            .map_batches(edges_batch_factory(n_nodes, k),
                         batch_format="pyarrow").materialize()

    e = edges()
    out = {"n_nodes": n_nodes, "n_edges": n_nodes * k}
    checks = True

    # walls kept UNROUNDED (rounded for display later): the big/small
    # ratio divides by these, and a sub-50ms leg rounded to 0.0 would
    # turn the whole two-leg measurement into a ZeroDivisionError
    t0 = time.perf_counter()
    n = pagerank(e, iters=3).count()
    out["pagerank_3iter_s"] = time.perf_counter() - t0
    checks &= (n == n_nodes)       # every node holds rank (ring in-edge)

    t0 = time.perf_counter()
    n = bfs_depths(e, source=0).count()
    out["bfs_depths_s"] = time.perf_counter() - t0
    checks &= (n == n_nodes)       # ring + chords: everything reachable

    t0 = time.perf_counter()
    comps = connected_components(e).unique("component")
    out["components_s"] = time.perf_counter() - t0
    checks &= (len(comps) == 1)    # the ring keeps one component

    out["checks_ok"] = bool(checks)
    return out


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    num_cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    small = run_at(n_small, k, num_cpus)
    big = run_at(n_big, k, num_cpus)
    size_ratio = big["n_edges"] / small["n_edges"]
    OPS = ("pagerank_3iter_s", "bfs_depths_s", "components_s")
    ratios = {op: round(big[op] / small[op], 2) for op in OPS}
    for d in (small, big):
        for op in OPS:
            d[op] = round(d[op], 1)
    print(json.dumps({
        "metric": "graph_scale_proof",
        "num_cpus": num_cpus,
        "small": small,
        "big": big,
        "edge_ratio": size_ratio,
        "wall_ratios": ratios,
        # the amortization claim is about FIXED-round ops (pagerank's 3
        # iterations, BFS's small-world diameter): their wall must grow
        # sub-linearly in edges. components runs O(diameter) rounds of
        # linear exchanges, so linear-in-edges ±diameter growth is its
        # correct asymptotic, not a regression — report it raw.
        "fixed_round_ops_amortized": all(
            ratios[op] < size_ratio
            for op in ("pagerank_3iter_s", "bfs_depths_s")),
        "loadavg": list(os.getloadavg()),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
