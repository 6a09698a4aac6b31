"""ANN-family scale proof: run the similarity-search operators over a
1 M-vector corpus with PLANTED cluster structure, so recall is checkable
without a ground-truth scan — the same at-scale discipline as
tools/working_set_proof.py (KG flagship), dedup_scale_proof.py and
graph_scale_proof.py.

Corpus: dim-64 vectors around C=1024 splitmix64 centroids; vector i
belongs to cluster i % C with ±0.05 coordinate noise (centroid coords in
[-1, 1], so same-cluster cosine ≈ 1 while cross-cluster cosine ≈ 0).
Checks:
  - ann_bruteforce: every top-k neighbor of every probe query must lie in
    the query's planted cluster (exact method -> fraction must be 1.0);
  - ann_lsh / knn_graph: same-cluster fraction reported as recall (both
    are approximate by design; the proof asserts they stay above 0.5 —
    a collapse to ~0 would mean a bucketing regression, not noise).

Usage:
    python tools/ann_scale_proof.py [n_vecs] [num_cpus]
    # defaults: 1_000_000 32
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

DIM = 64
N_CLUSTERS = 1024
N_QUERIES = 32


def _centroids():
    import numpy as np

    from dedup_scale_proof import _mix

    flat = _mix(np.arange(N_CLUSTERS * DIM, dtype=np.uint64))
    # uint64 -> [-1, 1)
    return (flat.astype(np.float64) / 2.0**63 - 1.0) \
        .reshape(N_CLUSTERS, DIM)


def vec_batch(batch):
    import numpy as np
    import pyarrow as pa

    from dedup_scale_proof import _mix

    ids = batch["id"].to_numpy().astype(np.int64)
    cents = _centroids()[ids % N_CLUSTERS]
    keys = (ids[:, None].astype(np.uint64) * np.uint64(DIM)
            + np.arange(DIM, dtype=np.uint64)[None, :])
    noise = (_mix(keys + np.uint64(0xA5A5A5A5)).astype(np.float64)
             / 2.0**63 - 1.0) * 0.05
    mat = (cents + noise).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), pa.float32()), DIM).cast(
        pa.list_(pa.float32()))
    return pa.table({"vec_id": pa.array(ids, pa.int64()),
                     "embedding": emb,
                     "label": pa.array((ids % N_CLUSTERS).astype(np.int32),
                                       pa.int32())})


def same_cluster_fraction(t, query_col="query_id", nb_col="neighbor_id"):
    q = t.column(query_col).to_pylist()
    n = t.column(nb_col).to_pylist()
    if not q:
        return 0.0
    same = sum(1 for a, b in zip(q, n)
               if a % N_CLUSTERS == b % N_CLUSTERS)
    return same / len(q)


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from working_set_proof import Sampler

    from raykg.ops.ann import ann_bruteforce, ann_lsh, knn_graph

    def embeddings() -> rd.Dataset:
        return rd.range(n_vecs, override_num_blocks=max(8, num_cpus * 4)) \
            .map_batches(vec_batch, batch_format="pyarrow")

    # probe queries spread across clusters AND the id range
    queries = [(i * (n_vecs // N_QUERIES) + i) % n_vecs
               for i in range(N_QUERIES)]

    sampler = Sampler()
    sampler.start()
    results = {}
    checks_ok = True

    t0 = time.perf_counter()
    bf = ann_bruteforce(embeddings(), queries, k=5)
    frac = same_cluster_fraction(bf)
    results["ann_bruteforce"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "rows": bf.num_rows, "same_cluster_frac": round(frac, 4)}
    checks_ok &= (frac == 1.0)      # exact method, tight planted clusters

    t0 = time.perf_counter()
    lsh = ann_lsh(embeddings(), queries, k=5)
    frac = same_cluster_fraction(lsh)
    results["ann_lsh"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "rows": lsh.num_rows, "same_cluster_frac": round(frac, 4)}
    checks_ok &= (frac > 0.5)       # approximate; collapse = regression

    t0 = time.perf_counter()
    # bits sized per the knn_graph docstring: expected bucket = N / 2^bits
    kg = knn_graph(embeddings(), k=5, bits=10)
    n_edges = kg.count()
    sample = kg.limit(20000).to_pandas()
    same = (sample["query_id"] % N_CLUSTERS
            == sample["neighbor_id"] % N_CLUSTERS).mean() \
        if len(sample) else 0.0
    results["knn_graph"] = {
        "wall_s": round(time.perf_counter() - t0, 1),
        "rows": n_edges, "same_cluster_frac_sample": round(float(same), 4)}
    checks_ok &= (n_edges > 0 and same > 0.5)

    sampler.stop.set()
    sampler.join(timeout=5)
    gib = 1024 ** 3
    print(json.dumps({
        "metric": "ann_scale_proof",
        "n_vecs": n_vecs,
        "dim": DIM,
        "num_cpus": num_cpus,
        "runs": results,
        "checks_ok": bool(checks_ok),
        "peak_object_store_gib": round(sampler.peak_shm / gib, 2),
        "peak_host_used_gib": round(sampler.peak_used / gib, 2),
        "peak_spill_gib": round(sampler.peak_spill / gib, 2),
        "loadavg": list(os.getloadavg()),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
