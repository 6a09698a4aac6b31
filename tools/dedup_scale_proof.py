"""Dedup-stack working-set proof: run the headline dedup operators over a
multi-million-doc corpus — the same at-scale discipline that
tools/working_set_proof.py applies to the KG flagship (and that caught the
distributed-linker int32-offset overflow there). Everything here is
deterministic arithmetic on the doc id, so the corpus is reproducible and
reshard-stable without any driver-side state.

Planted structure per 32-doc stripe (so the ops have real work to do):
  - ids 32k..32k+2 share one text          -> exact-dup cluster of 3
  - id  32k+3 = that text, one word edited -> near-dup of the cluster
  - everything else unique word salad (30-60 words, 5k-word vocabulary)

Expected counts at n_docs = N (N % 32 == 0): exact_dedup keeps
N - 2*(N/32) rows (each cluster of 3 collapses to 1); the near-dup graph
has N/32 components of size >= 2.

Usage:
    python tools/dedup_scale_proof.py [n_docs] [num_cpus]
    # defaults: 1_000_000 32
"""

import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
# tools/ must be importable in WORKER processes too: gen_batch is pickled
# by reference to this module, so it rides PYTHONPATH into each worker
os.environ["PYTHONPATH"] = os.path.dirname(_TOOLS) + ":" + _TOOLS + ":" \
    + os.environ.get("PYTHONPATH", "")
sys.path.insert(0, _TOOLS)

VOCAB = 5000


def _mix(x):
    """splitmix64 over a uint64 numpy array — word choice must be a REAL
    bit-mixing hash of (doc, position): a linear congruence here makes
    every pair of docs with congruent ids share entire word sequences,
    planting thousands of unintended near-dups (measured: 1.8M LSH pairs
    at 32k docs instead of the planted ~7k)."""
    import numpy as np

    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def gen_batch(batch):
    import numpy as np
    import pyarrow as pa

    ids = batch["id"].to_numpy()
    texts = []
    for i in ids:
        r = int(i) % 32
        cid = int(i) - r if r <= 3 else int(i)  # cluster head for 0..3
        n_words = 30 + (cid % 31)
        key = np.uint64(cid) * np.uint64(0x100000001B3)
        idx = (_mix(key + np.arange(n_words, dtype=np.uint64))
               % np.uint64(VOCAB)).astype(np.int64)
        if r == 3:  # near-dup: one word edited at a cid-derived position
            idx[cid % n_words] = (idx[cid % n_words] + 1) % VOCAB
        texts.append(" ".join(f"w{j}" for j in idx))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from working_set_proof import Sampler  # same per-second memory sampler

    from raykg.ops.corpus import neardup_components
    from raykg.ops.dedup import exact_dedup, lsh_candidate_pairs, \
        minhash_dedup

    def docs() -> rd.Dataset:
        return rd.range(n_docs, override_num_blocks=max(8, num_cpus * 4)) \
            .map_batches(gen_batch, batch_format="pyarrow")

    n_clusters = n_docs // 32
    # (lo, hi) bounds on the output row count from the planted structure:
    # exact_dedup is EXACT; the near-dup families get bands because a few
    # boundary clusters sit at the Jaccard threshold (measured ~0.3% at 1M)
    runs = [
        ("exact_dedup", lambda: exact_dedup(docs()),
         (n_docs - 2 * n_clusters, n_docs - 2 * n_clusters)),
        ("minhash_dedup_fast",
         lambda: minhash_dedup(docs(), hash_family="fast"),
         (n_docs - 3 * n_clusters, n_docs - 2 * n_clusters)),
        ("lsh_candidate_pairs",
         lambda: lsh_candidate_pairs(docs(), hash_family="fast"),
         (int(5.4 * n_clusters), 7 * n_clusters)),  # 6 pairs/cluster ±10%
        ("neardup_components",
         lambda: neardup_components(docs(), hash_family="fast"),
         (int(3.6 * n_clusters), 4 * n_clusters)),  # 4 docs/cluster ±10%
    ]
    sampler = Sampler()
    sampler.start()
    results = {}
    checks_ok = True
    for name, fn, (lo, hi) in runs:
        t0 = time.perf_counter()
        n = fn().count()
        wall = time.perf_counter() - t0
        results[name] = {"wall_s": round(wall, 1), "rows": n}
        if not lo <= n <= hi:
            results[name]["expected_range"] = [lo, hi]
            checks_ok = False
    sampler.stop.set()
    sampler.join(timeout=5)

    gib = 1024 ** 3
    print(json.dumps({
        "metric": "dedup_scale_proof",
        "n_docs": n_docs,
        "num_cpus": num_cpus,
        "runs": results,
        "planted_checks_ok": checks_ok,
        "peak_object_store_gib": round(sampler.peak_shm / gib, 2),
        "peak_host_used_gib": round(sampler.peak_used / gib, 2),
        "peak_spill_gib": round(sampler.peak_spill / gib, 2),
        "loadavg": list(os.getloadavg()),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
