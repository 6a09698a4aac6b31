"""Curation-composite scale proof: run curate_corpus — the multi-stage
Gopher-filter → exact-dedup → decontaminate → deterministic-split
pipeline, with a union stream and three bucketed exchanges inside — over
the same planted 1 M-doc corpus as tools/dedup_scale_proof.py, and check
the output against the planted structure:

  1. EXACT: the two non-minimal members of every planted exact-dup trio
     (doc_id % 32 in {1, 2}) must NEVER survive (dedup keeps the min id).
  2. BAND: survivor count in (uniques - 0.25*clusters, uniques] where
     uniques = n - 2*clusters — decontamination removes roughly
     2*P(train)*P(test) ≈ 0.16 of the head/near-dup pairs (they share
     8-token windows; unique salad docs share none).
  3. BAND: split fractions track the sha rule's 0.1 / 0.1 / 0.8.

Gopher knobs: the salad corpus has no English stopwords and 30-60-word
docs, so the proof passes min_stop_hits=0, min_words=30 — rule engine
exercised, planted structure preserved.

Usage:
    python tools/curate_scale_proof.py [n_docs] [num_cpus]
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


def split_counts_batch(t):
    import pyarrow as pa

    ids = t.column("doc_id").to_numpy()
    splits = t.column("split").to_pylist()
    bad = int(((ids % 32 == 1) | (ids % 32 == 2)).sum())
    from collections import Counter
    c = Counter(splits)
    return pa.table({
        "n": pa.array([len(ids)], pa.int64()),
        "bad_members": pa.array([bad], pa.int64()),
        "train": pa.array([c.get("train", 0)], pa.int64()),
        "val": pa.array([c.get("val", 0)], pa.int64()),
        "test": pa.array([c.get("test", 0)], pa.int64())})


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from dedup_scale_proof import gen_batch
    from working_set_proof import Sampler

    from raykg.pipelines.curate import curate_corpus

    docs = rd.range(n_docs, override_num_blocks=max(8, num_cpus * 4)) \
        .map_batches(gen_batch, batch_format="pyarrow")

    sampler = Sampler()
    sampler.start()
    t0 = time.perf_counter()
    out = curate_corpus(docs, min_stop_hits=0, min_words=30)
    agg = out.map_batches(split_counts_batch, batch_format="pyarrow") \
        .to_pandas().sum()
    wall = time.perf_counter() - t0
    sampler.stop.set()
    sampler.join(timeout=5)

    n_clusters = n_docs // 32
    uniques = n_docs - 2 * n_clusters
    total = int(agg["n"])
    checks = {
        "no_dup_members_survive": int(agg["bad_members"]) == 0,
        "survivors_in_band":
            uniques - n_clusters // 4 < total <= uniques,
        "split_fracs_in_band": all(
            abs(int(agg[s]) / total - f) < 0.01
            for s, f in (("val", 0.1), ("test", 0.1), ("train", 0.8)))
            if total else False,
    }
    gib = 1024 ** 3
    print(json.dumps({
        "metric": "curate_scale_proof",
        "n_docs": n_docs,
        "num_cpus": num_cpus,
        "wall_s": round(wall, 1),
        "survivors": total,
        "uniques": uniques,
        "splits": {s: int(agg[s]) for s in ("train", "val", "test")},
        "bad_members": int(agg["bad_members"]),
        "checks": checks,
        "checks_ok": all(checks.values()),
        "peak_object_store_gib": round(sampler.peak_shm / gib, 2),
        "peak_host_used_gib": round(sampler.peak_used / gib, 2),
        "peak_spill_gib": round(sampler.peak_spill / gib, 2),
        "loadavg": list(os.getloadavg()),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
