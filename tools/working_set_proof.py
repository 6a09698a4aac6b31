"""128 GiB working-set proof (VERDICT r4 roadmap #5): run the flagship
KG-construction job at multi-million-doc scale and RECORD the memory
footprint while it streams — the closest single-node analog to the 100 TB
claim. A sampler thread polls, once per second:

  - /dev/shm usage (the plasma object store lives there in this container);
  - host used memory (MemTotal - MemAvailable from /proc/meminfo);
  - Ray's spill directory size (object_spilling under the session dir).

The streaming-executor claim is "peak object store + heap stays bounded
well under the 128 GiB host while the working set (docs -> triples ->
edges) is tens of GiB end-to-end, spilling instead of dying". The proof
row for BASELINE.md is the printed JSON line.

Usage:
    python tools/working_set_proof.py [n_docs] [link_mode] [num_cpus]
    # defaults: 4_000_000 broadcast 32

Each invocation is ONE fresh process / fresh Ray session (so the plasma
store starts empty and the peak is attributable to this job alone).
"""

import glob
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")


def _meminfo_used() -> int:
    total = avail = 0
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemTotal:"):
                total = int(line.split()[1]) * 1024
            elif line.startswith("MemAvailable:"):
                avail = int(line.split()[1]) * 1024
    return total - avail


def _spill_bytes() -> int:
    n = 0
    for d in glob.glob("/tmp/ray/session_*/ray_spilled_objects*") + \
            glob.glob("/tmp/ray/session_*/object_spilling*"):
        for root, _, files in os.walk(d):
            for fn in files:
                try:
                    n += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    return n


class Sampler(threading.Thread):
    def __init__(self) -> None:
        super().__init__(daemon=True)
        self.stop = threading.Event()
        self.base_shm = shutil.disk_usage("/dev/shm").used
        self.base_used = _meminfo_used()
        # baseline like the other two: stale spill files from an earlier
        # crashed session must not be attributed to THIS job
        self.base_spill = _spill_bytes()
        self.peak_shm = 0
        self.peak_used = 0
        self.peak_spill = 0
        self.n_samples = 0

    def run(self) -> None:
        while not self.stop.is_set():
            self.peak_shm = max(
                self.peak_shm,
                shutil.disk_usage("/dev/shm").used - self.base_shm)
            self.peak_used = max(
                self.peak_used, _meminfo_used() - self.base_used)
            self.peak_spill = max(self.peak_spill,
                                  _spill_bytes() - self.base_spill)
            self.n_samples += 1
            self.stop.wait(1.0)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    link_mode = sys.argv[2] if len(sys.argv) > 2 else "broadcast"
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import bench
    from raykg.pipelines.kg import build_kg

    bench._warm_workers(num_cpus)
    sampler = Sampler()
    sampler.start()
    t0 = time.perf_counter()
    cfg, docs = bench._flagship_inputs(num_cpus, n_docs)
    result = build_kg(docs, cfg, link_mode=link_mode)
    n_triples = bench._consume(result.triples)
    n_edges = bench._consume(result.edges)
    wall = time.perf_counter() - t0
    sampler.stop.set()
    sampler.join(timeout=5)

    gib = 1024 ** 3
    print(json.dumps({
        "metric": "working_set_proof",
        "n_docs": n_docs,
        "link_mode": link_mode,
        "num_cpus": num_cpus,
        "wall_s": round(wall, 1),
        "n_triples": n_triples,
        "n_edges": n_edges,
        "docs_per_s": round(n_docs / wall, 1),
        "triples_per_s": round(n_triples / wall, 1),
        "peak_object_store_gib": round(sampler.peak_shm / gib, 2),
        "peak_host_used_gib": round(sampler.peak_used / gib, 2),
        "peak_spill_gib": round(sampler.peak_spill / gib, 2),
        "mem_samples": sampler.n_samples,
        "loadavg": list(os.getloadavg()),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
