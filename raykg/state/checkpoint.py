"""Per-partition lineage checkpointing (north rule: "resumable from
checkpoint with per-partition lineage + metrics").

Layout under a checkpoint root::

    root/
      part-00000/           parquet fragments for input shard 0
      part-00001/
      _lineage/
        part-00000.json     {"part", "rows", "counters", "committed_at"}
        part-00001.json

A shard's manifest is written with tmp-file + ``os.replace`` AFTER its data
directory is fully written, so a manifest's existence is the atomic commit
marker. A restarted run skips committed shards and re-runs (after wiping any
partial data directory) only uncommitted ones — the resume semantics the
reference approximates by re-serializing its whole pattern map after every
file (src2/main/scala/Main.scala:69,178-202), here at per-partition
granularity with no global rewrite.

At 100 TB scale each shard is an input fragment range; shard outputs are
separate directories (never one giant file) so a 256-node run that loses a
worker mid-job re-executes only the lost shards.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable

import ray.data as rd


class LineageCheckpoint:
    """Atomic per-partition checkpoint for one pipeline stage."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(self.lineage_dir, exist_ok=True)

    @property
    def lineage_dir(self) -> str:
        return os.path.join(self.root, "_lineage")

    def manifest_path(self, part: int) -> str:
        return os.path.join(self.lineage_dir, f"part-{part:05d}.json")

    def part_dir(self, part: int) -> str:
        return os.path.join(self.root, f"part-{part:05d}")

    def is_committed(self, part: int) -> bool:
        return os.path.exists(self.manifest_path(part))

    def committed_parts(self) -> dict[int, dict]:
        out: dict[int, dict] = {}
        for name in sorted(os.listdir(self.lineage_dir)):
            if name.startswith("part-") and name.endswith(".json"):
                with open(os.path.join(self.lineage_dir, name)) as f:
                    m = json.load(f)
                out[m["part"]] = m
        return out

    def _commit(self, part: int, rows: int, counters: dict,
                fingerprint: dict | None) -> None:
        manifest = {
            "part": part,
            "rows": rows,
            "counters": counters,
            "committed_at": time.time(),
        }
        if fingerprint is not None:
            manifest["fingerprint"] = fingerprint
        tmp = self.manifest_path(part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self.manifest_path(part))

    def run_partition(self, part: int, make_ds: Callable[[], rd.Dataset],
                      counters: dict | None = None,
                      fingerprint: dict | None = None) -> str:
        """Execute + commit one shard; returns "skipped" or "ran".

        ``make_ds`` is lazy so a skipped shard costs nothing.

        ``fingerprint`` identifies WHAT this shard computes (e.g. its
        (lo, hi) doc range, shard count, config hash). It is recorded in the
        manifest and validated on resume: a committed shard whose stored
        fingerprint differs from the one passed now was generated under
        different bounds/seed/config, and silently reusing it would mix
        stale data into the output — that is an error, not a skip.
        """
        if self.is_committed(part):
            if fingerprint is not None:
                with open(self.manifest_path(part)) as f:
                    stored = json.load(f).get("fingerprint")
                # stored None = manifest from before fingerprints existed:
                # accept (legacy checkpoints stay resumable) but say so —
                # the shard's provenance cannot be validated
                if stored is None:
                    import logging

                    logging.getLogger("raykg").warning(
                        "checkpoint shard %d at %s predates fingerprints; "
                        "resuming it WITHOUT validating that it matches the "
                        "current parameters %r", part, self.root, fingerprint)
                elif stored != fingerprint:
                    raise ValueError(
                        f"checkpoint shard {part} at {self.root} was committed "
                        f"with fingerprint {stored!r} but this run expects "
                        f"{fingerprint!r}; the checkpoint is stale — delete "
                        f"{self.root} or restore the original parameters")
            return "skipped"
        out = self.part_dir(part)
        shutil.rmtree(out, ignore_errors=True)  # partial output from a crash
        make_ds().write_parquet(out)
        rows = _count_rows(out)
        self._commit(part, rows, dict(counters or {}), fingerprint)
        return "ran"

    def dataset(self, columns: list[str] | None = None) -> rd.Dataset:
        """All committed shards as one streaming Dataset."""
        parts = sorted(self.committed_parts())
        paths = [os.path.join(self.part_dir(p), f)
                 for p in parts
                 for f in sorted(os.listdir(self.part_dir(p)))
                 if f.endswith(".parquet")]
        if not paths:
            raise FileNotFoundError(f"no committed partitions under {self.root}")
        return rd.read_parquet(paths, columns=columns)

    def total_counters(self) -> dict:
        """Summed counters + rows across committed shards (the "metrics" half
        of the lineage requirement)."""
        total: dict = {"rows": 0, "parts": 0}
        for m in self.committed_parts().values():
            total["rows"] += m["rows"]
            total["parts"] += 1
            for k, v in m.get("counters", {}).items():
                total[k] = total.get(k, 0) + v
        return total


def _count_rows(path: str) -> int:
    """Metadata-only row count of a parquet directory (no data scan)."""
    import pyarrow.dataset as pads

    return pads.dataset(path, format="parquet").count_rows()


def shard_bounds(n_items: int, n_shards: int) -> list[tuple[int, int]]:
    """Deterministic [lo, hi) index ranges covering ``range(n_items)``."""
    if n_items <= 0:
        return []
    n_shards = max(1, min(n_shards, n_items))
    step = (n_items + n_shards - 1) // n_shards
    return [(lo, min(lo + step, n_items))
            for lo in range(0, n_items, step)]
