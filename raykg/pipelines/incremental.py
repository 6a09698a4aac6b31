"""Incremental file-directory pattern discovery — the reference's second
entry point (src2/main/scala/Main.scala:19-159) re-expressed Ray-Data-first.

Per file in a directory (processed in sorted order): read CSV → detect a
node label per row from the closed vocabulary (column NAME substring match
first, then cell VALUE match, else UnknownNodeLabel — reference
src2/main/scala/DataToPattern.scala:53-73) → pattern = (label, sorted
present-property set) with per-batch combiner counts → merge into the
cross-run parquet snapshot (merge_pattern_snapshot, reference S5).

Resume semantics upgrade (reference re-serializes its ENTIRE pattern map
after every file, src2/main/scala/Main.scala:69): here a per-file JSON
manifest commits atomically after the file's patterns land in the snapshot,
so a restarted run skips committed files and never rewrites global state.
"""

from __future__ import annotations

import json
import os
from collections import Counter

import pyarrow as pa

import ray.data as rd

from raykg.config import NODE_LABELS

UNKNOWN_LABEL = "UnknownNodeLabel"

PATTERNS = pa.schema([
    ("label", pa.string()),
    ("properties", pa.list_(pa.string())),
    ("n", pa.int64()),
])


def detect_label(columns: list[str], row: dict,
                 vocabulary: tuple[str, ...]) -> str:
    """Reference M7: first vocabulary label contained (case-insensitive) in a
    column name; else in a string cell value; else UnknownNodeLabel."""
    for label in vocabulary:
        low = label.lower()
        for c in columns:
            if low in c.lower():
                return label
    for label in vocabulary:
        low = label.lower()
        for v in row.values():
            if isinstance(v, str) and low in v.lower():
                return label
    return UNKNOWN_LABEL


def extract_file_patterns(path: str,
                          vocabulary: tuple[str, ...] = NODE_LABELS
                          ) -> pa.Table:
    """One file -> (label, properties, n) pattern counts. The reference does
    this in a driver-side ``df.collect()`` loop (DataToPattern.scala:11-51);
    here it is a map_batches combiner + a tiny final merge."""
    ds = rd.read_csv(path)

    def batch_patterns(t: pa.Table) -> pa.Table:
        columns = t.column_names
        # column-name label match is row-independent — resolve once
        name_label = None
        for label in vocabulary:
            if any(label.lower() in c.lower() for c in columns):
                name_label = label
                break
        counts: Counter = Counter()
        for row in t.to_pylist():
            label = name_label or detect_label(columns, row, vocabulary)
            # empty string == absent: Arrow CSV reads empty cells as "",
            # Spark (the reference's reader) reads them as null
            props = tuple(sorted(k for k, v in row.items()
                                 if v is not None and v != ""))
            counts[(label, props)] += 1
        return pa.Table.from_pydict({
            "label": [k[0] for k in counts],
            "properties": [list(k[1]) for k in counts],
            "n": list(counts.values()),
        }, schema=PATTERNS)

    partial = ds.map_batches(batch_patterns, batch_format="pyarrow")
    merged: Counter = Counter()
    for b in partial.iter_batches(batch_format="pyarrow", batch_size=65536):
        for label, props, n in zip(b.column("label").to_pylist(),
                                   b.column("properties").to_pylist(),
                                   b.column("n").to_pylist()):
            merged[(label, tuple(props))] += n
    return pa.Table.from_pydict({
        "label": [k[0] for k in sorted(merged)],
        "properties": [list(k[1]) for k in sorted(merged)],
        "n": [merged[k] for k in sorted(merged)],
    }, schema=PATTERNS)


class IncrementalPatternRun:
    """Cross-run state: pattern snapshot parquet + per-file commit manifests
    under ``state_dir``."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        self.manifest_dir = os.path.join(state_dir, "_files")
        self.snapshot = os.path.join(state_dir, "patterns.parquet")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def _manifest(self, path: str) -> str:
        safe = os.path.basename(path).replace("/", "_")
        return os.path.join(self.manifest_dir, safe + ".json")

    def _file_table(self, path: str) -> str:
        safe = os.path.basename(path).replace("/", "_")
        return os.path.join(self.manifest_dir, safe + ".parquet")

    def is_committed(self, path: str) -> bool:
        return os.path.exists(self._manifest(path))

    @property
    def _legacy_base(self) -> str:
        return os.path.join(self.manifest_dir, "_legacy.parquet")

    def _migrate_legacy(self) -> None:
        """State dirs written before per-file tables existed have manifests
        with no sibling parquet; their combined counts ARE the snapshot (the
        old invariant), so freeze the snapshot once as ``_legacy.parquet``
        and treat table-less manifests as covered by it."""
        if os.path.exists(self._legacy_base):
            return
        if os.path.exists(self.snapshot):
            import shutil

            tmp = self._legacy_base + ".tmp"
            shutil.copyfile(self.snapshot, tmp)
            os.replace(tmp, self._legacy_base)
        else:
            # no snapshot to recover: freeze an EMPTY base (tombstone) so a
            # later call cannot mistake a rebuilt snapshot — which by then
            # contains post-upgrade per-file counts — for the legacy total
            # and double-count them
            import logging

            import pyarrow.parquet as pq

            logging.getLogger("raykg").warning(
                "incremental state at %s has legacy manifests but no "
                "snapshot; their pattern counts are unrecoverable and the "
                "merge starts from the per-file tables only", self.state_dir)
            tmp = self._legacy_base + ".tmp"
            pq.write_table(PATTERNS.empty_table(), tmp)
            os.replace(tmp, self._legacy_base)

    def _merge_committed(self) -> Counter:
        """Global pattern counts derived from COMMITTED per-file tables
        (plus the frozen legacy base for pre-upgrade state dirs). A crash
        anywhere in ``process_file`` cannot double-count: a file's counts
        enter the merge iff its manifest (the single atomic commit marker)
        exists, and its pattern table is rewritten idempotently on
        re-processing."""
        import pyarrow.parquet as pq

        names = [n for n in sorted(os.listdir(self.manifest_dir))
                 if n.endswith(".json")]
        if any(not os.path.exists(
                os.path.join(self.manifest_dir, n[:-len(".json")] + ".parquet"))
               for n in names):
            self._migrate_legacy()

        merged: Counter = Counter()

        def add(t) -> None:
            for label, props, n in zip(t.column("label").to_pylist(),
                                       t.column("properties").to_pylist(),
                                       t.column("n").to_pylist()):
                merged[(label, tuple(props))] += n

        if os.path.exists(self._legacy_base):
            add(pq.read_table(self._legacy_base))
        for name in names:
            table = os.path.join(self.manifest_dir,
                                 name[:-len(".json")] + ".parquet")
            if os.path.exists(table):   # else: legacy, covered by the base
                add(pq.read_table(table))
        return merged

    def _write_snapshot(self, merged: Counter) -> None:
        import pyarrow.parquet as pq

        t = pa.Table.from_pydict({
            "label": [k[0] for k in sorted(merged)],
            "properties": [list(k[1]) for k in sorted(merged)],
            "n": [merged[k] for k in sorted(merged)],
        }, schema=PATTERNS)
        tmp = self.snapshot + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, self.snapshot)

    def process_file(self, path: str,
                     vocabulary: tuple[str, ...] = NODE_LABELS) -> str:
        if self.is_committed(path):
            return "skipped"
        import pyarrow.parquet as pq

        new = extract_file_patterns(path, vocabulary)
        # 1. per-file pattern table (idempotent: safe to rewrite on retry)
        tmp_t = self._file_table(path) + ".tmp"
        pq.write_table(new, tmp_t)
        os.replace(tmp_t, self._file_table(path))
        # 2. manifest = THE atomic commit point for this file
        manifest = {"file": path, "rows": int(sum(new.column("n").to_pylist())),
                    "patterns": new.num_rows}
        tmp = self._manifest(path) + ".json.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest(path))
        # 3. snapshot = derived cache over committed files (crash before or
        #    after this line loses nothing — patterns() re-derives)
        self._write_snapshot(self._merge_committed())
        return "ran"

    def patterns(self) -> pa.Table:
        """Merged pattern table, derived from committed per-file tables (the
        snapshot parquet is refreshed as a read-optimized artifact)."""
        merged = self._merge_committed()
        self._write_snapshot(merged)
        import pyarrow.parquet as pq

        return pq.read_table(self.snapshot)


def process_directory(input_dir: str, state_dir: str,
                      vocabulary: tuple[str, ...] = NODE_LABELS,
                      suffix: str = ".csv") -> pa.Table:
    """Reference lifecycle §3.2: list files, process each uncommitted one,
    return the merged pattern table."""
    run = IncrementalPatternRun(state_dir)
    for name in sorted(os.listdir(input_dir)):
        if name.endswith(suffix):
            run.process_file(os.path.join(input_dir, name), vocabulary)
    return run.patterns()
