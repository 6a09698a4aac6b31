"""Table IO. The production design targets Lance (per BASELINE.json
``input_hint``: "Lance table of interleaved text + media documents"), but the
``lance`` package is not available in this container, so every call is gated
behind an import-try and falls back to partitioned Parquet — identical
semantics for this engine (columnar, column-pruned scans, fragment-based
resumable writes). Swap ``read_table``/``write_table`` when Lance is present.
"""

from __future__ import annotations

import ray.data as rd

try:  # pragma: no cover - lance not installed in this container
    import lance  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None,
               cast_to=None) -> rd.Dataset:
    """Distributed read with column pruning pushed to the scan. JSONL
    (``.jsonl`` path suffix) is supported as an ingest format — columns
    are projected after the parse (the format has no column pruning), and
    ``cast_to`` (a pyarrow.Schema) casts the inferred types to the
    contract schema (JSON inference widens e.g. int32 span offsets to
    int64; parquet/lance carry authoritative schemas, so the cast is a
    JSONL-only concern)."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        return rd.read_lance(path, columns=columns)
    if path.rstrip("/").endswith(".jsonl"):
        ds = rd.read_json(path, file_extensions=["jsonl", "json"])
        if cast_to is not None:
            ds = ds.map_batches(
                lambda t, s=cast_to: t.select(s.names).cast(s),
                batch_format="pyarrow")
        return ds.select_columns(columns) if columns else ds
    return rd.read_parquet(path, columns=columns)


def write_table(ds: rd.Dataset, path: str, **kwargs) -> None:
    """Partitioned columnar write (one part file per block — never one giant
    file, so a rerun can skip or re-emit individual partitions)."""
    if HAVE_LANCE and path.endswith(".lance"):  # pragma: no cover
        ds.write_lance(path, **kwargs)
        return
    if path.rstrip("/").endswith(".jsonl"):
        ds.write_json(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
