"""Bucketed two-phase aggregation — the engine's standard wide-aggregate
pattern for high-cardinality keys.

Ray Data's ``groupby(key)`` runs a sort-based shuffle: for ~1M distinct
*string* keys the range-sort dominates (measured 8.2 s vs 2.0 s for the
bucketed variant on the 60k-doc flagship edge dedup at 32 CPUs). Instead:

1. **combiner** (``map_batches``): collapse duplicates inside each batch with
   a vectorized Arrow ``Table.group_by`` — embarrassingly parallel, thins hot
   keys before any data moves (reference analog: the partial/final two-phase
   pattern SURVEY §4 prescribes for the skewed cluster aggregate).
2. **bucket**: attach ``bucket = crc32(key) % num_buckets`` (int32). The hash
   is uniform regardless of key skew, so hot keys cannot overload one
   partition beyond its bucket's share — this, plus the combiner, is the
   salted-key guard from the north rule.
3. **exchange**: ``groupby("bucket")`` — sorting a small-int column is cheap
   and the all-to-all moves already-thinned partials.
4. **finalize** (``map_groups``): one vectorized Arrow hash-agg per bucket.

At cluster scale, ``num_buckets`` should be ≥ total cores so every node gets
work; buckets are independent, so a failed bucket re-executes alone.
``num_buckets`` must be LARGE (default 1024): Ray's sort-based groupby
range-partitions on sampled key quantiles, and a key with only ~64 distinct
values collapses the ranges (measured 37 s vs 5.8 s at 3.3M rows, 64 vs 1024
buckets). Hash-shuffle strategy (set on the DataContext) was measured 6x
SLOWER here (aggregator-actor startup) besides deadlocking against actor
pools — stay on the sort default.

**Zero-row block convention (why sentinels live at call sites):** Ray
replaces a zero-row map output with a schema-less block, which crashes
joins and downstream keyed stages. This helper cannot fix that generically
— a synthetic row needs a key value that is provably absent from real data
AND, on the finalize side, an output row in finalize's schema, both of
which only the call site knows. Convention: combiners/finalizers that can
go empty append ONE sentinel row per block using a key that cannot occur
in the data (empty string, a NUL-prefixed string like "\\x00S", or -1 for
non-negative int keys — guard with a validation like neardup_keep's) and
filter it after the exchange. Document the impossibility argument at each
site."""

from __future__ import annotations

import zlib
from collections.abc import Callable

import numpy as np
import pyarrow as pa

import ray.data as rd


def crc_bucket_array(keys: pa.ChunkedArray | pa.Array,
                     num_buckets: int) -> pa.Array:
    """int32 bucket per key: crc32 for strings, a Knuth multiplicative hash
    for integer keys (fully vectorized — no per-row Python). Stable across
    processes and partitionings either way."""
    if pa.types.is_integer(keys.type):
        arr = (keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
               else keys).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = ((arr * np.uint64(2654435761)) >> np.uint64(7)) \
            % np.uint64(num_buckets)
        return pa.array(b.astype(np.int32), pa.int32())
    ks = keys.to_pylist()
    out = np.fromiter((zlib.crc32(s.encode("utf-8")) % num_buckets
                       for s in ks), dtype=np.int32, count=len(ks))
    return pa.array(out, pa.int32())


def bucketed_group_agg(ds: rd.Dataset,
                       combiner: Callable[[pa.Table], pa.Table],
                       key_col: str,
                       finalize: Callable[[pa.Table], pa.Table],
                       num_buckets: int = 1024,
                       combine_batch_size: int | None = 65536) -> rd.Dataset:
    """Two-phase grouped aggregation over ``key_col``.

    ``combiner``: batch -> partial table that MUST contain ``key_col``
    (one row per distinct key in the batch, ideally).
    ``finalize``: per-bucket table (bucket column already dropped) -> final
    rows for every key hashed into that bucket.
    """

    def with_bucket(batch: pa.Table) -> pa.Table:
        t = combiner(batch)
        return t.append_column(
            "bucket", crc_bucket_array(t.column(key_col), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        return finalize(t.drop_columns(["bucket"]))

    # Large combine batches (64k default; None = block-sized): the combiner's
    # dedup power scales with batch size — hot keys recur in every small
    # batch, so small batches emit multiples more partial rows into the
    # exchange on a Zipfian key stream, and upstream stages often produce
    # many small blocks that are worth coalescing here.
    partial = ds.map_batches(with_bucket, batch_format="pyarrow",
                             batch_size=combine_batch_size)
    return partial.groupby("bucket").map_groups(
        per_bucket, batch_format="pyarrow")
