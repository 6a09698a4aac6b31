"""Pinning the bucketed-exchange contracts (functions/shuffle.py).

Two layers:
  - hypothesis property tests for ``crc_bucket_array`` — the pure kernel
    whose stability across chunking / dtype / process is what makes "same
    result at any partitioning" true for every bucketed op;
  - adversarial empty-bucket integration tests for the ZERO-ROW BLOCK
    convention (shuffle.py module docstring): one test per sentinel family
    used at the ~10 call sites (string "", NUL-prefixed "\\x00S", int -1).
    Each drives ``bucketed_group_agg`` with a combiner that filters entire
    blocks to zero rows — the exact shape that turns a map output into a
    schema-less block and crashes the exchange when the convention is
    violated — and checks the final aggregate against a driver-side
    reference, sentinel rows excluded.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data as rd

from raykg.functions.shuffle import bucketed_group_agg, crc_bucket_array

# --- crc_bucket_array properties (pure, no Ray) --------------------------


@given(st.lists(st.integers(min_value=-2**62, max_value=2**62), max_size=200),
       st.integers(1, 4096))
@settings(max_examples=60, deadline=None)
def test_int_buckets_bounded_and_chunking_invariant(keys, num_buckets):
    arr = pa.array(keys, pa.int64())
    b = crc_bucket_array(arr, num_buckets).to_pylist()
    assert all(0 <= x < num_buckets for x in b)
    # chunking must not change assignments (blocks arrive arbitrarily split)
    if len(keys) > 1:
        mid = len(keys) // 2
        chunked = pa.chunked_array([keys[:mid], keys[mid:]],
                                   type=pa.int64())
        assert crc_bucket_array(chunked, num_buckets).to_pylist() == b
    # re-evaluation is deterministic (stability across retries/processes)
    assert crc_bucket_array(arr, num_buckets).to_pylist() == b


@given(st.lists(st.text(max_size=24), max_size=200), st.integers(1, 4096))
@settings(max_examples=60, deadline=None)
def test_str_buckets_bounded_and_deterministic(keys, num_buckets):
    arr = pa.array(keys, pa.string())
    b = crc_bucket_array(arr, num_buckets).to_pylist()
    assert all(0 <= x < num_buckets for x in b)
    assert crc_bucket_array(arr, num_buckets).to_pylist() == b
    # equal keys always share a bucket regardless of position
    by_key = {}
    for k, bk in zip(keys, b):
        assert by_key.setdefault(k, bk) == bk


@given(st.lists(st.integers(0, 2**31), min_size=64, max_size=512))
@settings(max_examples=20, deadline=None)
def test_int_buckets_spread(keys):
    # the multiplicative hash must not collapse distinct keys into one
    # bucket (the failure mode that re-creates the hot-partition problem)
    distinct = sorted(set(keys))
    if len(distinct) < 32:
        return
    b = crc_bucket_array(pa.array(distinct, pa.int64()), 64).to_pylist()
    assert len(set(b)) > 1


# --- zero-row-block sentinel conventions (Ray integration) ---------------
#
# Shared shape: 8 input blocks; the combiner drops every row of half the
# blocks (adversarial: zero-row map outputs), appends its family's sentinel
# row, and the finalizer sums per key and filters the sentinel. Expected =
# driver-side sum over the kept rows. num_buckets intentionally exceeds the
# key count so MOST buckets are empty too.


def _run_family(ray_session, keys, vals, keep_mask, sentinel_key, key_type):
    t = pa.table({"k": pa.array(keys, key_type),
                  "v": pa.array(vals, pa.int64()),
                  "keep": pa.array(keep_mask, pa.bool_())})
    ds = rd.from_arrow(t).repartition(8)

    def combiner(batch: pa.Table) -> pa.Table:
        kept = batch.filter(batch.column("keep"))
        part = pa.TableGroupBy(kept.select(["k", "v"]), "k").aggregate(
            [("v", "sum")]).rename_columns(["k", "v"])
        # the convention under test: one sentinel row keeps zero-row
        # blocks typed through the exchange
        sent = pa.table({"k": pa.array([sentinel_key], key_type),
                         "v": pa.array([0], pa.int64())})
        return pa.concat_tables([part, sent])

    def finalize(t: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(t, "k").aggregate([("v", "sum")]) \
            .rename_columns(["k", "v"])
        return out.filter(pc.not_equal(out.column("k"),
                                       pa.scalar(sentinel_key, key_type)))

    res = bucketed_group_agg(ds, combiner, "k", finalize, num_buckets=64)
    got = {}
    for b in res.iter_batches(batch_format="pyarrow"):
        for k, v in zip(b.column("k").to_pylist(), b.column("v").to_pylist()):
            assert k not in got, "key crossed buckets"
            got[k] = v

    expect = {}
    for k, v, keep in zip(keys, vals, keep_mask):
        if keep:
            expect[k] = expect.get(k, 0) + v
    assert got == expect


@pytest.mark.parametrize("sentinel_key,key_type,keyspace", [
    ("", pa.string(), ["alpha", "beta", "gamma", "delta"]),
    ("\x00S", pa.string(), ["alpha", "beta", "gamma", "delta"]),
    (-1, pa.int64(), [0, 1, 7, 12345]),
], ids=["empty-string", "nul-prefixed", "int-minus-one"])
def test_sentinel_family_survives_empty_blocks(ray_session, sentinel_key,
                                               key_type, keyspace):
    rng = np.random.default_rng(7)
    n = 400
    keys = [keyspace[i] for i in rng.integers(0, len(keyspace), n)]
    vals = rng.integers(1, 100, n).tolist()
    # drop ALL rows whose position falls in half the blocks: with 8 blocks
    # of 50 rows, blocks 1,3,5,7 go entirely empty through the combiner
    keep = [(i // 50) % 2 == 0 for i in range(n)]
    _run_family(ray_session, keys, vals, keep, sentinel_key, key_type)


def test_all_blocks_empty(ray_session):
    # the extreme case: EVERY block filters to nothing; the exchange must
    # still complete and produce an empty (not schema-less) result
    _run_family(ray_session, ["a", "b"] * 50, list(range(100)),
                [False] * 100, "", pa.string())
