"""kg_edges key-scheme selection: the wide string-key fallback must produce
the identical output to the packed path, and must auto-select when FK
values exceed the 30-bit packing bound (the sf100+ scale ceiling ADVICE r2
flagged)."""

import pyarrow as pa
import pyarrow.parquet as pq

from raykg.functions.hashing import sha_hex
from raykg.ops import relational


def _rows(ds):
    return sorted((r["subj"], r["pred"], r["obj"], r["n"])
                  for r in ds.take_all())


def test_wide_path_matches_packed(ray_session, monkeypatch):
    """Force the fallback (as if footer stats were missing) on the fixture
    tables: output must be bit-identical to the packed path."""
    sf = "/root/testdata/sf0.001"
    packed = _rows(relational.kg_edges(sf))
    monkeypatch.setattr(relational, "_parquet_col_ranges",
                        lambda path, cols: {c: None for c in cols})
    wide = _rows(relational.kg_edges(sf))
    assert wide == packed
    assert len(wide) > 100


def test_big_fk_values_auto_select_wide(ray_session, tmp_path):
    """FK values >= 2^30 (real at TPC-H sf200) must route to the wide path
    and still mint correct URIs instead of raising or bleeding bits."""
    d = str(tmp_path)
    big = 1 << 31
    pq.write_table(pa.table({"n_nationkey": pa.array([0], pa.int64()),
                             "n_regionkey": pa.array([0], pa.int64())}),
                   f"{d}/nation.parquet")
    pq.write_table(pa.table({"c_custkey": pa.array([1], pa.int64()),
                             "c_nationkey": pa.array([0], pa.int64())}),
                   f"{d}/customer.parquet")
    pq.write_table(pa.table({"o_orderkey": pa.array([big, 5], pa.int64()),
                             "o_custkey": pa.array([1, 1], pa.int64())}),
                   f"{d}/orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([big, big, 5], pa.int64()),
        "l_partkey": pa.array([7, 7, 7], pa.int64()),
        "l_suppkey": pa.array([3, 3, 3], pa.int64()),
    }), f"{d}/lineitem.parquet")

    rows = _rows(relational.kg_edges(d))
    big_order = f"sdpg.gr/Order/{sha_hex(str(big))}"
    part7 = f"sdpg.gr/Part/{sha_hex('7')}"
    assert (big_order, "HAS_PART", part7, 2) in rows        # deduped count
    assert (f"sdpg.gr/Order/{sha_hex('5')}", "HAS_PART", part7, 1) in rows
    assert (big_order, "PLACED_BY", f"sdpg.gr/Customer/{sha_hex('1')}",
            1) in rows
