"""numeric_correlation_matrix and fuzzy_name_pairs pinned against their
in-process DuckDB oracle SQL on crafted tables (negative correlation,
2-decimal quantization boundaries, deletion/substitution name shapes)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from raykg.ops import relational
from raykg.ops.dedup import fuzzy_name_pairs


def _lineitem_table() -> pa.Table:
    # perfectly anti-correlated qty/discount, boundary decimals on price
    qty = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    price = [100.05, 2399.99, 17.01, 901.10, 55.55, 4000.00]
    disc = [0.10, 0.08, 0.06, 0.04, 0.02, 0.00]
    tax = [0.00, 0.01, 0.02, 0.05, 0.07, 0.08]
    return pa.table({
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array(disc, pa.float64()),
        "l_tax": pa.array(tax, pa.float64()),
    })


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True) \
        .astype(str).values.tolist()


def test_correlation_matrix_vs_oracle(ray_session, tmp_path):
    import __ray_entry__ as e

    t = _lineitem_table()
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    got = relational.numeric_correlation_matrix(str(tmp_path)).to_pandas()

    con = duckdb.connect()
    con.register("lineitem", t)
    want = con.sql(e.oracle_sql()["numeric_correlation_matrix"]).df()
    con.close()
    assert _norm(got) == _norm(want)
    # sanity: qty vs discount is exactly -1 on this fixture
    row = got[(got.col_x == "l_quantity") & (got.col_y == "l_discount")]
    assert row.r.iloc[0] == -1.0


def test_fuzzy_name_pairs_vs_oracle(ray_session):
    import __ray_entry__ as e

    names = ["red bolt", "rod bolt", "cold gear", "old gear", "old gea",
             "ab", "ba", "red bolt", "widget", "widgets"]
    t = pa.table({"p_name": pa.array(names, pa.string())})
    ds = rd.from_arrow(t)
    got = fuzzy_name_pairs(ds, col="p_name").to_pandas()

    con = duckdb.connect()
    con.register("part", t)
    want = con.sql(e.oracle_sql()["fuzzy_name_pairs"]).df()
    con.close()
    assert _norm(got) == _norm(want)
    assert len(got) >= 4   # red/rod, cold/old gear, old gear/gea, widget(s)
