"""ngram_novelty and pareto_front pinned against their in-process DuckDB
oracle SQL on crafted tables (gram reuse across docs, short-text gram
fallback, dominated/tied skyline points)."""

import duckdb
import pyarrow as pa

import ray.data as rd

from raykg.ops import relational, text


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True) \
        .astype(str).values.tolist()


def test_ngram_novelty_vs_oracle(ray_session):
    import __ray_entry__ as e

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta",          # all grams first here
            "alpha beta gamma epsilon",        # reuses 'alpha beta gamma'
            "zeta eta",                        # <3 tokens: single gram
            "alpha beta gamma delta",          # exact dup: novelty 0
            "",                                # no grams: absent from out
        ], pa.string())})
    got = text.ngram_novelty(rd.from_arrow(docs), num_buckets=4).to_pandas()

    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(e.oracle_sql()["ngram_novelty"]).df()
    con.close()
    assert _norm(got) == _norm(want)

    by = {r.doc_id: r for r in got.itertuples()}
    assert set(by) == {1, 2, 3, 4}
    assert by[1].novelty == 1.0
    assert by[4].novelty == 0.0                 # every gram first in doc 1
    assert (by[3].n_grams, by[3].novel_grams) == (1, 1)
    # doc 2: grams 'alpha beta gamma' (seen), 'beta gamma epsilon' (new)
    assert (by[2].n_grams, by[2].novel_grams) == (2, 1)


def test_pareto_front_vs_oracle(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    part = pa.table({
        "p_size": pa.array([10, 10, 8, 8, 5, 12, 12, 3], pa.int64()),
        "p_retailprice": pa.array(
            [100.00, 90.00,    # same size: only cheaper survives
             90.00,            # tied price, smaller size: dominated
             80.00,            # smaller but cheaper: survives
             80.00,            # tied price, smaller size: dominated
             150.00, 150.00,   # duplicate pair: one row out
             10.05],           # smallest, cheapest: survives
            pa.float64())})
    pq.write_table(part, str(tmp_path / "part.parquet"))
    got = relational.pareto_front(str(tmp_path)).to_pandas()

    con = duckdb.connect()
    con.register("part", part)
    want = con.sql(e.oracle_sql()["pareto_front"]).df()
    con.close()
    assert _norm(got) == _norm(want)
    assert sorted(zip(got.p_size, got.price_cents)) == \
        [(3, 1005), (8, 8000), (10, 9000), (12, 15000)]


def test_pareto_front_merge_across_blocks(ray_session, tmp_path):
    """A point that is locally non-dominated in its block but dominated by
    a point in ANOTHER block must be removed by the final driver scan."""
    import pyarrow.parquet as pq

    sizes, prices = [], []
    # block-spanning fixture: many rows so read splits into >1 batch is
    # plausible; correctness must not depend on the split either way
    for i in range(500):
        sizes.append(5)
        prices.append(200.0 + i)     # all dominated by (6, 150.0)
    sizes += [6]
    prices += [150.0]
    part = pa.table({"p_size": pa.array(sizes, pa.int64()),
                     "p_retailprice": pa.array(prices, pa.float64())})
    pq.write_table(part, str(tmp_path / "part.parquet"))
    got = relational.pareto_front(str(tmp_path)).to_pandas()
    assert sorted(zip(got.p_size, got.price_cents)) == [(6, 15000)]


def test_group_quantiles_vs_oracle(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    part = pa.table({
        "l_returnflag": pa.array(list("AAAABBB"), pa.string()),
        "l_extendedprice": pa.array(
            [1.00, 2.00, 3.00, 4.00,    # even n: disc pick, no midpoint
             5.00, 5.00, 7.00],         # duplicated value mass
            pa.float64())})
    pq.write_table(part, str(tmp_path / "lineitem.parquet"))
    got = relational.group_quantiles(str(tmp_path), num_buckets=4) \
        .to_pandas()

    con = duckdb.connect()
    con.register("lineitem", part)
    want = con.sql(e.oracle_sql()["group_quantiles"]).df()
    con.close()
    assert _norm(got) == _norm(want)
    by = {(r.group_key, r.q): r.value for r in got.itertuples()}
    assert by[("A", 0.25)] == 1.0 and by[("A", 0.5)] == 2.0 \
        and by[("A", 0.75)] == 3.0
    assert by[("B", 0.25)] == 5.0 and by[("B", 0.5)] == 5.0 \
        and by[("B", 0.75)] == 7.0


def test_robust_group_stats_crafted(ray_session, tmp_path):
    """Hampel rule on crafted groups: MAD immune to the outlier it flags
    (group A), MAD=0 degenerate mass (group B: any deviation is an
    outlier), even-count disc median (group C). Pinned against the twin."""
    import pyarrow.parquet as pq

    import __ray_entry__ as e

    orders = pa.table({
        "o_orderpriority": pa.array(
            ["A"] * 7 + ["B"] * 5 + ["C"] * 4, pa.string()),
        "o_totalprice": pa.array(
            [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 500.0,   # A: one outlier
             5.0, 5.0, 5.0, 5.0, 9.0,                     # B: MAD = 0
             1.0, 2.0, 3.0, 4.0],                         # C: even n
            pa.float64())})
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = relational.robust_group_stats(str(tmp_path), num_buckets=4) \
        .to_pandas()

    con = duckdb.connect()
    con.register("orders", orders)
    want = con.sql(e.oracle_sql()["robust_group_stats"]).df()
    con.close()
    assert _norm(got) == _norm(want)
    by = {r.group_key: r for r in got.itertuples()}
    # A: median 13, devs {0,1,1,2,2,3,487} -> MAD 2, outliers: 487 > 6
    assert (by["A"].median, by["A"].mad, by["A"].n_outliers) == (13.0, 2.0, 1)
    # B: median 5, MAD 0, the single 9 is an outlier (4 > 0)
    assert (by["B"].median, by["B"].mad, by["B"].n_outliers) == (5.0, 0.0, 1)
    # C: even n disc median = 2 (cum*2 >= n at the 2nd of 4)
    assert by["C"].median == 2.0 and by["C"].n_outliers == 0


def test_local_supplier_revenue_correlation(ray_session, tmp_path):
    """The c_nationkey = s_nationkey correlation must drop the lineitem
    whose supplier nation differs from the customer's, the date filter
    must drop the out-of-range order, and the off-region nation must not
    appear at all. Pinned against the twin."""
    import datetime as dt

    import pyarrow.parquet as pq

    import __ray_entry__ as e

    def w(name, table):
        pq.write_table(table, str(tmp_path / f"{name}.parquet"))

    w("region", pa.table({"r_regionkey": pa.array([0, 2], pa.int64()),
                          "r_name": pa.array(["AFRICA", "ASIA"],
                                             pa.string())}))
    w("nation", pa.table({
        "n_nationkey": pa.array([10, 11, 20], pa.int64()),
        "n_name": pa.array(["JAPAN", "CHINA", "KENYA"], pa.string()),
        "n_regionkey": pa.array([2, 2, 0], pa.int64())}))
    w("supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"], pa.string()),
        "s_nationkey": pa.array([10, 11, 20], pa.int64()),
        "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64())}))
    w("customer", pa.table({
        "c_custkey": pa.array([100, 101], pa.int64()),
        "c_name": pa.array(["c100", "c101"], pa.string()),
        "c_nationkey": pa.array([10, 20], pa.int64()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["A", "B"], pa.string())}))
    T = dt.datetime
    w("orders", pa.table({
        "o_orderkey": pa.array([1000, 1001, 1002], pa.int64()),
        "o_custkey": pa.array([100, 100, 101], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3, pa.string()),
        "o_totalprice": pa.array([1.0, 1.0, 1.0], pa.float64()),
        "o_orderdate": pa.array(
            [T(1996, 6, 1), T(1999, 6, 1), T(1996, 6, 1)],
            pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * 3, pa.string())}))
    # order 1000 (JAPAN customer): one JAPAN-supplier line (kept, 100),
    # one CHINA-supplier line (dropped: correlation); order 1001 kept
    # by keys but out of date range; order 1002 KENYA customer (off
    # region, dropped)
    w("lineitem", pa.table({
        "l_orderkey": pa.array([1000, 1000, 1001, 1002], pa.int64()),
        "l_partkey": pa.array([1] * 4, pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 3], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1], pa.int64()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([200.0, 300.0, 400.0, 500.0],
                                    pa.float64()),
        "l_discount": pa.array([0.5, 0.0, 0.0, 0.0], pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["N"] * 4, pa.string()),
        "l_linestatus": pa.array(["O"] * 4, pa.string()),
        "l_shipdate": pa.array([T(1996, 6, 2)] * 4, pa.timestamp("us"))}))

    got = relational.local_supplier_revenue(str(tmp_path)).to_pandas()
    assert got.values.tolist() == [["JAPAN", 100.0]]

    # the distributed customer leg (dim_broadcast_limit exceeded -> the
    # custkey->nation attach becomes a hash join and the customer table
    # never reaches the driver) must produce the identical table
    got_join = relational.local_supplier_revenue(
        str(tmp_path), dim_broadcast_limit=0).to_pandas()
    assert got_join.values.tolist() == got.values.tolist()

    con = duckdb.connect()
    for t in ("region", "nation", "supplier", "customer", "orders",
              "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    want = con.sql(e.oracle_sql()["local_supplier_revenue"]).df()
    con.close()
    assert _norm(got) == _norm(want)
