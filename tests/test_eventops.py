"""Event-table operators (sessionize, sliding window, as-of join, range
join) pinned against in-process DuckDB on a crafted corpus that exercises
the edge cases: equal-timestamp tie-breaks, lefts with no prior right,
session gaps, multi-hour windows."""

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from raykg.ops import relational

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events_table() -> pa.Table:
    rows = []
    eid = 0

    def add(minutes, user, etype, value=1.0):
        nonlocal eid
        rows.append((eid, T0 + dt.timedelta(minutes=minutes), user, etype,
                     value, '{"k": 1}'))
        eid += 1

    # user 1: click at 0, purchase at 5 (attributed to click 0),
    # TWO clicks at the same timestamp 10 (tie-break -> max event_id),
    # purchase at 10 (same ts: inclusive match), purchase at 200 (gap ->
    # new session; still attributed to ts-10 click)
    add(0, 1, "click")
    add(5, 1, "purchase")
    add(10, 1, "click")
    add(10, 1, "click")
    add(10, 1, "purchase")
    add(200, 1, "purchase")
    # user 2: purchase with NO prior click (left outer null), later click
    # AFTER the purchase must not match
    add(3, 2, "purchase")
    add(8, 2, "click")
    # user 3: errors with 0, 1, 2 clicks in the trailing 10 minutes
    add(0, 3, "error")
    add(20, 3, "click")
    add(25, 3, "error")
    add(27, 3, "click")
    add(30, 3, "error")
    # spread across hours for the sliding window
    add(70, 1, "view", 2.5)
    add(130, 2, "view", 4.0)
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })


def _sf_dir(tmp_path) -> str:
    pq.write_table(_events_table(), str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _oracle(name: str):
    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("events", _events_table())
    df = con.sql(e.oracle_sql()[name]).df()
    con.close()
    return df


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True) \
        .astype(str).values.tolist()


def test_asof_last_click_edges(ray_session, tmp_path):
    sf = _sf_dir(tmp_path)
    got = relational.asof_last_click(sf).to_pandas()
    # purchase 1 -> click 0; purchase 4 (ts=10) -> click 3 (equal-ts,
    # max event_id); purchase 5 -> click 3; purchase 6 (user 2) -> null
    by_p = {int(r.purchase_id): r for r in got.itertuples()}
    assert int(by_p[1].click_id) == 0
    assert int(by_p[4].click_id) == 3
    assert int(by_p[5].click_id) == 3
    import pandas as pd

    assert pd.isna(by_p[6].click_id)
    assert _norm(got) == _norm(_oracle("asof_last_click"))


def test_range_join_counts(ray_session, tmp_path):
    sf = _sf_dir(tmp_path)
    got = relational.range_join_recent_clicks(sf).to_pandas()
    by_e = {int(r.error_id): int(r.n_recent_clicks) for r in got.itertuples()}
    assert by_e[8] == 0          # error at 0: no clicks yet
    assert by_e[10] == 1         # error at 25: click at 20
    assert by_e[12] == 2         # error at 30: clicks at 20 and 27
    assert _norm(got) == _norm(_oracle("range_join_recent_clicks"))


def test_sessionize_and_windows_match_duckdb(ray_session, tmp_path):
    sf = _sf_dir(tmp_path)
    got = relational.sessionize(sf).to_pandas()
    by_u = {int(r.user_id): (int(r.n_events), int(r.n_sessions))
            for r in got.itertuples()}
    # user 1: events at 0,5,10,10,10,70,200 -> gaps >30min before 70? 10->70
    # is 60min (break), 70->200 is 130min (break) -> 3 sessions
    assert by_u[1] == (7, 3)
    assert _norm(got) == _norm(_oracle("sessionize"))

    sliding = relational.sliding_event_stats(sf).to_pandas()
    assert _norm(sliding) == _norm(_oracle("sliding_event_stats"))
    hourly = relational.hourly_event_stats(sf).to_pandas()
    assert _norm(hourly) == _norm(_oracle("hourly_event_stats"))


def test_event_lag_stats_matches_duckdb(ray_session, tmp_path):
    # equal-ts events (ids 2,3,4 at minute 10) pin the (ts, event_id)
    # tie-break; users never mix (deltas are per-user)
    sf = _sf_dir(tmp_path)
    got = relational.event_lag_stats(sf).to_pandas()
    assert _norm(got) == _norm(_oracle("event_lag_stats"))
    # user 2's purchase at minute 3 is its user's first event -> the
    # 'purchase' deltas come only from user 1 (5-0, 10-10, 200-10 min)
    purch = got[got.event_type == "purchase"].iloc[0]
    assert int(purch.n_deltas) == 3


def test_event_transitions_matches_duckdb(ray_session, tmp_path):
    sf = _sf_dir(tmp_path)
    got = relational.event_transitions(sf).to_pandas()
    assert _norm(got) == _norm(_oracle("event_transitions"))
    # user 1's stream: click,purchase,click,click,purchase,purchase,view —
    # the same-ts rows at minute 10 order by event_id, so click->click
    # happens exactly once
    row = got[(got.from_type == "click") & (got.to_type == "click")]
    assert len(row) == 1 and int(row.iloc[0].n) == 1
    # out-probabilities per from_type sum to ~1
    sums = got.groupby("from_type").p.sum()
    assert ((sums - 1.0).abs() < 1e-4).all()


def test_top_orders_per_customer_rank_semantics(ray_session, tmp_path):
    import pandas as pd

    orders = pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "o_orderkey": pa.array([10, 11, 12, 20, 21, 30], pa.int64()),
        # customer 1: tie on totalprice -> smaller orderkey ranks first
        "o_totalprice": pa.array([5.0, 5.0, 1.0, 9.0, 2.0, 4.0],
                                 pa.float64()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = relational.top_orders_per_customer(str(tmp_path), k=2) \
        .to_pandas().sort_values(["o_custkey", "rnk"]).reset_index(drop=True)
    want = pd.DataFrame({
        "o_custkey": [1, 1, 2, 2, 3],
        "rnk": [1, 2, 1, 2, 1],
        "o_orderkey": [10, 11, 20, 21, 30],
        "o_totalprice": [5.0, 5.0, 9.0, 2.0, 4.0],
    })
    assert got.astype(str).values.tolist() == want.astype(str).values.tolist()


def test_customers_without_orders_anti_join(ray_session, tmp_path):
    import datetime as dtm

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        str(tmp_path / "customer.parquet"))
    d_old = dtm.datetime(1999, 6, 1)
    d_new = dtm.datetime(2001, 6, 1)
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2], pa.int64()),
        "o_orderdate": pa.array([d_new, d_old, d_old], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    got = relational.customers_without_orders(str(tmp_path)) \
        .to_pandas()["c_custkey"].sort_values().tolist()
    # 1 has a recent order; 2 only old ones; 3, 4 none at all
    assert got == [2, 3, 4]


def test_pricing_rollup_levels(ray_session, tmp_path):
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "B"], pa.string()),
        "l_linestatus": pa.array(["O", "F", "O"], pa.string()),
        "l_quantity": pa.array([1.0, 2.0, 4.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    got = relational.pricing_rollup(str(tmp_path)).to_pandas()
    rows = {(r.l_returnflag, r.l_linestatus): (r.sum_qty, r.n)
            for r in got.itertuples()}
    assert rows[("A", "O")] == (1.0, 1) and rows[("A", "F")] == (2.0, 1)
    assert rows[("A", None)] == (3.0, 2) and rows[("B", None)] == (4.0, 1)
    assert rows[(None, None)] == (7.0, 3)
    assert len(rows) == 6


def test_funnel_stages_crafted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from raykg.ops.relational import funnel_stages

    rows = [
        # user 1: full funnel in order
        (1, "2024-01-01 00:00", "view"), (1, "2024-01-01 00:10", "click"),
        (1, "2024-01-01 00:20", "purchase"),
        # user 2: purchase BEFORE the view->click chain -> stage 2
        (2, "2024-01-01 00:00", "purchase"), (2, "2024-01-01 00:05", "view"),
        (2, "2024-01-01 00:10", "click"),
        # user 3: click only, never views -> stage 0
        (3, "2024-01-01 00:00", "click"),
        # user 4: view then a click at the SAME instant -> strict > fails
        (4, "2024-01-01 00:00", "view"), (4, "2024-01-01 00:00", "click"),
        # user 5: view, early clicks before the view don't count, late does
        (5, "2024-01-01 00:00", "click"), (5, "2024-01-01 00:05", "view"),
        (5, "2024-01-01 00:10", "click"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r["stage"]
           for r in funnel_stages(str(tmp_path), num_buckets=8).take_all()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 1, 5: 2}


def test_histogram_quantiles_matches_duckdb(ray_session, tmp_path):
    # varied values spanning several 8-wide bins, incl. negatives (floor
    # binning), an exact bin-boundary value (16.0) and a hot bin — the
    # estimator (cum >= q*n hit + within-bin interpolation) must match the
    # SQL twin term-for-term
    import __ray_entry__ as e

    vals = [-3.5, 0.0, 1.0, 1.0, 2.5, 7.999, 8.0, 9.0, 16.0, 40.25,
            41.0, 41.5, 42.0, 100.0]
    rows = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([T0] * len(vals), pa.timestamp("us")),
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "event_type": pa.array(
            ["a" if i % 3 else "b" for i in range(len(vals))]),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * len(vals))})
    pq.write_table(rows, str(tmp_path / "events.parquet"))
    got = relational.histogram_quantiles(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.register("events", rows)
    want = con.sql(e.oracle_sql()["histogram_quantiles"]).df()
    con.close()
    assert _norm(got) == _norm(want)
    # within-data-range sanity: every estimate sits inside [min, max] bins
    assert got["value_est"].between(-8.0, 104.0).all()


def test_burst_stats_matches_duckdb(ray_session, tmp_path):
    # crafted bursts: user 1 fires 4 events inside 10 min (incl. two at the
    # SAME timestamp — RANGE peers count together) and one far later;
    # user 2's events straddle the exact 10-min boundary (inclusive);
    # user 3 has a single event
    import __ray_entry__ as e

    def ev(eid, minutes, user):
        return (eid, T0 + dt.timedelta(minutes=minutes), user, "click",
                1.0, "{}")

    rows = [ev(0, 0, 1), ev(1, 5, 1), ev(2, 5, 1), ev(3, 9, 1),
            ev(4, 120, 1),
            ev(5, 0, 2), ev(6, 10, 2), ev(7, 30, 2),
            ev(8, 7, 3)]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows])})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = relational.burst_stats(str(tmp_path)).to_pandas()
    by_u = {int(r.user_id): (int(r.n_events), int(r.max_burst),
                             int(r.is_burst)) for r in got.itertuples()}
    # user 1: window ending at minute 9 holds events 0,1,2,3 -> burst 4
    # user 2: minute-10 window [0, 10] holds both boundary events -> 2
    assert by_u == {1: (5, 4, 1), 2: (3, 2, 0), 3: (1, 1, 0)}
    con = duckdb.connect()
    con.register("events", t)
    want = con.sql(e.oracle_sql()["burst_stats"]).df()
    con.close()
    assert _norm(got) == _norm(want)


def test_ewma_by_user_matches_duckdb_and_hand(ray_session, tmp_path):
    # user 1: values 1, 2, 4 -> s = 1, 1.5, 2.75; ties at minute 5 pin the
    # (ts, event_id) order (event 1 before event 2)
    import __ray_entry__ as e

    rows = [
        (0, T0, 1, "a", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=5), 1, "a", 2.0, "{}"),
        (2, T0 + dt.timedelta(minutes=5), 1, "a", 4.0, "{}"),
        (3, T0, 2, "a", 7.5, "{}"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows])})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = relational.ewma_by_user(str(tmp_path)).to_pandas()
    by_u = {int(r.user_id): (int(r.n_events), float(r.ewma))
            for r in got.itertuples()}
    assert by_u == {1: (3, ((1.0 + 2.0) / 2 + 4.0) / 2), 2: (1, 7.5)}
    con = duckdb.connect()
    con.register("events", t)
    want = con.sql(e.oracle_sql()["ewma_by_user"]).df()
    con.close()
    assert _norm(got) == _norm(want)


def _retention_events() -> pa.Table:
    # multi-week spread: user 1 first active in week W, returns W+1 and W+3;
    # user 2 first active in W, never returns; user 3 first active in W+1,
    # returns W+2 twice IN THE SAME WEEK (must count once)
    rows = []
    eid = 0

    def add(days, user):
        nonlocal eid
        rows.append((eid, T0 + dt.timedelta(days=days), user, "click",
                     1.0, "{}"))
        eid += 1

    add(0, 1)
    add(1, 1)        # same week as first -> offset 0, counted once
    add(8, 1)        # W+1
    add(22, 1)       # W+3
    add(2, 2)        # W only
    add(9, 3)        # first week W+1
    add(15, 3)       # W+2
    add(16, 3)       # W+2 again (same week -> one retention row)
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string())})


def test_retention_cohorts_matches_duckdb(ray_session, tmp_path):
    import __ray_entry__ as e

    pq.write_table(_retention_events(), str(tmp_path / "events.parquet"))
    got = relational.retention_cohorts(str(tmp_path)).to_pandas()

    con = duckdb.connect()
    con.register("events", _retention_events())
    want = con.sql(e.oracle_sql()["retention_cohorts"]).df()
    con.close()
    assert _norm(got) == _norm(want)

    # semantic pins: T0 = 2024-01-01 lands in epoch-week 2817
    by = {(int(r.cohort_week), int(r.week_offset)): int(r.n_users)
          for r in got.itertuples()}
    w0 = int(dt.datetime(2024, 1, 1).timestamp() * 1_000_000
             // 604_800_000_000)
    # cohort w0: users 1 and 2 start there; user 1 returns W+1 and W+3
    assert by[(w0, 0)] == 2
    assert by[(w0, 1)] == 1
    assert by[(w0, 3)] == 1
    assert (w0, 2) not in by
    # cohort w0+1: user 3; two same-week events at W+2 count once
    assert by[(w0 + 1, 0)] == 1
    assert by[(w0 + 1, 1)] == 1


def test_interval_coverage_matches_duckdb(ray_session, tmp_path):
    """Gaps-and-islands on the crafted corpus (overlapping, touching and
    disjoint value-minute intervals per user) vs the SQL twin, plus a
    hand-checked island: user 3's three error events at 0/25/30 with
    1-minute durations are three separate islands."""
    sf = _sf_dir(tmp_path)
    got = relational.interval_coverage(sf).to_pandas()
    assert _norm(got) == _norm(_oracle("interval_coverage"))
    u3 = got[got.user_id == 3].iloc[0]
    # all five user-3 events are 1.0-minute intervals at 0,20,25,27,30:
    # islands {0}, {20,25,27,30}? 20+1<25 -> no; check: [20,21],[25,26],
    # [27,28],[30,31] all disjoint -> 5 islands, 5 minutes covered
    assert u3.n_islands == 5
    assert u3.covered_us == 5 * 60 * 1_000_000


def test_interval_coverage_variable_durations(ray_session, tmp_path):
    """Non-monotone interval ends (a LONG interval swallowing later short
    ones) — the case a sessionize-style gap test cannot catch and the
    grouped-cummax exists for."""
    import pyarrow.parquet as pq

    rows = [
        # user 9: 60-min interval at t=0 swallows events at 10 and 30
        # (their short intervals end before the first one does), then a
        # disjoint event at 120
        (0, 0, 9, 60.0), (1, 10, 9, 1.0), (2, 30, 9, 1.0),
        (3, 120, 9, 5.0),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(minutes=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = relational.interval_coverage(str(tmp_path)).to_pandas()
    assert got.n_islands.tolist() == [2]
    # island 1 = [0, 60] min (61 would need touching; ends at minute 60),
    # island 2 = [120, 125] min -> 65 minutes total
    assert got.covered_us.tolist() == [65 * 60 * 1_000_000]


def test_rolling_median_matches_duckdb(ray_session, tmp_path):
    """Exact trailing-5 rolling median vs quantile_cont window, including
    the expanding prefix (windows of 1..4) and equal-timestamp ordering
    by event_id."""
    sf = _sf_dir(tmp_path)
    got = relational.rolling_median(sf).to_pandas()
    assert _norm(got) == _norm(_oracle("rolling_median"))
    # expanding prefix sanity: user 1's first two events -> median of one
    # value, then of two (the midpoint)
    by_eid = got.set_index("event_id").roll_med
    assert by_eid[0] == 1.0
    assert by_eid[1] == 1.0


def test_hourly_autocorrelation_period2(ray_session, tmp_path):
    """A strict high/low alternating hourly series: lag-1 correlation
    must be -1, lag-2 must be +1; zero-filled gap hours count as real
    zeros. Pinned against the twin."""
    import pyarrow.parquet as pq

    from raykg.ops.relational import hourly_autocorrelation

    rows = []
    eid = 0
    # hours 0..9: 3 events on even hours, 1 on odd hours (never zero so
    # the pattern is pure alternation); hour 10 intentionally ABSENT
    # and hour 11 has 1 event -> the spine zero-fills hour 10
    for h in range(10):
        for _ in range(3 if h % 2 == 0 else 1):
            rows.append((eid, T0 + dt.timedelta(hours=h, minutes=5), 1))
            eid += 1
    rows.append((eid, T0 + dt.timedelta(hours=11, minutes=5), 1))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = hourly_autocorrelation(str(tmp_path)).to_pandas()
    by = {int(r.lag): r for r in got.itertuples()}
    # series = [3,1,3,1,3,1,3,1,3,1,0,1]: anti-correlated at lag 1,
    # correlated at lag 2 (the zero-filled hour bends both off +/-1) —
    # assert the EXACT Pearson of the known series
    import math

    series = [3, 1, 3, 1, 3, 1, 3, 1, 3, 1, 0, 1]

    def ref(lag):
        a, b = series[:-lag], series[lag:]
        n = len(a)
        sx, sy = sum(a), sum(b)
        sxy = sum(x * y for x, y in zip(a, b))
        sx2, sy2 = sum(x * x for x in a), sum(y * y for y in b)
        return round(
            (n * sxy - sx * sy)
            / math.sqrt(float(n * sx2 - sx * sx)
                        * (n * sy2 - sy * sy)), 6)

    assert by[1].r == ref(1) < 0 < ref(2) == by[2].r
    assert by[1].n_pairs == 11 and by[2].n_pairs == 10
    assert 24 not in by                      # lag >= series length

    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("events", t)
    want = con.sql(e.oracle_sql()["hourly_autocorrelation"]).df()
    con.close()
    assert _norm(got) == _norm(want)


def test_interval_coverage_randomized_vs_bruteforce(ray_session, tmp_path):
    """Seeded random users/timestamps/durations (including zero and
    swallowing intervals): the grouped-cummax island pass must equal a
    per-user brute-force interval union exactly."""
    import random

    import pyarrow.parquet as pq

    from raykg.ops.relational import interval_coverage

    rng = random.Random(11)
    rows = []
    for eid in range(400):
        rows.append((eid,
                     T0 + dt.timedelta(minutes=rng.randint(0, 600)),
                     rng.randint(0, 6),
                     rng.choice([0.0, 0.5, 2.0, 30.0, 120.0])))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {int(r.user_id): (int(r.n_islands), int(r.covered_us))
           for r in interval_coverage(str(tmp_path)).to_pandas()
           .itertuples()}

    import math

    per_user: dict = {}
    for _, ts, u, val in rows:
        s = int(ts.timestamp() * 1_000_000)
        dur = max(0, math.floor(val * 60 + 0.5)) * 1_000_000
        per_user.setdefault(u, []).append((s, s + dur))
    want = {}
    for u, ivs in per_user.items():
        ivs.sort()
        islands = []
        for s, f in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], f)
            else:
                islands.append([s, f])
        want[u] = (len(islands), sum(f - s for s, f in islands))
    assert got == want


def test_rolling_median_randomized_vs_pandas(ray_session, tmp_path):
    """Seeded random per-user series: the lagged-column nanmedian pass
    must equal pandas' expanding-then-rolling median on cents."""
    import random

    import pandas as pd
    import pyarrow.parquet as pq

    from raykg.ops.relational import rolling_median

    rng = random.Random(5)
    rows = []
    for eid in range(300):
        rows.append((eid, T0 + dt.timedelta(seconds=eid),
                     rng.randint(0, 4),
                     round(rng.uniform(0, 50), 2)))
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = rolling_median(str(tmp_path)).to_pandas() \
        .set_index("event_id").roll_med

    df = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "user_id": [r[2] for r in rows],
        "cents": [int(r[3] * 100 + 0.5) for r in rows]})
    ref = df.groupby("user_id")["cents"] \
        .rolling(window=5, min_periods=1).median() \
        .reset_index(level=0, drop=True)
    df["want"] = (ref / 100.0).round(4)
    for r in df.itertuples():
        assert got[r.event_id] == r.want, r.event_id
