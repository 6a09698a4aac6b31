"""Relational operator surface over the TPC-H-ish test tables — the SURVEY §2
operator inventory re-expressed Ray-Data-first, with column-pruned reads,
two-phase (combiner + groupby) aggregation, broadcast small-side joins,
hash-shuffle large-side joins, grouped top-1, top-k, distinct, windowed and
sessionized event aggregation, and a KG-from-relational path (URI minting +
FK edges) whose values are reproducible in ANSI SQL (DuckDB oracle).

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table whose
column names match the corresponding ``__ray_entry__.oracle_sql`` entry.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from raykg.functions.hashing import hex_threshold, round_half_away, sha_hex


def _rha(col, digits: int) -> pa.Array:
    """DuckDB-bit-identical round of an Arrow column."""
    import numpy as np

    vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.array(round_half_away(vals, digits), pa.float64())

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _read(sf_dir: str, table: str, columns: list[str] | None = None,
          blocks: int | None = None) -> rd.Dataset:
    kw = {"override_num_blocks": blocks} if blocks else {}
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kw)


def small_key_agg(partials: rd.Dataset, combine, recombine_batch: int = 65536
                  ) -> pa.Table:
    """Final aggregation for TYPE-VOCABULARY-sized key spaces (tens of
    distinct groups). Ray's sort-based groupby costs ~5 s of fixed
    sampling + exchange even for a few thousand tiny partial rows (measured
    on property_signatures), so instead: one more distributed re-combine
    pass over 64k-row map tasks (cuts O(keys x blocks) partials down to
    O(keys x final_blocks), no all-to-all), then ONE vectorized Arrow
    group_by over the vocabulary-sized remainder on the driver. ``combine``
    must be idempotent (partials in, same-schema partials out)."""
    red = partials.map_batches(combine, batch_format="pyarrow",
                               batch_size=recombine_batch)
    rows = red.take_all()
    if rows:
        return combine(pa.Table.from_pylist(rows))
    # empty source: rebuild a typed empty table so combine's group_by still
    # sees its key/sum columns and the result keeps the output schema
    sch = red.schema()
    if sch is None:
        raise ValueError("small_key_agg: empty input with unknown schema")
    base = getattr(sch, "base_schema", sch)
    return combine(base.empty_table())


def _read_small(sf_dir: str, table: str, columns: list[str] | None = None) -> pa.Table:
    """Driver-side read of a dimension table (broadcast side)."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# A1/A2 analog: pruned read + two-phase grouped aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


def _sum_combine(keys: list[str], sums: list[str]):
    """Idempotent partial combiner for ``small_key_agg``: group by ``keys``,
    sum ``sums``, restore original column names."""

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([(c, "sum") for c in sums])
        return pa.table({**{k: g.column(k) for k in keys},
                         **{c: g.column(f"{c}_sum") for c in sums}})

    return combine


def pricing_summary(sf_dir: str) -> pa.Table:
    """Per (l_returnflag, l_linestatus): sum_qty, sum_price, sum_disc_price,
    avg_qty, n — partial aggregation inside map_batches (vectorized pyarrow
    group_by per batch), small_key_agg final merge (6 groups)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        t = t.append_column("disc_price", disc_price)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("l_quantity", "sum"), ("l_extendedprice", "sum"),
            ("disc_price", "sum"), ([], "count_all")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "q": g.column("l_quantity_sum"),
            "p": g.column("l_extendedprice_sum"),
            "d": g.column("disc_price_sum"),
            "n": g.column("count_all"),
        })

    tot = small_key_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        _sum_combine(["l_returnflag", "l_linestatus"], ["q", "p", "d", "n"]))
    sq = tot.column("q")
    n = tot.column("n")
    return pa.table({
        "l_returnflag": tot.column("l_returnflag"),
        "l_linestatus": tot.column("l_linestatus"),
        "sum_qty": _rha(sq, 2),
        "sum_price": _rha(tot.column("p"), 2),
        "sum_disc_price": _rha(tot.column("d"), 2),
        "avg_qty": _rha(pc.divide(
            sq.combine_chunks(), pc.cast(n.combine_chunks(),
                                         pa.float64())), 4),
        "n": n,
    })


def _sums(cols: list[str]):
    from ray.data.aggregate import Sum

    return [Sum(c) for c in cols]


# ---------------------------------------------------------------------------
# J1/T4 analog: broadcast small-side join (customer+nation dims via ray.put)
# ---------------------------------------------------------------------------


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """orders ⋈ customer ⋈ nation, dims broadcast once: per n_name total
    o_totalprice and order count. The broadcast lookup on the fact side is
    fully vectorized — ``pc.index_in`` + ``take`` + Arrow ``group_by`` per
    batch, zero Python rows touched on the orders table."""
    cust = _read_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    nation = _read_small(sf_dir, "nation", ["n_nationkey", "n_name"])
    nat_name = dict(zip(nation.column("n_nationkey").to_pylist(),
                        nation.column("n_name").to_pylist()))
    keys = pc.cast(cust.column("c_custkey").combine_chunks(), pa.int64())
    names = pa.array([nat_name[n]
                      for n in cust.column("c_nationkey").to_pylist()],
                     pa.string())
    ref = ray.put((keys, names))

    class Partial:
        def __init__(self):
            self.keys, self.names = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(pc.cast(t.column("o_custkey").combine_chunks(),
                                      pa.int64()), value_set=self.keys)
            g = pa.table({
                "n_name": self.names.take(idx),
                "price": t.column("o_totalprice"),
            }).group_by("n_name").aggregate([("price", "sum"),
                                             ([], "count_all")])
            return pa.table({"n_name": g.column("n_name"),
                             "rev": g.column("price_sum"),
                             "cnt": g.column("count_all")})

    part = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(Partial, batch_format="pyarrow", concurrency=(1, 4))
    tot = small_key_agg(part, _sum_combine(["n_name"], ["rev", "cnt"]))
    return pa.table({
        "n_name": tot.column("n_name"),
        "revenue": _rha(tot.column("rev"), 2),
        "n_orders": tot.column("cnt"),
    })


# ---------------------------------------------------------------------------
# J2 analog: large ⋈ large hash-shuffle join (Dataset.join)
# ---------------------------------------------------------------------------


def revenue_by_priority(sf_dir: str) -> pa.Table:
    """lineitem ⋈ orders on orderkey (both sides large -> hash-partitioned
    shuffle join), then revenue per o_orderpriority."""
    # metadata-only counts (no scan): an all-empty side reaches the hash
    # join as schema-less blocks, which it rejects — the result is
    # definitionally empty, so return it before shuffling anything
    if _read(sf_dir, "lineitem", ["l_orderkey"]).count() == 0 or \
            _read(sf_dir, "orders", ["o_orderkey"]).count() == 0:
        return pa.table({"o_orderpriority": pa.array([], pa.string()),
                         "revenue": pa.array([], pa.float64())})
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def add_rev(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        return pa.table({"l_orderkey": t.column("l_orderkey"), "rev": rev})

    li = li.map_batches(add_rev, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(orders, join_type="inner", num_partitions=16,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        if "o_orderpriority" not in t.column_names:   # schema-less guard
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "rev": pa.array([], pa.float64())})
        g = t.group_by("o_orderpriority").aggregate([("rev", "sum")])
        return pa.table({"o_orderpriority": g.column("o_orderpriority"),
                         "rev": g.column("rev_sum")})

    tot = small_key_agg(joined.map_batches(partial, batch_format="pyarrow"),
                        _sum_combine(["o_orderpriority"], ["rev"]))
    return pa.table({"o_orderpriority": tot.column("o_orderpriority"),
                     "revenue": _rha(tot.column("rev"), 2)})


# ---------------------------------------------------------------------------
# A5/O1 analog: majority (top-1-per-group via grouped argmax, no window fn)
# ---------------------------------------------------------------------------


def majority_nation_per_segment(sf_dir: str) -> pa.Table:
    """Per c_mktsegment the nation with the most customers
    (ties -> smallest n_nationkey). Partial counts per batch, small_key_agg
    merge (segments x nations = ~125 groups), argmax over the tiny total."""
    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_nationkey"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_mktsegment", "c_nationkey"]).aggregate(
            [([], "count_all")])
        return pa.table({"c_mktsegment": g.column("c_mktsegment"),
                         "c_nationkey": g.column("c_nationkey"),
                         "n": g.column("count_all")})

    tot = small_key_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        _sum_combine(["c_mktsegment", "c_nationkey"], ["n"])).to_pandas()
    tot = tot.sort_values(["c_mktsegment", "n", "c_nationkey"],
                          ascending=[True, False, True])
    top = tot.groupby("c_mktsegment", as_index=False).first()
    return pa.table({
        "c_mktsegment": pa.array(top["c_mktsegment"], pa.string()),
        "top_nationkey": pa.array(top["c_nationkey"].astype("int32"),
                                  pa.int32()),
        "n_customers": pa.array(top["n"].astype("int64"), pa.int64()),
    })


# ---------------------------------------------------------------------------
# O2/O3 analog: global top-k with deterministic tie-break
# ---------------------------------------------------------------------------


def top_orders(sf_dir: str, k: int = 10) -> rd.Dataset:
    return _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]) \
        .sort(["o_totalprice", "o_orderkey"], descending=[True, False]) \
        .limit(k)


# ---------------------------------------------------------------------------
# O5 analog: distinct + counts
# ---------------------------------------------------------------------------


def event_type_counts(sf_dir: str) -> pa.Table:
    ds = _read(sf_dir, "events", ["event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g.column("event_type"),
                         "n": g.column("count_all")})

    return small_key_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         _sum_combine(["event_type"], ["n"]))


# ---------------------------------------------------------------------------
# streaming-shaped: tumbling window + sessionization (ray_guide pattern)
# ---------------------------------------------------------------------------


def hourly_event_stats(sf_dir: str) -> rd.Dataset:
    """Tumbling 1h window per event_type: count + sum(value)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        t2 = pa.table({"hour": hour, "event_type": t.column("event_type"),
                       "value": t.column("value")})
        return t2.group_by(["hour", "event_type"]).aggregate(
            [("value", "sum"), ([], "count_all")])

    part = ds.map_batches(partial, batch_format="pyarrow")
    agg = part.groupby(["hour", "event_type"]).aggregate(
        *_sums(["value_sum", "count_all"]))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "hour": t.column("hour"),
            "event_type": t.column("event_type"),
            "sum_value": _rha(t.column("sum(value_sum)"), 2),
            "n": t.column("sum(count_all)"),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def sliding_event_stats(sf_dir: str, window_hours: int = 3) -> rd.Dataset:
    """Sliding window: per (window_end hour, event_type), count + sum(value)
    over the trailing ``window_hours`` hours. Each per-batch HOURLY partial
    is exploded to the ``window_hours`` windows it contributes to before the
    single groupby — shuffle rows scale with hours x types x window, never
    events x window."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    HOUR_TICKS = {"s": 3600, "ms": 3600 * 10**3,
                  "us": 3600 * 10**6, "ns": 3600 * 10**9}

    def partial(t: pa.Table) -> pa.Table:
        unit = t.schema.field("ts").type.unit
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        g = pa.table({"hour": hour, "event_type": t.column("event_type"),
                      "value": t.column("value")}) \
            .group_by(["hour", "event_type"]).aggregate(
                [("value", "sum"), ([], "count_all")])
        h64 = pc.cast(g.column("hour").combine_chunks(), pa.int64())
        parts = []
        for o in range(window_hours):
            wend = pc.add(h64, pa.scalar(o * HOUR_TICKS[unit], pa.int64()))
            parts.append(pa.table({
                "wend": pc.cast(wend, pa.timestamp(unit)),
                "event_type": g.column("event_type"),
                "value_sum": g.column("value_sum"),
                "count_all": g.column("count_all"),
            }))
        return pa.concat_tables(parts)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["wend", "event_type"]) \
        .aggregate(*_sums(["value_sum", "count_all"]))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_end": t.column("wend"),
            "event_type": t.column("event_type"),
            "sum_value": _rha(t.column("sum(value_sum)"), 2),
            "n": t.column("sum(count_all)"),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


def _tag_typed_events(left_type: str, right_type: str, num_buckets: int):
    """Shared tag stage for the as-of and range joins: keep the two event
    types, mark the left side, bucket by hashed user (crc_bucket_array's
    vectorized integer path)."""
    from raykg.functions.shuffle import crc_bucket_array

    def tag(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        value_set=pa.array([left_type, right_type]))
        t = t.filter(keep)
        return pa.table({
            "event_id": t.column("event_id"),
            "ts": t.column("ts"),
            "user_id": t.column("user_id"),
            "is_left": pc.equal(t.column("event_type"), left_type),
            "bucket": crc_bucket_array(
                pc.cast(t.column("user_id"), pa.int64()), num_buckets),
        })

    return tag


def asof_last_click(sf_dir: str, left_type: str = "purchase",
                    right_type: str = "click",
                    num_buckets: int = 256) -> rd.Dataset:
    """As-of join: for each ``left_type`` event, the most recent
    ``right_type`` event of the SAME user at or before its timestamp
    (classic attribution / time-series alignment). Ray Data has no asof
    join; composed here as ONE pass tagging both sides + a hashed-user
    bucket shuffle + a vectorized per-bucket sorted ``searchsorted`` merge
    — the partitioning assumption is user-bucketed co-location, the same
    key the sessionizer uses. Equal-timestamp rights dedup to the max
    event_id (deterministic, mirrors the SQL oracle's QUALIFY).

    Output: (purchase_id, user_id, click_id, click_ts) with nulls when the
    user has no prior ``right_type`` event."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    tag = _tag_typed_events(left_type, right_type, num_buckets)

    def merge(t: pa.Table) -> pa.Table:
        unit = t.schema.field("ts").type.unit
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(t.column("event_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        left = t.column("is_left").to_numpy(zero_copy_only=False)
        out_p, out_u, out_c, out_ct = [], [], [], []
        n = len(uid)
        lo = 0
        while lo < n:
            hi = lo
            while hi < n and uid[hi] == uid[lo]:
                hi += 1
            l_idx = np.flatnonzero(left[lo:hi]) + lo
            r_idx = np.flatnonzero(~left[lo:hi]) + lo
            if len(l_idx):
                if len(r_idx):
                    # sorted by (ts, event_id): side='right' - 1 lands on
                    # the last right with ts <= left ts == max event_id
                    # among equal timestamps
                    pos = np.searchsorted(ts[r_idx], ts[l_idx],
                                          side="right") - 1
                    match = np.where(pos >= 0, r_idx[np.clip(pos, 0, None)],
                                     -1)
                else:
                    match = np.full(len(l_idx), -1)
                for li, mi in zip(l_idx, match):
                    out_p.append(int(eid[li]))
                    out_u.append(int(uid[li]))
                    out_c.append(int(eid[mi]) if mi >= 0 else None)
                    out_ct.append(int(ts[mi]) if mi >= 0 else None)
            lo = hi
        return pa.table({
            "purchase_id": pa.array(out_p, pa.int64()),
            "user_id": pa.array(out_u, pa.int64()),
            "click_id": pa.array(out_c, pa.int64()),
            "click_ts": pc.cast(pa.array(out_ct, pa.int64()),
                                pa.timestamp(unit)),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: merge(t.drop_columns(["bucket"])),
            batch_format="pyarrow")


def range_join_recent_clicks(sf_dir: str, window_minutes: int = 10,
                             left_type: str = "error",
                             right_type: str = "click",
                             num_buckets: int = 256) -> rd.Dataset:
    """Range (interval) join: for each ``left_type`` event, the number of
    ``right_type`` events by the same user in the trailing
    ``window_minutes`` (inclusive both ends). Composed as the same
    user-bucketed shuffle as the as-of join, with a vectorized per-segment
    double ``searchsorted`` (no per-pair work at all).

    Output: (error_id, user_id, n_recent_clicks)."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    tag = _tag_typed_events(left_type, right_type, num_buckets)

    def merge(t: pa.Table) -> pa.Table:
        unit = t.schema.field("ts").type.unit
        per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        win = window_minutes * 60 * per_s
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        eid = pc.cast(t.column("event_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        left = t.column("is_left").to_numpy(zero_copy_only=False)
        out_e, out_u, out_n = [], [], []
        n = len(uid)
        lo = 0
        while lo < n:
            hi = lo
            while hi < n and uid[hi] == uid[lo]:
                hi += 1
            l_idx = np.flatnonzero(left[lo:hi]) + lo
            r_ts = ts[np.flatnonzero(~left[lo:hi]) + lo]
            if len(l_idx):
                a = np.searchsorted(r_ts, ts[l_idx] - win, side="left")
                b = np.searchsorted(r_ts, ts[l_idx], side="right")
                out_e.extend(eid[l_idx].tolist())
                out_u.extend(uid[l_idx].tolist())
                out_n.extend((b - a).tolist())
            lo = hi
        return pa.table({
            "error_id": pa.array(out_e, pa.int64()),
            "user_id": pa.array(out_u, pa.int64()),
            "n_recent_clicks": pa.array(out_n, pa.int64()),
        })

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: merge(t.drop_columns(["bucket"])),
            batch_format="pyarrow")


def sessionize(sf_dir: str, gap_minutes: int = 30,
               num_buckets: int = 256) -> rd.Dataset:
    """Per user: event count and session count (session = maximal run of
    events with inter-arrival gap <= gap_minutes).

    Bucketed, not per-user: ``groupby(user).map_groups`` costs ~0.3 ms of
    block slicing per group (see stages/canonicalize.py), which dies at 10^8
    users. Instead users are hashed into ``num_buckets`` uniform buckets, the
    shuffle exchanges on the small-int bucket key, and each bucket does ONE
    vectorized pass: sort by (user, ts), numpy diff for gap flags, and
    ``add.reduceat`` over user segment boundaries."""
    import numpy as np

    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            pc.cast(t.column("user_id"), pa.int64()), num_buckets))

    gap_s = gap_minutes * 60

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        unit = t.schema.field("ts").type.unit
        per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        if len(uid) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())})
        same_user = uid[1:] == uid[:-1]
        gap_break = same_user & ((ts[1:] - ts[:-1]) > gap_s * per_s)
        breaks = np.concatenate(([False], gap_break)).astype(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], ~same_user)))
        n_events = np.diff(np.concatenate((starts, [len(uid)])))
        n_sessions = 1 + np.add.reduceat(breaks, starts)
        return pa.table({"user_id": pa.array(uid[starts], pa.int64()),
                         "n_events": pa.array(n_events, pa.int64()),
                         "n_sessions": pa.array(n_sessions, pa.int64())})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: per_bucket(t.drop_columns(["bucket"])),
            batch_format="pyarrow")


# ---------------------------------------------------------------------------
# M12 analog: parser (regexp field extraction from the events props JSON)
# ---------------------------------------------------------------------------


def props_k_stats(sf_dir: str) -> pa.Table:
    """Extract integer field k from the props JSON string with a compiled
    regex (vectorized pyarrow extract), then avg per event_type."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t.column("props").combine_chunks(),
                               r'"k": (?P<k>\d+)')
        if isinstance(ext, pa.ChunkedArray):
            ext = ext.combine_chunks()
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        g = pa.table({"event_type": t.column("event_type"), "k": k}) \
            .group_by(["event_type"]).aggregate(
                [("k", "sum"), ([], "count_all")])
        return pa.table({"event_type": g.column("event_type"),
                         "ks": g.column("k_sum"),
                         "n": g.column("count_all")})

    tot = small_key_agg(ds.map_batches(partial, batch_format="pyarrow"),
                        _sum_combine(["event_type"], ["ks", "n"]))
    return pa.table({
        "event_type": tot.column("event_type"),
        "avg_k": _rha(pc.divide(
            pc.cast(tot.column("ks").combine_chunks(), pa.float64()),
            pc.cast(tot.column("n").combine_chunks(), pa.float64())), 4),
        "n": tot.column("n"),
    })


def value_quantiles_by_type(sf_dir: str,
                            qs: tuple = (0.25, 0.5, 0.75, 0.95)) -> rd.Dataset:
    """Exact per-key quantiles: (event_type, q, value) with value =
    quantile_cont linear interpolation over the group's sorted values,
    rounded to 4 (DuckDB ``quantile_cont`` twin).

    Scale envelope: a ``groupby(key).map_groups`` — each key's values must
    fit one worker (fine for vocabulary-sized keys like event_type; for a
    high-cardinality key or one giant group, swap in a sorted-sample /
    t-digest sketch and accept approximation)."""
    import numpy as np

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def per_type(t: pa.Table) -> pa.Table:
        vals = np.sort(t.column("value").to_numpy(zero_copy_only=False)
                       .astype(np.float64))
        n = len(vals)
        et = t.column("event_type")[0].as_py()
        out = []
        for q in qs:
            pos = q * (n - 1)
            lo = int(np.floor(pos))
            hi = min(lo + 1, n - 1)
            v = vals[lo] + (vals[hi] - vals[lo]) * (pos - lo)
            out.append(round_half_away(float(v), 4))
        return pa.table({
            "event_type": pa.array([et] * len(qs), pa.string()),
            "q": pa.array(list(qs), pa.float64()),
            "value": pa.array(out, pa.float64()),
        })

    return ds.groupby("event_type").map_groups(per_type,
                                               batch_format="pyarrow")


def histogram_quantiles(sf_dir: str, bin_width: float = 8.0,
                        qs: tuple = (0.25, 0.5, 0.75, 0.95)) -> pa.Table:
    """Approximate per-key quantiles from a MERGEABLE equi-width histogram
    sketch: (event_type, q, value_est) with value_est = linear interpolation
    inside the first bin whose cumulative count reaches q*n, rounded to 4.

    This is the scale path the exact ``value_quantiles_by_type`` docstring
    reserves for high-cardinality keys / giant groups: each batch emits
    (event_type, bin, count) partials — register-sized (types x occupied
    bins), independent of row count — which SUM-merge associatively, so no
    group ever has to fit one worker and there is no per-key sort. Accuracy
    is bounded by ``bin_width``; the estimator's arithmetic (floor-binning,
    cum >= q*n hit rule, within-bin interpolation) is replicated term-for-
    term in the DuckDB twin, so the approximation itself is hash-checked."""
    import numpy as np

    w = float(bin_width)
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column("value").to_numpy(zero_copy_only=False)
        bins = np.floor(vals / w).astype(np.int64)
        raw = pa.table({
            "event_type": t.column("event_type"),
            "bin": pa.array(bins, pa.int64()),
            "n": pa.array(np.ones(len(bins), np.int64), pa.int64())})
        return _sum_combine(["event_type", "bin"], ["n"])(raw)

    reg = small_key_agg(ds.map_batches(partial, batch_format="pyarrow"),
                        _sum_combine(["event_type", "bin"], ["n"]))
    reg = reg.sort_by([("event_type", "ascending"), ("bin", "ascending")])

    ets = reg.column("event_type").to_pylist()
    bins = reg.column("bin").to_numpy(zero_copy_only=False)
    cnts = reg.column("n").to_numpy(zero_copy_only=False)
    out_et, out_q, out_v = [], [], []
    for et in sorted(set(ets)):
        m = np.array([e == et for e in ets])
        b, c = bins[m], cnts[m]
        cum = np.cumsum(c)
        n = int(cum[-1])
        for q in qs:
            target = q * n          # same DOUBLE product as the SQL's n * q
            i = int(np.searchsorted(cum, target, side="left"))
            cum_before = int(cum[i]) - int(c[i])
            est = float(b[i]) * w + w * (target - cum_before) / float(c[i])
            out_et.append(et)
            out_q.append(float(q))
            out_v.append(round_half_away(est, 4))
    return pa.table({"event_type": pa.array(out_et, pa.string()),
                     "q": pa.array(out_q, pa.float64()),
                     "value_est": pa.array(out_v, pa.float64())})


# ---------------------------------------------------------------------------
# KG-from-relational: URI minting + FK edges (M6-M8 analogs, SQL-checkable)
# ---------------------------------------------------------------------------

_NODE_SOURCES = [
    ("customer", "Customer", "c_custkey",
     ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]),
    ("supplier", "Supplier", "s_suppkey",
     ["s_name", "s_nationkey", "s_acctbal"]),
    ("part", "Part", "p_partkey",
     ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
    ("nation", "Nation", "n_nationkey", ["n_name", "n_regionkey"]),
    ("region", "Region", "r_regionkey", ["r_name"]),
]


def kg_nodes(sf_dir: str) -> rd.Dataset:
    """One node per dimension row: uri = sdpg.gr/<Label>/sha256(key)
    (reference URI scheme src2/main/scala/DataToPattern.scala:21)."""
    parts = []
    for table, label, key, props in _NODE_SOURCES:
        ds = _read(sf_dir, table, [key], blocks=8)

        def mint(t: pa.Table, label=label, key=key, nprops=len(props)) -> pa.Table:
            ks = t.column(key).to_pylist()
            return pa.table({
                "uri": pa.array(
                    [f"sdpg.gr/{label}/{sha_hex(str(k))}" for k in ks],
                    pa.string()),
                "label": pa.array([label] * len(ks), pa.string()),
                "n_props": pa.array([nprops] * len(ks), pa.int64()),
            })

        parts.append(ds.map_batches(mint, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


_EDGE_SOURCES = [
    ("customer", "IS_LOCATED_IN", "c_custkey", "Customer", "c_nationkey", "Nation"),
    ("nation", "IN_REGION", "n_nationkey", "Nation", "n_regionkey", "Region"),
    ("orders", "PLACED_BY", "o_orderkey", "Order", "o_custkey", "Customer"),
    ("lineitem", "HAS_PART", "l_orderkey", "Order", "l_partkey", "Part"),
    ("lineitem", "SUPPLIED_BY", "l_orderkey", "Order", "l_suppkey", "Supplier"),
]


def _parquet_col_ranges(path: str,
                        cols: list[str]) -> dict[str, tuple[int, int] | None]:
    """{col: (min, max) | None} of int columns from parquet FOOTER
    statistics only — ONE metadata pass per file, no data scan. A column
    maps to None when it is absent or any row group lacks stats. Handles a
    single file or a directory of part files."""
    import os

    import pyarrow.parquet as pq

    files = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if f.endswith(".parquet")] if os.path.isdir(path) else [path])
    out: dict[str, tuple[int, int] | None] = {c: None for c in cols}
    dead: set[str] = set()
    for f in files:
        md = pq.read_metadata(f)
        names = md.schema.names
        for c in cols:
            if c in dead:
                continue
            if c not in names:
                dead.add(c)
                out[c] = None
                continue
            ci = names.index(c)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    dead.add(c)
                    out[c] = None
                    break
                lo, hi = int(st.min), int(st.max)
                cur = out[c]
                out[c] = (lo, hi) if cur is None \
                    else (min(cur[0], lo), max(cur[1], hi))
    return out


def _edges_by_table() -> dict[str, list[tuple[int, str, str]]]:
    """_EDGE_SOURCES grouped by source table: {table: [(esrc, sk, dk)]}."""
    by_table: dict[str, list[tuple[int, str, str]]] = {}
    for esrc, (table, _, src_key, _, dst_key, _) in enumerate(_EDGE_SOURCES):
        by_table.setdefault(table, []).append((esrc, src_key, dst_key))
    return by_table


def _kg_edges_plan(sf_dir: str, encode_partial, finalize) -> rd.Dataset:
    """The ONE scan/union/aggregate plan shared by the packed and wide key
    schemes (they differ only in ``encode_partial`` / ``finalize``): each
    source table is scanned ONCE with the union of its key columns
    (lineitem feeds two edge types — one read instead of two), per-batch
    partials concatenate across that table's edge types, and the union
    flows through the engine's bucketed two-phase aggregate on "k"."""
    from raykg.functions.shuffle import bucketed_group_agg

    def make_partial(specs: list[tuple[int, str, str]]):
        def partial(t: pa.Table) -> pa.Table:
            return pa.concat_tables([
                encode_partial(t, esrc, sk, dk) for esrc, sk, dk in specs])
        return partial

    parts = []
    for table, specs in _edges_by_table().items():
        cols = sorted({c for _, sk, dk in specs for c in (sk, dk)})
        ds = _read(sf_dir, table, cols)
        parts.append(ds.map_batches(make_partial(specs),
                                    batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return bucketed_group_agg(out, lambda t: t, "k", finalize)


def kg_edges(sf_dir: str) -> rd.Dataset:
    """FK edges with minted URIs, exact-deduped with counts (O7 analog).

    Mint-last plan, int-packed keys: the dedup aggregate runs on ONE int64
    ``(edge_source << 60) | (src_key << 30) | dst_key`` — the exchange
    moves 8-byte ints instead of URI strings (or even delimited key
    strings), the bucket hash is a vectorized numpy multiply, and sha256
    minting happens once per DISTINCT endpoint after the aggregate, not
    once per input row.

    Key bound: the packed path needs raw FK values in [0, 2^30) (TPC-H
    l_orderkey crosses that between sf100 and sf200). The bound is checked
    UP FRONT against parquet footer statistics (no data scan); when any key
    column exceeds it — or footer stats are missing — the op transparently
    falls back to a delimited-string key with identical output, trading
    exchange bytes for an unbounded key space. The per-batch check in the
    packed path stays as a loud backstop against lying footers."""
    import numpy as np

    # footer probe: one metadata pass per table, early exit on first miss
    fits_packed = True
    for table, specs in _edges_by_table().items():
        cols = sorted({c for _, sk, dk in specs for c in (sk, dk)})
        rngs = _parquet_col_ranges(f"{sf_dir}/{table}.parquet", cols)
        if any(rngs[c] is None or rngs[c][0] < 0 or rngs[c][1] >= (1 << 30)
               for c in cols):
            fits_packed = False
            break
    if not fits_packed:
        return _kg_edges_wide(sf_dir)

    def encode_partial(t: pa.Table, esrc: int, src_key: str,
                       dst_key: str) -> pa.Table:
        g = pa.table({"sk": pc.cast(t.column(src_key), pa.int64()),
                      "dk": pc.cast(t.column(dst_key), pa.int64())}) \
            .group_by(["sk", "dk"]).aggregate([([], "count_all")])
        sk = g.column("sk").to_numpy(zero_copy_only=False)
        dk = g.column("dk").to_numpy(zero_copy_only=False)
        if sk.size and not (0 <= int(sk.min())
                            and int(sk.max()) < (1 << 30)
                            and 0 <= int(dk.min())
                            and int(dk.max()) < (1 << 30)):
            # a real exception, not an assert (stripped under -O):
            # out-of-range keys would silently bleed into other fields
            raise ValueError(
                "kg_edges int-packed key requires FK values in "
                f"[0, 2^30); got range [{sk.min()}, {sk.max()}] / "
                f"[{dk.min()}, {dk.max()}]")
        packed = (np.int64(esrc) << np.int64(60)) \
            | (sk.astype(np.int64) << np.int64(30)) | dk.astype(np.int64)
        return pa.table({"k": pa.array(packed, pa.int64()),
                         "n": g.column("count_all")})

    def finalize(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("n", "sum")])
        karr = g.column("k").to_numpy(zero_copy_only=False)
        esrc = karr >> 60
        sk = (karr >> 30) & ((1 << 30) - 1)
        dk = karr & ((1 << 30) - 1)
        subj, pred, obj = [], [], []
        uri_cache: dict[tuple, str] = {}
        for e, s, d in zip(esrc.tolist(), sk.tolist(), dk.tolist()):
            _, p, _, src_label, _, dst_label = _EDGE_SOURCES[e]
            ks, kd = (src_label, s), (dst_label, d)
            s_uri = uri_cache.get(ks)
            if s_uri is None:
                s_uri = f"sdpg.gr/{src_label}/{sha_hex(str(s))}"
                uri_cache[ks] = s_uri
            d_uri = uri_cache.get(kd)
            if d_uri is None:
                d_uri = f"sdpg.gr/{dst_label}/{sha_hex(str(d))}"
                uri_cache[kd] = d_uri
            subj.append(s_uri)
            pred.append(p)
            obj.append(d_uri)
        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "n": g.column("n_sum"),
        })

    return _kg_edges_plan(sf_dir, encode_partial, finalize)


def _kg_edges_wide(sf_dir: str) -> rd.Dataset:
    """String-keyed fallback for :func:`kg_edges` when FK values exceed the
    30-bit packing bound (or footer stats are missing). Same plan
    (:func:`_kg_edges_plan`) and identical output; the exchange key is
    ``"<esrc>\\x1f<sk>\\x1f<dk>"`` (unbounded key space, more bytes)."""

    def encode_partial(t: pa.Table, esrc: int, src_key: str,
                       dst_key: str) -> pa.Table:
        g = pa.table({"sk": pc.cast(t.column(src_key), pa.int64()),
                      "dk": pc.cast(t.column(dst_key), pa.int64())}) \
            .group_by(["sk", "dk"]).aggregate([([], "count_all")])
        k = pc.binary_join_element_wise(
            pa.array([str(esrc)] * g.num_rows, pa.string()),
            pc.cast(g.column("sk"), pa.string()),
            pc.cast(g.column("dk"), pa.string()), "\x1f")
        return pa.table({"k": k, "n": g.column("count_all")})

    def finalize(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("n", "sum")])
        subj, pred, obj = [], [], []
        uri_cache: dict[tuple, str] = {}
        for key in g.column("k").to_pylist():
            e_s, s_s, d_s = key.split("\x1f")
            _, p, _, src_label, _, dst_label = _EDGE_SOURCES[int(e_s)]
            ks, kd = (src_label, s_s), (dst_label, d_s)
            s_uri = uri_cache.get(ks)
            if s_uri is None:
                s_uri = f"sdpg.gr/{src_label}/{sha_hex(s_s)}"
                uri_cache[ks] = s_uri
            d_uri = uri_cache.get(kd)
            if d_uri is None:
                d_uri = f"sdpg.gr/{dst_label}/{sha_hex(d_s)}"
                uri_cache[kd] = d_uri
            subj.append(s_uri)
            pred.append(p)
            obj.append(d_uri)
        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "n": g.column("n_sum"),
        })

    return _kg_edges_plan(sf_dir, encode_partial, finalize)


# ---------------------------------------------------------------------------
# M1/T1/A1 analog over relational rows: hash-noised presence signatures +
# deterministic sha-MinHash cluster keys (both SQL-replicable)
# ---------------------------------------------------------------------------

SIG_SOURCES = [
    ("customer", "Customer", "c_custkey",
     ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]),
    ("supplier", "Supplier", "s_suppkey",
     ["s_name", "s_nationkey", "s_acctbal"]),
    ("part", "Part", "p_partkey",
     ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"]),
]
SIG_NOISE = 0.3
SIG_SEED = 42
SIG_MINHASH = 4


def _present_props(label: str, key: object, props: list[str],
                   noise: float, seed: int) -> list[str]:
    thr = hex_threshold(noise)
    return [p for p in props
            if not sha_hex(f"noise|{label}|{key}|{p}|{seed}")[:4] < thr]


def property_signatures(sf_dir: str) -> pa.Table:
    """Per (label, signature): row count, where signature = comma-joined
    surviving property names under the deterministic hash-noise rule
    (presence iff sha256('noise|label|key|prop|seed')[:4] >= hex(p*65536)).
    This is the reference's binary presence matrix + cluster groupBy
    (DataProcessor.scala:12-17, Clustering.scala:90-97) in bounded form —
    56 distinct (label, signature) groups, merged via small_key_agg."""
    parts = []
    for table, label, key, props in SIG_SOURCES:
        ds = _read(sf_dir, table, [key], blocks=8)

        def sig(t: pa.Table, label=label, key=key, props=props) -> pa.Table:
            ks = t.column(key).to_pylist()
            sigs = [",".join(_present_props(label, k, props, SIG_NOISE, SIG_SEED))
                    for k in ks]
            g = pa.table({"label": pa.array([label] * len(ks), pa.string()),
                          "signature": pa.array(sigs, pa.string())}) \
                .group_by(["label", "signature"]).aggregate([([], "count_all")])
            return pa.table({"label": g.column("label"),
                             "signature": g.column("signature"),
                             "n": g.column("count_all")})

        parts.append(ds.map_batches(sig, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return small_key_agg(out, _sum_combine(["label", "signature"], ["n"]))


def infer_column_types(sf_dir: str, table: str = "events",
                       columns: tuple[str, ...] = ("event_type", "props",
                                                   "user_id"),
                       sample: int = 1000) -> pa.Table:
    """Per-column logical type inference by majority vote over a row sample
    (reference analog: src2/main/scala/Main.scala:299-318 — 1,000-row
    ``take``, vote over {INT, LONG, DOUBLE, FLOAT, BOOLEAN, STRING}).

    Values are classified from their string form with the same rules the
    DuckDB oracle uses; ties break by type name. Output: (col,
    inferred_type), one row per column."""
    import re

    from collections import Counter

    int_re = re.compile(r"-?\d+$")
    dbl_re = re.compile(r"-?\d+\.\d+$")

    def classify(v: str) -> str:
        if int_re.match(v):
            return "INT" if abs(int(v)) < 2147483648 else "LONG"
        if dbl_re.match(v):
            return "DOUBLE"
        if v.lower() in ("true", "false"):
            return "BOOLEAN"
        return "STRING"

    rows = _read(sf_dir, table, list(columns)).limit(sample).take_all()
    out_col, out_type = [], []
    for col in columns:
        votes = Counter(classify(str(r[col])) for r in rows)
        winner = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out_col.append(col)
        out_type.append(winner)
    return pa.table({"col": pa.array(out_col, pa.string()),
                     "inferred_type": pa.array(out_type, pa.string())})


def minhash_cluster_counts(sf_dir: str) -> pa.Table:
    """Per deterministic MinHash cluster key over the property signature:
    row count. cluster_key = '_'-join over h of
    min over props of sha256(prop + '#' + h + '#' + seed)[:8].
    Derived from the vocabulary-sized property_signatures table (56 rows) —
    the heavy lifting (per-row hash-noise signatures) already happened in
    that distributed pass; keying + regrouping 56 rows is driver arithmetic."""
    from collections import Counter

    from raykg.functions.hashing import minhash_sig_sha

    sigs = property_signatures(sf_dir)
    counts: Counter = Counter()
    for s, n in zip(sigs.column("signature").to_pylist(),
                    sigs.column("n").to_pylist()):
        props = [p for p in s.split(",") if p]
        counts["_".join(minhash_sig_sha(props, SIG_MINHASH, SIG_SEED))] += n
    keys = sorted(counts)
    return pa.table({"cluster_key": pa.array(keys, pa.string()),
                     "n": pa.array([counts[k] for k in keys], pa.int64())})


# ---------------------------------------------------------------------------
# window functions: LAG / ROW_NUMBER analogs (bucketed sorted-segment pass)
# ---------------------------------------------------------------------------


def event_lag_stats(sf_dir: str, num_buckets: int = 256) -> pa.Table:
    """Per event_type: count and mean of the inter-arrival delta (seconds)
    between each event and the SAME USER's previous event — the
    ``LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)`` window,
    without a window engine: users hash into buckets, each bucket does one
    vectorized pass (sort by (user, ts, event_id), numpy diff masked to
    same-user rows), partials aggregate per event_type. Deltas stay int64
    microseconds until the one final float divide, so the DuckDB twin is
    bit-identical. Shuffle volume = one row per (bucket, event_type), never
    events."""
    import numpy as np

    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            pc.cast(t.column("user_id"), pa.int64()), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)   # microseconds
        if len(uid) < 2:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "sum_us": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        same = uid[1:] == uid[:-1]
        d_us = (ts[1:] - ts[:-1])[same]
        et = t.column("event_type").combine_chunks().take(
            pa.array(np.flatnonzero(same) + 1))
        g = pa.table({"event_type": et, "d": pa.array(d_us, pa.int64())}) \
            .group_by("event_type").aggregate([("d", "sum"),
                                               ([], "count_all")])
        return pa.table({"event_type": g.column("event_type"),
                         "sum_us": g.column("d_sum"),
                         "n": g.column("count_all")})

    tot = small_key_agg(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(
            lambda t: per_bucket(t.drop_columns(["bucket"])),
            batch_format="pyarrow"),
        _sum_combine(["event_type"], ["sum_us", "n"]))
    su = pc.cast(tot.column("sum_us").combine_chunks(), pa.float64())
    n = pc.cast(tot.column("n").combine_chunks(), pa.float64())
    return pa.table({
        "event_type": tot.column("event_type"),
        "n_deltas": tot.column("n"),
        "avg_delta_s": _rha(pc.divide(su, pc.multiply(n, 1e6)), 4),
    })


def event_transitions(sf_dir: str, num_buckets: int = 256) -> pa.Table:
    """(from_type, to_type, n, p): the first-order Markov transition
    matrix of the per-user event stream — the
    ``LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` window without a window engine. Same bucketed
    sorted-segment pass as :func:`event_lag_stats`: users hash into
    buckets, one vectorized lexsort per bucket, consecutive same-user
    rows pair up; partial (from, to, n) counts aggregate through
    ``small_key_agg`` (the matrix is types x types — register-sized).
    p = n / total-out-of-from, rounded to 6 (DuckDB-parity round).
    Shuffle volume: each event row crosses once; partials are
    matrix-sized per bucket."""
    import numpy as np

    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            pc.cast(t.column("user_id"), pa.int64()), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(uid) < 2:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        idx = np.flatnonzero(uid[1:] == uid[:-1])
        et = t.column("event_type").combine_chunks()
        g = pa.table({"from_type": et.take(pa.array(idx)),
                      "to_type": et.take(pa.array(idx + 1))}) \
            .group_by(["from_type", "to_type"]) \
            .aggregate([([], "count_all")])
        return pa.table({"from_type": g.column("from_type"),
                         "to_type": g.column("to_type"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    tot = small_key_agg(
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(
            lambda t: per_bucket(t.drop_columns(["bucket"])),
            batch_format="pyarrow"),
        _sum_combine(["from_type", "to_type"], ["n"]))
    frm = tot.column("from_type").to_pylist()
    ns = tot.column("n").to_pylist()
    totals: dict[str, int] = {}
    for f, n in zip(frm, ns):
        totals[f] = totals.get(f, 0) + n
    p = [round_half_away(n / totals[f], 6) for f, n in zip(frm, ns)]
    return pa.table({"from_type": tot.column("from_type"),
                     "to_type": tot.column("to_type"),
                     "n": tot.column("n"),
                     "p": pa.array(p, pa.float64())})


def top_orders_per_customer(sf_dir: str, k: int = 2,
                            num_buckets: int = 256) -> rd.Dataset:
    """Top-k orders per customer by (o_totalprice DESC, o_orderkey ASC)
    with an explicit rank column — the
    ``ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY ...)`` window as a
    bucketed sorted-segment pass: customers hash into buckets, one lexsort
    per bucket, rank = offset inside the customer's segment (pure numpy,
    no per-group slicing). Output is ~k rows per customer; the exchange
    moves each order row once."""
    import numpy as np

    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            t.column("o_custkey"), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        ck = _np_col(t, "o_custkey")
        ok = _np_col(t, "o_orderkey")
        tp = _np_col(t, "o_totalprice")
        order = np.lexsort((ok, -tp, ck))
        ck, ok, tp = ck[order], ok[order], tp[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ck[1:] != ck[:-1])))
        seg = np.cumsum(np.concatenate(
            ([False], ck[1:] != ck[:-1])))
        rnk = np.arange(len(ck)) - starts[seg]
        keep = rnk < k
        return pa.table({
            "o_custkey": pa.array(ck[keep], pa.int64()),
            "rnk": pa.array(rnk[keep] + 1, pa.int64()),
            "o_orderkey": pa.array(ok[keep], pa.int64()),
            "o_totalprice": pa.array(tp[keep], pa.float64())})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: per_bucket(t.drop_columns(["bucket"])),
            batch_format="pyarrow")


def _np_col(t: pa.Table, name: str):
    return t.column(name).combine_chunks().to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# anti-join + rollup aggregate
# ---------------------------------------------------------------------------


def customers_without_orders(sf_dir: str, since: str = "2000-01-01",
                             num_buckets: int = 256) -> rd.Dataset:
    """(c_custkey) for customers with NO order on/after ``since`` — a
    distributed anti-join: both sides hash into the same custkey buckets
    (the order side is filtered then pre-distincted per batch, so the
    exchange moves at most one row per (batch, key)), and each bucket
    emits its customer keys absent from the order side via one np.isin.
    No side is broadcast; skewed customers spread by the bucket hash."""
    import datetime as dt

    import numpy as np

    from raykg.functions.shuffle import bucketed_group_agg

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"key": t.column("c_custkey"),
                            "side": pa.array([0] * t.num_rows, pa.int8())}),
        batch_format="pyarrow")

    cutoff = dt.datetime.fromisoformat(since)

    def order_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("o_orderdate"), cutoff))
        u = pc.unique(t.column("o_custkey").combine_chunks())
        return pa.table({"key": u,
                         "side": pa.array([1] * len(u), pa.int8())})

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]) \
        .map_batches(order_keys, batch_format="pyarrow")

    def anti(t: pa.Table) -> pa.Table:
        key = t.column("key").combine_chunks().to_numpy(
            zero_copy_only=False)
        side = t.column("side").combine_chunks().to_numpy(
            zero_copy_only=False)
        left = key[side == 0]
        right = key[side == 1]
        return pa.table({"c_custkey": pa.array(
            left[~np.isin(left, right)], pa.int64())})

    return bucketed_group_agg(cust.union(orders), lambda t: t, "key", anti,
                              num_buckets=num_buckets)


def pricing_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus): per-(flag, status)
    totals, per-flag subtotals (status NULL) and the grand total (both
    NULL). The distributed work is ONE pass (the same combiner as
    pricing_summary); the rollup levels are derived from the
    vocabulary-sized base aggregate (a few rows), not by re-scanning."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ([], "count_all")])
        return pa.table({"l_returnflag": g.column("l_returnflag"),
                         "l_linestatus": g.column("l_linestatus"),
                         "qty": g.column("l_quantity_sum"),
                         "n": g.column("count_all")})

    base = small_key_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         _sum_combine(["l_returnflag", "l_linestatus"],
                                      ["qty", "n"]))

    def level(t: pa.Table, keys: list[str]) -> pa.Table:
        if keys:
            g = t.group_by(keys).aggregate([("qty", "sum"), ("n", "sum")])
            qty, n = g.column("qty_sum"), g.column("n_sum")
        else:
            g = None
            qty = pa.array([pc.sum(t.column("qty")).as_py()], pa.float64())
            n = pa.array([pc.sum(t.column("n")).as_py()], pa.int64())
        cols = {}
        for k in ("l_returnflag", "l_linestatus"):
            if g is not None and k in keys:
                cols[k] = g.column(k)
            else:
                cols[k] = pa.array([None] * len(qty), pa.string())
        q = pc.cast(qty, pa.float64())
        if isinstance(q, pa.ChunkedArray):
            q = q.combine_chunks()
        cols["sum_qty"] = _rha(q, 2)
        cols["n"] = pc.cast(n, pa.int64())
        return pa.table(cols)

    return pa.concat_tables([
        level(base, ["l_returnflag", "l_linestatus"]),
        level(base, ["l_returnflag"]),
        level(base, []),
    ])


def funnel_per_bucket(t: pa.Table, stages: tuple) -> pa.Table:
    """Pure per-bucket funnel kernel (columns user_id/ts/event_type →
    user_id/stage). Strict-order first-touch: stage k+1 must occur
    strictly after the EARLIEST valid occurrence of stage k. One
    ``minimum.reduceat`` per stage over masked timestamps — no Python
    row loop. Split out of :func:`funnel_stages` so the property test
    can drive it directly against a brute-force oracle."""
    import numpy as np

    t = t.sort_by([("user_id", "ascending")])
    uid = pc.cast(t.column("user_id"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    if len(uid) == 0:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "stage": pa.array([], pa.int64())})
    INF = np.iinfo(np.int64).max
    ts = pc.cast(t.column("ts"), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    etype = t.column("event_type").combine_chunks()
    starts = np.flatnonzero(
        np.concatenate(([True], uid[1:] != uid[:-1])))
    seg = np.repeat(np.arange(len(starts)),
                    np.diff(np.concatenate((starts, [len(uid)]))))
    stage_count = np.zeros(len(starts), np.int64)
    bound = np.full(len(starts), -1, np.int64)   # ts must be > bound
    for s in stages:
        mask = pc.equal(etype, s).to_numpy(zero_copy_only=False)
        cand = np.where(mask & (ts > bound[seg]), ts, INF)
        seg_min = np.minimum.reduceat(cand, starts)
        hit = seg_min < INF
        stage_count = np.where(hit, stage_count + 1, stage_count)
        # users that missed this stage keep bound=INF so no later
        # stage can match (strict ordering)
        bound = np.where(hit, seg_min, INF)
    return pa.table({"user_id": pa.array(uid[starts], pa.int64()),
                     "stage": pa.array(stage_count, pa.int64())})


def funnel_stages(sf_dir: str,
                  stages: tuple = ("view", "click", "purchase"),
                  num_buckets: int = 256) -> rd.Dataset:
    """(user_id, stage): strict-order funnel progress per user — stage k
    means the user has an event chain s1 < s2 < ... < sk in time where
    each step uses the EARLIEST occurrence after the previous step (the
    standard first-touch funnel). Users with events but no stage-1 event
    report stage 0.

    Same bucketed shape as :func:`sessionize` (one user-keyed exchange,
    per-bucket vectorized segment pass — no per-user map_groups). The
    stage chain is computed with one ``minimum.reduceat`` per stage over
    masked timestamps, so per-bucket work is O(rows x stages) with no
    Python row loop. No combiner: the earliest-after-bound chain is not
    decomposable batch-locally (an arbitrary number of stage-2 events
    can precede the global stage-1 minimum), so all events cross the
    exchange — identical shuffle volume to sessionize."""
    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            pc.cast(t.column("user_id"), pa.int64()), num_buckets))

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: funnel_per_bucket(t.drop_columns(["bucket"]), stages),
            batch_format="pyarrow")


def burst_stats(sf_dir: str, window_minutes: int = 10,
                threshold: int = 3, num_buckets: int = 256) -> rd.Dataset:
    """Per-user burst / rate-limit detection over the event stream: the
    maximum number of events any sliding ``window_minutes`` window ending
    at one of the user's events contains -> (user_id, n_events, max_burst,
    is_burst) with is_burst = max_burst >= threshold. This is the
    abuse/bot-traffic screen a web-scale ingest runs before trusting a
    source's documents.

    Same scale shape as :func:`sessionize` (its docstring has the
    numbers): ONE user-bucketed exchange, sort by (user, ts int64), then a
    per-USER-segment pass (bounded by users per bucket, never events; each
    iteration is two vectorized ``searchsorted`` calls over the whole
    segment — the same loop class as kg_edges' per-distinct-key finalize)
    counting same-user events in [t - W, t] (both ends inclusive,
    equal-timestamp peers included), exactly DuckDB's value-based ``RANGE
    BETWEEN INTERVAL W PRECEDING AND CURRENT ROW`` frame. Integer counts
    -> bit-exact twin."""
    import numpy as np

    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            pc.cast(t.column("user_id"), pa.int64()), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        unit = t.schema.field("ts").type.unit
        per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
        ts = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(uid) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "max_burst": pa.array([], pa.int64()),
                             "is_burst": pa.array([], pa.int64())})
        w = np.int64(window_minutes) * 60 * per_s
        starts = np.flatnonzero(np.concatenate(
            ([True], uid[1:] != uid[:-1])))
        ends = np.concatenate((starts[1:], [len(uid)]))
        max_burst = np.empty(len(starts), np.int64)
        for k in range(len(starts)):      # per USER segment, not per event
            s, e = starts[k], ends[k]
            seg = ts[s:e]
            cnt = (np.searchsorted(seg, seg, side="right")
                   - np.searchsorted(seg, seg - w, side="left"))
            max_burst[k] = cnt.max()
        n_events = ends - starts
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
            "max_burst": pa.array(max_burst, pa.int64()),
            "is_burst": pa.array((max_burst >= threshold).astype(np.int64),
                                 pa.int64())})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: per_bucket(t.drop_columns(["bucket"])),
            batch_format="pyarrow")


def ewma_by_user(sf_dir: str, num_buckets: int = 256) -> rd.Dataset:
    """Per-user exponentially-weighted moving average of event values
    (alpha = 1/2: s_0 = v_0, s_i = (v_i + s_{i-1}) / 2 in (ts, event_id)
    order) -> (user_id, n_events, ewma). The streaming-state aggregate a
    feature pipeline keeps per key; halving is an exact IEEE exponent
    decrement and the addition order is pinned by the sort, so the DuckDB
    recursive-CTE twin replays the identical op sequence bit-for-bit.

    Scale shape: ONE user-bucketed exchange, then per bucket a sort by
    (user, ts, event_id) and a rank-synchronous update loop — iteration r
    updates ALL users that have an r-th event in one vectorized step, so
    the Python loop is bounded by max events per user (the recurrence's
    critical path, irreducible), never by user or event count."""
    import numpy as np

    from raykg.functions.hashing import round_half_away
    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            pc.cast(t.column("user_id"), pa.int64()), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(uid) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "ewma": pa.array([], pa.float64())})
        ts = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = pc.cast(t.column("event_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, val = uid[order], val[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], uid[1:] != uid[:-1])))
        n_events = np.diff(np.concatenate((starts, [len(uid)])))
        s = val[starts].copy()
        max_n = int(n_events.max())
        for r in range(1, max_n):       # critical path of the recurrence
            has = np.flatnonzero(n_events > r)
            idx = starts[has] + r
            s[has] = (val[idx] + s[has]) / 2.0
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
            "ewma": pa.array(round_half_away(s, 6), pa.float64())})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: per_bucket(t.drop_columns(["bucket"])),
            batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------

def retention_cohorts(sf_dir: str, num_buckets: int = 256) -> pa.Table:
    """(cohort_week, week_offset, n_users): classic cohort retention —
    users grouped by the week of their FIRST event, counted as retained in
    every later week they show activity. ``week`` is a fixed 7-day bucket
    anchored at the unix epoch (``epoch_us // 604800e6`` — a pure integer
    contract both engine and oracle reproduce bit-for-bit; deliberately NOT
    calendar ISO weeks, whose locale rules aren't worth the parity risk).

    Scale shape: one user-keyed bucketed exchange whose per-batch partial
    is ALREADY distinct (user, week) rows; the per-bucket finalize derives
    each user's cohort (min week, one vectorized lexsort) and emits
    (cohort, offset) partial counts, which merge through ``small_key_agg``
    — the output is weeks x offsets, register-sized, never user-sized."""
    import numpy as np

    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    WEEK_TICKS = {"s": 604_800, "ms": 604_800 * 10**3,
                  "us": 604_800 * 10**6, "ns": 604_800 * 10**9}

    def partial(t: pa.Table) -> pa.Table:
        unit = t.schema.field("ts").type.unit
        uid = pc.cast(t.column("user_id"), pa.int64())
        wk = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False) // WEEK_TICKS[unit]
        g = pa.table({"user_id": uid,
                      "wk": pa.array(wk, pa.int64())}) \
            .group_by(["user_id", "wk"]).aggregate([])
        return g.append_column("bucket", crc_bucket_array(
            g.column("user_id"), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "wk"]).aggregate([])  # cross-batch dedup
        uid = _np_col(g, "user_id")
        wk = _np_col(g, "wk")
        if not len(uid):
            return pa.table({"cohort_week": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64()),
                             "n_users": pa.array([], pa.int64())})
        order = np.lexsort((wk, uid))
        uid, wk = uid[order], wk[order]
        seg = np.flatnonzero(np.concatenate(([True], uid[1:] != uid[:-1])))
        seglen = np.diff(np.concatenate([seg, [len(uid)]]))
        cohort = np.repeat(wk[seg], seglen)       # per-user min (sorted)
        off = wk - cohort
        c = pa.table({"cohort_week": pa.array(cohort, pa.int64()),
                      "week_offset": pa.array(off, pa.int64())}) \
            .group_by(["cohort_week", "week_offset"]) \
            .aggregate([([], "count_all")])
        return pa.table({"cohort_week": c.column("cohort_week"),
                         "week_offset": c.column("week_offset"),
                         "n_users": pc.cast(c.column("count_all"),
                                            pa.int64())})

    return small_key_agg(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket").map_groups(
            lambda t: per_bucket(t.drop_columns(["bucket"])),
            batch_format="pyarrow"),
        _sum_combine(["cohort_week", "week_offset"], ["n_users"]))


def numeric_correlation_matrix(sf_dir: str) -> pa.Table:
    """(col_x, col_y, n_rows, r): exact Pearson correlation between every
    pair of lineitem numeric measures (quantity, extendedprice, discount,
    tax) under the repo's scaled-int64 register contract (cf.
    degree_assortativity): each value is quantized once as
    floor(x*100 + 0.5) — exact for these 2-decimal measures — and the six
    moment registers (n, Σx, Σy, Σxy, Σx², Σy²) are summed as EXACT
    integers (per-element products fit int64; cross-batch totals are
    arbitrary-precision Python ints riding the partials as strings, the
    engine's analog of DuckDB's BIGINT→HUGEINT sum widening). r is ONE
    float expression over the merged registers, so the DuckDB twin
    reproduces it bit-for-bit.

    Scale shape: a per-batch combiner reduces each batch to 6 register
    rows (one per column pair); the merge exchange is register-sized —
    6 × n_batches rows — regardless of row count, and the final reduce
    runs on the driver over that register table only."""
    import math

    import numpy as np

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", cols)
    pair_idx = [(i, j) for i in range(len(cols))
                for j in range(i + 1, len(cols))]

    def partial(t: pa.Table) -> pa.Table:
        q = {c: np.floor(
            t.column(c).to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64) for c in cols}
        xs, ys, ns, sx, sy, sxy, sx2, sy2 = [], [], [], [], [], [], [], []
        for i, j in pair_idx:
            a, b = q[cols[i]], q[cols[j]]
            xs.append(cols[i])
            ys.append(cols[j])
            ns.append(len(a))
            sx.append(str(int(a.sum())))
            sy.append(str(int(b.sum())))
            # per-element products fit int64 (<= 1e14); totals may not —
            # widen to Python int before summing
            sxy.append(str(sum((a * b).tolist())))
            sx2.append(str(sum((a * a).tolist())))
            sy2.append(str(sum((b * b).tolist())))
        return pa.table({
            "col_x": pa.array(xs, pa.string()),
            "col_y": pa.array(ys, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "sx": pa.array(sx, pa.string()),
            "sy": pa.array(sy, pa.string()),
            "sxy": pa.array(sxy, pa.string()),
            "sx2": pa.array(sx2, pa.string()),
            "sy2": pa.array(sy2, pa.string())})

    # register-sized driver pull: 6 rows per input batch
    partials = pa.concat_tables(
        ds.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))

    acc: dict = {}
    for row in partials.to_pylist():
        k = (row["col_x"], row["col_y"])
        st = acc.setdefault(k, [0, 0, 0, 0, 0, 0])
        st[0] += row["n"]
        st[1] += int(row["sx"])
        st[2] += int(row["sy"])
        st[3] += int(row["sxy"])
        st[4] += int(row["sx2"])
        st[5] += int(row["sy2"])
    xs, ys, ns, rs = [], [], [], []
    for i, j in pair_idx:
        k = (cols[i], cols[j])
        n, sx, sy, sxy, sx2, sy2 = acc[k]
        num = n * sxy - sx * sy
        denx = n * sx2 - sx * sx
        deny = n * sy2 - sy * sy
        r = float(num) / (math.sqrt(float(denx)) * math.sqrt(float(deny)))
        xs.append(cols[i])
        ys.append(cols[j])
        ns.append(n)
        rs.append(round_half_away(r, 4))
    return pa.table({"col_x": pa.array(xs, pa.string()),
                     "col_y": pa.array(ys, pa.string()),
                     "n_rows": pa.array(ns, pa.int64()),
                     "r": pa.array(rs, pa.float64())})


def pareto_front(sf_dir: str) -> pa.Table:
    """(p_size, price_cents): the skyline of distinct part
    (size, retail-price) points under "larger size is better, lower
    price is better" — every point no other point dominates (>= size,
    <= price, strict in at least one). The classic skyline operator
    (Borzsony et al., ICDE 2001); price is quantized ONCE to exact
    integer cents so dominance is pure int comparison and the DuckDB
    NOT EXISTS twin matches row-for-row.

    Scale shape: 2-D skylines admit the pareto-of-paretos merge law
    (skyline(A ∪ B) ⊆ skyline(A) ∪ skyline(B)), so each batch reduces
    to its local front via one sort + running-min scan (vectorized
    numpy cummin), and only the union of local fronts — bounded by
    #batches × front size, and a 2-D front is at most #distinct sizes
    rows — reaches the driver for the identical final scan. No global
    sort, no all-pairs."""
    import numpy as np

    ds = _read(sf_dir, "part", ["p_size", "p_retailprice"])

    def local_front(t: pa.Table) -> pa.Table:
        size = t.column("p_size").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cents = np.floor(t.column("p_retailprice").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        return _front_scan(size, cents)

    def _front_scan(size: np.ndarray, cents: np.ndarray) -> pa.Table:
        if len(size) == 0:
            return pa.table({"p_size": pa.array([], pa.int64()),
                             "price_cents": pa.array([], pa.int64())})
        # sort by size desc, cents asc; a point survives iff its price is
        # a strict new running minimum (everything before it has >= size,
        # and ties on size keep only the cheapest, which sorts first)
        order = np.lexsort((cents, -size))
        s, c = size[order], cents[order]
        cmin = np.minimum.accumulate(c)
        keep = np.ones(len(s), dtype=bool)
        # strict new running minimum; equal-price/equal-pair rows fail
        # (==, not <), so dominated ties and duplicates drop together
        keep[1:] = c[1:] < cmin[:-1]
        return pa.table({"p_size": pa.array(s[keep], pa.int64()),
                         "price_cents": pa.array(c[keep], pa.int64())})

    partials = pa.concat_tables(
        ds.map_batches(local_front, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    return _front_scan(
        partials.column("p_size").to_numpy(zero_copy_only=False)
        .astype(np.int64),
        partials.column("price_cents").to_numpy(zero_copy_only=False)
        .astype(np.int64))


def group_quantiles(sf_dir: str, num_buckets: int = 64) -> rd.Dataset:
    """(group_key, q, value): EXACT discrete quantiles (q = .25/.50/.75,
    percentile_disc semantics — the least value whose cumulative count
    reaches ceil(q*n)) of l_extendedprice per l_returnflag. Exact
    distributed median without a global sort: prices quantize to integer
    cents, so each group reduces to a (cents -> count) histogram whose
    size is bounded by the PRICE DOMAIN (~100k distinct cents), not the
    row count; the quantile pick is an integer cumulative-count
    comparison (cum*4 >= k*n), so no float threshold can flake and the
    DuckDB twin matches bit-for-bit.

    Scale shape: per-batch combiner collapses rows to distinct
    (group, cents) partials; one group-keyed bucketed exchange moves
    only histogram rows; each group's finalize is a sort + cumsum over
    its domain-bounded histogram. At 100 TB the histogram per group is
    unchanged (domain-bounded) — only partial-row counts grow with
    batch count."""
    import numpy as np

    from raykg.functions.shuffle import bucketed_group_agg

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def comb(t: pa.Table) -> pa.Table:
        cents = pa.array(np.floor(t.column("l_extendedprice").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64),
            pa.int64())
        g = pa.table({"group_key": t.column("l_returnflag"),
                      "cents": cents}) \
            .group_by(["group_key", "cents"]).aggregate([([], "count_all")])
        # sentinel: group_key "" cannot occur (l_returnflag is 1 char)
        return pa.table({
            "group_key": pa.array(
                g.column("group_key").to_pylist() + [""], pa.string()),
            "cents": pa.array(g.column("cents").to_pylist() + [0],
                              pa.int64()),
            "n": pa.array(g.column("count_all").to_pylist() + [0],
                          pa.int64())})

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by(["group_key", "cents"]).aggregate([("n", "sum")])
        keys_out, qs_out, vs_out = [], [], []
        for key in sorted(set(g.column("group_key").to_pylist())):
            sub = g.filter(pc.equal(g.column("group_key"), key))
            cents = np.asarray(sub.column("cents").to_pylist(), np.int64)
            cnt = np.asarray(sub.column("n_sum").to_pylist(), np.int64)
            if key == "":
                continue
            order = np.argsort(cents)
            cents, cnt = cents[order], cnt[order]
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            if n == 0:
                continue
            for k, q in ((1, 0.25), (2, 0.5), (3, 0.75)):
                idx = int(np.searchsorted(cum * 4, k * n))
                keys_out.append(key)
                qs_out.append(q)
                vs_out.append(round_half_away(cents[idx] / 100.0, 2))
        if not keys_out:   # sentinel-only bucket
            return pa.table({"group_key": pa.array([""], pa.string()),
                             "q": pa.array([0.0], pa.float64()),
                             "value": pa.array([0.0], pa.float64())})
        return pa.table({"group_key": pa.array(keys_out, pa.string()),
                         "q": pa.array(qs_out, pa.float64()),
                         "value": pa.array(vs_out, pa.float64())})

    out = bucketed_group_agg(ds, comb, "group_key", fin,
                             num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("group_key"), "")),
        batch_format="pyarrow")


def interval_coverage(sf_dir: str, num_buckets: int = 256) -> rd.Dataset:
    """Per user: merged-interval (gaps-and-islands) statistics over the
    event stream, where each event opens an interval of ``value`` minutes
    — (user_id, n_islands, covered_us). Two events whose intervals
    overlap or touch belong to one island; coverage is the union length
    of each island in microseconds. The classic interval-merge problem
    (SQL: MAX window + island sum), done scale-shaped: users hash into
    ``num_buckets`` uniform buckets, the shuffle exchanges on the
    small-int bucket key, and each bucket runs ONE vectorized pass.

    The per-bucket pass needs a GROUPED running max (interval ends are
    not monotone when durations vary). An earlier draft used the
    cummax(end + seg_id * BIG) - seg_id * BIG offset trick, but
    seg_id * BIG = (users per bucket) x (time range in us) overflows
    int64 at exactly the scale this op claims (300k users x a 1-year
    range wraps silently). Instead the running max accumulates per user
    SEGMENT — a loop over segment slices with a vectorized accumulate
    inside, the same per-group-loop shape as co_mention_edges' pair
    finalize: O(n) total, all operands plain int64 microseconds.

    Durations floor(value*60 + 0.5) seconds, clamped at 0, mirroring the
    DuckDB twin expression exactly."""
    import numpy as np

    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            pc.cast(t.column("user_id"), pa.int64()), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        unit = t.schema.field("ts").type.unit
        per_us = {"s": 10**6, "ms": 10**3, "us": 1}[unit]
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(uid) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_islands": pa.array([], pa.int64()),
                             "covered_us": pa.array([], pa.int64())})
        s = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False) * per_us
        val = t.column("value").to_numpy(zero_copy_only=False)
        dur = np.maximum(np.floor(val * 60.0 + 0.5).astype(np.int64), 0) \
            * 1_000_000
        f = s + dur
        n = len(uid)
        is_start = np.empty(n, np.bool_)
        is_start[0] = True
        np.not_equal(uid[1:], uid[:-1], out=is_start[1:])
        # grouped running max of f, exact int64 at any scale: accumulate
        # within each user segment (no cross-segment offset arithmetic)
        cm = np.empty(n, np.int64)
        seg_bounds = np.append(np.flatnonzero(is_start), n)
        for si in range(len(seg_bounds) - 1):
            lo_i, hi_i = seg_bounds[si], seg_bounds[si + 1]
            np.maximum.accumulate(f[lo_i:hi_i], out=cm[lo_i:hi_i])
        # island break: first event of a user, or start past the running
        # max of all PRIOR ends in the segment (exclusive prefix)
        brk = is_start.copy()
        brk[1:] |= (~is_start[1:]) & (s[1:] > cm[:-1])
        isl_start = np.flatnonzero(brk)
        isl_end = np.concatenate((isl_start[1:], [n])) - 1
        cov = cm[isl_end] - s[isl_start]   # island union = max end - min s
        # islands -> users: user segment boundaries within the island list
        isl_uid = uid[isl_start]
        u_start = np.flatnonzero(np.concatenate(
            ([True], isl_uid[1:] != isl_uid[:-1])))
        n_islands = np.diff(np.concatenate((u_start, [len(isl_uid)])))
        covered = np.add.reduceat(cov, u_start)
        return pa.table({
            "user_id": pa.array(isl_uid[u_start], pa.int64()),
            "n_islands": pa.array(n_islands, pa.int64()),
            "covered_us": pa.array(covered, pa.int64())})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow") \
        .select_columns(["user_id", "n_islands", "covered_us"])


def rolling_median(sf_dir: str, window: int = 5,
                   num_buckets: int = 256) -> rd.Dataset:
    """Per event: exact rolling median of ``value`` over the trailing
    ``window`` events of the same user (expanding below ``window``),
    ordered by (ts, event_id) — (event_id, user_id, roll_med). The
    order-statistic window SQL expresses as ``quantile_cont(0.5) OVER
    (... ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    Exactness contract: values quantize to int64 cents
    (floor(value*100 + 0.5)); the median of <= window small ints is
    exact in float64 (the even-count midpoint (a+b)/2 is an exact
    binary op on integers), so round(cents/100, 4) is bit-identical to
    the DuckDB twin — no interpolation-order hazard.

    Scale shape: user-bucketed exchange, then one vectorized pass per
    bucket — the trailing window materializes as ``window`` lagged
    columns (NaN where the lag crosses a user boundary) and a single
    np.nanmedian over axis 1; no per-row Python, no per-user groups."""
    import numpy as np

    from raykg.functions.hashing import round_half_away
    from raykg.functions.shuffle import crc_bucket_array

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            pc.cast(t.column("user_id"), pa.int64()), num_buckets))

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        uid = pc.cast(t.column("user_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "roll_med": pa.array([], pa.float64())})
        eid = pc.cast(t.column("event_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = np.floor(
            t.column("value").to_numpy(zero_copy_only=False) * 100.0
            + 0.5).astype(np.int64).astype(np.float64)
        is_start = np.empty(n, np.bool_)
        is_start[0] = True
        np.not_equal(uid[1:], uid[:-1], out=is_start[1:])
        seg_start = np.maximum.accumulate(
            np.where(is_start, np.arange(n), 0))
        cols = np.full((n, window), np.nan)
        idx = np.arange(n)
        for lag in range(window):
            valid = idx - lag >= seg_start
            cols[valid, lag] = cents[idx[valid] - lag]
        med = np.nanmedian(cols, axis=1) / 100.0
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "roll_med": pa.array(
                [round_half_away(m, 4) for m in med], pa.float64())})

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow") \
        .select_columns(["event_id", "user_id", "roll_med"])


def robust_group_stats(sf_dir: str, num_buckets: int = 64) -> rd.Dataset:
    """(group_key, n, median, mad, n_outliers): robust per-group location
    and spread of o_totalprice per o_orderpriority — median, the median
    absolute deviation, and the count of rows with |x - median| > 3*MAD
    (the Hampel outlier rule; ~4.5 sigma on normal data, but unlike a
    z-score it cannot be dragged by the outliers it is hunting).

    The second-order statistic (a median OF deviations FROM a median)
    needs no second exchange: like :func:`group_quantiles`, rows collapse
    to a domain-bounded (cents -> count) histogram per group, and the
    deviation distribution is a pure reindexing of that SAME histogram
    (|cents - med| with the same counts), so median, MAD and the outlier
    count all come out of one finalize. All comparisons are integer
    (percentile_disc semantics, cum*2 >= n), so the DuckDB twin matches
    bit-for-bit; the two reported dollar values round once at the end."""
    import numpy as np

    from raykg.functions.hashing import round_half_away
    from raykg.functions.shuffle import bucketed_group_agg

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def comb(t: pa.Table) -> pa.Table:
        cents = pa.array(np.floor(t.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100.0 + 0.5).astype(np.int64),
            pa.int64())
        g = pa.table({"group_key": t.column("o_orderpriority"),
                      "cents": cents}) \
            .group_by(["group_key", "cents"]).aggregate([([], "count_all")])
        # sentinel: "" cannot occur (priorities are '1-URGENT'.. style)
        return pa.table({
            "group_key": pa.array(
                g.column("group_key").to_pylist() + [""], pa.string()),
            "cents": pa.array(g.column("cents").to_pylist() + [0],
                              pa.int64()),
            "n": pa.array(g.column("count_all").to_pylist() + [0],
                          pa.int64())})

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by(["group_key", "cents"]).aggregate([("n", "sum")])
        keys, ns, meds, mads, outs = [], [], [], [], []
        for key in sorted(set(g.column("group_key").to_pylist())):
            if key == "":
                continue
            sub = g.filter(pc.equal(g.column("group_key"), key))
            cents = np.asarray(sub.column("cents").to_pylist(), np.int64)
            cnt = np.asarray(sub.column("n_sum").to_pylist(), np.int64)
            order = np.argsort(cents)
            cents, cnt = cents[order], cnt[order]
            cum = np.cumsum(cnt)
            n = int(cum[-1])
            if n == 0:
                continue
            med = int(cents[np.searchsorted(cum * 2, n)])
            # deviation histogram: same counts, reindexed; symmetric
            # cents collide so merge by reduceat over sorted devs
            dev = np.abs(cents - med)
            dorder = np.argsort(dev, kind="stable")
            dev, dcnt = dev[dorder], cnt[dorder]
            starts = np.flatnonzero(np.concatenate(
                ([True], dev[1:] != dev[:-1])))
            udev = dev[starts]
            ucnt = np.add.reduceat(dcnt, starts)
            dcum = np.cumsum(ucnt)
            mad = int(udev[np.searchsorted(dcum * 2, n)])
            keys.append(key)
            ns.append(n)
            meds.append(round_half_away(med / 100.0, 4))
            mads.append(round_half_away(mad / 100.0, 4))
            outs.append(int(ucnt[udev > 3 * mad].sum()))
        return pa.table({"group_key": pa.array(keys, pa.string()),
                         "n": pa.array(ns, pa.int64()),
                         "median": pa.array(meds, pa.float64()),
                         "mad": pa.array(mads, pa.float64()),
                         "n_outliers": pa.array(outs, pa.int64())})

    return bucketed_group_agg(ds, comb, "group_key", fin,
                              num_buckets=num_buckets)


def local_supplier_revenue(sf_dir: str, region: str = "ASIA",
                           date_from: str = "1996-01-01",
                           date_to: str = "1998-01-01",
                           num_partitions: int = 16,
                           dim_broadcast_limit: int = 2_000_000) -> pa.Table:
    """TPC-H Q5 shape — (n_name, revenue): revenue from lineitems whose
    SUPPLIER and ordering CUSTOMER sit in the same nation of ``region``,
    for orders in [date_from, date_to). The most join-intensive pipeline
    in the suite, shaped for scale the way a 100 TB run would be:

    - region ⋈ nation ⋈ supplier and the customer→nation map are
      DIMENSION sides: read once on the driver, pushed to workers as ONE
      ray.put broadcast, applied inside vectorized map_batches — never a
      shuffle. Scale envelope: unlike region/nation, TPC-H customer and
      supplier grow linearly with scale factor, so this broadcast costs
      O(|customer| + |supplier|) driver heap, which does NOT fit past
      SF ~10k. The envelope is now CODED, not just documented: when the
      customer row count (parquet metadata, no scan) exceeds
      ``dim_broadcast_limit``, the customer leg is rewritten as a second
      hash-shuffle join (orders ⋈ customer on custkey, same shape as the
      lineitem ⋈ orders leg below) and the customer table never reaches
      the driver. Both plans produce the identical table (pinned by
      tests forcing ``dim_broadcast_limit=0``); the broadcast form stays
      the default because it is the right plan at the benchmarked scales;
    - the two FACT tables meet in a hash-partitioned shuffle join
      (lineitem ⋈ orders on orderkey) — the only all-to-all, and both
      sides arrive pre-filtered (date range on orders, region's
      suppliers on lineitem) and pre-projected to 2-3 columns, so the
      exchange carries a fraction of either table;
    - the c_nationkey = s_nationkey correlation resolves AFTER the join
      as a vectorized equality on two attached small-int columns;
    - revenue partials per nation merge through small_key_agg
      (nations-per-region sized), float sums rounded once at the end
      (the revenue_by_priority contract)."""
    import datetime as dt

    import numpy as np
    import ray

    nation = _read_small(sf_dir, "nation")
    reg = _read_small(sf_dir, "region")
    rkey = {r: k for k, r in zip(reg.column("r_regionkey").to_pylist(),
                                 reg.column("r_name").to_pylist())}[region]
    n_in = {k: n for k, n, rk in zip(nation.column("n_nationkey").to_pylist(),
                                     nation.column("n_name").to_pylist(),
                                     nation.column("n_regionkey").to_pylist())
            if rk == rkey}
    supp = _read_small(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    s_map = {s: n for s, n in zip(supp.column("s_suppkey").to_pylist(),
                                  supp.column("s_nationkey").to_pylist())
             if n in n_in}
    # customer-leg plan selection: row count comes from parquet metadata
    # (no scan); above the budget the customer table never reaches the
    # driver and the attach becomes a hash-shuffle join instead
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    if n_cust <= dim_broadcast_limit:
        cust = _read_small(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        c_map = {c: n for c, n in zip(cust.column("c_custkey").to_pylist(),
                                      cust.column("c_nationkey").to_pylist())
                 if n in n_in}
    else:
        c_map = None
    dims = ray.put((s_map, c_map))
    t_lo = dt.datetime.fromisoformat(date_from)
    t_hi = dt.datetime.fromisoformat(date_to)

    # plain task functions, NOT actor pools: Dataset.join spawns its own
    # long-lived aggregator actors, and an actor pool upstream of a join
    # deadlocks them on a CPU-capped cluster (see bench _init_ray note).
    # ray.get on the broadcast ref is served from the local object store
    # after the first fetch per worker process.
    def order_side(t: pa.Table) -> pa.Table:
        c_map = ray.get(dims)[1]
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"),
                                     pa.scalar(t_lo)),
                    pc.less(t.column("o_orderdate"), pa.scalar(t_hi)))
        t = t.filter(m)
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        cn = np.fromiter((c_map.get(int(c), -1) for c in ck),
                         np.int64, count=len(ck))
        keep = cn >= 0
        return pa.table({
            "o_orderkey": pa.array(
                t.column("o_orderkey").to_numpy(
                    zero_copy_only=False)[keep], pa.int64()),
            "cust_nation": pa.array(cn[keep], pa.int64())})

    def line_side(t: pa.Table) -> pa.Table:
        s_map = ray.get(dims)[0]
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        sn = np.fromiter((s_map.get(int(s), -1) for s in sk),
                         np.int64, count=len(sk))
        keep = sn >= 0
        rev = pc.multiply(
            t.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), t.column("l_discount"))) \
            .to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "l_orderkey": pa.array(
                t.column("l_orderkey").to_numpy(
                    zero_copy_only=False)[keep], pa.int64()),
            "supp_nation": pa.array(sn[keep], pa.int64()),
            "rev": pa.array(rev, pa.float64())})

    if c_map is not None:
        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate"]) \
            .map_batches(order_side, batch_format="pyarrow")
    else:
        # distributed customer leg: nation membership is register-sized
        # (nations of one region) so it stays a closure; the custkey →
        # nation attach is a hash join, and the result materializes so the
        # fact join below runs as the DAG's only JoinOperator (stacked
        # join aggregators deadlock on CPU-capped clusters — see
        # stages/link_distributed.py)
        region_nations = pa.array(sorted(n_in), pa.int64())

        def cust_side(t: pa.Table) -> pa.Table:
            nk = pc.cast(t.column("c_nationkey"), pa.int64())
            keep = pc.is_in(nk, value_set=region_nations)
            return pa.table({
                "c_custkey": pc.cast(t.column("c_custkey"),
                                     pa.int64()).filter(keep),
                "cust_nation": nk.filter(keep)})

        def order_filter(t: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(t.column("o_orderdate"),
                                         pa.scalar(t_lo)),
                        pc.less(t.column("o_orderdate"), pa.scalar(t_hi)))
            t = t.filter(m)
            return pa.table({
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_custkey": pc.cast(t.column("o_custkey"), pa.int64())})

        # materialize both join inputs and guard the all-filtered case:
        # when EVERY block comes out of a filter empty, the blocks are
        # schema-less and the hash join rejects them ("No match ... for
        # key field reference") instead of producing an empty result
        cust_ds = _read(sf_dir, "customer",
                        ["c_custkey", "c_nationkey"]) \
            .map_batches(cust_side, batch_format="pyarrow").materialize()
        orders_f = _read(sf_dir, "orders",
                         ["o_orderkey", "o_custkey", "o_orderdate"]) \
            .map_batches(order_filter, batch_format="pyarrow").materialize()
        if cust_ds.count() == 0 or orders_f.count() == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue": pa.array([], pa.float64())})
        orders = orders_f \
            .join(cust_ds, join_type="inner",
                  num_partitions=num_partitions,
                  on=("o_custkey",), right_on=("c_custkey",)) \
            .map_batches(
                lambda t: t.select(["o_orderkey", "cust_nation"])
                if "cust_nation" in t.column_names
                else pa.schema([("o_orderkey", pa.int64()),
                                ("cust_nation", pa.int64())]).empty_table(),
                # explicit batch_size: the join emits SCHEMA-LESS zero-row
                # blocks for empty partitions, and map_batches skips the
                # UDF on zero-row blocks entirely — but with a batch_size
                # the batcher coalesces blocks, dissolving the empties, so
                # every surviving block carries this projection's schema
                # (the second join rejects schema-less right-side blocks)
                batch_format="pyarrow",
                batch_size=262_144).materialize()
        if orders.count() == 0:
            # all blocks schema-less (nothing survived the date filter /
            # region membership): the fact join below would reject them;
            # the result is definitionally empty
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue": pa.array([], pa.float64())})
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice",
                "l_discount"]) \
        .map_batches(line_side, batch_format="pyarrow")

    joined = li.join(orders, join_type="inner",
                     num_partitions=num_partitions,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        if "cust_nation" not in t.column_names:     # schema-less guard
            return pa.table({"nk": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.float64())})
        t = t.filter(pc.equal(t.column("cust_nation"),
                              t.column("supp_nation")))
        g = t.group_by("supp_nation").aggregate([("rev", "sum")])
        return pa.table({"nk": g.column("supp_nation"),
                         "rev": g.column("rev_sum")})

    tot = small_key_agg(joined.map_batches(partial, batch_format="pyarrow"),
                        _sum_combine(["nk"], ["rev"]))
    names = pa.array([n_in[k] for k in tot.column("nk").to_pylist()],
                     pa.string())
    out = pa.table({"n_name": names,
                    "revenue": _rha(tot.column("rev"), 2)})
    return out.sort_by([("n_name", "ascending")])


def hourly_autocorrelation(sf_dir: str,
                           lags: tuple = (1, 2, 3, 24)) -> pa.Table:
    """(lag, n_pairs, r): exact Pearson autocorrelation of the HOURLY
    event-count series at the given lags — the periodicity diagnostic
    for a stream (a strong lag-24 says daily seasonality; near-zero
    everywhere says Poisson-ish arrivals). The series is zero-filled
    over the full [min_hour, max_hour] range (missing hours are real
    zeros, not missing data), matching the twin's range() spine.

    Scale shape: the heavy part — collapsing billions of events to an
    (hour -> count) series — is a distributed two-phase aggregate whose
    exchange is bounded by the TIME RANGE, not the event count; the
    series itself is register-sized (hours), so the lag products run on
    the driver over exact Python ints with r as one float expression
    (the numeric_correlation_matrix contract)."""
    import math

    import numpy as np

    ds = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        return pa.table({"hour": hour}).group_by("hour").aggregate(
            [([], "count_all")])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("hour").aggregate(*_sums(["count_all"]))
    rows = pa.concat_tables(agg.iter_batches(batch_format="pyarrow",
                                             batch_size=None))
    hours = pc.cast(pc.cast(rows.column("hour"), pa.timestamp("us")),
                    pa.int64()).to_numpy(zero_copy_only=False) \
        // 3_600_000_000
    counts = rows.column("sum(count_all)").to_numpy(zero_copy_only=False)
    lo, hi = int(hours.min()), int(hours.max())
    series = np.zeros(hi - lo + 1, np.int64)
    series[hours - lo] = counts

    lag_col, n_col, r_col = [], [], []
    for lag in lags:
        if lag >= len(series):
            continue
        a = series[:-lag].tolist()
        b = series[lag:].tolist()
        n = len(a)
        sx, sy = sum(a), sum(b)
        sxy = sum(x * y for x, y in zip(a, b))
        sx2 = sum(x * x for x in a)
        sy2 = sum(y * y for y in b)
        vx = n * sx2 - sx * sx
        vy = n * sy2 - sy * sy
        if vx == 0 or vy == 0:
            r = 0.0
        else:
            r = (n * sxy - sx * sy) / math.sqrt(float(vx) * float(vy))
        from raykg.functions.hashing import round_half_away

        lag_col.append(lag)
        n_col.append(n)
        r_col.append(round_half_away(r, 6))
    return pa.table({"lag": pa.array(lag_col, pa.int64()),
                     "n_pairs": pa.array(n_col, pa.int64()),
                     "r": pa.array(r_col, pa.float64())})
