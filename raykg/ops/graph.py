"""Distributed graph analytics over (src, dst) edge lists — the
post-construction half of a KG pipeline (reference scope analog:
src2/main/scala/Clustering.scala builds the graph; these ops consume it).

Every op is a composition of bucketed two-phase shuffles
(`raykg.functions.shuffle.bucketed_group_agg`) over int64 node / packed-pair
keys: nothing node- or edge-sized ever lands on the driver, hot keys are
spread by the crc/Knuth bucket hash, and each stage is vectorized
(numpy / pyarrow.compute) per bucket.

Determinism contract: all arithmetic is integer (degree counts, triangle
counts, and an integer-scaled PageRank), so DuckDB reproduces every result
bit-for-bit — including the iterative op, which is otherwise the class of
operator (cf. ann_ivf_kmeans) that only gets a rows-only check.

Node-id envelope: triangle_counts and pagerank pack an edge into one int64
pair key (``a * 2^31 + b``, same trick as kg_edges in ops/relational.py), so
their ids must be in [0, 2^31) — violations raise loudly.
connected_components carries pair identity as two columns instead and only
requires non-negative ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raykg.functions.hashing import (hex_threshold8, round_half_away,
                                     sha_hex, sha_int)
from raykg.functions.shuffle import bucketed_group_agg

_SHIFT = np.int64(1) << np.int64(31)
_SENT = -1  # sentinel node / pair key (ids are asserted non-negative)


# ---------------------------------------------------------------------------
# deterministic synthetic graph (sha-derived; DuckDB regenerates it exactly)
# ---------------------------------------------------------------------------

GRAPH_N = 2000
GRAPH_COMM = 40          # community size (intra-community edges => triangles)
GRAPH_MAX_SLOTS = 6      # out-slots per node: 2 + sha%4 in [2, 5]
GRAPH_P_INTRA = 0.8


def synth_graph_edges(n_nodes: int = GRAPH_N, seed: int = 42,
                      p_intra: float = GRAPH_P_INTRA) -> rd.Dataset:
    """Deterministic directed edge list (src, dst) with community structure:
    node i draws 2 + sha%4 out-slots; each slot lands inside i's 40-node
    community w.p. ``p_intra`` (=> triangle-rich) else anywhere. Self-loops
    dropped, per-node duplicate targets dropped. Every byte is a pure
    function of (seed, i, slot), so the DuckDB oracle regenerates the graph
    exactly (same sha256 / threshold idiom as synth_pii_docs).
    ``p_intra=1.0`` keeps every edge inside its community — a multi-component
    graph for connected_components (0.8 merges everything into one giant
    component)."""
    if n_nodes % GRAPH_COMM:
        raise ValueError(f"n_nodes must be a multiple of {GRAPH_COMM}")
    thr = hex_threshold8(p_intra)

    def gen(b) -> pa.Table:
        srcs, dsts = [], []
        for i in b["id"].tolist():
            i = int(i)
            deg = 2 + int(sha_hex(f"gdeg|{seed}|{i}")[:8], 16) % 4
            seen = set()
            for j in range(deg):
                h = int(sha_hex(f"gdst|{seed}|{i}|{j}")[:8], 16)
                if sha_hex(f"gin|{seed}|{i}|{j}")[:8] < thr:
                    dst = (i // GRAPH_COMM) * GRAPH_COMM + h % GRAPH_COMM
                else:
                    dst = h % n_nodes
                if dst != i and dst not in seen:
                    seen.add(dst)
                    srcs.append(i)
                    dsts.append(dst)
        return pa.table({"src": pa.array(srcs, pa.int64()),
                         "dst": pa.array(dsts, pa.int64())})

    return rd.range(n_nodes, override_num_blocks=max(1, n_nodes // 500)) \
        .map_batches(gen, batch_format="numpy")


def _np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return a.to_numpy(zero_copy_only=False)


def _check_ids(*arrays: np.ndarray) -> None:
    for a in arrays:
        if len(a) and (a.min() < 0 or a.max() >= (1 << 31)):
            raise ValueError("graph node ids must be in [0, 2^31) "
                             "(int64 pair-key packing, cf. kg_edges)")


# ---------------------------------------------------------------------------
# degree statistics
# ---------------------------------------------------------------------------

def degree_stats(edges: rd.Dataset, num_buckets: int = 256,
                 _keep_sentinel: bool = False) -> rd.Dataset:
    """(node, out_deg, in_deg) over a directed edge list. Map-side combine
    (arrow hash-agg per batch) -> one bucketed exchange of (node, partial)
    rows -> per-bucket sum. Multi-edges count multiply; every endpoint
    appears (a pure sink has out_deg = 0).

    ``_keep_sentinel``: internal consumers (pagerank) keep the per-block
    node=-1 sentinel rows so no block is ever zero-row/schema-less; the
    public result filters them (terminal zero-row blocks are harmless)."""

    def comb(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        node = np.concatenate([src, dst])
        ones = np.ones(len(src), np.int64)
        zeros = np.zeros(len(dst), np.int64)
        p = pa.table({"node": np.concatenate([node, [_SENT]]),
                      "o": np.concatenate([ones, zeros, [0]]),
                      "i": np.concatenate([zeros, ones, [0]])})
        g = p.group_by("node").aggregate([("o", "sum"), ("i", "sum")])
        return pa.table({"node": g.column("node"), "o": g.column("o_sum"),
                         "i": g.column("i_sum")})

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("o", "sum"), ("i", "sum")])
        return pa.table({"node": g.column("node"),
                         "out_deg": g.column("o_sum"),
                         "in_deg": g.column("i_sum")})

    out = bucketed_group_agg(edges, comb, "node", fin,
                             num_buckets=num_buckets)
    if _keep_sentinel:
        return out
    return out.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0)),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# triangle counting (degree-oriented wedge join)
# ---------------------------------------------------------------------------

def triangle_counts(edges: rd.Dataset,
                    num_buckets: int = 256) -> rd.Dataset:
    """(node, n_triangles) over the UNDIRECTED simple graph underlying
    `edges` (direction and multiplicity collapsed; nodes in no triangle are
    omitted). The classic scalable plan:

    1. canonicalize + distinct the edge set (bucketed on the packed pair
       key) — the simple undirected graph;
    2. one endpoint-keyed exchange that computes each node's degree AND
       tags both endpoints of every edge with it (degree is |rows per node
       in the bucket group|, so no separate degree pass);
    3. re-group by pair key to ORIENT each edge low->high by (degree, id) —
       bounding every node's oriented out-degree by O(sqrt(m)), which is
       what keeps wedge generation from going quadratic on hubs (the
       standard Ganter/Schank--Wagner bound; no silent cap needed);
    4. wedge generation per oriented source (np.triu_indices per segment);
    5. membership semi-join of wedges against the canonical edge set
       (np.isin per bucket); each hit is one triangle, counted once from
       its minimum-(degree, id) corner, exploded to its 3 corners;
    6. per-node count aggregate.

    Every stage is a bucketed shuffle over int64 keys; the driver never
    sees an edge."""

    # 1. canonical distinct undirected edges, packed key pk = a*2^31 + b
    def canon(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        pk = np.unique(a * _SHIFT + b)
        return pa.table({"pk": np.concatenate([pk, [_SENT]])})

    def distinct(t: pa.Table) -> pa.Table:
        pk = np.unique(_np(t.column("pk")))
        # keep one sentinel so no und block is zero-row (schema-less-block
        # guard); every consumer filters pk >= 0
        return pa.table({"pk": np.concatenate([pk[pk >= 0], [_SENT]])})

    und = bucketed_group_agg(edges, canon, "pk", distinct,
                             num_buckets=num_buckets).materialize()

    # 2. endpoint exchange: per node, degree = #incident rows in its group;
    # emit (pk, node, deg) for every incident edge.
    def endpoints(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = pk[pk >= 0]
        return pa.table({
            "node": np.concatenate([pk // _SHIFT, pk % _SHIFT, [_SENT]]),
            "pk": np.concatenate([pk, pk, [_SENT]]),
        })

    def tag_deg(t: pa.Table) -> pa.Table:
        node, pk = _np(t.column("node")), _np(t.column("pk"))
        real = node >= 0
        node, pk = node[real], pk[real]
        order = np.argsort(node, kind="stable")
        node, pk = node[order], pk[order]
        uniq, start, counts = np.unique(node, return_index=True,
                                        return_counts=True)
        deg = np.repeat(counts, counts)
        return pa.table({"pk": np.concatenate([pk, [_SENT]]),
                         "node": np.concatenate([node, [_SENT]]),
                         "deg": np.concatenate([deg, [0]])})

    tagged = bucketed_group_agg(und, endpoints, "node", tag_deg,
                                num_buckets=num_buckets)

    # 3. orient: group the two endpoint rows of each edge, src = smaller
    # (deg, id). Vectorized: sort by pk, rows pair up adjacently.
    def orient(t: pa.Table) -> pa.Table:
        pk, node = _np(t.column("pk")), _np(t.column("node"))
        deg = _np(t.column("deg"))
        real = pk >= 0
        pk, node, deg = pk[real], node[real], deg[real]
        order = np.argsort(pk, kind="stable")
        pk, node, deg = pk[order], node[order], deg[order]
        n0, n1 = node[0::2], node[1::2]
        d0, d1 = deg[0::2], deg[1::2]
        first = (d0 < d1) | ((d0 == d1) & (n0 < n1))
        u = np.where(first, n0, n1)
        v = np.where(first, n1, n0)
        return pa.table({"u": np.concatenate([u, [_SENT]]),
                         "v": np.concatenate([v, [_SENT]])})

    oriented = bucketed_group_agg(tagged, lambda t: t, "pk", orient,
                                  num_buckets=num_buckets)

    # 4. wedges per oriented source: pairs of out-neighbors, keyed by the
    # missing edge's pair key; corner = the wedge apex u.
    def wedges(t: pa.Table) -> pa.Table:
        u, v = _np(t.column("u")), _np(t.column("v"))
        real = u >= 0
        u, v = u[real], v[real]
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        _, start, counts = np.unique(u, return_index=True,
                                     return_counts=True)
        wpks, corners = [np.array([_SENT], np.int64)], \
            [np.array([_SENT], np.int64)]
        for s, c in zip(start, counts):
            if c < 2:
                continue
            nb = v[s:s + c]
            ii, jj = np.triu_indices(c, 1)
            x, y = nb[ii], nb[jj]
            lo, hi = np.minimum(x, y), np.maximum(x, y)
            wpks.append(lo * _SHIFT + hi)
            corners.append(np.full(len(lo), u[s], np.int64))
        return pa.table({"wpk": np.concatenate(wpks),
                         "corner": np.concatenate(corners)})

    wedge_ds = bucketed_group_agg(oriented, lambda t: t, "u", wedges,
                                  num_buckets=num_buckets)

    # 5. membership: wedge (x,y) closed iff pair key exists in und.
    def edge_marker(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))   # sentinel rows (pk=-1) pass through and
        return pa.table({"wpk": pk,  # group under wpk=-1, dropped in close
                         "corner": np.full(len(pk), -2, np.int64)})

    def close(t: pa.Table) -> pa.Table:
        wpk, corner = _np(t.column("wpk")), _np(t.column("corner"))
        edge_keys = wpk[(corner == -2) & (wpk >= 0)]
        wed = (corner >= 0)
        hit = wed & np.isin(wpk, edge_keys)
        apex = corner[hit]
        x, y = wpk[hit] // _SHIFT, wpk[hit] % _SHIFT
        node = np.concatenate([apex, x, y, [_SENT]])
        return pa.table({"node": node,
                         "n": np.concatenate(
                             [np.ones(len(apex) * 3, np.int64), [0]])})

    closed = bucketed_group_agg(
        wedge_ds.union(und.map_batches(edge_marker, batch_format="pyarrow")),
        lambda t: t, "wpk", close, num_buckets=num_buckets)

    # 6. per-corner counts
    def comb(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("n", "sum")])
        return pa.table({"node": g.column("node"), "n": g.column("n_sum")})

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("n", "sum")])
        g = g.filter(pc.greater_equal(g.column("node"), 0))
        return pa.table({"node": g.column("node"),
                         "n_triangles": g.column("n_sum")})

    return bucketed_group_agg(closed, comb, "node", fin,
                              num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# PageRank — integer-scaled, bit-exact
# ---------------------------------------------------------------------------

PR_SCALE = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100   # damping 0.85 as an exact ratio


def pagerank(edges: rd.Dataset, iters: int = 3,
             num_buckets: int = 256,
             teleport_to: int | None = None) -> rd.Dataset:
    """(node, rank_int) after `iters` synchronous iterations of
    integer-scaled PageRank: ranks start at PR_SCALE; each round every
    node with out-edges sends floor(floor(rank*85/100) / out_deg) to each
    out-neighbor and every node restarts from floor(PR_SCALE*15/100).
    All arithmetic is int64 floor division -> bit-identical to the DuckDB
    oracle (the floor semantics ARE the contract; dangling mass is
    dropped, as in the original sum formulation of PageRank).

    ``teleport_to``: personalized PageRank — the start mass and per-round
    restart land ONLY on that node (random walk with restart to a seed;
    the ranking is proximity to the seed instead of global centrality).

    Fully distributed fixpoint loop: per iteration one src-keyed exchange
    (rank lookup via np.searchsorted against the <=bucket-sized state
    slice) computes contributions, one dst-keyed exchange sums them into
    the new state. State lives as a Dataset and is materialized per
    iteration (it is consumed by the next round's shuffle) — the driver
    never holds a node-sized structure."""
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN

    def _start(node: np.ndarray) -> np.ndarray:
        if teleport_to is None:
            return np.where(node >= 0, PR_SCALE, 0).astype(np.int64)
        return np.where(node == teleport_to, PR_SCALE, 0).astype(np.int64)

    def _restart(node: np.ndarray) -> np.ndarray:
        if teleport_to is None:
            return np.full(len(node), base, np.int64)
        return np.where(node == teleport_to, base, 0).astype(np.int64)

    edges = edges.materialize()
    state = degree_stats(edges, num_buckets=num_buckets,
                         _keep_sentinel=True).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "out_deg": t.column("out_deg"),
            "rank_int": pa.array(_start(_np(t.column("node"))), pa.int64()),
        }), batch_format="pyarrow").materialize()

    def edge_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        return pa.table({"node": src, "dst": dst,
                         "out_deg": np.full(len(src), -1, np.int64),
                         "rank_int": np.zeros(len(src), np.int64)})

    def state_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "dst": pa.array([_SENT] * t.num_rows, pa.int64()),
                         "out_deg": t.column("out_deg"),
                         "rank_int": t.column("rank_int")})

    def contribs(t: pa.Table) -> pa.Table:
        """Per bucket: state rows give (rank, out_deg) per node; edge rows
        look them up (sorted searchsorted — every src node's state row
        hashes into this same bucket by construction)."""
        node, dst = _np(t.column("node")), _np(t.column("dst"))
        od, rk = _np(t.column("out_deg")), _np(t.column("rank_int"))
        is_state = dst == _SENT
        snode, sod, srk = node[is_state], od[is_state], rk[is_state]
        order = np.argsort(snode)
        snode, sod, srk = snode[order], sod[order], srk[order]
        enode, edst = node[~is_state], dst[~is_state]
        idx = np.searchsorted(snode, enode)
        if len(enode) and (idx.max() >= len(snode)
                           or not np.array_equal(snode[idx], enode)):
            raise AssertionError("pagerank: edge src missing from state "
                                 "(degree_stats must cover all endpoints)")
        send = (srk[idx] * PR_DAMP_NUM) // PR_DAMP_DEN
        c = send // sod[idx]   # out_deg >= 1 wherever a src edge exists
        return pa.table({"node": np.concatenate([edst, [_SENT]]),
                         "contrib": np.concatenate([c, [0]])})

    for _ in range(iters):
        contrib_ds = bucketed_group_agg(
            edges.map_batches(edge_rows, batch_format="pyarrow")
            .union(state.map_batches(state_rows, batch_format="pyarrow")),
            lambda t: t, "node", contribs, num_buckets=num_buckets)

        def carrier(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column("node"),
                             "out_deg": t.column("out_deg"),
                             "contrib": pa.array([0] * t.num_rows,
                                                 pa.int64())})

        def contrib_rows(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column("node"),
                             "out_deg": pa.array([-1] * t.num_rows,
                                                 pa.int64()),
                             "contrib": t.column("contrib")})

        def new_state(t: pa.Table) -> pa.Table:
            g = t.group_by("node").aggregate([("contrib", "sum"),
                                              ("out_deg", "max")])
            g = g.filter(pc.greater_equal(g.column("node"), 0))
            gnode = _np(g.column("node"))
            # out_deg max: carrier row holds the true value, contrib rows -1.
            # One sentinel per block keeps the state union-safe next round.
            return pa.table({
                "node": pa.concat_arrays(
                    [g.column("node").combine_chunks(),
                     pa.array([_SENT], pa.int64())]),
                "out_deg": pa.concat_arrays(
                    [g.column("out_deg_max").combine_chunks(),
                     pa.array([0], pa.int64())]),
                "rank_int": pa.array(np.concatenate(
                    [_np(g.column("contrib_sum")) + _restart(gnode), [0]]),
                    pa.int64()),
            })

        state = bucketed_group_agg(
            contrib_ds.map_batches(contrib_rows, batch_format="pyarrow")
            .union(state.map_batches(carrier, batch_format="pyarrow")),
            lambda t: t, "node", new_state,
            num_buckets=num_buckets).materialize()

    return state.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0))
        .select(["node", "rank_int"]), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# connected components — vectorized min-label propagation
# ---------------------------------------------------------------------------

def connected_components(edges: rd.Dataset, max_iters: int = 32,
                         num_buckets: int = 256) -> rd.Dataset:
    """(node, component) over the UNDIRECTED simple graph underlying
    ``edges``; component = min node id reachable. Nodes with no non-self
    edge are omitted (the pair-node universe — matches the recursive-CTE
    oracle and neardup_components' contract).

    Iterative min-label propagation, fully vectorized, three bucketed
    exchanges per round and nothing node- or edge-sized on the driver:

    1. node-keyed ATTACH: each endpoint row of every canonical edge looks
       up its node's current label (sorted ``searchsorted`` against the
       state slice that hashes into the same bucket — pagerank's contribs
       idiom) and emits (a, b, label);
    2. pair-keyed EDGE-MIN: rows are routed on a derived int64 pair-hash
       (collisions only affect load balance), lexsorted by (a, b) inside
       the bucket, and ``minimum.reduceat`` over the segment boundaries
       offers min(label of a, label of b) back to BOTH endpoints;
    3. node-keyed FOLD: new label = min(old, offers); the changed flag is
       computed in the same aggregate (no extra exchange) and summed
       distributedly for the fixpoint test.

    Unlike triangle_counts/pagerank, pair identity is carried as TWO int64
    columns (never packed), so there is no 2^31 id ceiling — ids only need
    to be non-negative. A label travels one edge per round, so convergence
    takes component-diameter rounds; exhausting ``max_iters`` LOGS a
    warning (the result would be over-segmented vs the exact closure)."""

    def _pair_route(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # routing key only — collisions are harmless (finalize re-groups
        # exactly on (a, b) via lexsort inside the bucket)
        return ((a.astype(np.uint64) * np.uint64(2654435761)
                 + b.astype(np.uint64)) & np.uint64(0x7FFFFFFFFFFFFFFF)) \
            .astype(np.int64)

    def _ab(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        return _np(t.column("a")), _np(t.column("b"))

    def _pair_dedup(a: np.ndarray, b: np.ndarray) \
            -> tuple[np.ndarray, np.ndarray]:
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            keep = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            a, b = a[keep], b[keep]
        return a, b

    # canonical distinct undirected edge set, (a, b) with a < b
    def canon(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        if len(src) and (src.min() < 0 or dst.min() < 0):
            raise ValueError("connected_components: node ids must be "
                             "non-negative (-1 is the sentinel)")
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        a, b = _pair_dedup(a, b)
        return pa.table({"a": np.concatenate([a, [_SENT]]),
                         "b": np.concatenate([b, [_SENT]]),
                         "ph": np.concatenate([_pair_route(a, b), [_SENT]])})

    def distinct(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        real = a >= 0
        a, b = _pair_dedup(a[real], b[real])
        return pa.table({"a": np.concatenate([a, [_SENT]]),
                         "b": np.concatenate([b, [_SENT]])})

    und = bucketed_group_agg(edges, canon, "ph", distinct,
                             num_buckets=num_buckets).materialize()

    # initial state: every endpoint, label = node id
    def seed(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        node = np.unique(np.concatenate([a[a >= 0], b[b >= 0]]))
        return pa.table({"node": np.concatenate([node, [_SENT]]),
                         "label": np.concatenate([node, [_SENT]])})

    def seed_fin(t: pa.Table) -> pa.Table:
        node = np.unique(_np(t.column("node")))
        node = node[node >= 0]
        return pa.table({"node": np.concatenate([node, [_SENT]]),
                         "label": np.concatenate([node, [_SENT]])})

    state = bucketed_group_agg(und, seed, "node", seed_fin,
                               num_buckets=num_buckets).materialize()

    # per-round streams. Endpoint rows: (node, a, b); state rows are
    # flagged by a = _SENT (an endpoint row always has a >= 0).
    def ep_rows(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        real = a >= 0
        a, b = a[real], b[real]
        return pa.table({
            "node": np.concatenate([a, b, [_SENT]]),
            "a": np.concatenate([a, a, [_SENT]]),
            "b": np.concatenate([b, b, [_SENT]]),
            "label": np.zeros(2 * len(a) + 1, np.int64),
        })

    def state_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": t.column("node"),
                         "a": pa.array([_SENT] * n, pa.int64()),
                         "b": pa.array([_SENT] * n, pa.int64()),
                         "label": t.column("label")})

    def attach(t: pa.Table) -> pa.Table:
        node, lab = _np(t.column("node")), _np(t.column("label"))
        a, b = _ab(t)
        is_state = a == _SENT
        snode, slab = node[is_state], lab[is_state]
        order = np.argsort(snode, kind="stable")
        snode, slab = snode[order], slab[order]
        ea, eb, enode = a[~is_state], b[~is_state], node[~is_state]
        idx = np.searchsorted(snode, enode)
        if len(enode) and (idx.max() >= len(snode)
                           or not np.array_equal(snode[idx], enode)):
            raise AssertionError("connected_components: endpoint missing "
                                 "from state (seed must cover every "
                                 "endpoint)")
        return pa.table({
            "a": np.concatenate([ea, [_SENT]]),
            "b": np.concatenate([eb, [_SENT]]),
            "label": np.concatenate([slab[idx], [_SENT]]),
            "ph": np.concatenate([_pair_route(ea, eb), [_SENT]])})

    def edge_min(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        lab = _np(t.column("label"))
        real = a >= 0
        a, b, lab = a[real], b[real], lab[real]
        if not len(a):
            return pa.table({"node": pa.array([_SENT], pa.int64()),
                             "offer": pa.array([_SENT], pa.int64()),
                             "is_old": pa.array([0], pa.int8())})
        order = np.lexsort((b, a))
        a, b, lab = a[order], b[order], lab[order]
        start = np.flatnonzero(np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))))
        m = np.minimum.reduceat(lab, start)
        return pa.table({
            "node": np.concatenate([a[start], b[start], [_SENT]]),
            "offer": np.concatenate([m, m, [_SENT]]),
            "is_old": np.zeros(2 * len(start) + 1, np.int8)})

    def old_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": t.column("node"),
                         "offer": t.column("label"),
                         "is_old": pa.array([1] * n, pa.int8())})

    def fold(t: pa.Table) -> pa.Table:
        node, off = _np(t.column("node")), _np(t.column("offer"))
        old_f = _np(t.column("is_old"))
        order = np.argsort(node, kind="stable")
        node, off, old_f = node[order], off[order], old_f[order]
        start = np.flatnonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))
        new = np.minimum.reduceat(off, start)
        uniq = node[start]
        # exactly one old row per real node (state nodes are unique);
        # old label = max over the group's old rows works because offers
        # never carry is_old=1
        old_lab = np.maximum.reduceat(
            np.where(old_f == 1, off, np.int64(-1)), start)
        changed = ((new < old_lab) & (uniq >= 0)).astype(np.int64)
        return pa.table({"node": uniq, "label": new, "changed": changed})

    converged = False
    for _ in range(max_iters):
        attached = bucketed_group_agg(
            und.map_batches(ep_rows, batch_format="pyarrow")
            .union(state.map_batches(state_rows, batch_format="pyarrow")),
            lambda t: t, "node", attach, num_buckets=num_buckets)
        offers = bucketed_group_agg(attached, lambda t: t, "ph", edge_min,
                                    num_buckets=num_buckets)
        state = bucketed_group_agg(
            offers.union(state.map_batches(old_rows,
                                           batch_format="pyarrow")),
            lambda t: t, "node", fold, num_buckets=num_buckets) \
            .materialize()
        if not state.sum("changed"):   # materialized -> cheap
            converged = True
            break
        state = state.drop_columns(["changed"])
    if not converged:
        import logging

        logging.getLogger("raykg").warning(
            "connected_components: min-label propagation did not reach "
            "its fixpoint within %d rounds — a component's diameter "
            "exceeds max_iters and the output is over-segmented vs the "
            "exact closure; raise max_iters", max_iters)

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("node"), 0))
        return pa.table({"node": t.column("node"),
                         "component": t.column("label")})

    return state.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Fused frontier min-plus kernel (BFS / weighted SSSP)
# ---------------------------------------------------------------------------

_K_EDGE, _K_STATE, _K_OFFER, _K_CNT = 0, 1, 2, 3


def _frontier_min(edges: rd.Dataset, source: int, max_rounds: int,
                  num_buckets: int, weight_fn=None,
                  budget: int | None = None) -> tuple[rd.Dataset, bool]:
    """Synchronous min-plus frontier propagation from ``source`` with ONE
    bucketed exchange per round (the round-latency fix for the former
    two-exchange bfs/sssp shape):

    every row carries its target ``bucket``; edges are keyed by src ONCE
    and PASS THROUGH each round unchanged (they are already in their home
    bucket), state rows stay in their home bucket, and offer rows are
    emitted pre-routed to ``bucket(dst)``. The per-bucket finalize FUSES
    last round's fold (min over old state + arriving offers; ``changed``
    per bucket) with this round's attach — offers go out only from nodes
    IMPROVED this round (delta propagation), so offer volume is
    frontier-adjacent edges, not reached-adjacent edges. One counter row
    per bucket doubles as the non-empty-block sentinel and the distributed
    fixpoint test (summed per round; no separate signature pass).

    The source enters as an OFFER, so round r settles the depth-(r-1)
    frontier; a run of ``max_rounds`` covers eccentricity max_rounds - 2
    plus the empty round that proves convergence.

    Exchange volume per round is edges + state + frontier-offers — same
    bytes the previous design re-shuffled across TWO exchanges (it re-keyed
    the full edge table every round too), at half the stage latency. At
    cluster scale the remaining improvement is edge-resident partitions
    (edges pinned per bucket, only offers exchanged); Ray Data's groupby
    cannot express residency across rounds, so that variant needs raw
    actors and is deliberately out of scope.

    ``weight_fn(batch) -> int64 weights`` (default all-ones = BFS);
    ``budget`` drops offers whose value exceeds it (cost-bounded SSSP).
    Returns (state dataset with columns (node, val), converged)."""
    INF = np.int64(1) << np.int64(62)

    def route(a: np.ndarray) -> np.ndarray:
        return ((a.astype(np.uint64) * np.uint64(2654435761))
                >> np.uint64(7)).astype(np.int64) % num_buckets

    def edge_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        w = weight_fn(t) if weight_fn is not None \
            else np.ones(len(src), np.int64)
        n = len(src)
        return pa.table({
            "bucket": pa.array(np.concatenate([route(src), [0]]), pa.int64()),
            "node": pa.array(np.concatenate([src, [_SENT]]), pa.int64()),
            "dst": pa.array(np.concatenate([dst, [_SENT]]), pa.int64()),
            "val": pa.array(np.concatenate([w, [0]]), pa.int64()),
            "kind": pa.array([_K_EDGE] * (n + 1), pa.int8()),
        })

    seed_bucket = int(route(np.array([source], np.int64))[0])
    seed_t = pa.table({
        "bucket": pa.array([seed_bucket], pa.int64()),
        "node": pa.array([source], pa.int64()),
        "dst": pa.array([_SENT], pa.int64()),
        "val": pa.array([0], pa.int64()),
        "kind": pa.array([_K_OFFER], pa.int8()),
    })

    def round_fn(t: pa.Table) -> pa.Table:
        bkt = int(t.column("bucket")[0].as_py())
        node, dst = _np(t.column("node")), _np(t.column("dst"))
        val = _np(t.column("val"))
        kind = _np(t.column("kind"))
        real = node >= 0
        em = (kind == _K_EDGE) & real
        esrc, edst, ew = node[em], dst[em], val[em]
        fm = ((kind == _K_STATE) | (kind == _K_OFFER)) & real
        f_node, f_val = node[fm], val[fm]
        f_old = kind[fm] == _K_STATE
        if len(f_node):
            order = np.lexsort((f_val, f_node))
            n_, v_, o_ = f_node[order], f_val[order], f_old[order]
            start = np.flatnonzero(np.concatenate(
                ([True], n_[1:] != n_[:-1])))
            uniq, new = n_[start], v_[start]      # sorted => min is first
            old = np.minimum.reduceat(np.where(o_, v_, INF), start)
            improved = new < old
        else:
            uniq = np.empty(0, np.int64)
            new = np.empty(0, np.int64)
            improved = np.empty(0, bool)
        changed = int(improved.sum())
        fr_node, fr_val = uniq[improved], new[improved]
        if len(fr_node) and len(esrc):
            eo = np.argsort(esrc, kind="stable")
            es, ed, ewo = esrc[eo], edst[eo], ew[eo]
            lo = np.searchsorted(es, fr_node, side="left")
            hi = np.searchsorted(es, fr_node, side="right")
            counts = (hi - lo).astype(np.int64)
            total = int(counts.sum())
            # ragged gather of each frontier node's out-edge slice
            base = np.repeat(lo, counts)
            offs = np.arange(total, dtype=np.int64) \
                - np.repeat(np.concatenate(([0], np.cumsum(counts)[:-1])),
                            counts)
            idx = base + offs
            off_dst = ed[idx]
            off_val = np.repeat(fr_val, counts) + ewo[idx]
            if budget is not None:
                inside = off_val <= budget
                off_dst, off_val = off_dst[inside], off_val[inside]
        else:
            off_dst = np.empty(0, np.int64)
            off_val = np.empty(0, np.int64)
        ne, ns, no = len(esrc), len(uniq), len(off_dst)
        return pa.table({
            "bucket": pa.array(np.concatenate(
                [np.full(ne + ns, bkt, np.int64), route(off_dst), [bkt]]),
                pa.int64()),
            "node": pa.array(np.concatenate(
                [esrc, uniq, off_dst, [_SENT]]), pa.int64()),
            "dst": pa.array(np.concatenate(
                [edst, np.full(ns + no + 1, _SENT, np.int64)]), pa.int64()),
            "val": pa.array(np.concatenate(
                [ew, new, off_val, [changed]]), pa.int64()),
            "kind": pa.array(np.concatenate(
                [np.full(ne, _K_EDGE, np.int8),
                 np.full(ns, _K_STATE, np.int8),
                 np.full(no, _K_OFFER, np.int8),
                 np.array([_K_CNT], np.int8)]), pa.int8()),
        })

    def cnt_rows(t: pa.Table) -> pa.Table:
        v = _np(t.column("val"))[_np(t.column("kind")) == _K_CNT]
        return pa.table({"val": pa.array([int(v.sum())], pa.int64())})

    cur = edges.map_batches(edge_rows, batch_format="pyarrow") \
        .union(rd.from_arrow(seed_t))
    converged = False
    for _ in range(max_rounds):
        cur = cur.groupby("bucket").map_groups(
            round_fn, batch_format="pyarrow").materialize()
        if not cur.map_batches(cnt_rows,
                               batch_format="pyarrow").sum("val"):
            converged = True
            break

    def fin(t: pa.Table) -> pa.Table:
        keep = pc.equal(t.column("kind"), _K_STATE)
        t = t.filter(keep)
        return pa.table({"node": t.column("node"), "val": t.column("val")})

    return cur.map_batches(fin, batch_format="pyarrow"), converged


# ---------------------------------------------------------------------------
# BFS depths — single-source unit-weight shortest paths
# ---------------------------------------------------------------------------

def bfs_depths(edges: rd.Dataset, source: int = 0, max_iters: int = 32,
               num_buckets: int = 256) -> rd.Dataset:
    """(node, depth) for every node reachable from ``source`` along
    DIRECTED edges; depth = length of the shortest such path (source
    itself at depth 0). One fused bucketed exchange per round via
    :func:`_frontier_min` (fold + frontier attach in the same per-bucket
    finalize; the per-bucket counter row is the distributed fixpoint
    test), nothing node-sized on the driver.

    Synchronous min-propagation over unit weights IS breadth-first search:
    round r settles exactly the depth-(r-1) frontier, so the loop stops
    after eccentricity(source)+2 rounds. Exhausting the round budget logs
    a warning (the result would then miss nodes deeper than max_iters).
    All-integer arithmetic — the DuckDB recursive-CTE twin is bit-exact."""
    state, converged = _frontier_min(edges, source,
                                     max_rounds=max_iters + 2,
                                     num_buckets=num_buckets)
    if not converged:
        import logging

        logging.getLogger("raykg").warning(
            "bfs_depths: frontier did not empty within %d rounds — nodes "
            "deeper than max_iters are missing from the output; raise "
            "max_iters", max_iters)

    return state.map_batches(
        lambda t: t.rename_columns(["node", "depth"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# connected components in O(log^2 n) rounds — alternating star contraction
# ---------------------------------------------------------------------------

def connected_components_star(edges: rd.Dataset, max_iters: int = 64,
                              num_buckets: int = 256) -> rd.Dataset:
    """(node, component) — same contract as :func:`connected_components`
    (component = min reachable node id over the undirected simple graph,
    pair-node universe), but via alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): converges in O(log^2 n) rounds INDEPENDENT of
    component diameter, vs min-label propagation's O(diameter). This is
    the scale path for long-chain graphs (web link paths, citation
    chains) where a 10^6-hop component would take 10^6 propagation
    rounds but ~40 star rounds.

    One bucketed node-keyed exchange per star, everything vectorized
    (argsort + ``minimum.reduceat`` segment mins); each round's edge
    count never grows (large-star emits exactly one edge per input edge,
    small-star at most one), so per-round work is linear in the current
    edge set.

    Fixpoint detection compares a commutative 64-bit mix signature
    (count + wrapping sum of per-edge hashes) across rounds: the paper's
    potential function strictly decreases until the star-forest fixpoint,
    so a repeated signature means convergence (up to a documented 2^-64
    collision risk); equality with the propagation variant is asserted
    in tests."""

    def _ab(t: pa.Table):
        return _np(t.column("a")), _np(t.column("b"))

    def _pair_dedup(a: np.ndarray, b: np.ndarray):
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            keep = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            a, b = a[keep], b[keep]
        return a, b

    def _route(a: np.ndarray) -> np.ndarray:
        return ((a.astype(np.uint64) * np.uint64(2654435761))
                >> np.uint64(7)).astype(np.int64) % num_buckets

    # canonical distinct undirected simple edges (a < b)
    def canon(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        if len(src) and (src.min() < 0 or dst.min() < 0):
            raise ValueError("connected_components_star: node ids must "
                             "be non-negative (-1 is the sentinel)")
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        a, b = _pair_dedup(a, b)
        return pa.table({"a": np.concatenate([a, [_SENT]]),
                         "b": np.concatenate([b, [_SENT]])})

    def dedup_fin(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        real = a >= 0
        a, b = _pair_dedup(a[real], b[real])
        return pa.table({"a": np.concatenate([a, [_SENT]]),
                         "b": np.concatenate([b, [_SENT]])})

    def _dedup(ds: rd.Dataset) -> rd.Dataset:
        # route on the smaller endpoint: canonical duplicates share it
        def keyed(t: pa.Table) -> pa.Table:
            a, b = _ab(t)
            real = a >= 0
            a, b = _pair_dedup(a[real], b[real])
            return pa.table({"a": np.concatenate([a, [_SENT]]),
                             "b": np.concatenate([b, [_SENT]])})

        return bucketed_group_agg(ds, keyed, "a", dedup_fin,
                                  num_buckets=num_buckets)

    state = _dedup(edges.map_batches(canon, batch_format="pyarrow")) \
        .materialize()

    # ---- star rounds -------------------------------------------------
    def ls_rows(t: pa.Table) -> pa.Table:
        """Both directions: edge (a, b) lands in group a AND group b."""
        a, b = _ab(t)
        real = a >= 0
        a, b = a[real], b[real]
        return pa.table({"u": np.concatenate([a, b, [_SENT]]),
                         "v": np.concatenate([b, a, [_SENT]])})

    def large_star(t: pa.Table) -> pa.Table:
        """Per group u: m = min(u, neighbors); emit (v, m) for v > u.
        Every canonical edge is emitted exactly once (from its smaller
        endpoint's group), so the edge count never grows."""
        u, v = _np(t.column("u")), _np(t.column("v"))
        real = u >= 0
        u, v = u[real], v[real]
        if not len(u):   # bucket held only sentinel rows
            return pa.table({"a": np.array([_SENT], np.int64),
                             "b": np.array([_SENT], np.int64)})
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        start = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        counts = np.diff(np.concatenate([start, [len(u)]]))
        m = np.minimum(np.minimum.reduceat(v, start), u[start])
        m_row = np.repeat(m, counts)
        keep = v > u
        return pa.table({"a": np.concatenate([m_row[keep], [_SENT]]),
                         "b": np.concatenate([v[keep], [_SENT]])})

    def ss_rows(t: pa.Table) -> pa.Table:
        """One direction: group by the LARGER endpoint."""
        a, b = _ab(t)
        real = a >= 0
        a, b = a[real], b[real]
        return pa.table({"u": np.concatenate([b, [_SENT]]),
                         "v": np.concatenate([a, [_SENT]])})

    def small_star(t: pa.Table) -> pa.Table:
        """Per group u (all v < u): m = min(v); emit (m, v) for v != m
        plus (m, u)."""
        u, v = _np(t.column("u")), _np(t.column("v"))
        real = u >= 0
        u, v = u[real], v[real]
        if not len(u):   # bucket held only sentinel rows
            return pa.table({"a": np.array([_SENT], np.int64),
                             "b": np.array([_SENT], np.int64)})
        order = np.argsort(u, kind="stable")
        u, v = u[order], v[order]
        start = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        counts = np.diff(np.concatenate([start, [len(u)]]))
        m = np.minimum.reduceat(v, start)
        m_row = np.repeat(m, counts)
        keep = v != m_row
        out_a = np.concatenate([m_row[keep], m])
        out_b = np.concatenate([v[keep], u[start]])
        return pa.table({"a": np.concatenate([out_a, [_SENT]]),
                         "b": np.concatenate([out_b, [_SENT]])})

    _K1, _K2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)

    def _signature(ds: rd.Dataset) -> tuple:
        """Commutative edge-set signature: (count, wrapping uint64 mix
        sum). Block partials ship as 32-bit halves so int64 columns never
        overflow; the driver folds block-count-sized rows."""
        def part(t: pa.Table) -> pa.Table:
            a, b = _ab(t)
            real = a >= 0
            a, b = a[real], b[real]
            mix = (a.astype(np.uint64) * _K1 + b.astype(np.uint64) * _K2)
            # numpy unsigned sums wrap mod 2^64 — exactly the fold we want
            s = mix.sum(dtype=np.uint64) if len(mix) else np.uint64(0)
            return pa.table({"cnt": pa.array([len(a)], pa.int64()),
                             "hi": pa.array([int(s >> np.uint64(32))],
                                            pa.int64()),
                             "lo": pa.array([int(s & np.uint64(0xFFFFFFFF))],
                                            pa.int64())})

        rows = ds.map_batches(part, batch_format="pyarrow").take_all()
        cnt = sum(r["cnt"] for r in rows)
        mix = sum(((r["hi"] << 32) | r["lo"]) for r in rows) % (1 << 64)
        return (cnt, mix)

    sig = _signature(state)
    converged = False
    for _ in range(max_iters):
        ls = _dedup(bucketed_group_agg(
            state.map_batches(ls_rows, batch_format="pyarrow"),
            lambda t: t, "u", large_star, num_buckets=num_buckets))
        state = _dedup(bucketed_group_agg(
            ls.map_batches(ss_rows, batch_format="pyarrow"),
            lambda t: t, "u", small_star,
            num_buckets=num_buckets)).materialize()
        new_sig = _signature(state)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        import logging

        logging.getLogger("raykg").warning(
            "connected_components_star: star contraction did not reach "
            "its fixpoint within %d rounds; raise max_iters", max_iters)

    # star forest: every edge (root, child); roots also map to themselves
    def emit(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        real = a >= 0
        a, b = a[real], b[real]
        return pa.table({"node": np.concatenate([b, a, [_SENT]]),
                         "component": np.concatenate([a, a, [_SENT]])})

    def fin(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        comp = _np(t.column("component"))
        real = node >= 0
        node, comp = node[real], comp[real]
        if not len(node):   # bucket held only sentinel rows
            return pa.table({"node": pa.array([], pa.int64()),
                             "component": pa.array([], pa.int64())})
        order = np.argsort(node, kind="stable")
        node, comp = node[order], comp[order]
        start = np.flatnonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))
        return pa.table({"node": node[start],
                         "component": np.minimum.reduceat(comp, start)})

    return bucketed_group_agg(state, emit, "node", fin,
                              num_buckets=num_buckets)


def kcore(edges: rd.Dataset, k: int = 3, max_rounds: int = 16,
          num_buckets: int = 256) -> rd.Dataset:
    """(node, deg): the k-core of the UNDIRECTED simple graph underlying
    ``edges`` — the maximal subgraph in which every node keeps degree
    >= k — with each surviving node's degree inside the core. The
    density/cohesion filter of graph curation (spam farms peel away,
    tight communities survive).

    Distributed synchronous peeling, three bucketed exchanges per round
    and nothing node- or edge-sized on the driver:

    1. degree count over the current edge set (endpoint explode ->
       node-keyed sum); the same aggregate emits the distributed
       ``dead`` count for the fixpoint test;
    2./3. one membership-masked attach per endpoint column (bfs_depths'
       idiom): survivor marker rows and edge rows hash into the same
       bucket; an edge survives iff its key endpoint finds a marker.

    Each round's edge set is materialized into the object store (the
    peeling recurrence needs it twice); the set only ever shrinks. A
    node removed in round r can lower neighbors below k only in round
    r+1, so convergence takes exactly peel-depth rounds;
    exhausting ``max_rounds`` logs a warning and returns the partially
    peeled degrees (both the engine and the unrolled SQL twin then ran
    exactly the same ``max_rounds`` peels, so they still agree)."""
    import logging

    def _ab(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        return _np(t.column("a")), _np(t.column("b"))

    def canon(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            a, b = a[first], b[first]
        route = ((a.astype(np.uint64) * np.uint64(2654435761)
                  + b.astype(np.uint64))
                 & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return pa.table({"a": np.concatenate([a, [_SENT]]),
                         "b": np.concatenate([b, [_SENT]]),
                         "ph": np.concatenate([route, [_SENT]])})

    def distinct(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        real = a >= 0
        a, b = a[real], b[real]
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            a, b = a[first], b[first]
        return pa.table({"a": np.concatenate([a, [_SENT]]),
                         "b": np.concatenate([b, [_SENT]])})

    und = bucketed_group_agg(edges, canon, "ph", distinct,
                             num_buckets=num_buckets).materialize()

    def deg_combine(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        real = a >= 0
        node, cnt = np.unique(np.concatenate([a[real], b[real]]),
                              return_counts=True)
        return pa.table({
            "node": np.concatenate([node, [_SENT]]),
            "cnt": np.concatenate([cnt.astype(np.int64), [0]])})

    def deg_fin(t: pa.Table) -> pa.Table:
        node, cnt = _np(t.column("node")), _np(t.column("cnt"))
        order = np.argsort(node, kind="stable")
        node, cnt = node[order], cnt[order]
        start = np.flatnonzero(np.concatenate(
            ([True], node[1:] != node[:-1])))
        uniq = node[start]
        deg = np.add.reduceat(cnt, start)
        dead = ((deg < k) & (uniq >= 0)).astype(np.int64)
        return pa.table({"node": uniq, "deg": deg, "dead": dead})

    def degrees(e: rd.Dataset) -> rd.Dataset:
        return bucketed_group_agg(e, deg_combine, "node", deg_fin,
                                  num_buckets=num_buckets).materialize()

    def _filter_on(e: rd.Dataset, surv: rd.Dataset, col: str) -> rd.Dataset:
        def edge_rows(t: pa.Table) -> pa.Table:
            a, b = _ab(t)
            real = a >= 0
            a, b = a[real], b[real]
            key = a if col == "a" else b
            return pa.table({
                "key": np.concatenate([key, [_SENT]]),
                "a": np.concatenate([a, [_SENT]]),
                "b": np.concatenate([b, [_SENT]]),
                "is_node": np.zeros(len(a) + 1, np.int8)})

        def surv_rows(t: pa.Table) -> pa.Table:
            node = _np(t.column("node"))
            return pa.table({
                "key": np.concatenate([node, [_SENT]]),
                "a": np.full(len(node) + 1, _SENT, np.int64),
                "b": np.full(len(node) + 1, _SENT, np.int64),
                "is_node": np.concatenate(
                    [np.ones(len(node), np.int8), [0]])})

        def keep_member(t: pa.Table) -> pa.Table:
            key = _np(t.column("key"))
            a, b = _ab(t)
            is_node = _np(t.column("is_node"))
            marker = np.unique(key[(is_node == 1) & (key >= 0)])
            ea, eb, ek = a[is_node == 0], b[is_node == 0], \
                key[is_node == 0]
            real = ea >= 0
            ea, eb, ek = ea[real], eb[real], ek[real]
            if len(marker) and len(ea):
                idx = np.searchsorted(marker, ek)
                idx[idx >= len(marker)] = len(marker) - 1
                hit = marker[idx] == ek
                ea, eb = ea[hit], eb[hit]
            else:
                ea = np.empty(0, np.int64)
                eb = np.empty(0, np.int64)
            return pa.table({"a": np.concatenate([ea, [_SENT]]),
                             "b": np.concatenate([eb, [_SENT]])})

        return bucketed_group_agg(
            e.map_batches(edge_rows, batch_format="pyarrow")
            .union(surv.map_batches(surv_rows, batch_format="pyarrow")),
            lambda t: t, "key", keep_member, num_buckets=num_buckets)

    def surv_nodes(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t.column("dead"), 0),
                       pc.greater_equal(t.column("node"), 0))
        return t.filter(keep).select(["node"])

    state = None
    for _ in range(max_rounds):
        state = degrees(und)
        if not state.sum("dead"):
            break
        surv = state.map_batches(surv_nodes, batch_format="pyarrow")
        und = _filter_on(_filter_on(und, surv, "a"), surv, "b") \
            .materialize()
    else:
        logging.getLogger("raykg").warning(
            "kcore: max_rounds=%d exhausted before the peel converged — "
            "returning the partially peeled degrees", max_rounds)
        state = degrees(und)

    def emit(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(t.column("node"), 0)
        return t.filter(keep).select(["node", "deg"])

    return state.map_batches(emit, batch_format="pyarrow")


def label_propagation(edges: rd.Dataset, rounds: int = 4,
                      num_buckets: int = 256) -> rd.Dataset:
    """(node, community): synchronous majority label propagation over
    the undirected simple graph underlying ``edges`` — the classic
    near-linear community detector (Raghavan et al. 2007). Labels start
    as node ids; each round, every node adopts the most frequent label
    among its neighbors' previous-round labels, ties -> smallest label.
    Runs EXACTLY ``rounds`` rounds (no early exit), so the unrolled
    DuckDB twin replays byte-identical rounds; all-integer state keeps
    the parity bit-exact. Isolated nodes don't occur in an edge list,
    so every node has >= 1 neighbor and always receives offers.

    Two bucketed exchanges per round, nothing node-sized on the driver:
    1. nbr-keyed ATTACH (skipped in round 1, where lab0(v) = v makes
       the neighbor's label just the neighbor id): state rows and
       (nbr, node) rows hash by the neighbor; a sorted ``searchsorted``
       hands each edge endpoint its neighbor's label;
    2. node-keyed MAJORITY: per-(node, lab) run-length counts via one
       lexsort + ``diff`` on segment starts, then argmax with the
       smallest-label tie-break via a second lexsort — no per-group
       Python."""
    def _ab(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        return _np(t.column("a")), _np(t.column("b"))

    def canon(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            a, b = a[first], b[first]
        route = ((a.astype(np.uint64) * np.uint64(2654435761)
                  + b.astype(np.uint64))
                 & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        return pa.table({"a": np.concatenate([a, [_SENT]]),
                         "b": np.concatenate([b, [_SENT]]),
                         "ph": np.concatenate([route, [_SENT]])})

    def distinct(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        real = a >= 0
        a, b = a[real], b[real]
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        if len(a):
            first = np.concatenate(
                ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
            a, b = a[first], b[first]
        return pa.table({"a": np.concatenate([a, [_SENT]]),
                         "b": np.concatenate([b, [_SENT]])})

    und = bucketed_group_agg(edges, canon, "ph", distinct,
                             num_buckets=num_buckets).materialize()

    def nb_rows(t: pa.Table) -> pa.Table:
        a, b = _ab(t)
        real = a >= 0
        a, b = a[real], b[real]
        return pa.table({
            "node": np.concatenate([a, b, [_SENT]]),
            "nbr": np.concatenate([b, a, [_SENT]])})

    nb = und.map_batches(nb_rows, batch_format="pyarrow").materialize()

    def majority(t: pa.Table) -> pa.Table:
        node, lab = _np(t.column("node")), _np(t.column("lab"))
        real = node >= 0
        node, lab = node[real], lab[real]
        if not len(node):
            return pa.table({"node": np.array([_SENT], np.int64),
                             "lab": np.array([_SENT], np.int64)})
        order = np.lexsort((lab, node))
        node, lab = node[order], lab[order]
        pstart = np.flatnonzero(np.concatenate(
            ([True], (node[1:] != node[:-1]) | (lab[1:] != lab[:-1]))))
        cnt = np.diff(np.concatenate([pstart, [len(node)]]))
        pn, pl = node[pstart], lab[pstart]
        sel = np.lexsort((pl, -cnt, pn))
        pn, pl = pn[sel], pl[sel]
        nstart = np.flatnonzero(np.concatenate(
            ([True], pn[1:] != pn[:-1])))
        return pa.table({
            "node": np.concatenate([pn[nstart], [_SENT]]),
            "lab": np.concatenate([pl[nstart], [_SENT]])})

    def nbr_key_rows(t: pa.Table) -> pa.Table:
        node, nbr = _np(t.column("node")), _np(t.column("nbr"))
        return pa.table({
            "key": nbr,
            "node": node,
            "lab": np.zeros(len(node), np.int64),
            "is_state": np.zeros(len(node), np.int8)})

    def state_key_rows(t: pa.Table) -> pa.Table:
        node, lab = _np(t.column("node")), _np(t.column("lab"))
        return pa.table({
            "key": node,
            "node": np.full(len(node), _SENT, np.int64),
            "lab": lab,
            "is_state": np.ones(len(node), np.int8)})

    def attach(t: pa.Table) -> pa.Table:
        key, node = _np(t.column("key")), _np(t.column("node"))
        lab, st = _np(t.column("lab")), _np(t.column("is_state"))
        real = key >= 0
        key, node, lab, st = key[real], node[real], lab[real], st[real]
        is_s = st == 1
        skey, slab = key[is_s], lab[is_s]
        order = np.argsort(skey, kind="stable")
        skey, slab = skey[order], slab[order]
        ekey, enode = key[~is_s], node[~is_s]
        if len(skey) and len(ekey):
            idx = np.searchsorted(skey, ekey)
            idx[idx >= len(skey)] = len(skey) - 1
            hit = skey[idx] == ekey
            off_n, off_l = enode[hit], slab[idx[hit]]
        else:
            off_n = np.empty(0, np.int64)
            off_l = np.empty(0, np.int64)
        return pa.table({"node": np.concatenate([off_n, [_SENT]]),
                         "lab": np.concatenate([off_l, [_SENT]])})

    state: rd.Dataset | None = None
    for _ in range(rounds):
        if state is None:
            # round 1: lab0(v) = v, so the neighbor's label IS its id
            offers = nb.map_batches(
                lambda t: pa.table({"node": t.column("node"),
                                    "lab": t.column("nbr")}),
                batch_format="pyarrow")
        else:
            offers = bucketed_group_agg(
                nb.map_batches(nbr_key_rows, batch_format="pyarrow")
                .union(state.map_batches(state_key_rows,
                                         batch_format="pyarrow")),
                lambda t: t, "key", attach, num_buckets=num_buckets)
        state = bucketed_group_agg(offers, lambda t: t, "node", majority,
                                   num_buckets=num_buckets).materialize()

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("node"), 0))
        return pa.table({"node": t.column("node"),
                         "community": t.column("lab")})

    return state.map_batches(fin, batch_format="pyarrow")


def negative_samples(edges: rd.Dataset, n_nodes: int, per_node: int = 3,
                     draws: int = 8, seed: int = 42,
                     num_buckets: int = 256) -> rd.Dataset:
    """(src, neg_dst, j): deterministic negative edge sampling for
    link-prediction training — for every node that appears as an edge
    endpoint, up to ``per_node`` uniform non-neighbors drawn by sha
    (draw j of node v proposes dst = sha('neg|seed|v|j') % n_nodes;
    self-loops and existing DIRECTED edges are rejected, duplicates
    keep their smallest j, survivors keep the ``per_node`` smallest j).
    Deterministic and reshard-stable, so a resumed training run re-draws
    the exact negative set — the property random.choice cannot give.

    Three bucketed exchanges, nothing node- or edge-sized on the driver:
    1. distinct endpoint nodes (node-keyed);
    2. membership anti-join of the candidate stream against the edge
       set on the packed pair key (requires ids < 2^31, checked — the
       same envelope as triangle_counts);
    3. per-src rank-and-keep (src-keyed sorted-segment pass)."""
    edges = edges.materialize()

    def node_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        if np.concatenate([src, dst, [0]]).max() >= (1 << 31) or \
                n_nodes > (1 << 31):
            raise ValueError("negative_samples packs pairs as "
                             "src * 2^31 + dst; ids must be < 2^31")
        node = np.unique(np.concatenate([src, dst]))
        return pa.table({"node": np.concatenate([node, [_SENT]])})

    def node_fin(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        node = np.unique(node[node >= 0])
        return pa.table({"node": np.concatenate([node, [_SENT]])})

    nodes = bucketed_group_agg(edges, node_rows, "node", node_fin,
                               num_buckets=num_buckets)

    # candidate + edge rows meet on the packed pair key
    def cand_rows(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        node = node[node >= 0]
        pks, srcs, dsts, js = [_SENT], [_SENT], [_SENT], [0]
        for v in node.tolist():
            for j in range(draws):
                c = int(sha_hex(f"neg|{seed}|{v}|{j}")[:8], 16) % n_nodes
                if c == v:
                    continue
                pks.append(v * (1 << 31) + c)
                srcs.append(v)
                dsts.append(c)
                js.append(j)
        return pa.table({"pk": pa.array(pks, pa.int64()),
                         "src": pa.array(srcs, pa.int64()),
                         "dst": pa.array(dsts, pa.int64()),
                         "j": pa.array(js, pa.int64()),
                         "is_edge": pa.array([0] * len(pks), pa.int8())})

    def edge_pk_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        pk = src * (1 << 31) + dst
        n = len(pk)
        return pa.table({"pk": np.concatenate([pk, [_SENT]]),
                         "src": np.concatenate([src, [_SENT]]),
                         "dst": np.concatenate([dst, [_SENT]]),
                         "j": np.zeros(n + 1, np.int64),
                         "is_edge": np.ones(n + 1, np.int8)})

    def anti(t: pa.Table) -> pa.Table:
        pk, st = _np(t.column("pk")), _np(t.column("is_edge"))
        real = pk >= 0
        pk, st = pk[real], st[real]
        src = _np(t.column("src"))[real]
        dst = _np(t.column("dst"))[real]
        j = _np(t.column("j"))[real]
        edge_pks = np.unique(pk[st == 1])
        is_c = st == 0
        cpk, csrc, cdst, cj = pk[is_c], src[is_c], dst[is_c], j[is_c]
        if len(edge_pks):
            idx = np.searchsorted(edge_pks, cpk)
            idx[idx >= len(edge_pks)] = len(edge_pks) - 1
            keep = edge_pks[idx] != cpk
            csrc, cdst, cj, cpk = (csrc[keep], cdst[keep], cj[keep],
                                   cpk[keep])
        # duplicate draws of the same pair keep their smallest j
        order = np.lexsort((cj, cpk))
        cpk, csrc, cdst, cj = cpk[order], csrc[order], cdst[order], cj[order]
        first = np.concatenate(([True], cpk[1:] != cpk[:-1])) \
            if len(cpk) else np.empty(0, bool)
        return pa.table({
            "src": np.concatenate([csrc[first], [_SENT]]),
            "dst": np.concatenate([cdst[first], [_SENT]]),
            "j": np.concatenate([cj[first], [0]])})

    survivors = bucketed_group_agg(
        nodes.map_batches(cand_rows, batch_format="pyarrow")
        .union(edges.map_batches(edge_pk_rows, batch_format="pyarrow")),
        lambda t: t, "pk", anti, num_buckets=num_buckets)

    def keep_k(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        j = _np(t.column("j"))
        real = src >= 0
        src, dst, j = src[real], dst[real], j[real]
        order = np.lexsort((dst, j, src))
        src, dst, j = src[order], dst[order], j[order]
        start = np.flatnonzero(np.concatenate(
            ([True], src[1:] != src[:-1]))) if len(src) else \
            np.empty(0, np.int64)
        rank = np.arange(len(src)) - np.repeat(
            start, np.diff(np.concatenate([start, [len(src)]])))
        keep = rank < per_node
        return pa.table({
            "src": np.concatenate([src[keep], [_SENT]]),
            "neg_dst": np.concatenate([dst[keep], [_SENT]]),
            "j": np.concatenate([j[keep], [0]])})

    ranked = bucketed_group_agg(survivors, lambda t: t, "src", keep_k,
                                num_buckets=num_buckets)

    def fin(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("src"), 0))

    return ranked.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic random walks (DeepWalk-style corpus generation)
# ---------------------------------------------------------------------------

def random_walks(edges: rd.Dataset, walk_len: int = 4,
                 walks_per_node: int = 2, seed: int = 42,
                 num_buckets: int = 256) -> rd.Dataset:
    """(start, walk, step, node): DeepWalk-style walk corpus over DIRECTED
    edges — the sentence generator feeding skip-gram node embeddings
    (Perozzi et al. 2014), downstream of KG construction the same way
    label_propagation / pagerank are. Every start node (= every distinct
    edge source) launches ``walks_per_node`` walks; at node v on step s of
    walk (start, r) the walker moves to the rank-th smallest out-neighbor
    of v with rank = sha('walk|seed|start|r|s') % out_deg(v). A walker
    standing on a node with no out-neighbors stops early (its remaining
    steps are simply absent). Every draw is a pure function of
    (seed, start, r, s), so the corpus is reshard/resume-stable and the
    DuckDB twin (unrolled rank-joins against a ROW_NUMBER adjacency CTE)
    is bit-exact.

    Scale shape: ONE src-keyed bucketed exchange per step — adjacency rows
    and frontier rows hash into the same bucket; the per-bucket step is a
    lexsorted adjacency + two searchsorted calls, and the sha draws loop
    over FRONTIER rows only (walk-sized, never edge-sized). Nothing
    node- or edge-sized lands on the driver; per-step frontiers are
    materialized so step k never recomputes steps 0..k-1."""
    edges = edges.materialize()

    def src_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        return pa.table({"node": np.concatenate([np.unique(src), [_SENT]])})

    def src_fin(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        node = np.unique(node[node >= 0])
        return pa.table({"node": np.concatenate([node, [_SENT]])})

    starts = bucketed_group_agg(edges, src_rows, "node", src_fin,
                                num_buckets=num_buckets)

    def frontier0(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        node = node[node >= 0]
        start = np.repeat(node, walks_per_node)
        walk = np.tile(np.arange(walks_per_node, dtype=np.int64), len(node))
        return pa.table({
            "start": np.concatenate([start, [_SENT]]),
            "walk": np.concatenate([walk, [0]]),
            "node": np.concatenate([start, [_SENT]])})

    frontier = starts.map_batches(frontier0,
                                  batch_format="pyarrow").materialize()

    def adj_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        n = len(src)
        return pa.table({"node": np.concatenate([src, [_SENT]]),
                         "dst": np.concatenate([dst, [_SENT]]),
                         "start": np.full(n + 1, _SENT, np.int64),
                         "walk": np.zeros(n + 1, np.int64),
                         "is_adj": np.ones(n + 1, np.int8)})

    adj = edges.map_batches(adj_rows, batch_format="pyarrow").materialize()

    def frontier_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": t.column("node"),
                         "dst": pa.array([_SENT] * n, pa.int64()),
                         "start": t.column("start"),
                         "walk": t.column("walk"),
                         "is_adj": pa.array([0] * n, pa.int8())})

    def make_step(s: int):
        def step_fin(t: pa.Table) -> pa.Table:
            node, dst = _np(t.column("node")), _np(t.column("dst"))
            start, walk = _np(t.column("start")), _np(t.column("walk"))
            is_adj = _np(t.column("is_adj"))
            # adjacency sentinels carry node=-1 and are dropped with the
            # frontier sentinels here; a fresh sentinel is appended below
            a = (is_adj == 1) & (node >= 0)
            f = (is_adj == 0) & (node >= 0)
            anode, adst = node[a], dst[a]
            order = np.lexsort((adst, anode))
            anode, adst = anode[order], adst[order]
            fnode, fstart, fwalk = node[f], start[f], walk[f]
            lo = np.searchsorted(anode, fnode, side="left")
            hi = np.searchsorted(anode, fnode, side="right")
            deg = hi - lo
            alive = deg > 0
            fstart, fwalk = fstart[alive], fwalk[alive]
            lo, deg = lo[alive], deg[alive]
            if len(fstart):
                ranks = np.fromiter(
                    (sha_int(f"walk|{seed}|{st}|{w}|{s}")
                     for st, w in zip(fstart.tolist(), fwalk.tolist())),
                    dtype=np.int64, count=len(fstart)) % deg
                nxt = adst[lo + ranks]
            else:
                nxt = np.empty(0, np.int64)
            return pa.table({
                "start": np.concatenate([fstart, [_SENT]]),
                "walk": np.concatenate([fwalk, [0]]),
                "node": np.concatenate([nxt, [_SENT]])})
        return step_fin

    def with_step(s: int):
        def add(t: pa.Table) -> pa.Table:
            t = t.filter(pc.greater_equal(t.column("start"), 0))
            return t.append_column(
                "step", pa.array([s] * t.num_rows, pa.int64()))
        return add

    outs = [frontier.map_batches(with_step(0), batch_format="pyarrow")]
    for s in range(1, walk_len + 1):
        frontier = bucketed_group_agg(
            adj.union(frontier.map_batches(frontier_rows,
                                           batch_format="pyarrow")),
            lambda t: t, "node", make_step(s),
            num_buckets=num_buckets).materialize()
        outs.append(frontier.map_batches(with_step(s),
                                         batch_format="pyarrow"))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out.select_columns(["start", "walk", "step", "node"])


# ---------------------------------------------------------------------------
# link-prediction scores: common neighbors + Adamic-Adar
# ---------------------------------------------------------------------------

def link_prediction_scores(edges: rd.Dataset, min_cn: int = 2,
                           max_neighbors: int = 128,
                           num_buckets: int = 256) -> rd.Dataset:
    """(u, v, cn, aa, is_edge) for every unordered node pair sharing at
    least ``min_cn`` UNDIRECTED common neighbors: cn = |N(u) ∩ N(v)| and
    aa = Adamic-Adar Σ_w 1/ln(deg(w)) over the common neighbors w
    (Adamic & Adar 2003) — the classic KG link-prediction / missing-edge
    candidate scorer. ``is_edge`` marks pairs already present as an edge
    (either direction), so ``is_edge = 0`` rows are the predictions.

    Wedge enumeration, never all-pairs: one center-keyed exchange builds
    each node w's distinct undirected neighbor set and emits the
    C(deg_w, 2) wedges (u < v) through w; a second pair-keyed exchange
    sums counts/weights per pair and folds in the undirected edge rows for
    the ``is_edge`` flag. Hub guard: a center with more than
    ``max_neighbors`` neighbors is SKIPPED with a loud warning — a
    celebrity node would otherwise emit O(deg^2) wedges (same contract as
    _cap_block in ops/dedup.py); the scores near such hubs are then
    undercounts, raise the cap deliberately if you need them. The SQL twin
    (_link_pred_sql) replicates the SAME cap, so the engine/oracle
    contracts stay aligned when data grows hubs. ``aa`` uses the repo's
    scaled-int64 float contract: each wedge weight is the exact int64
    ``floor((1/ln(deg)) * 1e6)``, summed order-free, with one float
    division + round(.., 4) at finalize (cf. neighbor_embedding_mean)."""
    edges = edges.materialize()

    def nbr_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        w = np.concatenate([src, dst])
        u = np.concatenate([dst, src])
        pk = np.unique(w * _SHIFT + u)        # in-batch dedup
        return pa.table({"w": np.concatenate([pk // _SHIFT, [_SENT]]),
                         "u": np.concatenate([pk % _SHIFT, [_SENT]])})

    def wedge_fin(t: pa.Table) -> pa.Table:
        w, u = _np(t.column("w")), _np(t.column("u"))
        real = w >= 0
        w, u = w[real], u[real]
        pk = np.unique(w * _SHIFT + u)        # distinct neighbor pairs
        w, u = pk // _SHIFT, pk % _SHIFT
        seg = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1]))) \
            if len(w) else np.empty(0, np.int64)
        seglen = np.diff(np.concatenate([seg, [len(w)]])).astype(np.int64)
        capped = int((seglen > max_neighbors).sum())
        if capped:
            import logging

            logging.getLogger("raykg").warning(
                "link_prediction_scores: %d center node(s) exceed "
                "max_neighbors=%d and were skipped — pair scores through "
                "those hubs are undercounted; raise max_neighbors to "
                "include them", capped, max_neighbors)
        pks, us, vs, ws = [np.empty(0, np.int64)], [np.empty(0, np.int64)], \
            [np.empty(0, np.int64)], [np.empty(0, np.int64)]
        for i, s0 in enumerate(seg.tolist()):
            d = int(seglen[i])
            if d < 2 or d > max_neighbors:
                continue
            nbrs = u[s0:s0 + d]               # already ascending
            ia, ib = np.triu_indices(d, k=1)
            uu, vv = nbrs[ia], nbrs[ib]
            pks.append(uu * _SHIFT + vv)
            us.append(uu)
            vs.append(vv)
            w_int = np.int64(np.floor((1.0 / np.log(float(d))) * 1e6))
            ws.append(np.full(len(uu), w_int, np.int64))
        pk2 = np.concatenate(pks)
        n = len(pk2)
        return pa.table({
            "pk": np.concatenate([pk2, [_SENT]]),
            "u": np.concatenate([np.concatenate(us), [_SENT]]),
            "v": np.concatenate([np.concatenate(vs), [_SENT]]),
            "c": np.concatenate([np.ones(n, np.int64), [0]]),
            "wt": np.concatenate([np.concatenate(ws), [0]]),
            "is_edge": np.zeros(n + 1, np.int64)})

    wedges = bucketed_group_agg(edges, nbr_rows, "w", wedge_fin,
                                num_buckets=num_buckets)

    def edge_pair_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        pk = np.unique(a * _SHIFT + b)
        n = len(pk)
        return pa.table({
            "pk": np.concatenate([pk, [_SENT]]),
            "u": np.concatenate([pk // _SHIFT, [_SENT]]),
            "v": np.concatenate([pk % _SHIFT, [_SENT]]),
            "c": np.zeros(n + 1, np.int64),
            "wt": np.zeros(n + 1, np.int64),
            "is_edge": np.concatenate([np.ones(n, np.int64),
                                        [0]])})

    def score_fin(t: pa.Table) -> pa.Table:
        pk, c = _np(t.column("pk")), _np(t.column("c"))
        wt, ie = _np(t.column("wt")), _np(t.column("is_edge"))
        real = pk >= 0
        pk, c, wt, ie = pk[real], c[real], wt[real], ie[real]
        # group by pk; the scaled-int64 wt sum is order-free
        order = np.argsort(pk, kind="stable")
        pk, c, wt, ie = pk[order], c[order], wt[order], ie[order]
        seg = np.flatnonzero(np.concatenate(([True], pk[1:] != pk[:-1]))) \
            if len(pk) else np.empty(0, np.int64)
        cn = np.add.reduceat(c, seg) if len(seg) else np.empty(0, np.int64)
        aa = (np.add.reduceat(wt, seg) if len(seg) else
              np.empty(0, np.int64)).astype(np.float64) / 1e6
        edge_flag = (np.maximum.reduceat(ie, seg) if len(seg) else
                     np.empty(0, np.int8)).astype(np.int64)
        upk = pk[seg]
        keep = cn >= min_cn
        upk, cn, aa, edge_flag = (upk[keep], cn[keep], aa[keep],
                                  edge_flag[keep])
        return pa.table({
            "u": np.concatenate([upk // _SHIFT, [_SENT]]),
            "v": np.concatenate([upk % _SHIFT, [_SENT]]),
            "cn": np.concatenate([cn, [0]]),
            "aa": np.concatenate([round_half_away(aa, 4), [0.0]]),
            "is_edge": np.concatenate([edge_flag, [0]])})

    scored = bucketed_group_agg(
        wedges.union(edges.map_batches(edge_pair_rows,
                                       batch_format="pyarrow")),
        lambda t: t, "pk", score_fin, num_buckets=num_buckets)

    def fin(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("u"), 0))

    return scored.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# GraphSAGE-style 1-hop neighbor feature aggregation (graph × embeddings)
# ---------------------------------------------------------------------------

EMB_SCALE = 1_000_000.0  # float32 component -> exact int64: floor(v * 1e6)


def neighbor_embedding_mean(edges: rd.Dataset, embeddings: rd.Dataset,
                            num_buckets: int = 256) -> rd.Dataset:
    """Per-dimension mean of each node's out-neighbors' embedding vectors
    -> (node, dim, nbr_mean): the 1-hop feature-aggregation step of
    GraphSAGE-style node enrichment (Hamilton et al. 2017), i.e. the
    "attach neighborhood features to KG nodes" pass that follows graph
    construction (reference scope analog: src2/main/scala/Clustering.scala
    builds the neighborhood; this consumes it).

    Neighbors map onto the embedding table by ``dst % n_vecs`` so the
    synthetic graph's node space composes with any embedding-table size.

    Determinism contract: each float32 component is scaled to an exact
    int64 — ``floor(v * 1e6)`` computed in float64, where float32→float64
    is exact and DuckDB performs the identical IEEE multiply+floor — so the
    neighbor sums are order-free integer arithmetic and the single division
    at finalize is replicated term-for-term by the SQL twin.

    Scale shape: two bucketed exchanges, both edge-bounded and neither
    broadcast. Exchange 1 (key = embedding id) ships (key, src) per edge
    plus each embedding's scaled vector once; a per-bucket sorted
    ``searchsorted`` attach emits (src, qvec) per edge. Exchange 2
    (key = src) is fed by a per-batch combiner that pre-sums vectors per
    distinct src, so it carries (distinct srcs per batch) x (d+1) ints.
    Nothing vector- or edge-sized ever lands on the driver.
    """
    n_vecs = embeddings.count()
    list_t = pa.list_(pa.int64())

    def edge_key_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        n = len(src)
        return pa.table({
            "key": pa.array(dst % np.int64(n_vecs), pa.int64()),
            "src": pa.array(src, pa.int64()),
            "q": pa.array([[]] * n, list_t),
            "is_state": pa.array(np.zeros(n, np.int8), pa.int8())})

    def emb_key_rows(t: pa.Table) -> pa.Table:
        vid = _np(t.column("vec_id"))
        emb = t.column("embedding").combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        # float32 -> float64 is exact; multiply+floor match DuckDB's
        # CAST(floor(CAST(e AS DOUBLE) * 1000000.0) AS BIGINT)
        q = np.floor(flat.astype(np.float64) * EMB_SCALE).astype(np.int64)
        n = len(vid)
        dim = q.size // n if n else 0
        offs = np.arange(0, (n + 1) * dim, dim, dtype=np.int64)
        return pa.table({
            "key": pa.array(vid, pa.int64()),
            "src": pa.array(np.full(n, _SENT, np.int64), pa.int64()),
            "q": pa.ListArray.from_arrays(pa.array(offs, pa.int64()),
                                          pa.array(q, pa.int64())),
            "is_state": pa.array(np.ones(n, np.int8), pa.int8())})

    def attach(t: pa.Table) -> pa.Table:
        key, src = _np(t.column("key")), _np(t.column("src"))
        st = _np(t.column("is_state"))
        q = t.column("q").combine_chunks()
        is_s = st == 1
        skey = key[is_s]
        n_state = int(is_s.sum())
        flat = np.asarray(q.flatten().to_numpy(zero_copy_only=False),
                          np.int64)
        dim = flat.size // n_state if n_state else 0
        # q.flatten() drops empty edge lists, so flat is state-only and
        # row-ordered like the table; select the state rows' matrix
        mat = flat.reshape(n_state, dim) if n_state else \
            np.empty((0, 0), np.int64)
        order = np.argsort(skey, kind="stable")
        skey, mat = skey[order], mat[order] if n_state else mat
        ekey, esrc = key[~is_s], src[~is_s]
        real = esrc >= 0
        ekey, esrc = ekey[real], esrc[real]
        if n_state and len(ekey):
            idx = np.searchsorted(skey, ekey)
            idx[idx >= n_state] = n_state - 1
            hit = skey[idx] == ekey
            out_src = esrc[hit]
            out_mat = mat[idx[hit]]
        else:
            out_src = np.empty(0, np.int64)
            out_mat = np.empty((0, dim), np.int64)
        m = len(out_src)
        offs = np.arange(0, (m + 1) * dim, max(dim, 1), dtype=np.int64) \
            if dim else np.zeros(m + 1, np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([out_src, [_SENT]]), pa.int64()),
            "q": pa.concat_arrays([
                pa.ListArray.from_arrays(pa.array(offs, pa.int64()),
                                         pa.array(out_mat.ravel(),
                                                  pa.int64())),
                pa.array([[]], list_t)]),
            "cnt": pa.array(np.concatenate(
                [np.ones(m, np.int64), [0]]), pa.int64())})

    attached = bucketed_group_agg(
        edges.map_batches(edge_key_rows, batch_format="pyarrow")
        .union(embeddings.map_batches(emb_key_rows,
                                      batch_format="pyarrow")),
        lambda t: t, "key", attach, num_buckets=num_buckets)

    def _seg_sum(src: np.ndarray, mat: np.ndarray, cnt: np.ndarray):
        order = np.argsort(src, kind="stable")
        src, mat, cnt = src[order], mat[order], cnt[order]
        seg = np.flatnonzero(np.concatenate(([True], src[1:] != src[:-1])))
        s = np.add.reduceat(mat, seg, axis=0)
        c = np.add.reduceat(cnt, seg)
        return src[seg], s, c

    def _rows(src, mat, cnt, dim):
        m = len(src)
        offs = np.arange(0, (m + 1) * dim, max(dim, 1), dtype=np.int64) \
            if dim else np.zeros(m + 1, np.int64)
        return pa.table({
            "src": pa.array(np.concatenate([src, [_SENT]]), pa.int64()),
            "q": pa.concat_arrays([
                pa.ListArray.from_arrays(pa.array(offs, pa.int64()),
                                         pa.array(mat.ravel(), pa.int64())),
                pa.array([[]], list_t)]),
            "cnt": pa.array(np.concatenate([cnt, [0]]), pa.int64())})

    def _unpack(t: pa.Table):
        src, cnt = _np(t.column("src")), _np(t.column("cnt"))
        q = t.column("q").combine_chunks()
        real = src >= 0
        n_real = int(real.sum())
        flat = np.asarray(q.flatten().to_numpy(zero_copy_only=False),
                          np.int64)
        dim = flat.size // n_real if n_real else 0
        # sentinel rows carry empty lists, so flatten() yields exactly the
        # real rows' values in row order
        mat = flat.reshape(n_real, dim) if n_real else \
            np.empty((0, 0), np.int64)
        return src[real], mat, cnt[real], dim

    def combine(t: pa.Table) -> pa.Table:
        src, mat, cnt, dim = _unpack(t)
        if not len(src):
            return _rows(np.empty(0, np.int64),
                         np.empty((0, 0), np.int64),
                         np.empty(0, np.int64), 0)
        usrc, s, c = _seg_sum(src, mat, cnt)
        return _rows(usrc, s, c, dim)

    def finalize(t: pa.Table) -> pa.Table:
        src, mat, cnt, dim = _unpack(t)
        if not len(src):
            return pa.table({
                "node": pa.array([_SENT], pa.int64()),
                "dim": pa.array([_SENT], pa.int64()),
                "nbr_mean": pa.array([0.0], pa.float64())})
        usrc, s, c = _seg_sum(src, mat, cnt)
        mean = round_half_away(
            s.astype(np.float64) / (c[:, None].astype(np.float64)
                                    * EMB_SCALE), 6)
        m = len(usrc)
        return pa.table({
            "node": pa.array(np.concatenate(
                [np.repeat(usrc, dim), [_SENT]]), pa.int64()),
            "dim": pa.array(np.concatenate(
                [np.tile(np.arange(dim, dtype=np.int64), m), [_SENT]]),
                pa.int64()),
            "nbr_mean": pa.array(np.concatenate([mean.ravel(), [0.0]]),
                                 pa.float64())})

    agg = bucketed_group_agg(attached, combine, "src", finalize,
                             num_buckets=num_buckets)

    def fin(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("node"), 0))

    return agg.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# entity co-mention edge weights (KG enrichment over the triple stream)
# ---------------------------------------------------------------------------

def _doc_entity_rows(t: pa.Table) -> pa.Table:
    """DISTINCT (doc_id, uri) entity observations in a triples batch:
    every canonical ``obj`` URI plus every non-document ``subj`` URI
    (doc-subject rows contribute their object only). Shared by
    co_mention_edges / co_mention_pmi / cross_modal_alignment-adjacent
    consumers."""
    doc = t.column("doc_id")
    subj, obj = t.column("subj"), t.column("obj")
    base = pa.table({"doc_id": doc, "uri": obj})
    is_ent_subj = pc.invert(pc.starts_with(subj, "sdpg.gr/Document/"))
    subj_rows = pa.table({"doc_id": doc.filter(is_ent_subj),
                          "uri": subj.filter(is_ent_subj)})
    both = pa.concat_tables([base, subj_rows])
    return both.group_by(["doc_id", "uri"]).aggregate([])


def co_mention_edges(triples: rd.Dataset, num_buckets: int = 256,
                     max_doc_entities: int = 256) -> rd.Dataset:
    """Weighted co-mention edges from the flagship triple stream: for every
    unordered pair of canonical entities observed in the same document,
    the number of documents that co-mention them -> (ent_a, ent_b, n_docs)
    with ent_a < ent_b. This is the classic KG-enrichment edge family the
    reference's clustering stage implies (co-occurring labels; reference
    analog src2/main/scala/Clustering.scala's pattern co-grouping) built
    instead from linker output.

    Entity endpoints = every canonical ``obj`` URI plus every non-document
    ``subj`` URI (doc-subject rows contribute their object only).

    Scale shape: two bucketed exchanges. Exchange 1 keys by doc_id; its
    per-batch combiner already reduces to DISTINCT (doc_id, uri) rows, so
    the exchange carries at most (docs x distinct entities per doc), and
    the per-bucket finalize explodes pairs with a per-document loop that is
    bounded by entities-per-doc (spans-per-doc bounded, never corpus-sized;
    ``max_doc_entities`` guards degenerate documents with a logged cap, the
    same discipline as dedup._cap_block). Exchange 2 counts per packed
    string pair key with a per-batch pre-sum. Nothing lands on the driver.
    """
    from itertools import combinations

    ent_rows = _doc_entity_rows

    def pair_fin(t: pa.Table) -> pa.Table:
        t = t.group_by(["doc_id", "uri"]).aggregate([])
        t = t.sort_by([("doc_id", "ascending"), ("uri", "ascending")])
        doc = t.column("doc_id").to_pylist()
        uri = t.column("uri").to_pylist()
        keys: list[str] = []
        n = len(doc)
        i = 0
        while i < n:
            j = i
            while j < n and doc[j] == doc[i]:
                j += 1
            ents = uri[i:j]
            if len(ents) > max_doc_entities:
                import logging
                logging.getLogger("raykg").warning(
                    "co_mention_edges: doc %s has %d entities; capping at "
                    "%d", doc[i], len(ents), max_doc_entities)
                ents = ents[:max_doc_entities]
            for a, b in combinations(ents, 2):
                keys.append(a + "\x1f" + b)
            i = j
        return pa.table({
            "pk": pa.array(keys + [""], pa.string()),
            "n": pa.array([1] * len(keys) + [0], pa.int64())})

    pairs = bucketed_group_agg(
        triples.map_batches(ent_rows, batch_format="pyarrow"),
        lambda t: t, "doc_id", pair_fin, num_buckets=num_buckets)

    def count_comb(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("pk"), ""))
        return t.group_by("pk").aggregate([("n", "sum")]) \
            .rename_columns(["pk", "n"])

    def count_fin(t: pa.Table) -> pa.Table:
        t = t.group_by("pk").aggregate([("n", "sum")])
        pk = t.column("pk").to_pylist()
        n = _np(t.column("n_sum"))
        a = [s.split("\x1f", 1)[0] for s in pk]
        b = [s.split("\x1f", 1)[1] for s in pk]
        return pa.table({
            "ent_a": pa.array(a + [""], pa.string()),
            "ent_b": pa.array(b + [""], pa.string()),
            "n_docs": pa.array(np.concatenate([n, [0]]), pa.int64())})

    counted = bucketed_group_agg(pairs, count_comb, "pk", count_fin,
                                 num_buckets=num_buckets)

    def fin(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("ent_a"), ""))

    return counted.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HITS hubs / authorities (unnormalized integer-exact fixed rounds)
# ---------------------------------------------------------------------------

_HITS_MAX = np.int64(1) << np.int64(60)


def hits(edges: rd.Dataset, iters: int = 3,
         num_buckets: int = 256) -> rd.Dataset:
    """(node, hub_int, auth_int) after ``iters`` synchronous HITS rounds
    (Kleinberg 1999) WITHOUT normalization: h_0 = a_0 = 1 for every
    endpoint node; each round a(v) = Σ h(u) over in-edges (u, v), then
    h(u) = Σ a(v) over out-edges (u, v). Multi-edges count once per
    occurrence. Dropping the per-round norm keeps every value an exact
    int64 — the ranking is identical to normalized HITS after the same
    rounds, and the DuckDB twin reproduces each unrolled round bit-for-bit
    (the same determinism contract as :func:`pagerank`). Values grow by a
    ≤ max_in·max_out factor per round; a loud overflow guard trips at 2^60.

    Fully distributed: per half-round one endpoint-keyed exchange attaches
    the current score to each edge (sorted searchsorted against the
    bucket's state slice) and one node-keyed exchange sums contributions,
    with an all-nodes carrier so scoreless nodes keep an explicit 0 row.
    State lives as a Dataset materialized per half-round; the driver never
    holds a node-sized structure."""
    edges = edges.materialize()
    nodes = degree_stats(edges, num_buckets=num_buckets,
                         _keep_sentinel=True).map_batches(
        lambda t: pa.table({
            "node": t.column("node"),
            "val": pa.array(np.where(_np(t.column("node")) >= 0, 1, 0),
                            pa.int64())}),
        batch_format="pyarrow").materialize()

    def _edge_rows(from_col: str, to_col: str):
        def rows(t: pa.Table) -> pa.Table:
            f, o = _np(t.column(from_col)), _np(t.column(to_col))
            _check_ids(f, o)
            return pa.table({"key": f, "other": o,
                             "val": np.zeros(len(f), np.int64)})
        return rows

    def _state_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t.column("node"),
                         "other": pa.array([_SENT] * t.num_rows, pa.int64()),
                         "val": t.column("val")})

    def _attach(t: pa.Table) -> pa.Table:
        key, other = _np(t.column("key")), _np(t.column("other"))
        val = _np(t.column("val"))
        is_state = other == _SENT
        skey, sval = key[is_state], val[is_state]
        order = np.argsort(skey, kind="stable")
        skey, sval = skey[order], sval[order]
        ekey, eoth = key[~is_state], other[~is_state]
        real = ekey >= 0
        ekey, eoth = ekey[real], eoth[real]
        if len(ekey):
            idx = np.searchsorted(skey, ekey)
            if idx.max() >= len(skey) or \
                    not np.array_equal(skey[idx], ekey):
                raise AssertionError(
                    "hits: edge endpoint missing from state (degree_stats "
                    "must cover all endpoints)")
            out_n, out_v = eoth, sval[idx]
        else:
            out_n = np.empty(0, np.int64)
            out_v = np.empty(0, np.int64)
        return pa.table({"node": np.concatenate([out_n, [_SENT]]),
                         "val": np.concatenate([out_v, [0]])})

    def _carrier(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "val": pa.array([0] * t.num_rows, pa.int64())})

    def _sum_state(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("val", "sum"), ("val", "count"),
                                          ("val", "min"), ("val", "max")])
        g = g.filter(pc.greater_equal(g.column("node"), 0))
        # PRE-summation headroom guard: |sum| <= max|term| * n_terms, both
        # wrap-free aggregates — so a group whose bound stays under 2^62
        # provably did not wrap during the int64 sum. Checking the summed
        # value alone is unsound: a wrapped sum can land back under the
        # threshold (float product can't wrap, unlike the int64 sum).
        bound = np.maximum(np.abs(_np(g.column("val_min"))),
                           np.abs(_np(g.column("val_max")))) \
            .astype(np.float64) * _np(g.column("val_count")) \
            .astype(np.float64)
        v = _np(g.column("val_sum"))
        if len(v) and (bound.max() >= float(np.int64(1) << np.int64(62))
                       or np.abs(v).max() >= _HITS_MAX):
            raise ValueError(
                "hits: unnormalized score exceeds 2^60 — reduce iters "
                "(each round multiplies by up to max_in*max_out)")
        return pa.table({
            "node": np.concatenate([_np(g.column("node")), [_SENT]]),
            "val": np.concatenate([v, [0]])})

    def _half_round(state: rd.Dataset, from_col: str,
                    to_col: str) -> rd.Dataset:
        contrib = bucketed_group_agg(
            edges.map_batches(_edge_rows(from_col, to_col),
                              batch_format="pyarrow")
            .union(state.map_batches(_state_rows, batch_format="pyarrow")),
            lambda t: t, "key", _attach, num_buckets=num_buckets)
        return bucketed_group_agg(
            contrib.union(nodes.map_batches(_carrier,
                                            batch_format="pyarrow")),
            lambda t: t, "node", _sum_state,
            num_buckets=num_buckets).materialize()

    h, a = nodes, nodes
    for _ in range(iters):
        a = _half_round(h, "src", "dst")
        h = _half_round(a, "dst", "src")

    def _h_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"), "hub": t.column("val"),
                         "auth": pa.array([0] * t.num_rows, pa.int64()),
                         "is_h": pa.array([1] * t.num_rows, pa.int8())})

    def _a_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "hub": pa.array([0] * t.num_rows, pa.int64()),
                         "auth": t.column("val"),
                         "is_h": pa.array([0] * t.num_rows, pa.int8())})

    def _zip(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("hub", "sum"), ("auth", "sum")])
        g = g.filter(pc.greater_equal(g.column("node"), 0))
        return pa.table({
            "node": pa.concat_arrays([g.column("node").combine_chunks(),
                                      pa.array([_SENT], pa.int64())]),
            "hub_int": pa.concat_arrays([g.column("hub_sum")
                                         .combine_chunks(),
                                         pa.array([0], pa.int64())]),
            "auth_int": pa.concat_arrays([g.column("auth_sum")
                                          .combine_chunks(),
                                          pa.array([0], pa.int64())])})

    joined = bucketed_group_agg(
        h.map_batches(_h_rows, batch_format="pyarrow")
        .union(a.map_batches(_a_rows, batch_format="pyarrow")),
        lambda t: t, "node", _zip, num_buckets=num_buckets)

    return joined.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0)),
        batch_format="pyarrow")


def cross_modal_alignment(triples: rd.Dataset,
                          num_buckets: int = 256) -> rd.Dataset:
    """Cross-modal consistency over the interleaved corpus: per canonical
    entity, in how many documents it appears on the media side (a
    ``depicts`` triple from an image/audio caption span), on the text side
    (a mention or relation endpoint from a text span), and on BOTH ->
    (uri, n_depicted, n_texted, n_both). n_both is the caption<->text
    agreement signal a multimodal training-data pipeline uses to rank
    image-text pairs (an entity depicted but never discussed — or vice
    versa — is weak supervision).

    Scale shape mirrors :func:`co_mention_edges`: exchange 1 keys by
    doc_id with a per-batch DISTINCT-max combiner (rows bounded by docs x
    distinct entities per doc), exchange 2 keys by entity URI with a
    per-batch pre-sum. No pair explosion at all here, nothing driver-side.
    """
    one = pa.array([1], pa.int64())

    def side_rows(t: pa.Table) -> pa.Table:
        doc, subj = t.column("doc_id"), t.column("subj")
        pred, obj = t.column("pred"), t.column("obj")
        is_dep = pc.equal(pred, "depicts")
        obj_rows = pa.table({
            "doc_id": doc, "uri": obj,
            "dep": pc.cast(is_dep, pa.int64()),
            "txt": pc.cast(pc.invert(is_dep), pa.int64())})
        is_ent_subj = pc.invert(pc.starts_with(subj, "sdpg.gr/Document/"))
        n_s = int(pc.sum(pc.cast(is_ent_subj, pa.int64())).as_py() or 0)
        subj_rows = pa.table({
            "doc_id": doc.filter(is_ent_subj),
            "uri": subj.filter(is_ent_subj),
            "dep": pa.array(np.zeros(n_s, np.int64), pa.int64()),
            "txt": pa.array(np.ones(n_s, np.int64), pa.int64())})
        both = pa.concat_tables([obj_rows, subj_rows])
        return both.group_by(["doc_id", "uri"]).aggregate(
            [("dep", "max"), ("txt", "max")]).rename_columns(
            ["doc_id", "uri", "dep", "txt"])

    def doc_fin(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_id", "uri"]).aggregate(
            [("dep", "max"), ("txt", "max")])
        dep = _np(g.column("dep_max"))
        txt = _np(g.column("txt_max"))
        return pa.table({
            "uri": pa.concat_arrays([g.column("uri").combine_chunks(),
                                     pa.array([""], pa.string())]),
            "dep": pa.array(np.concatenate([dep, [0]]), pa.int64()),
            "txt": pa.array(np.concatenate([txt, [0]]), pa.int64()),
            "both": pa.array(np.concatenate([dep * txt, [0]]), pa.int64())})

    per_doc = bucketed_group_agg(
        triples.map_batches(side_rows, batch_format="pyarrow"),
        lambda t: t, "doc_id", doc_fin, num_buckets=num_buckets)

    def sum_comb(t: pa.Table) -> pa.Table:
        # the "" sentinel rides the exchange (dep/txt/both are all 0 on it)
        # so no combine output is ever zero-row; dropped after finalize
        return t.group_by("uri").aggregate(
            [("dep", "sum"), ("txt", "sum"), ("both", "sum")]) \
            .rename_columns(["uri", "dep", "txt", "both"])

    def sum_fin(t: pa.Table) -> pa.Table:
        g = t.group_by("uri").aggregate(
            [("dep", "sum"), ("txt", "sum"), ("both", "sum")])
        return pa.table({
            "uri": pa.concat_arrays([g.column("uri").combine_chunks(),
                                     pa.array([""], pa.string())]),
            "n_depicted": pa.concat_arrays(
                [g.column("dep_sum").combine_chunks(), one]),
            "n_texted": pa.concat_arrays(
                [g.column("txt_sum").combine_chunks(), one]),
            "n_both": pa.concat_arrays(
                [g.column("both_sum").combine_chunks(), one])})

    counted = bucketed_group_agg(per_doc, sum_comb, "uri", sum_fin,
                                 num_buckets=num_buckets)

    return counted.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("uri"), "")),
        batch_format="pyarrow")


def degree_assortativity(edges: rd.Dataset,
                         num_buckets: int = 256) -> rd.Dataset:
    """One-row (n_edges, sum_x, sum_y, sum_xy, sum_x2, sum_y2, r):
    Pearson correlation over directed edges (u, v) between x = out_deg(u)
    and y = in_deg(v) (out-in degree assortativity, Newman 2002) — do
    hub-authored links point at hubs? A single float expression over six
    exact int64 registers, so the DuckDB twin reproduces r bit-for-bit.

    Scale shape: degree_stats (one node-keyed exchange), then TWO
    endpoint-keyed attach exchanges put (x, y) on every edge, a per-batch
    combiner reduces each batch to ONE register row, and the six registers
    SUM-merge associatively — the final exchange is register-sized
    regardless of edge count. The r expression runs once on the merged
    row."""
    edges = edges.materialize()
    deg = degree_stats(edges, num_buckets=num_buckets,
                       _keep_sentinel=True).materialize()

    def _attach_deg(edge_key: str, deg_col: str, out_col: str,
                    carry: list[str]):
        """Return a Dataset of edges with ``out_col`` = deg_col of the
        node in ``edge_key`` (sorted searchsorted per bucket)."""
        def edge_rows(t: pa.Table) -> pa.Table:
            cols = {"key": t.column(edge_key)}
            for c in carry:
                cols[c] = t.column(c)
            cols["degval"] = pa.array(
                np.full(t.num_rows, -1, np.int64), pa.int64())
            cols["is_state"] = pa.array(
                np.zeros(t.num_rows, np.int8), pa.int8())
            return pa.table(cols)

        def state_rows(t: pa.Table) -> pa.Table:
            cols = {"key": t.column("node")}
            for c in carry:
                cols[c] = pa.array(np.full(t.num_rows, _SENT, np.int64),
                                   pa.int64())
            cols["degval"] = t.column(deg_col)
            cols["is_state"] = pa.array(np.ones(t.num_rows, np.int8),
                                        pa.int8())
            return pa.table(cols)

        def attach(t: pa.Table) -> pa.Table:
            key, st = _np(t.column("key")), _np(t.column("is_state"))
            dv = _np(t.column("degval"))
            is_s = st == 1
            skey, sval = key[is_s], dv[is_s]
            order = np.argsort(skey, kind="stable")
            skey, sval = skey[order], sval[order]
            ekey = key[~is_s]
            real = ekey >= 0
            out = {}
            for c in carry:
                out[c] = _np(t.column(c))[~is_s][real]
            ekey = ekey[real]
            if len(ekey):
                idx = np.searchsorted(skey, ekey)
                if idx.max() >= len(skey) or \
                        not np.array_equal(skey[idx], ekey):
                    raise AssertionError(
                        "degree_assortativity: endpoint missing from "
                        "degree state")
                vals = sval[idx]
            else:
                vals = np.empty(0, np.int64)
            cols = {c: np.concatenate([v, [_SENT]])
                    for c, v in out.items()}
            cols[out_col] = np.concatenate([vals, [_SENT]])
            cols["mark"] = np.concatenate(
                [np.zeros(len(ekey), np.int8), [1]]).astype(np.int8)
            return pa.table(cols)

        return bucketed_group_agg(
            edges_ds.map_batches(edge_rows, batch_format="pyarrow")
            .union(deg.map_batches(state_rows, batch_format="pyarrow")),
            lambda t: t, "key", attach, num_buckets=num_buckets)

    # pass 1: x = out_deg(src), carrying dst; pass 2: y = in_deg(dst)
    edges_ds = edges
    withx = _attach_deg("src", "out_deg", "x", ["dst"]).map_batches(
        lambda t: t.filter(pc.equal(t.column("mark"), 0))
        .drop_columns(["mark"]), batch_format="pyarrow")

    def edge2_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t.column("dst"), "x": t.column("x"),
                         "degval": pa.array(
                             np.full(t.num_rows, -1, np.int64), pa.int64()),
                         "is_state": pa.array(
                             np.zeros(t.num_rows, np.int8), pa.int8())})

    def state2_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t.column("node"),
                         "x": pa.array(np.full(t.num_rows, _SENT, np.int64),
                                       pa.int64()),
                         "degval": t.column("in_deg"),
                         "is_state": pa.array(np.ones(t.num_rows, np.int8),
                                              pa.int8())})

    def attach2(t: pa.Table) -> pa.Table:
        key, st = _np(t.column("key")), _np(t.column("is_state"))
        dv, x = _np(t.column("degval")), _np(t.column("x"))
        is_s = st == 1
        skey, sval = key[is_s], dv[is_s]
        order = np.argsort(skey, kind="stable")
        skey, sval = skey[order], sval[order]
        ekey, ex = key[~is_s], x[~is_s]
        real = (ekey >= 0) & (ex >= 0)
        ekey, ex = ekey[real], ex[real]
        if len(ekey):
            idx = np.searchsorted(skey, ekey)
            if idx.max() >= len(skey) or \
                    not np.array_equal(skey[idx], ekey):
                raise AssertionError(
                    "degree_assortativity: endpoint missing from degree "
                    "state")
            ey = sval[idx]
        else:
            ey = np.empty(0, np.int64)
        # reduce this bucket to ONE register row right here
        return pa.table({
            "n": pa.array([len(ekey)], pa.int64()),
            "sx": pa.array([int(ex.sum())], pa.int64()),
            "sy": pa.array([int(ey.sum())], pa.int64()),
            "sxy": pa.array([int((ex * ey).sum())], pa.int64()),
            "sx2": pa.array([int((ex * ex).sum())], pa.int64()),
            "sy2": pa.array([int((ey * ey).sum())], pa.int64())})

    regs = bucketed_group_agg(
        withx.map_batches(edge2_rows, batch_format="pyarrow")
        .union(deg.map_batches(state2_rows, batch_format="pyarrow")),
        lambda t: t, "key", attach2, num_buckets=num_buckets)

    def fin(t: pa.Table) -> pa.Table:
        n = int(pc.sum(t.column("n")).as_py() or 0)
        sx = int(pc.sum(t.column("sx")).as_py() or 0)
        sy = int(pc.sum(t.column("sy")).as_py() or 0)
        sxy = int(pc.sum(t.column("sxy")).as_py() or 0)
        sx2 = int(pc.sum(t.column("sx2")).as_py() or 0)
        sy2 = int(pc.sum(t.column("sy2")).as_py() or 0)
        # same DOUBLE expression as the SQL twin, term for term
        num = float(n * sxy - sx * sy)
        den = float(np.sqrt(float(n * sx2 - sx * sx))
                    * np.sqrt(float(n * sy2 - sy * sy)))
        r = round_half_away(num / den, 6) if den != 0.0 else 0.0
        return pa.table({
            "n_edges": pa.array([n], pa.int64()),
            "sum_x": pa.array([sx], pa.int64()),
            "sum_y": pa.array([sy], pa.int64()),
            "sum_xy": pa.array([sxy], pa.int64()),
            "sum_x2": pa.array([sx2], pa.int64()),
            "sum_y2": pa.array([sy2], pa.int64()),
            "r": pa.array([r], pa.float64())})

    # registers merge associatively; the scalar step sees 6 ints per bucket
    return regs.repartition(1).map_batches(fin, batch_format="pyarrow",
                                           batch_size=None)


def reciprocity(edges: rd.Dataset, num_buckets: int = 256) -> rd.Dataset:
    """One-row (n_edges, n_reciprocal, reciprocity): over the DISTINCT
    directed edge set (self-loops dropped), how many edges have their
    reverse present — the link-symmetry diagnostic (citation graphs ~0,
    social graphs high). reciprocity = round(n_reciprocal / n_edges, 6).

    Scale shape: one exchange on the packed UNORDERED pair key (the
    kg_edges int64 trick, ids < 2^31 enforced by _check_ids' packing
    guard in triangle_counts — here enforced directly); the per-bucket
    finalize counts, per distinct unordered pair, how many distinct
    directions exist (1 or 2), emitting three int64 registers per bucket
    that SUM-merge. Multi-edges collapse first inside a per-batch
    combiner, so the exchange is bounded by distinct edges per batch."""
    def comb(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        if (src >= (1 << 31)).any() or (dst >= (1 << 31)).any():
            raise ValueError("reciprocity: node ids must be < 2^31 "
                             "(packed-pair key)")
        keep = src != dst
        src, dst = src[keep], dst[keep]
        a, b = np.minimum(src, dst), np.maximum(src, dst)
        pk = a * _SHIFT + b
        rev = (src > dst).astype(np.int64)   # direction bit
        key = pk * 2 + rev                   # distinct directed edge id
        key = np.unique(key)
        return pa.table({"pk": pa.array(key // 2, pa.int64()),
                         "dirbit": pa.array(key % 2, pa.int64())})

    def fin(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        dirbit = _np(t.column("dirbit"))
        key = pk * 2 + dirbit
        key = np.unique(key)                 # distinct directed edges
        upk = key // 2
        pstart = np.flatnonzero(np.concatenate(
            ([True], upk[1:] != upk[:-1]))) if len(upk) else \
            np.empty(0, np.int64)
        ndirs = np.diff(np.concatenate([pstart, [len(upk)]])) \
            if len(upk) else np.empty(0, np.int64)
        n_edges = int(ndirs.sum())
        n_recip = int((ndirs * (ndirs == 2)).sum())
        return pa.table({"n_edges": pa.array([n_edges], pa.int64()),
                         "n_reciprocal": pa.array([n_recip], pa.int64())})

    regs = bucketed_group_agg(edges, comb, "pk", fin,
                              num_buckets=num_buckets)

    def total(t: pa.Table) -> pa.Table:
        n = int(pc.sum(t.column("n_edges")).as_py() or 0)
        r = int(pc.sum(t.column("n_reciprocal")).as_py() or 0)
        ratio = round_half_away(r / n, 6) if n else 0.0
        return pa.table({"n_edges": pa.array([n], pa.int64()),
                         "n_reciprocal": pa.array([r], pa.int64()),
                         "reciprocity": pa.array([ratio], pa.float64())})

    return regs.repartition(1).map_batches(total, batch_format="pyarrow",
                                           batch_size=None)


def edge_weights(t: pa.Table, seed: int = 42, mod: int = 9) -> np.ndarray:
    """Deterministic per-edge weight 1 + sha('gw|seed|src|dst') % mod —
    the same sha-threshold idiom as synth_graph_edges, so DuckDB
    regenerates every weight exactly."""
    src, dst = _np(t.column("src")), _np(t.column("dst"))
    return np.fromiter(
        (1 + sha_int(f"gw|{seed}|{s}|{d}") % mod
         for s, d in zip(src.tolist(), dst.tolist())),
        dtype=np.int64, count=len(src))


def sssp_weighted(edges: rd.Dataset, source: int = 0, max_dist: int = 48,
                  num_buckets: int = 256, seed: int = 42,
                  weight_mod: int = 9) -> rd.Dataset:
    """(node, dist) = cost-bounded single-source shortest paths over
    DIRECTED edges with deterministic integer weights (1..weight_mod via
    :func:`edge_weights`): synchronous min-plus Bellman-Ford run to
    fixpoint, keeping only nodes whose shortest distance is <= max_dist.
    The budget makes the semantics finitely SQL-expressible (every prefix
    of an optimal path is <= its total, so truncating offers above the
    budget loses exactly the nodes outside it) — the DuckDB twin is a
    recursive walk whose accumulated distance strictly increases per hop
    and is bounded by the same budget, hence terminates.

    Same distributed frontier shape as :func:`bfs_depths` — one fused
    bucketed exchange per round (:func:`_frontier_min`), with the budget
    applied at offer emission; weights >= 1 bound the rounds by max_dist.
    All-integer -> bit-exact twin."""
    state, converged = _frontier_min(
        edges, source, max_rounds=max_dist + 2, num_buckets=num_buckets,
        weight_fn=lambda t: edge_weights(t, seed=seed, mod=weight_mod),
        budget=max_dist)
    if not converged:
        import logging
        logging.getLogger("raykg").warning(
            "sssp_weighted: no fixpoint after %d rounds", max_dist + 2)

    return state.map_batches(
        lambda t: t.rename_columns(["node", "dist"]),
        batch_format="pyarrow")


def clustering_coefficient(edges: rd.Dataset,
                           num_buckets: int = 256) -> rd.Dataset:
    """(node, deg, n_triangles, coeff) over the UNDIRECTED simple graph:
    local clustering coefficient C(v) = 2T(v) / (deg(v) * (deg(v) - 1))
    (Watts-Strogatz 1998), 0 for deg < 2 — how clique-like each node's
    neighborhood is. Composes two already-exact primitives: triangle
    counts from :func:`triangle_counts` and the undirected simple degree,
    joined by one node-keyed tag exchange; the single float division is
    replicated term-for-term by the twin.

    Scale shape: the triangle plan's bounds (sqrt(m) orientation) carry
    over; the degree pass is one distinct-pair exchange + one endpoint
    count; the join ships (node, deg) + (node, T) rows only."""
    edges = edges.materialize()
    tri = triangle_counts(edges, num_buckets=num_buckets)

    # undirected simple degree: distinct canonical pairs, then endpoints
    def pair_comb(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        if (src >= (1 << 31)).any() or (dst >= (1 << 31)).any():
            raise ValueError("clustering_coefficient: node ids must be "
                             "< 2^31 (packed-pair key)")
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        pk = np.unique(a * _SHIFT + b)
        return pa.table({"pk": pa.array(pk, pa.int64())})

    def pair_fin(t: pa.Table) -> pa.Table:
        pk = np.unique(_np(t.column("pk")))
        return pa.table({"node": np.concatenate(
            [pk // _SHIFT, pk % _SHIFT, [_SENT]]).astype(np.int64)})

    endpoints = bucketed_group_agg(edges, pair_comb, "pk", pair_fin,
                                   num_buckets=num_buckets)

    def deg_comb(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        node = node[node >= 0]
        un, cnt = np.unique(node, return_counts=True)
        return pa.table({"node": pa.array(np.concatenate([un, [_SENT]]),
                                          pa.int64()),
                         "deg": pa.array(np.concatenate([cnt, [0]]),
                                         pa.int64()),
                         "tri": pa.array(np.zeros(len(un) + 1, np.int64),
                                         pa.int64())})

    def tri_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "deg": pa.array([0] * t.num_rows, pa.int64()),
                         "tri": t.column("n_triangles")})

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("deg", "sum"), ("tri", "sum")])
        g = g.filter(pc.greater_equal(g.column("node"), 0))
        node = _np(g.column("node"))
        deg = _np(g.column("deg_sum"))
        tri_n = _np(g.column("tri_sum"))
        # a node can only appear via the degree pass (deg >= 1 always);
        # same single-expression arithmetic as the SQL twin
        with np.errstate(divide="ignore", invalid="ignore"):
            coeff = np.where(
                deg >= 2,
                round_half_away((2.0 * tri_n)
                                / (deg * (deg - 1)).astype(np.float64), 6),
                0.0)
        return pa.table({
            "node": pa.array(np.concatenate([node, [_SENT]]), pa.int64()),
            "deg": pa.array(np.concatenate([deg, [0]]), pa.int64()),
            "n_triangles": pa.array(np.concatenate([tri_n, [0]]),
                                    pa.int64()),
            "coeff": pa.array(np.concatenate([coeff, [0.0]]),
                              pa.float64())})

    joined = bucketed_group_agg(
        endpoints.map_batches(deg_comb, batch_format="pyarrow")
        .union(tri.map_batches(tri_rows, batch_format="pyarrow")),
        lambda t: t, "node", fin, num_buckets=num_buckets)

    return joined.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0)),
        batch_format="pyarrow")


def scc_of(edges: rd.Dataset, source: int = 0,
           num_buckets: int = 256) -> rd.Dataset:
    """(node,) members of the strongly connected component containing
    ``source``: forward reachability ∩ backward reachability (one
    :func:`bfs_depths` pass per orientation — the forward-backward SCC
    step of Fleischer et al. 2000), intersected by one node-keyed tag
    exchange. The pivot SCC is the SQL-expressible unit of SCC
    decomposition (full decomposition recurses on data-dependent pivots,
    which no finite unrolling can express); the DuckDB twin runs the two
    recursive walks and intersects.

    The two frontier loops run SEQUENTIALLY on the driver thread: Ray
    Data execution is not documented thread-safe for concurrent
    driver-side loops (an earlier variant drove them from two threads —
    it worked but raced the scheduler), and the fused one-exchange round
    of :func:`_frontier_min` already halved the per-round constant the
    concurrency was hiding."""
    edges = edges.materialize()   # consumed by both orientations
    rev_edges = edges.map_batches(
        lambda t: pa.table({"src": t.column("dst"),
                            "dst": t.column("src")}),
        batch_format="pyarrow")
    fwd = bfs_depths(edges, source=source, num_buckets=num_buckets)
    bwd = bfs_depths(rev_edges, source=source, num_buckets=num_buckets)

    def tag(which: int):
        def rows(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "node": t.column("node"),
                "f": pa.array([1 - which] * n, pa.int64()),
                "b": pa.array([which] * n, pa.int64())})
        return rows

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("f", "max"), ("b", "max")])
        both = pc.and_(pc.equal(g.column("f_max"), 1),
                       pc.equal(g.column("b_max"), 1))
        return pa.table({"node": pa.concat_arrays(
            [g.filter(both).column("node").combine_chunks(),
             pa.array([_SENT], pa.int64())])})

    members = bucketed_group_agg(
        fwd.map_batches(tag(0), batch_format="pyarrow")
        .union(bwd.map_batches(tag(1), batch_format="pyarrow")),
        lambda t: t, "node", fin, num_buckets=num_buckets)

    return members.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0)),
        batch_format="pyarrow")


def co_mention_pmi(triples: rd.Dataset,
                   num_buckets: int = 256) -> rd.Dataset:
    """(ent_a, ent_b, n_both, pmi): pointwise mutual information of each
    co-mentioned entity pair — pmi = log2(n_both * N / (n_a * n_b)) with
    N = distinct documents, n_x = documents observing entity x. The edge
    SIGNIFICANCE weighting a KG keeps alongside raw co-mention counts
    (chance co-occurrence of two ubiquitous entities scores near/below 0,
    genuinely associated pairs score high). All counts are exact int64;
    the one log2+division is replicated term-for-term by the twin (the
    same determinism contract as text.cooccurrence_pmi).

    Scale shape: reuses :func:`co_mention_edges` for the pair counts; the
    per-entity doc counts are one uri-keyed exchange over the DISTINCT
    (doc, uri) stream; N is a distributed distinct-count (never a driver
    list — only the single scalar comes back); the two attach exchanges
    ship (pair, count) + (uri, count) rows only."""
    triples = triples.materialize()
    pairs = co_mention_edges(triples, num_buckets=num_buckets)

    ents = triples.map_batches(_doc_entity_rows, batch_format="pyarrow")

    # N: distributed distinct-doc count — one doc-keyed exchange, per-
    # bucket distinct, then a scalar sum of per-bucket counts
    def nd_fin(t: pa.Table) -> pa.Table:
        n = len(np.unique(_np_str(t.column("doc_id"))))
        return pa.table({"n": pa.array([n], pa.int64())})

    n_docs = int(bucketed_group_agg(
        ents.map_batches(
            lambda t: t.select(["doc_id"]),
            batch_format="pyarrow"),
        lambda t: t, "doc_id", nd_fin,
        num_buckets=num_buckets).sum("n") or 0)

    # per-entity doc counts over the distinct (doc, uri) stream
    def ec_fin(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_id", "uri"]).aggregate([]) \
            .group_by("uri").aggregate([("doc_id", "count")])
        return pa.table({
            "uri": pa.concat_arrays([g.column("uri").combine_chunks(),
                                     pa.array([""], pa.string())]),
            "c": pa.array(np.concatenate(
                [_np(g.column("doc_id_count")), [0]]), pa.int64())})

    ec = bucketed_group_agg(ents, lambda t: t, "uri", ec_fin,
                            num_buckets=num_buckets)

    def _attach_count(pair_ds: rd.Dataset, key_col: str, out_col: str):
        def pair_rows(t: pa.Table) -> pa.Table:
            cols = {"key": t.column(key_col)}
            for c in pair_ds.schema().names:
                cols[c] = t.column(c)
            cols["c"] = pa.array(np.full(t.num_rows, -1, np.int64),
                                 pa.int64())
            return pa.table(cols)

        def state_rows(t: pa.Table) -> pa.Table:
            cols = {"key": t.column("uri")}
            for c in pair_ds.schema().names:
                typ = pair_ds.schema().base_schema.field(c).type
                if pa.types.is_string(typ):
                    cols[c] = pa.array([""] * t.num_rows, pa.string())
                else:
                    cols[c] = pa.array(np.zeros(t.num_rows, np.int64),
                                       pa.int64())
            cols["c"] = t.column("c")
            return pa.table(cols)

        carry = pair_ds.schema().names

        def attach(t: pa.Table) -> pa.Table:
            key = _np_str(t.column("key"))
            cv = _np(t.column("c"))
            is_state = cv >= 0
            skey, sval = key[is_state], cv[is_state]
            order = np.argsort(skey, kind="stable")
            skey, sval = skey[order], sval[order]
            epick = ~is_state
            ekey = key[epick]
            out = {c: t.column(c).filter(pa.array(epick)) for c in carry}
            if len(ekey) and len(skey):
                idx = np.searchsorted(skey, ekey)
                idx[idx >= len(skey)] = len(skey) - 1
                hit = skey[idx] == ekey
                if not hit.all():
                    raise AssertionError(
                        "co_mention_pmi: pair entity missing from the "
                        "doc-count state (both derive from the same "
                        "triple stream)")
                vals = sval[idx]
            elif len(ekey):
                raise AssertionError(
                    "co_mention_pmi: empty doc-count state for a bucket "
                    "with pair rows")
            else:
                vals = np.zeros(0, np.int64)
            cols = {c: pa.concat_arrays(
                [out[c].combine_chunks(),
                 pa.array([""], pa.string()) if pa.types.is_string(
                     out[c].type) else pa.array([0], pa.int64())])
                for c in carry}
            cols[out_col] = pa.array(np.concatenate([vals, [0]]),
                                     pa.int64())
            return pa.table(cols)

        return bucketed_group_agg(
            pair_ds.map_batches(pair_rows, batch_format="pyarrow")
            .union(ec.map_batches(state_rows, batch_format="pyarrow")),
            lambda t: t, "key", attach,
            num_buckets=num_buckets).map_batches(
            lambda t: t.filter(pc.not_equal(t.column("ent_a"), "")),
            batch_format="pyarrow")

    with_a = _attach_count(pairs, "ent_a", "n_a")
    with_b = _attach_count(with_a, "ent_b", "n_b")

    nd_f = float(n_docs)

    def score(t: pa.Table) -> pa.Table:
        nb = _np(t.column("n_docs")).astype(np.float64)
        na = _np(t.column("n_a"))
        nbb = _np(t.column("n_b"))
        pmi = round_half_away(
            np.log2((nb * nd_f) / (na * nbb).astype(np.float64)), 6)
        return pa.table({
            "ent_a": t.column("ent_a"), "ent_b": t.column("ent_b"),
            "n_both": t.column("n_docs"),
            "pmi": pa.array(pmi, pa.float64())})

    return with_b.map_batches(score, batch_format="pyarrow")


def _np_str(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return np.asarray(a.to_pylist(), dtype=object)


def entity_pagerank(triples: rd.Dataset, iters: int = 3,
                    num_buckets: int = 256,
                    weighted: bool = False) -> rd.Dataset:
    """(uri, rank_int): integer-exact PageRank of canonical entities over
    the UNDIRECTED co-mention graph — the "which entities matter" ranking
    a downstream consumer asks of the constructed KG. End-to-end
    composition of three exact primitives, each already oracle-checked:
    :func:`co_mention_edges` (the graph), ``corpus.dense_string_ids``
    (URI -> dense int id, distributed zipWithIndex with a SQL-replicable
    (sha-bucket, value) ordering contract), and :func:`pagerank` (both
    directions of every pair emitted, so the walk is symmetric).

    Scale shape: everything rides the primitives' exchanges; the only
    additions are three attach exchanges (two string-keyed to put ids on
    the pair endpoints, one int-keyed to map ranks back to URIs) — each
    ships (pairs + vocabulary) rows, nothing driver-side beyond
    dense_string_ids' num_buckets offset counts.

    ``weighted``: split each entity's rank across its co-mention
    neighbors proportionally to the pair's document count (n_docs as the
    integer edge weight, via :func:`pagerank_weighted`) instead of
    uniformly."""
    from raykg.ops.corpus import dense_string_ids

    triples = triples.materialize()
    ids = dense_string_ids(
        triples.map_batches(_doc_entity_rows, batch_format="pyarrow"),
        "uri", num_buckets=num_buckets).materialize()
    pairs = co_mention_edges(triples, num_buckets=num_buckets)

    def attach_str(ds: rd.Dataset, key_col: str,
                   carry: dict, out_col: str) -> rd.Dataset:
        """Attach the dense id of the ``key_col`` string to each row;
        ``carry`` maps column -> 'str' | 'int' (sentinel typing)."""
        def data_rows(t: pa.Table) -> pa.Table:
            cols = {"key": t.column(key_col)}
            for c in carry:
                cols[c] = t.column(c)
            cols["idv"] = pa.array(np.full(t.num_rows, -1, np.int64),
                                   pa.int64())
            return pa.table(cols)

        def id_rows(t: pa.Table) -> pa.Table:
            cols = {"key": t.column("uri")}
            for c, k in carry.items():
                cols[c] = pa.array([""] * t.num_rows, pa.string()) \
                    if k == "str" else \
                    pa.array(np.full(t.num_rows, -1, np.int64), pa.int64())
            cols["idv"] = t.column("id")
            return pa.table(cols)

        def attach(t: pa.Table) -> pa.Table:
            key = _np_str(t.column("key"))
            idv = _np(t.column("idv"))
            is_state = idv >= 0
            skey, sval = key[is_state], idv[is_state]
            order = np.argsort(skey, kind="stable")
            skey, sval = skey[order], sval[order]
            epick = ~is_state
            ekey = key[epick]
            if len(ekey):
                idx = np.searchsorted(skey, ekey)
                idx[idx >= len(skey)] = max(len(skey) - 1, 0)
                if not len(skey) or not (skey[idx] == ekey).all():
                    raise AssertionError(
                        "entity_pagerank: pair entity missing from the "
                        "id table (both derive from the same stream)")
                vals = sval[idx]
            else:
                vals = np.zeros(0, np.int64)
            cols = {}
            for c, k in carry.items():
                arr = t.column(c).filter(pa.array(epick)).combine_chunks()
                sent = pa.array([""], pa.string()) if k == "str" \
                    else pa.array([_SENT], pa.int64())
                cols[c] = pa.concat_arrays([arr, sent])
            cols[out_col] = pa.array(np.concatenate([vals, [_SENT]]),
                                     pa.int64())
            return pa.table(cols)

        return bucketed_group_agg(
            ds.map_batches(data_rows, batch_format="pyarrow")
            .union(ids.map_batches(id_rows, batch_format="pyarrow")),
            lambda t: t, "key", attach, num_buckets=num_buckets) \
            .map_batches(
            lambda t: t.filter(pc.greater_equal(t.column(out_col), 0)),
            batch_format="pyarrow")

    with_a = attach_str(pairs.map_batches(
        lambda t: pa.table({"ent_a": t.column("ent_a"),
                            "ent_b": t.column("ent_b"),
                            "w": t.column("n_docs")}),
        batch_format="pyarrow"),
        "ent_a", {"ent_b": "str", "w": "int"}, "src_id")
    with_b = attach_str(with_a, "ent_b",
                        {"w": "int", "src_id": "int"}, "dst_id")

    def both_dirs(t: pa.Table) -> pa.Table:
        s, d = _np(t.column("src_id")), _np(t.column("dst_id"))
        w = _np(t.column("w"))
        return pa.table({"src": np.concatenate([s, d]),
                         "dst": np.concatenate([d, s]),
                         "w": np.concatenate([w, w])})

    int_edges = with_b.map_batches(both_dirs, batch_format="pyarrow")
    if weighted:
        pr = pagerank_weighted(int_edges, iters=iters,
                               num_buckets=num_buckets, weight_col="w")
    else:
        pr = pagerank(int_edges, iters=iters, num_buckets=num_buckets)

    # map ranks back to URIs: one int-keyed attach against the id table
    def rank_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t.column("node"),
                         "uri": pa.array([""] * t.num_rows, pa.string()),
                         "val": t.column("rank_int"),
                         "is_id": pa.array(np.zeros(t.num_rows, np.int8),
                                           pa.int8())})

    def uri_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t.column("id"),
                         "uri": t.column("uri"),
                         "val": pa.array(np.zeros(t.num_rows, np.int64),
                                         pa.int64()),
                         "is_id": pa.array(np.ones(t.num_rows, np.int8),
                                           pa.int8())})

    def back(t: pa.Table) -> pa.Table:
        key, st = _np(t.column("key")), _np(t.column("is_id"))
        val = _np(t.column("val"))
        uri = t.column("uri")
        is_s = st == 1
        skey = key[is_s]
        suri = uri.filter(pa.array(is_s)).combine_chunks()
        order = np.argsort(skey, kind="stable")
        skey = skey[order]
        suri = suri.take(pa.array(order))
        ekey, eval_ = key[~is_s], val[~is_s]
        real = ekey >= 0
        ekey, eval_ = ekey[real], eval_[real]
        if len(ekey):
            idx = np.searchsorted(skey, ekey)
            idx[idx >= len(skey)] = max(len(skey) - 1, 0)
            if not len(skey) or not (skey[idx] == ekey).all():
                raise AssertionError(
                    "entity_pagerank: ranked id missing from the id table")
            out_uri = suri.take(pa.array(idx))
            out_val = eval_
        else:
            out_uri = pa.array([], pa.string())
            out_val = np.zeros(0, np.int64)
        return pa.table({
            "uri": pa.concat_arrays([out_uri.combine_chunks()
                                     if isinstance(out_uri,
                                                   pa.ChunkedArray)
                                     else out_uri,
                                     pa.array([""], pa.string())]),
            "rank_int": pa.array(np.concatenate([out_val, [0]]),
                                 pa.int64())})

    ranked = bucketed_group_agg(
        pr.map_batches(rank_rows, batch_format="pyarrow")
        .union(ids.map_batches(uri_rows, batch_format="pyarrow")),
        lambda t: t, "key", back, num_buckets=num_buckets)

    return ranked.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("uri"), "")),
        batch_format="pyarrow")


def pagerank_weighted(edges: rd.Dataset, iters: int = 3,
                      num_buckets: int = 256, seed: int = 42,
                      weight_mod: int = 9,
                      weight_col: str | None = None) -> rd.Dataset:
    """(node, rank_int): integer PageRank over WEIGHTED directed edges —
    each round node u splits floor(rank_u * 85/100) across its out-edges
    proportionally to weight: contribution to v = floor(send * w_uv / W_u)
    with W_u = u's total out-weight (the walk a KG runs over weighted
    co-mention / affinity edges). Weights come from ``weight_col`` when
    given (must be positive int64), else the sha family of
    :func:`edge_weights`. All arithmetic is int64 floor division, so the
    unrolled-round DuckDB twin is bit-exact — the weighted sibling of
    :func:`pagerank` with the identical two-exchange round shape (state
    carries (W_u, rank) instead of (out_deg, rank))."""
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    edges = edges.materialize()

    def _w(t: pa.Table) -> np.ndarray:
        if weight_col is not None:
            w = _np(t.column(weight_col))
            if len(w) and w.min() < 1:
                raise ValueError("pagerank_weighted: weights must be >= 1")
            return w
        return edge_weights(t, seed=seed, mod=weight_mod)

    # initial state: every endpoint node, W_u = sum of out-weights (0 for
    # pure sinks), rank = PR_SCALE — one node-keyed exchange
    def w_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        w = _w(t)
        return pa.table({
            "node": np.concatenate([src, dst, [_SENT]]),
            "wsum": np.concatenate([w, np.zeros(len(dst) + 1, np.int64)])})

    def w_fin(t: pa.Table) -> pa.Table:
        g = t.group_by("node").aggregate([("wsum", "sum")])
        node = _np(g.column("node"))
        keep = node >= 0
        return pa.table({
            "node": pa.array(np.concatenate([node[keep], [_SENT]]),
                             pa.int64()),
            "wsum": pa.array(np.concatenate(
                [_np(g.column("wsum_sum"))[keep], [0]]), pa.int64()),
            "rank_int": pa.array(np.concatenate(
                [np.full(int(keep.sum()), PR_SCALE, np.int64), [0]]),
                pa.int64())})

    state = bucketed_group_agg(edges.map_batches(w_rows,
                                                 batch_format="pyarrow"),
                               lambda t: t, "node", w_fin,
                               num_buckets=num_buckets).materialize()

    def edge_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        w = _w(t)
        return pa.table({"node": src, "dst": dst, "wsum": w,
                         "rank_int": np.zeros(len(src), np.int64)})

    def state_rows(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "dst": pa.array([_SENT] * t.num_rows, pa.int64()),
                         "wsum": t.column("wsum"),
                         "rank_int": t.column("rank_int")})

    def contribs(t: pa.Table) -> pa.Table:
        node, dst = _np(t.column("node")), _np(t.column("dst"))
        ws, rk = _np(t.column("wsum")), _np(t.column("rank_int"))
        is_state = dst == _SENT
        snode, sw, srk = node[is_state], ws[is_state], rk[is_state]
        order = np.argsort(snode, kind="stable")
        snode, sw, srk = snode[order], sw[order], srk[order]
        enode, edst, ew = node[~is_state], dst[~is_state], ws[~is_state]
        real = enode >= 0
        enode, edst, ew = enode[real], edst[real], ew[real]
        if len(enode):
            idx = np.searchsorted(snode, enode)
            if idx.max() >= len(snode) or \
                    not np.array_equal(snode[idx], enode):
                raise AssertionError(
                    "pagerank_weighted: edge src missing from state")
            send = (srk[idx] * PR_DAMP_NUM) // PR_DAMP_DEN
            c = (send * ew) // sw[idx]   # W_u >= 1 wherever a src exists
        else:
            edst = np.empty(0, np.int64)
            c = np.empty(0, np.int64)
        return pa.table({"node": np.concatenate([edst, [_SENT]]),
                         "contrib": np.concatenate([c, [0]])})

    for _ in range(iters):
        contrib_ds = bucketed_group_agg(
            edges.map_batches(edge_rows, batch_format="pyarrow")
            .union(state.map_batches(state_rows, batch_format="pyarrow")),
            lambda t: t, "node", contribs, num_buckets=num_buckets)

        def carrier(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column("node"),
                             "wsum": t.column("wsum"),
                             "contrib": pa.array([0] * t.num_rows,
                                                 pa.int64())})

        def contrib_rows(t: pa.Table) -> pa.Table:
            return pa.table({"node": t.column("node"),
                             "wsum": pa.array([-1] * t.num_rows,
                                              pa.int64()),
                             "contrib": t.column("contrib")})

        def new_state(t: pa.Table) -> pa.Table:
            g = t.group_by("node").aggregate([("contrib", "sum"),
                                              ("wsum", "max")])
            g = g.filter(pc.greater_equal(g.column("node"), 0))
            return pa.table({
                "node": pa.concat_arrays(
                    [g.column("node").combine_chunks(),
                     pa.array([_SENT], pa.int64())]),
                "wsum": pa.concat_arrays(
                    [g.column("wsum_max").combine_chunks(),
                     pa.array([0], pa.int64())]),
                "rank_int": pa.array(np.concatenate(
                    [_np(g.column("contrib_sum")) + base, [0]]),
                    pa.int64())})

        state = bucketed_group_agg(
            contrib_ds.map_batches(contrib_rows, batch_format="pyarrow")
            .union(state.map_batches(carrier, batch_format="pyarrow")),
            lambda t: t, "node", new_state,
            num_buckets=num_buckets).materialize()

    return state.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0))
        .select(["node", "rank_int"]), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Jaccard-coefficient link prediction (degree-normalized common neighbors)
# ---------------------------------------------------------------------------

def undirected_degrees(edges: rd.Dataset,
                       num_buckets: int = 256) -> rd.Dataset:
    """(node, deg): DISTINCT undirected neighbor count per node, self-loops
    dropped — the denominator state for :func:`jaccard_link_scores`. One
    node-keyed bucketed exchange whose combiner emits distinct (node, nbr)
    pairs per batch (same thinning as link_prediction_scores' nbr_rows).
    Output blocks carry one ``node = -1`` sentinel row per bucket (zero-row
    block convention, functions/shuffle.py) — consumers filter it."""

    def nbr_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        w = np.concatenate([src, dst])
        u = np.concatenate([dst, src])
        pk = np.unique(w * _SHIFT + u)
        return pa.table({"node": np.concatenate([pk // _SHIFT, [_SENT]]),
                         "u": np.concatenate([pk % _SHIFT, [_SENT]])})

    def fin(t: pa.Table) -> pa.Table:
        node, u = _np(t.column("node")), _np(t.column("u"))
        real = node >= 0
        pk = np.unique(node[real] * _SHIFT + u[real])
        w = pk // _SHIFT
        seg = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1]))) \
            if len(w) else np.empty(0, np.int64)
        deg = np.diff(np.concatenate([seg, [len(w)]])).astype(np.int64)
        return pa.table({"node": np.concatenate([w[seg], [_SENT]]),
                         "deg": np.concatenate([deg, [0]])})

    return bucketed_group_agg(edges, nbr_rows, "node", fin,
                              num_buckets=num_buckets)


def _attach_node_state(pairs: rd.Dataset, state: rd.Dataset, key_col: str,
                       carry: list[str], out_col: str,
                       num_buckets: int) -> rd.Dataset:
    """Attach ``state``'s (node, deg) value to every ``pairs`` row whose
    ``key_col`` matches, as ``out_col`` — the endpoint-keyed attach exchange
    (same shape as degree_assortativity's _attach_deg). ``carry`` columns
    must be int64 and non-negative (the sentinel carrier uses -1).
    Output keeps ``key_col``'s value under the column name ``akey`` plus a
    ``mark`` column (1 = sentinel row) — callers filter and rename."""

    def pair_rows(t: pa.Table) -> pa.Table:
        cols = {"akey": t.column(key_col)}
        for c in carry:
            cols[c] = t.column(c)
        n = t.num_rows
        cols["degval"] = pa.array(np.full(n, -1, np.int64), pa.int64())
        cols["is_state"] = pa.array(np.zeros(n, np.int8), pa.int8())
        return pa.table(cols)

    def state_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {"akey": t.column("node")}
        for c in carry:
            cols[c] = pa.array(np.full(n, _SENT, np.int64), pa.int64())
        cols["degval"] = t.column("deg")
        cols["is_state"] = pa.array(np.ones(n, np.int8), pa.int8())
        return pa.table(cols)

    def fin(t: pa.Table) -> pa.Table:
        key, st = _np(t.column("akey")), _np(t.column("is_state"))
        dv = _np(t.column("degval"))
        is_s = st == 1
        skey, sval = key[is_s], dv[is_s]
        order = np.argsort(skey, kind="stable")
        skey, sval = skey[order], sval[order]
        ekey = key[~is_s]
        real = ekey >= 0
        carr = {c: _np(t.column(c))[~is_s][real] for c in carry}
        ekey = ekey[real]
        if len(ekey):
            idx = np.searchsorted(skey, ekey)
            if idx.max() >= len(skey) or \
                    not np.array_equal(skey[idx], ekey):
                raise AssertionError(
                    "jaccard_link_scores: pair endpoint missing from the "
                    "undirected degree state")
            vals = sval[idx]
        else:
            vals = np.empty(0, np.int64)
        cols = {"akey": np.concatenate([ekey, [_SENT]])}
        for c in carry:
            cols[c] = np.concatenate([carr[c], [_SENT]])
        cols[out_col] = np.concatenate([vals, [_SENT]])
        cols["mark"] = np.concatenate(
            [np.zeros(len(ekey), np.int8), [1]]).astype(np.int8)
        return pa.table(cols)

    return bucketed_group_agg(
        pairs.map_batches(pair_rows, batch_format="pyarrow")
        .union(state.map_batches(state_rows, batch_format="pyarrow")),
        lambda t: t, "akey", fin, num_buckets=num_buckets)


def jaccard_link_scores(edges: rd.Dataset, min_cn: int = 2,
                        max_neighbors: int = 128,
                        num_buckets: int = 256) -> rd.Dataset:
    """(u, v, cn, jac, is_edge) for every unordered node pair with at least
    ``min_cn`` undirected common neighbors: the Jaccard neighborhood
    coefficient jac = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
    = cn / (deg(u) + deg(v) - cn) (Liben-Nowell & Kleinberg 2003), the
    degree-normalized sibling of link_prediction_scores' cn/aa — hub pairs
    stop dominating the ranking. ``min_cn`` must be >= 1 (the denominator is
    then positive by construction).

    Contract split, replicated exactly by the SQL twin (_jaccard_sql):
    the cn NUMERATOR inherits link_prediction_scores' hub-center cap
    (centers with more than ``max_neighbors`` neighbors emit no wedges,
    logged there), while the deg DENOMINATORS are TRUE uncapped undirected
    degrees. jac uses one float division + round(.., 4) at finalize over
    exact int64 inputs (the repo's float contract).

    Scale shape: the wedge pipeline (two exchanges) + one degree exchange
    + two endpoint-keyed attach exchanges; nothing pair- or node-sized
    lands on the driver."""
    if min_cn < 1:
        raise ValueError("jaccard_link_scores requires min_cn >= 1")
    edges = edges.materialize()
    pairs = link_prediction_scores(
        edges, min_cn=min_cn, max_neighbors=max_neighbors,
        num_buckets=num_buckets).map_batches(
            lambda t: t.select(["u", "v", "cn", "is_edge"]),
            batch_format="pyarrow")
    deg = undirected_degrees(edges, num_buckets=num_buckets).materialize()

    withu = _attach_node_state(
        pairs, deg, "u", ["v", "cn", "is_edge"], "du",
        num_buckets).map_batches(
            lambda t: t.filter(pc.equal(t.column("mark"), 0))
            .drop_columns(["mark"]).rename_columns(
                ["u", "v", "cn", "is_edge", "du"]),
            batch_format="pyarrow")
    withv = _attach_node_state(
        withu, deg, "v", ["u", "cn", "is_edge", "du"], "dv",
        num_buckets)

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("mark"), 0))
        cn = _np(t.column("cn")).astype(np.float64)
        du, dv = _np(t.column("du")), _np(t.column("dv"))
        jac = round_half_away(cn / (du + dv - cn).astype(np.float64), 4)
        return pa.table({"u": t.column("u"), "v": t.column("akey"),
                         "cn": t.column("cn"),
                         "jac": pa.array(jac, pa.float64()),
                         "is_edge": t.column("is_edge")})

    return withv.map_batches(fin, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# typed 2-hop metapath census over the constructed KG
# ---------------------------------------------------------------------------

def metapath_counts(edges: rd.Dataset, num_buckets: int = 256) -> rd.Dataset:
    """(label_a, pred_ab, label_m, pred_mc, label_c, n_paths): census of
    typed 2-hop paths a -[pred_ab]-> m -[pred_mc]-> c over the KG's distinct
    edge set, grouped by the endpoint/mid node labels (parsed from the
    ``sdpg.gr/<label>/<sha>`` URI scheme) — the metapath inventory used for
    KG schema discovery and metapath2vec-style walk design (Dong et al.
    2017, "metapath2vec"; reference scope analog: the pattern co-grouping in
    src2/main/scala/Clustering.scala consumes exactly this kind of typed
    adjacency census).

    Scale shape: ONE mid-keyed bucketed exchange. The combiner reduces each
    batch to counts per (mid, side, tag) — tag packs (endpoint label, pred)
    — so the exchange carries at most nodes × schema-combos rows, never
    paths; the per-bucket finalize cross-multiplies in-counts × out-counts
    per mid with one Arrow hash join and sums per combo. Path multiplicity
    is NEVER enumerated (a hub with 10^6 in-edges and 10^6 out-edges
    contributes one int64 product), so no hub cap is needed. The final
    reduce is schema-census-sized (≤ labels² × preds² rows), one block."""
    SEP = "\x1f"

    def side_rows(t: pa.Table) -> pa.Table:
        subj = t.column("subj").combine_chunks()
        obj = t.column("obj").combine_chunks()
        pred = t.column("pred").combine_chunks()
        la = pc.list_element(pc.split_pattern(subj, "/"), 1)
        lc = pc.list_element(pc.split_pattern(obj, "/"), 1)
        n = t.num_rows
        both = pa.table({
            "mid": pa.concat_arrays([obj, subj]),
            "side": pa.array(np.concatenate(
                [np.zeros(n, np.int8), np.ones(n, np.int8)]), pa.int8()),
            "tag": pa.chunked_array([
                pc.binary_join_element_wise(la, pred, SEP),
                pc.binary_join_element_wise(pred, lc, SEP),
            ]).combine_chunks()})
        g = both.group_by(["mid", "side", "tag"]).aggregate(
            [([], "count_all")])
        out = pa.table({"mid": g.column("mid"), "side": g.column("side"),
                        "tag": g.column("tag"),
                        "n": g.column("count_all")})
        # sentinel: "" is impossible as a mid (URIs are non-empty)
        return pa.concat_tables([out, pa.table({
            "mid": pa.array([""], pa.string()),
            "side": pa.array([-1], pa.int8()),
            "tag": pa.array([""], pa.string()),
            "n": pa.array([0], pa.int64())})])

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("side"), -1))
        g = t.group_by(["mid", "side", "tag"]).aggregate([("n", "sum")])
        it = g.filter(pc.equal(g.column("side"), 0))
        ot = g.filter(pc.equal(g.column("side"), 1))
        in_tbl = pa.table({"mid": it.column("mid"), "ka": it.column("tag"),
                           "ni": it.column("n_sum")})
        out_tbl = pa.table({"mid": ot.column("mid"), "kb": ot.column("tag"),
                            "no": ot.column("n_sum")})
        j = in_tbl.join(out_tbl, keys="mid", join_type="inner")
        ml = pc.list_element(pc.split_pattern(j.column("mid"), "/"), 1)
        prod = pc.multiply(j.column("ni"), j.column("no"))
        combo = pa.table({"ka": j.column("ka"), "ml": ml,
                          "kb": j.column("kb"), "n": prod}) \
            .group_by(["ka", "ml", "kb"]).aggregate([("n", "sum")])
        return pa.concat_tables([
            pa.table({"ka": combo.column("ka"), "ml": combo.column("ml"),
                      "kb": combo.column("kb"),
                      "n": combo.column("n_sum")}),
            pa.table({"ka": pa.array([""], pa.string()),
                      "ml": pa.array([""], pa.string()),
                      "kb": pa.array([""], pa.string()),
                      "n": pa.array([0], pa.int64())})])

    def final_fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("ml"), ""))
        g = t.group_by(["ka", "ml", "kb"]).aggregate([("n", "sum")])
        ka = pc.split_pattern(g.column("ka"), SEP)
        kb = pc.split_pattern(g.column("kb"), SEP)
        return pa.table({
            "label_a": pc.list_element(ka, 0),
            "pred_ab": pc.list_element(ka, 1),
            "label_m": g.column("ml"),
            "pred_mc": pc.list_element(kb, 0),
            "label_c": pc.list_element(kb, 1),
            "n_paths": g.column("n_sum")})

    partial = bucketed_group_agg(edges, side_rows, "mid", fin,
                                 num_buckets=num_buckets)
    return partial.repartition(1).map_batches(
        final_fin, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# sampled-source betweenness centrality (Brandes, integer-exact)
# ---------------------------------------------------------------------------

_B_EDGE, _B_STATE, _B_OFFER, _B_CNT = 0, 1, 2, 3
_BC_SCALE = 10**6


def _frontier_bfs_sigma(edges: rd.Dataset, sources: tuple,
                        max_rounds: int,
                        num_buckets: int) -> rd.Dataset:
    """Multi-source BFS with shortest-path counting: (si, node, d, sigma)
    for every (source index, reachable node), where sigma is the number of
    distinct shortest s->node paths. Same ONE-exchange-per-round shape as
    :func:`_frontier_min` — edges are keyed by src once and pass through;
    state/offer rows ride in bucket(node) carrying a source-index column —
    with a sum-fold instead of a min-fold: under unit weights every offer
    a node ever receives for source si arrives in the single round that
    first reaches it, so sigma = the sum of that round's offer sigmas and
    later (non-shortest) offers are simply dropped against the existing
    state. ``edges`` must be DISTINCT directed pairs without self-loops
    (the caller dedups) — a multi-edge would double-count paths."""
    INF = np.int64(1) << np.int64(62)

    def route(a: np.ndarray) -> np.ndarray:
        return ((a.astype(np.uint64) * np.uint64(2654435761))
                >> np.uint64(7)).astype(np.int64) % num_buckets

    def edge_rows(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        n = len(src)
        return pa.table({
            "bucket": pa.array(np.concatenate([route(src), [0]]),
                               pa.int64()),
            "node": pa.array(np.concatenate([src, [_SENT]]), pa.int64()),
            "dst": pa.array(np.concatenate([dst, [_SENT]]), pa.int64()),
            "si": pa.array(np.full(n + 1, -1, np.int64), pa.int64()),
            "val": pa.array(np.zeros(n + 1, np.int64), pa.int64()),
            "sig": pa.array(np.zeros(n + 1, np.int64), pa.int64()),
            "kind": pa.array([_B_EDGE] * (n + 1), pa.int8()),
        })

    src_arr = np.asarray(sources, np.int64)
    seed_t = pa.table({
        "bucket": pa.array(route(src_arr), pa.int64()),
        "node": pa.array(src_arr, pa.int64()),
        "dst": pa.array(np.full(len(src_arr), _SENT, np.int64), pa.int64()),
        "si": pa.array(np.arange(len(src_arr), dtype=np.int64), pa.int64()),
        "val": pa.array(np.zeros(len(src_arr), np.int64), pa.int64()),
        "sig": pa.array(np.ones(len(src_arr), np.int64), pa.int64()),
        "kind": pa.array([_B_OFFER] * len(src_arr), pa.int8()),
    })

    def round_fn(t: pa.Table) -> pa.Table:
        bkt = int(t.column("bucket")[0].as_py())
        node, dst = _np(t.column("node")), _np(t.column("dst"))
        si, val, sig = (_np(t.column("si")), _np(t.column("val")),
                        _np(t.column("sig")))
        kind = _np(t.column("kind"))
        real = node >= 0
        em = (kind == _B_EDGE) & real
        esrc, edst = node[em], dst[em]
        stm = (kind == _B_STATE) & real
        ofm = (kind == _B_OFFER) & real
        # settled state keyed (si, node)
        s_key = si[stm] * _SHIFT + node[stm]
        s_node, s_si = node[stm], si[stm]
        s_val, s_sig = val[stm], sig[stm]
        # fold offers: sum sigma per (si, node) NOT yet settled
        o_key = si[ofm] * _SHIFT + node[ofm]
        o_val, o_sig = val[ofm], sig[ofm]
        if len(o_key):
            order = np.argsort(o_key, kind="stable")
            ok, ov, osg = o_key[order], o_val[order], o_sig[order]
            start = np.flatnonzero(np.concatenate(
                ([True], ok[1:] != ok[:-1])))
            uk = ok[start]
            uval = ov[start]                     # all offers share d = round
            usig = np.add.reduceat(osg, start)
            if len(s_key):
                ssort = np.sort(s_key)
                pos = np.searchsorted(ssort, uk)
                pos[pos >= len(ssort)] = len(ssort) - 1 if len(ssort) else 0
                fresh = ~np.equal(ssort[pos], uk) if len(ssort) \
                    else np.ones(len(uk), bool)
            else:
                fresh = np.ones(len(uk), bool)
            nk, nval, nsig = uk[fresh], uval[fresh], usig[fresh]
        else:
            nk = np.empty(0, np.int64)
            nval = np.empty(0, np.int64)
            nsig = np.empty(0, np.int64)
        if len(nsig):
            assert int(nsig.max()) < INF // _BC_SCALE, \
                "betweenness sigma overflow"
        changed = len(nk)
        f_si, f_node = nk // _SHIFT, nk % _SHIFT
        # offers out of the freshly settled frontier
        if len(f_node) and len(esrc):
            eo = np.argsort(esrc, kind="stable")
            es, ed = esrc[eo], edst[eo]
            lo = np.searchsorted(es, f_node, side="left")
            hi = np.searchsorted(es, f_node, side="right")
            counts = (hi - lo).astype(np.int64)
            total = int(counts.sum())
            base = np.repeat(lo, counts)
            offs = np.arange(total, dtype=np.int64) \
                - np.repeat(np.concatenate(([0], np.cumsum(counts)[:-1])),
                            counts)
            idx = base + offs
            off_dst = ed[idx]
            off_si = np.repeat(f_si, counts)
            off_val = np.repeat(nval, counts) + 1
            off_sig = np.repeat(nsig, counts)
        else:
            off_dst = np.empty(0, np.int64)
            off_si = np.empty(0, np.int64)
            off_val = np.empty(0, np.int64)
            off_sig = np.empty(0, np.int64)
        ne, ns0, nn, no = len(esrc), len(s_node), len(f_node), len(off_dst)
        return pa.table({
            "bucket": pa.array(np.concatenate(
                [np.full(ne + ns0 + nn, bkt, np.int64), route(off_dst),
                 [bkt]]), pa.int64()),
            "node": pa.array(np.concatenate(
                [esrc, s_node, f_node, off_dst, [_SENT]]), pa.int64()),
            "dst": pa.array(np.concatenate(
                [edst, np.full(ns0 + nn + no + 1, _SENT, np.int64)]),
                pa.int64()),
            "si": pa.array(np.concatenate(
                [np.full(ne, -1, np.int64), s_si, f_si, off_si, [-1]]),
                pa.int64()),
            "val": pa.array(np.concatenate(
                [np.zeros(ne, np.int64), s_val, nval, off_val, [changed]]),
                pa.int64()),
            "sig": pa.array(np.concatenate(
                [np.zeros(ne, np.int64), s_sig, nsig, off_sig, [0]]),
                pa.int64()),
            "kind": pa.array(np.concatenate(
                [np.full(ne, _B_EDGE, np.int8),
                 np.full(ns0 + nn, _B_STATE, np.int8),
                 np.full(no, _B_OFFER, np.int8),
                 np.array([_B_CNT], np.int8)]), pa.int8()),
        })

    def cnt_rows(t: pa.Table) -> pa.Table:
        v = _np(t.column("val"))[_np(t.column("kind")) == _B_CNT]
        return pa.table({"val": pa.array([int(v.sum())], pa.int64())})

    cur = edges.map_batches(edge_rows, batch_format="pyarrow") \
        .union(rd.from_arrow(seed_t))
    for _ in range(max_rounds):
        cur = cur.groupby("bucket").map_groups(
            round_fn, batch_format="pyarrow").materialize()
        if not cur.map_batches(cnt_rows,
                               batch_format="pyarrow").sum("val"):
            break

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), _B_STATE))
        return pa.table({"si": t.column("si"), "node": t.column("node"),
                         "d": t.column("val"), "sigma": t.column("sig")})

    return cur.map_batches(fin, batch_format="pyarrow")


def betweenness_sampled(edges: rd.Dataset, sources: tuple = (0, 7, 13),
                        num_buckets: int = 256,
                        max_rounds: int = 64) -> rd.Dataset:
    """(node, bc_micro): Brandes betweenness centrality restricted to the
    ``sources`` sample (Brandes 2001; the sampled estimator of Brandes &
    Pich 2007), over the DISTINCT directed simple graph. Integer-exact
    contract so DuckDB replays it bit-for-bit: the dependency recursion
    runs in micro-units — Δ(v) = Σ_{w ∈ succ(v)} (σ_v · (10^6 + Δ(w)))
    // σ_w, all int64, order-free sums, ``//`` = floor division on both
    sides — and bc_micro(v) = Σ_s Δ_s(v) over v ≠ s, emitted where > 0.
    (Classic float Brandes is this with SCALE → ∞; at 10^6 the floor
    error is ≤ 1e-6 per path term, far below the sampling error.)

    Scale shape: forward = multi-source BFS-with-σ, ONE fused bucketed
    exchange per round (:func:`_frontier_bfs_sigma` — all sources advance
    in the same wavefront, so rounds = max eccentricity, not sources ×
    eccentricity). Backward = the same fused-round trick DOWN the depth
    layers, again ONE exchange per layer: edges live keyed by their HEAD,
    so a head's bucket holds σ_w, the Δ_w it computed the previous layer,
    and every in-edge — it emits (tail, σ_w, Δ_w) succ rows pre-routed to
    bucket(tail), where next round's finalize folds them against the local
    σ_v of tails settled at exactly depth L (non-shortest-path tails drop
    by the depth filter). Rounds = eccentricity + 1, nothing node- or
    edge-sized on the driver. The per-round edge pass-through is the same
    residency limitation documented in _frontier_min."""
    sources = tuple(int(s) for s in sources)
    if len(set(sources)) != len(sources):
        raise ValueError("betweenness sources must be distinct")

    # globally dedup directed edges, drop self-loops (σ counts paths in the
    # simple graph; a multi-edge would double-count)
    def ded_comb(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        pk = np.unique(src[keep] * _SHIFT + dst[keep])
        return pa.table({"pk": np.concatenate([pk, [_SENT]])})

    def ded_fin(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = np.unique(pk[pk >= 0])
        return pa.table({"src": np.concatenate([pk // _SHIFT, [_SENT]]),
                         "dst": np.concatenate([pk % _SHIFT, [_SENT]])})

    simple = bucketed_group_agg(edges, ded_comb, "pk", ded_fin,
                                num_buckets=num_buckets).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("src"), 0)),
        batch_format="pyarrow").materialize()

    state = _frontier_bfs_sigma(simple, sources, max_rounds,
                                num_buckets).materialize()
    dmax = state.max("d")
    dmax = int(dmax) if dmax is not None else 0

    def route(a: np.ndarray) -> np.ndarray:
        return ((a.astype(np.uint64) * np.uint64(2654435761))
                >> np.uint64(7)).astype(np.int64) % num_buckets

    # backward round rows, all in bucket(key):
    #   tag 0 EDGE  (key=head, other=tail)
    #   tag 1 STATE (key=node, si, sigma, d)
    #   tag 2 DELTA (key=node, si, delta)        — accrues as layers finish
    #   tag 3 SUCC  (key=tail, si, sigma=σ_w, delta=Δ_w) — arrives routed
    def edge_rows(t: pa.Table) -> pa.Table:
        head, tail = _np(t.column("dst")), _np(t.column("src"))
        n = len(head)
        return pa.table({
            "bucket": pa.array(np.concatenate([route(head), [0]]),
                               pa.int64()),
            "key": pa.array(np.concatenate([head, [_SENT]]), pa.int64()),
            "other": pa.array(np.concatenate([tail, [_SENT]]), pa.int64()),
            "si": pa.array(np.full(n + 1, -1, np.int64), pa.int64()),
            "sigma": pa.array(np.zeros(n + 1, np.int64), pa.int64()),
            "delta": pa.array(np.zeros(n + 1, np.int64), pa.int64()),
            "d": pa.array(np.full(n + 1, -1, np.int64), pa.int64()),
            "tag": pa.array([0] * (n + 1), pa.int8())})

    def state_rows(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        n = len(node)
        return pa.table({
            "bucket": pa.array(route(node), pa.int64()),
            "key": t.column("node"),
            "other": pa.array(np.full(n, _SENT, np.int64), pa.int64()),
            "si": t.column("si"),
            "sigma": t.column("sigma"),
            "delta": pa.array(np.zeros(n, np.int64), pa.int64()),
            "d": t.column("d"),
            "tag": pa.array(np.ones(n, np.int8), pa.int8())})

    def make_round(layer: int):
        def round_fn(t: pa.Table) -> pa.Table:
            bkt = int(t.column("bucket")[0].as_py())
            key, other = _np(t.column("key")), _np(t.column("other"))
            si, sigma = _np(t.column("si")), _np(t.column("sigma"))
            delta, dpt = _np(t.column("delta")), _np(t.column("d"))
            tag = _np(t.column("tag"))
            real = key >= 0
            em = (tag == 0) & real
            stm = (tag == 1) & real
            dm = (tag == 2) & real
            sm = (tag == 3) & real
            # local state lookup arrays sorted by (si, node)
            skey = si[stm] * _SHIFT + key[stm]
            sord = np.argsort(skey, kind="stable")
            skey_s = skey[sord]
            ssig = sigma[stm][sord]
            sd = dpt[stm][sord]
            # 1. fold succ arrivals into Δ for tails settled at this layer
            if int(sm.sum()):
                tkey = si[sm] * _SHIFT + key[sm]
                pos = np.searchsorted(skey_s, tkey)
                ok = (pos < len(skey_s))
                pos_c = np.where(ok, pos, 0)
                ok &= skey_s[pos_c] == tkey
                ok &= sd[pos_c] == layer
                sv = ssig[pos_c]
                sw, dw = sigma[sm], delta[sm]
                if int(ok.sum()):
                    assert int(sv[ok].max()) < (1 << 62) // (
                        _BC_SCALE + int(dw[ok].max()) + 1), \
                        "betweenness dependency overflow"
                term = np.where(ok, sv * (_BC_SCALE + dw)
                                // np.maximum(sw, 1), 0)
                nk = tkey[ok]
                tv = term[ok]
                order = np.argsort(nk, kind="stable")
                nk, tv = nk[order], tv[order]
                segs = np.flatnonzero(np.concatenate(
                    ([True], nk[1:] != nk[:-1]))) if len(nk) \
                    else np.empty(0, np.int64)
                new_dk = nk[segs]
                new_dv = np.add.reduceat(tv, segs) if len(segs) \
                    else np.empty(0, np.int64)
            else:
                new_dk = np.empty(0, np.int64)
                new_dv = np.empty(0, np.int64)
            # all delta rows now known locally (old + freshly folded)
            dk = np.concatenate([si[dm] * _SHIFT + key[dm], new_dk])
            dv = np.concatenate([delta[dm], new_dv])
            # 2. emit succ rows from heads settled at THIS layer to their
            #    in-edge tails (next round folds them at layer - 1)
            if layer > 0:
                hm = sd == layer
                hkey = skey_s[hm]
                hsig = ssig[hm]
                # attach each head's Δ (fresh this round or absent -> 0)
                dord = np.argsort(dk, kind="stable")
                dks, dvs = dk[dord], dv[dord]
                hpos = np.searchsorted(dks, hkey)
                hok = hpos < len(dks)
                hpos_c = np.where(hok, hpos, 0)
                hok &= (dks[hpos_c] == hkey) if len(dks) else False
                hdelta = np.where(hok, dvs[hpos_c] if len(dvs)
                                  else 0, 0)
                # in-edges of each head node
                hnode = hkey % _SHIFT
                eo = np.argsort(key[em], kind="stable")
                ekey, etail = key[em][eo], other[em][eo]
                if len(hkey) and len(ekey):
                    lo = np.searchsorted(ekey, hnode, side="left")
                    hi = np.searchsorted(ekey, hnode, side="right")
                    counts = (hi - lo).astype(np.int64)
                    total = int(counts.sum())
                    base = np.repeat(lo, counts)
                    offs = np.arange(total, dtype=np.int64) \
                        - np.repeat(np.concatenate(
                            ([0], np.cumsum(counts)[:-1])), counts)
                    idx = base + offs
                    s_tail = etail[idx]
                    s_si = np.repeat(hkey // _SHIFT, counts)
                    s_sig = np.repeat(hsig, counts)
                    s_del = np.repeat(hdelta, counts)
                else:
                    s_tail = np.empty(0, np.int64)
                    s_si = np.empty(0, np.int64)
                    s_sig = np.empty(0, np.int64)
                    s_del = np.empty(0, np.int64)
            else:
                s_tail = np.empty(0, np.int64)
                s_si = np.empty(0, np.int64)
                s_sig = np.empty(0, np.int64)
                s_del = np.empty(0, np.int64)
            ne = int(em.sum())
            ns = int(stm.sum())
            nd = len(dk)
            no = len(s_tail)
            return pa.table({
                "bucket": pa.array(np.concatenate(
                    [np.full(ne + ns + nd, bkt, np.int64),
                     route(s_tail), [bkt]]), pa.int64()),
                "key": pa.array(np.concatenate(
                    [key[em], key[stm], dk % _SHIFT, s_tail, [_SENT]]),
                    pa.int64()),
                "other": pa.array(np.concatenate(
                    [other[em],
                     np.full(ns + nd + no + 1, _SENT, np.int64)]),
                    pa.int64()),
                "si": pa.array(np.concatenate(
                    [np.full(ne, -1, np.int64), si[stm], dk // _SHIFT,
                     s_si, [-1]]), pa.int64()),
                "sigma": pa.array(np.concatenate(
                    [np.zeros(ne, np.int64), sigma[stm],
                     np.zeros(nd, np.int64), s_sig, [0]]), pa.int64()),
                "delta": pa.array(np.concatenate(
                    [np.zeros(ne, np.int64), np.zeros(ns, np.int64),
                     dv, s_del, [0]]), pa.int64()),
                "d": pa.array(np.concatenate(
                    [np.full(ne, -1, np.int64), dpt[stm],
                     np.full(nd + no + 1, -1, np.int64)]), pa.int64()),
                "tag": pa.array(np.concatenate(
                    [np.zeros(ne, np.int8), np.ones(ns, np.int8),
                     np.full(nd, 2, np.int8), np.full(no, 3, np.int8),
                     [0]]).astype(np.int8), pa.int8())})
        return round_fn

    cur = simple.map_batches(edge_rows, batch_format="pyarrow") \
        .union(state.map_batches(state_rows, batch_format="pyarrow"))
    for layer in range(dmax, -1, -1):
        cur = cur.groupby("bucket").map_groups(
            make_round(layer), batch_format="pyarrow").materialize()

    src_np = np.asarray(sources, np.int64)

    def bc_rows(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t.column("tag"), 2),
                       pc.greater_equal(t.column("key"), 0))
        t = t.filter(keep)
        si, node = _np(t.column("si")), _np(t.column("key"))
        delta = _np(t.column("delta"))
        ok = node != src_np[si]            # v != s (Brandes endpoints rule)
        return pa.table({"node": np.concatenate([node[ok], [_SENT]]),
                         "delta": np.concatenate([delta[ok], [0]])})

    def bc_fin(t: pa.Table) -> pa.Table:
        node, delta = _np(t.column("node")), _np(t.column("delta"))
        real = node >= 0
        g = pa.table({"node": pa.array(node[real], pa.int64()),
                      "bc_micro": pa.array(delta[real], pa.int64())}) \
            .group_by("node").aggregate([("bc_micro", "sum")])
        g = g.filter(pc.greater(g.column("bc_micro_sum"), 0))
        return pa.table({
            "node": pa.concat_arrays(
                [g.column("node").combine_chunks(),
                 pa.array([_SENT], pa.int64())]),
            "bc_micro": pa.concat_arrays(
                [g.column("bc_micro_sum").combine_chunks(),
                 pa.array([0], pa.int64())])})

    out = bucketed_group_agg(cur, bc_rows, "node", bc_fin,
                             num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0)),
        batch_format="pyarrow")


def harmonic_sampled(edges: rd.Dataset, sources: tuple = (0, 7, 13),
                     num_buckets: int = 256,
                     max_rounds: int = 64) -> rd.Dataset:
    """(node, harm_micro): sampled harmonic centrality (Boldi & Vigna
    2014) — harm(t) = Σ_{s ∈ sources, d(s,t) > 0} floor(10^6 / d(s,t)),
    the inward reachability score estimated from the same sampled-source
    wavefront betweenness uses. Integer micro-units (one floor per term,
    order-free int64 sum) so the DuckDB twin is bit-exact. Cost: ONE
    multi-source BFS (:func:`_frontier_bfs_sigma`, one fused exchange per
    round) + one node-keyed count exchange; the σ counts ride along unused
    — the state is shared with betweenness when both are wanted."""
    sources = tuple(int(s) for s in sources)
    if len(set(sources)) != len(sources):
        raise ValueError("harmonic sources must be distinct")

    def ded_comb(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        pk = np.unique(src[keep] * _SHIFT + dst[keep])
        return pa.table({"pk": np.concatenate([pk, [_SENT]])})

    def ded_fin(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = np.unique(pk[pk >= 0])
        return pa.table({"src": np.concatenate([pk // _SHIFT, [_SENT]]),
                         "dst": np.concatenate([pk % _SHIFT, [_SENT]])})

    simple = bucketed_group_agg(edges, ded_comb, "pk", ded_fin,
                                num_buckets=num_buckets).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("src"), 0)),
        batch_format="pyarrow")
    state = _frontier_bfs_sigma(simple, sources, max_rounds, num_buckets)

    def comb(t: pa.Table) -> pa.Table:
        node, d = _np(t.column("node")), _np(t.column("d"))
        keep = d > 0
        node, d = node[keep], d[keep]
        term = (10**6) // d
        g = pa.table({"node": pa.array(node, pa.int64()),
                      "harm_micro": pa.array(term, pa.int64())}) \
            .group_by("node").aggregate([("harm_micro", "sum")])
        return pa.table({
            "node": pa.concat_arrays(
                [g.column("node").combine_chunks(),
                 pa.array([_SENT], pa.int64())]),
            "harm_micro": pa.concat_arrays(
                [g.column("harm_micro_sum").combine_chunks(),
                 pa.array([0], pa.int64())])})

    def fin(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        hm = _np(t.column("harm_micro"))
        real = node >= 0
        g = pa.table({"node": pa.array(node[real], pa.int64()),
                      "harm_micro": pa.array(hm[real], pa.int64())}) \
            .group_by("node").aggregate([("harm_micro", "sum")])
        return pa.table({
            "node": pa.concat_arrays(
                [g.column("node").combine_chunks(),
                 pa.array([_SENT], pa.int64())]),
            "harm_micro": pa.concat_arrays(
                [g.column("harm_micro_sum").combine_chunks(),
                 pa.array([0], pa.int64())])})

    out = bucketed_group_agg(state, comb, "node", fin,
                             num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0)),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# k-truss decomposition (triangle-support peeling)
# ---------------------------------------------------------------------------

def _edge_support(und: rd.Dataset, num_buckets: int,
                  max_neighbors: int) -> rd.Dataset:
    """(a, b, support) for every undirected edge in ``und`` (distinct
    a < b pairs): support = number of triangles the edge closes = common
    neighbors of a and b within the CURRENT edge set. Center-keyed wedge
    enumeration + one pair-keyed join against the edge set — the
    link_prediction_scores plan restricted to actual edges. A center with
    more than ``max_neighbors`` neighbors RAISES (truss peeling is a
    correctness contract — a silently skipped hub would undercount
    support and peel valid edges; raise the cap for hubby graphs)."""

    def nbr_rows(t: pa.Table) -> pa.Table:
        a, b = _np(t.column("a")), _np(t.column("b"))
        w = np.concatenate([a, b])
        u = np.concatenate([b, a])
        pk = np.unique(w * _SHIFT + u)
        return pa.table({"w": np.concatenate([pk // _SHIFT, [_SENT]]),
                         "u": np.concatenate([pk % _SHIFT, [_SENT]])})

    def wedge_fin(t: pa.Table) -> pa.Table:
        w, u = _np(t.column("w")), _np(t.column("u"))
        real = w >= 0
        pk = np.unique(w[real] * _SHIFT + u[real])
        w, u = pk // _SHIFT, pk % _SHIFT
        seg = np.flatnonzero(np.concatenate(([True], w[1:] != w[:-1]))) \
            if len(w) else np.empty(0, np.int64)
        seglen = np.diff(np.concatenate([seg, [len(w)]])).astype(np.int64)
        if len(seglen) and int(seglen.max()) > max_neighbors:
            raise ValueError(
                f"ktruss: a node has {int(seglen.max())} neighbors > "
                f"max_neighbors={max_neighbors}; support through it "
                "cannot be skipped without corrupting the peel — raise "
                "max_neighbors")
        pks = [np.empty(0, np.int64)]
        for i, s0 in enumerate(seg.tolist()):
            d = int(seglen[i])
            if d < 2:
                continue
            nbrs = u[s0:s0 + d]
            ia, ib = np.triu_indices(d, k=1)
            pks.append(nbrs[ia] * _SHIFT + nbrs[ib])
        pk2 = np.concatenate(pks)
        n = len(pk2)
        return pa.table({
            "pk": np.concatenate([pk2, [_SENT]]),
            "c": np.concatenate([np.ones(n, np.int64), [0]]),
            "is_edge": np.zeros(n + 1, np.int64)})

    wedges = bucketed_group_agg(und, nbr_rows, "w", wedge_fin,
                                num_buckets=num_buckets)

    def edge_tag(t: pa.Table) -> pa.Table:
        a, b = _np(t.column("a")), _np(t.column("b"))
        n = len(a)
        return pa.table({
            "pk": np.concatenate([a * _SHIFT + b, [_SENT]]),
            "c": np.zeros(n + 1, np.int64),
            "is_edge": np.concatenate([np.ones(n, np.int64), [0]])})

    def sup_fin(t: pa.Table) -> pa.Table:
        pk, c = _np(t.column("pk")), _np(t.column("c"))
        ie = _np(t.column("is_edge"))
        real = pk >= 0
        pk, c, ie = pk[real], c[real], ie[real]
        order = np.argsort(pk, kind="stable")
        pk, c, ie = pk[order], c[order], ie[order]
        seg = np.flatnonzero(np.concatenate(([True], pk[1:] != pk[:-1]))) \
            if len(pk) else np.empty(0, np.int64)
        sup = np.add.reduceat(c, seg) if len(seg) else \
            np.empty(0, np.int64)
        edge = np.maximum.reduceat(ie, seg) if len(seg) else \
            np.empty(0, np.int64)
        upk = pk[seg]
        keep = edge == 1                       # only actual edges
        upk, sup = upk[keep], sup[keep]
        return pa.table({
            "a": np.concatenate([upk // _SHIFT, [_SENT]]),
            "b": np.concatenate([upk % _SHIFT, [_SENT]]),
            "support": np.concatenate([sup, [0]])})

    return bucketed_group_agg(
        wedges.union(und.map_batches(edge_tag, batch_format="pyarrow")),
        lambda t: t, "pk", sup_fin, num_buckets=num_buckets).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("a"), 0)),
        batch_format="pyarrow")


def ktruss_edges(edges: rd.Dataset, k: int = 4, max_rounds: int = 8,
                 num_buckets: int = 256,
                 max_neighbors: int = 4096) -> rd.Dataset:
    """(a, b): the k-truss of the undirected simple graph — the maximal
    subgraph in which every edge closes at least k-2 triangles WITHIN the
    subgraph (Cohen 2008); the triangle-cohesion sibling of k-core, the
    standard community-core extractor. Synchronous peel: each round
    recomputes every surviving edge's support over the CURRENT edge set
    and drops edges below k-2, until a fixpoint. Raises if the peel has
    not converged after ``max_rounds`` — the DuckDB twin unrolls exactly
    ``max_rounds`` rounds (identity once the fixpoint is reached, so any
    bound >= the data's peel depth verifies bit-for-bit; the loud failure
    keeps both sides honest instead of silently diverging).

    Scale shape per round: one center-keyed wedge exchange (O(Σ deg²)
    wedges, the triangle plan's cost envelope — ``max_neighbors`` RAISES
    on celebrity nodes rather than skipping, because a skipped hub would
    corrupt the peel) + one pair-keyed count/tag exchange. Nothing
    node- or edge-sized lands on the driver; the driver sees one count
    per round for the fixpoint test."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")

    def und_comb(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        pk = np.unique(a * _SHIFT + b)
        return pa.table({"pk": np.concatenate([pk, [_SENT]])})

    def und_fin(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = np.unique(pk[pk >= 0])
        return pa.table({"a": np.concatenate([pk // _SHIFT, [_SENT]]),
                         "b": np.concatenate([pk % _SHIFT, [_SENT]])})

    cur = bucketed_group_agg(edges, und_comb, "pk", und_fin,
                             num_buckets=num_buckets).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("a"), 0)),
        batch_format="pyarrow").materialize()
    n_cur = cur.count()
    for _ in range(max_rounds):
        if n_cur == 0:
            break
        sup = _edge_support(cur, num_buckets, max_neighbors)
        nxt = sup.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("support"),
                                                k - 2))
            .select(["a", "b"]), batch_format="pyarrow").materialize()
        n_nxt = nxt.count()
        if n_nxt == n_cur:
            break
        cur, n_cur = nxt, n_nxt
    else:
        raise RuntimeError(
            f"ktruss did not converge within max_rounds={max_rounds}; "
            "raise max_rounds (and regenerate the oracle's unroll bound)")
    return cur


def eccentricity_sampled(edges: rd.Dataset, sources: tuple = (0, 7, 13),
                         num_buckets: int = 256,
                         max_rounds: int = 64) -> pa.Table:
    """(source, ecc, n_reached): sampled-source eccentricity — the max
    BFS depth and reachable-set size per sampled source, i.e. the
    iFUB/pseudo-diameter probe (max over sources lower-bounds the graph
    diameter) and the reachability profile monitoring uses to catch
    partition-breaking ingestion bugs. Rides the SAME multi-source
    BFS wavefront as :func:`harmonic_sampled` / :func:`betweenness_sampled`
    (:func:`_frontier_bfs_sigma`, one fused exchange per round, rounds =
    eccentricity); the per-source reduction is register-sized (one
    (max, count) partial per source per batch), so only #sources rows
    reach the driver.

    Exact integers end to end: depths are int64 BFS levels, so the
    DuckDB twin (the shared unrolled forward pass + one GROUP BY) is
    bit-exact."""
    sources = tuple(int(s) for s in sources)
    if len(set(sources)) != len(sources):
        raise ValueError("eccentricity sources must be distinct")

    def ded_comb(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        keep = src != dst
        pk = np.unique(src[keep] * _SHIFT + dst[keep])
        return pa.table({"pk": np.concatenate([pk, [_SENT]])})

    def ded_fin(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = np.unique(pk[pk >= 0])
        return pa.table({"src": np.concatenate([pk // _SHIFT, [_SENT]]),
                         "dst": np.concatenate([pk % _SHIFT, [_SENT]])})

    simple = bucketed_group_agg(edges, ded_comb, "pk", ded_fin,
                                num_buckets=num_buckets).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("src"), 0)),
        batch_format="pyarrow")
    state = _frontier_bfs_sigma(simple, sources, max_rounds, num_buckets)

    def partial(t: pa.Table) -> pa.Table:
        si, d = _np(t.column("si")), _np(t.column("d"))
        node = _np(t.column("node"))
        keep = (si >= 0) & (node >= 0)   # drop exchange sentinels
        si, d = si[keep], d[keep]
        g = pa.table({"si": pa.array(si, pa.int64()),
                      "d": pa.array(d, pa.int64())}) \
            .group_by("si").aggregate([("d", "max"), ("d", "count")])
        return pa.table({"si": g.column("si"),
                         "mx": g.column("d_max"),
                         "cnt": g.column("d_count")})

    # register-sized driver pull: #sources rows per state batch
    parts = pa.concat_tables(
        state.map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))
    acc: dict = {}
    for row in parts.to_pylist():
        mx, cnt = acc.get(row["si"], (0, 0))
        acc[row["si"]] = (max(mx, row["mx"]), cnt + row["cnt"])
    out_s, out_e, out_n = [], [], []
    for i, s in enumerate(sources):
        mx, cnt = acc.get(i, (0, 0))
        out_s.append(s)
        out_e.append(mx)
        out_n.append(cnt)
    return pa.table({"source": pa.array(out_s, pa.int64()),
                     "ecc": pa.array(out_e, pa.int64()),
                     "n_reached": pa.array(out_n, pa.int64())})


def triad_motifs(edges: rd.Dataset, num_buckets: int = 256) -> rd.Dataset:
    """One row (n_transitive, n_cyclic): the directed-closure census over
    the DISTINCT directed edge set — n_transitive counts ordered triples
    (a, b, c) with a->b, b->c, a->c (a feed-forward/transitive closure,
    counted once per middle b like the SQL three-way join), n_cyclic
    counts directed 3-cycles a->b->c->a once per cycle (the wedge probe
    fires on all 3 rotations; divide by 3). The cyclic:transitive ratio
    is the classic motif signature separating hierarchical graphs
    (feed-forward-dominated, e.g. citation/dependency DAG-ish) from flow
    graphs (cycle-rich) — Milo et al., Science 2002.

    Scale shape — three bucketed int64 exchanges, no driver edge set:
      1. pk-keyed distinct of directed edges (packed a*2^31+b key);
      2. middle-node-keyed wedge pass: per node, in-neighbors x
         out-neighbors (a != c) emit TWO probe keys per wedge —
         pk(a, c) tagged transitive, pk(c, a) tagged cyclic;
      3. pk-keyed membership semi-join of probes against the edge set,
         counting register rows per bucket that SUM-merge.
    Wedge volume is sum_b in(b)*out(b); this synthetic family bounds
    out-degree at 5 so no cap is needed for exactness (the oracle has
    none). At 100 TB the standard mitigation is degree-threshold
    splitting of hub middles before the cross product — documented here
    rather than silently capped, because an engine-only cap would
    diverge from the uncapped SQL twin on hub-heavy data."""
    def dedup_comb(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        if (src >= (1 << 31)).any() or (dst >= (1 << 31)).any():
            raise ValueError("triad_motifs: node ids must be < 2^31 "
                             "(packed-pair key)")
        keep = src != dst
        pk = np.unique(src[keep] * _SHIFT + dst[keep])
        return pa.table({"pk": pa.array(
            np.concatenate([pk, [_SENT]]), pa.int64())})

    def dedup_fin(t: pa.Table) -> pa.Table:
        pk = np.unique(_np(t.column("pk")))
        return pa.table({"pk": pa.array(
            np.concatenate([pk[pk >= 0], [_SENT]]), pa.int64())})

    dire = bucketed_group_agg(edges, dedup_comb, "pk", dedup_fin,
                              num_buckets=num_buckets).materialize()

    # 2. wedge pass keyed on the middle node
    def endpoint_rows(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = pk[pk >= 0]
        src, dst = pk // _SHIFT, pk % _SHIFT
        return pa.table({
            # edge a->b contributes (node=b, other=a, dir=0 "in") and
            # (node=a, other=b, dir=1 "out")
            "node": pa.array(np.concatenate([dst, src, [_SENT]]),
                             pa.int64()),
            "other": pa.array(np.concatenate([src, dst, [_SENT]]),
                              pa.int64()),
            "dir": pa.array(
                np.concatenate([np.zeros(len(pk), np.int64),
                                np.ones(len(pk), np.int64), [0]]),
                pa.int64())})

    def wedge_probes(t: pa.Table) -> pa.Table:
        node = _np(t.column("node"))
        keep = node >= 0
        node = node[keep]
        other = _np(t.column("other"))[keep]
        dirb = _np(t.column("dir"))[keep]
        out_pk: list[np.ndarray] = []
        out_tag: list[np.ndarray] = []
        if len(node):
            order = np.lexsort((other, dirb, node))
            node, other, dirb = node[order], other[order], dirb[order]
            starts = np.flatnonzero(np.concatenate(
                ([True], node[1:] != node[:-1])))
            ends = np.concatenate((starts[1:], [len(node)]))
            for s, e in zip(starts, ends):
                d = dirb[s:e]
                ins = other[s:e][d == 0]
                outs = other[s:e][d == 1]
                if not len(ins) or not len(outs):
                    continue
                a = np.repeat(ins, len(outs))
                c = np.tile(outs, len(ins))
                ok = a != c
                a, c = a[ok], c[ok]
                out_pk.append(a * _SHIFT + c)       # transitive probe a->c
                out_tag.append(np.zeros(len(a), np.int64))
                out_pk.append(c * _SHIFT + a)       # cyclic probe c->a
                out_tag.append(np.ones(len(a), np.int64))
        out_pk.append(np.array([_SENT], np.int64))
        out_tag.append(np.array([0], np.int64))
        return pa.table({"pk": pa.array(np.concatenate(out_pk), pa.int64()),
                         "tag": pa.array(np.concatenate(out_tag),
                                         pa.int64())})

    probes = bucketed_group_agg(dire.map_batches(endpoint_rows,
                                                 batch_format="pyarrow"),
                                lambda t: t, "node", wedge_probes,
                                num_buckets=num_buckets)

    # 3. membership semi-join: probes vs edge presence, register counts
    def edge_rows(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = pk[pk >= 0]
        return pa.table({"pk": pa.array(np.concatenate([pk, [_SENT]]),
                                        pa.int64()),
                         "tag": pa.array([2] * (len(pk) + 1), pa.int64())})

    def count_hits(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        tag = _np(t.column("tag"))
        keep = pk >= 0
        pk, tag = pk[keep], tag[keep]
        eset = np.unique(pk[tag == 2])
        hit = np.isin(pk, eset)
        n_t = int((hit & (tag == 0)).sum())
        n_c = int((hit & (tag == 1)).sum())
        return pa.table({"n_t": pa.array([n_t], pa.int64()),
                         "n_c": pa.array([n_c], pa.int64())})

    regs = bucketed_group_agg(
        probes.union(dire.map_batches(edge_rows, batch_format="pyarrow")),
        lambda t: t, "pk", count_hits, num_buckets=num_buckets)

    def total(t: pa.Table) -> pa.Table:
        n_t = int(pc.sum(t.column("n_t")).as_py() or 0)
        n_c = int(pc.sum(t.column("n_c")).as_py() or 0)
        return pa.table({
            "n_transitive": pa.array([n_t], pa.int64()),
            "n_cyclic": pa.array([n_c // 3], pa.int64())})

    return regs.repartition(1).map_batches(total, batch_format="pyarrow",
                                           batch_size=None)


def entity_salience(triples: rd.Dataset, num_buckets: int = 256
                    ) -> rd.Dataset:
    """(uri, n_mentions, n_docs, salience): position-discounted entity
    prominence over the flagship triple stream — every mention (canonical
    ``obj`` URI, plus non-document ``subj`` URIs, multiplicity KEPT unlike
    :func:`_doc_entity_rows`) contributes an integer weight
    1_000_000 // (1 + span_offset), so lead-position mentions dominate
    (the first-mention-position salience signal of Dunietz & Gillick,
    EACL 2014, in an exactly-SQL-replicable integer form). n_docs is the
    exact distinct document count.

    Scale shape: the per-batch combiner pre-aggregates to (uri, doc_id)
    granularity (mention count + weight sum per doc), one uri-keyed
    bucketed exchange moves those partials, and the finalize merges doc
    rows per uri — exchange volume is distinct (uri, doc) pairs, never
    raw mentions."""
    def comb(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id")
        subj, obj = t.column("subj"), t.column("obj")
        off = pc.cast(t.column("span_offset"), pa.int64())
        w = pc.divide(pa.scalar(1_000_000, pa.int64()),
                      pc.add(off, pa.scalar(1, pa.int64())))
        base = pa.table({"uri": obj, "doc_id": doc, "w": w})
        is_ent = pc.invert(pc.starts_with(subj, "sdpg.gr/Document/"))
        srows = pa.table({"uri": subj.filter(is_ent),
                          "doc_id": doc.filter(is_ent),
                          "w": w.filter(is_ent)})
        g = pa.concat_tables([base, srows]) \
            .group_by(["uri", "doc_id"]) \
            .aggregate([([], "count_all"), ("w", "sum")])
        # sentinel: "" uri cannot occur (URIs carry the sdpg.gr scheme)
        return pa.table({
            "uri": pa.array(g.column("uri").to_pylist() + [""],
                            pa.string()),
            "doc_id": pa.array(g.column("doc_id").to_pylist() + [""],
                               pa.string()),
            "m": pa.array(g.column("count_all").to_pylist() + [0],
                          pa.int64()),
            "w": pa.array(g.column("w_sum").to_pylist() + [0],
                          pa.int64())})

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("uri"), ""))
        # merge same-(uri, doc) partials from different batches first,
        # then reduce doc rows per uri
        per_doc = t.group_by(["uri", "doc_id"]) \
            .aggregate([("m", "sum"), ("w", "sum")])
        g = per_doc.group_by("uri").aggregate(
            [("m_sum", "sum"), ("w_sum", "sum"), ([], "count_all")])
        out = pa.table({
            "uri": g.column("uri"),
            "n_mentions": pc.cast(g.column("m_sum_sum"), pa.int64()),
            "n_docs": pc.cast(g.column("count_all"), pa.int64()),
            "salience": pc.cast(g.column("w_sum_sum"), pa.int64())})
        sent = pa.table({"uri": pa.array([""], pa.string()),
                         "n_mentions": pa.array([0], pa.int64()),
                         "n_docs": pa.array([0], pa.int64()),
                         "salience": pa.array([0], pa.int64())})
        return pa.concat_tables([out, sent])

    out = bucketed_group_agg(triples, comb, "uri", fin,
                             num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("uri"), "")),
        batch_format="pyarrow")


def _mis_prio(nodes: np.ndarray, seed: int) -> np.ndarray:
    """Unique int64 Luby priority per node: (sha8 % 2^31) * 2^31 + node —
    sha-ordered, node-id tiebreak, collision-free (node < 2^31 asserted
    upstream), < 2^62 so int64-safe. DuckDB twin:
    (('0x'||substr(sha256('mis|seed|'||v),1,8))::UBIGINT % 2147483648)
    * 2147483648 + v."""
    return np.fromiter(
        ((sha_int(f"mis|{seed}|{int(v)}") % (1 << 31)) * (1 << 31) + int(v)
         for v in nodes), np.int64, count=len(nodes))


def _undirected_distinct(edges: rd.Dataset, op_name: str,
                         num_buckets: int,
                         materialize: bool = True) -> rd.Dataset:
    """Distinct undirected simple edge set as packed int64 keys
    pk = min*2^31 + max (self-loops dropped, sentinel-bearing) — the
    shared front of the symmetry-breaking family. ``materialize`` (the
    MIS/matching default — they re-scan the set every round) is off for
    single-consumer callers like greedy_coloring, which derive their own
    materialized state from it."""
    def canon(t: pa.Table) -> pa.Table:
        src, dst = _np(t.column("src")), _np(t.column("dst"))
        _check_ids(src, dst)
        if (src >= (1 << 31)).any() or (dst >= (1 << 31)).any():
            raise ValueError(f"{op_name}: node ids must be < 2^31 "
                             "(packed-pair key / priority layout)")
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b = np.maximum(src[keep], dst[keep])
        pk = np.unique(a * _SHIFT + b)
        return pa.table({"pk": pa.array(np.concatenate([pk, [_SENT]]),
                                        pa.int64())})

    def distinct(t: pa.Table) -> pa.Table:
        pk = np.unique(_np(t.column("pk")))
        return pa.table({"pk": pa.array(
            np.concatenate([pk[pk >= 0], [_SENT]]), pa.int64())})

    out = bucketed_group_agg(edges, canon, "pk", distinct,
                             num_buckets=num_buckets)
    return out.materialize() if materialize else out


def _count_pk(ds: rd.Dataset) -> int:
    """Real (sentinel-free) row count of a pk dataset — one vectorized
    register pass, not driver row shipping."""
    return int(ds.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int((_np(t.column("pk")) >= 0).sum())], pa.int64())}),
        batch_format="pyarrow").sum("n") or 0)


def _surviving_edges(tagged: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """From (pk, kill) rows — two per edge, one per endpoint — keep the
    pks where no row was killed. Shared by the MIS and matching rounds."""
    def alive(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        keep = pk >= 0
        pk = pk[keep]
        kill = _np(t.column("kill"))[keep]
        order = np.argsort(pk, kind="stable")
        pk, kill = pk[order], kill[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], pk[1:] != pk[:-1]))) if len(pk) else \
            np.empty(0, np.int64)
        mx = np.maximum.reduceat(kill, starts) if len(pk) else \
            np.empty(0, np.int64)
        out = pk[starts][mx == 0] if len(pk) else pk
        return pa.table({"pk": pa.array(
            np.concatenate([out, [_SENT]]), pa.int64())})

    return bucketed_group_agg(tagged, lambda t: t, "pk", alive,
                              num_buckets=num_buckets).materialize()


def maximal_independent_set(edges: rd.Dataset, seed: int = 42,
                            max_iters: int = 48,
                            num_buckets: int = 256) -> rd.Dataset:
    """(node,) — THE maximal independent set selected by Luby's algorithm
    (Luby 1986) under a FIXED sha-derived priority order: each round,
    every undecided node whose priority is a strict local minimum among
    its undecided neighbors joins the set and knocks its neighbors out;
    isolated undecided nodes join unconditionally. With fixed priorities
    this is exactly the greedy MIS in priority order, so the output is
    deterministic and the DuckDB twin (the same rounds unrolled with
    MATERIALIZED per-round CTEs, the graph_betweenness discipline)
    matches bit-for-bit. Rounds = O(log n) w.h.p. — the textbook
    symmetry-breaking primitive behind distributed coloring/matching.

    Scale shape: three bucketed exchanges per round, nothing node-sized
    on the driver —
      1. node-keyed: local-min test over the undecided adjacency; the
         winner's bucket holds its full neighbor list, so winner AND
         knocked-out rows come out of the same finalize;
      2. node-keyed: dead-set semi-join tagging each edge row and
         filtering the undecided-node set;
      3. pk-keyed: an edge survives iff neither endpoint row was tagged.
    Priorities recompute from sha anywhere (broadcast-free); at 100 TB
    swap the per-node Python sha for the vectorized fast family (the
    hash_family pattern in ops/dedup.py)."""
    und_edges = _undirected_distinct(edges, "maximal_independent_set",
                                     num_buckets)

    def node_rows(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = pk[pk >= 0]
        return pa.table({"node": pa.array(np.concatenate(
            [np.unique(np.concatenate([pk // _SHIFT, pk % _SHIFT]))
             if len(pk) else np.empty(0, np.int64), [_SENT]]), pa.int64())})

    def node_distinct(t: pa.Table) -> pa.Table:
        n = np.unique(_np(t.column("node")))
        return pa.table({"node": pa.array(
            np.concatenate([n[n >= 0], [_SENT]]), pa.int64())})

    und_nodes = bucketed_group_agg(und_edges, node_rows, "node",
                                   node_distinct,
                                   num_buckets=num_buckets).materialize()

    mis_parts: list[rd.Dataset] = []
    rounds = 0
    # carry the live-edge count across the loop: counting at the END of
    # each body doubles as the next round's check, so the common
    # convergent exit pays no redundant distributed recount
    n_left = _count_pk(und_edges)
    while rounds < max_iters and n_left > 0:
        rounds += 1

        # --- exchange 1: local-min winners + their knocked-out neighbors
        def adj_rows(t: pa.Table) -> pa.Table:
            pk = _np(t.column("pk"))
            pk = pk[pk >= 0]
            a, b = pk // _SHIFT, pk % _SHIFT
            return pa.table({
                "node": pa.array(np.concatenate([a, b, [_SENT]]),
                                 pa.int64()),
                "other": pa.array(np.concatenate([b, a, [_SENT]]),
                                  pa.int64())})

        def local_min(t: pa.Table) -> pa.Table:
            node = _np(t.column("node"))
            keep = node >= 0
            node = node[keep]
            other = _np(t.column("other"))[keep]
            out_node: list[np.ndarray] = []
            out_role: list[np.ndarray] = []
            if len(node):
                order = np.argsort(node, kind="stable")
                node, other = node[order], other[order]
                starts = np.flatnonzero(np.concatenate(
                    ([True], node[1:] != node[:-1])))
                prio_self = _mis_prio(node[starts], seed)
                min_nb = np.minimum.reduceat(_mis_prio(other, seed), starts)
                winners = node[starts][prio_self < min_nb]
                out_node.append(winners)
                out_role.append(np.ones(len(winners), np.int64))
                # knocked-out neighbors: others in each winner's segment
                # (winners comes from sorted segment starts, so it is
                # already unique and ascending — no Python set round-trip)
                wmask = np.isin(node, winners) if len(winners) \
                    else np.zeros(len(node), np.bool_)
                dead = np.unique(other[wmask])
                out_node.append(dead)
                out_role.append(np.full(len(dead), 2, np.int64))
            out_node.append(np.array([_SENT], np.int64))
            out_role.append(np.array([0], np.int64))
            return pa.table({"node": pa.array(np.concatenate(out_node),
                                              pa.int64()),
                             "role": pa.array(np.concatenate(out_role),
                                              pa.int64())})

        verdicts = bucketed_group_agg(
            und_edges.map_batches(adj_rows, batch_format="pyarrow"),
            lambda t: t, "node", local_min,
            num_buckets=num_buckets).materialize()

        winners = verdicts.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays([
                t.filter(pc.equal(t.column("role"), 1))
                .column("node").combine_chunks(),
                pa.array([_SENT], pa.int64())])}),
            batch_format="pyarrow")
        mis_parts.append(winners.materialize())

        # --- exchange 2: dead-set semi-join over edge rows + node set
        def edge_side_rows(t: pa.Table) -> pa.Table:
            pk = _np(t.column("pk"))
            pk = pk[pk >= 0]
            a, b = pk // _SHIFT, pk % _SHIFT
            return pa.table({
                "node": pa.array(np.concatenate([a, b, [_SENT]]),
                                 pa.int64()),
                "pk": pa.array(np.concatenate([pk, pk, [-2]]), pa.int64()),
                "role": pa.array(np.full(2 * len(pk) + 1, 3, np.int64),
                                 pa.int64())})

        def und_node_rows(t: pa.Table) -> pa.Table:
            n = _np(t.column("node"))
            n = n[n >= 0]
            return pa.table({
                "node": pa.array(np.concatenate([n, [_SENT]]), pa.int64()),
                "pk": pa.array(np.full(len(n) + 1, -2, np.int64),
                               pa.int64()),
                "role": pa.array(np.full(len(n) + 1, 4, np.int64),
                                 pa.int64())})

        def dead_tag(t: pa.Table) -> pa.Table:
            node = _np(t.column("node"))
            keep = node >= 0
            node = node[keep]
            pk = _np(t.column("pk"))[keep]
            role = _np(t.column("role"))[keep]
            dead = np.unique(node[(role == 1) | (role == 2)])
            is_dead = np.isin(node, dead)
            # edge rows: (pk, kill); surviving und-node rows: (node,)
            em = role == 3
            out_pk = pk[em]
            out_kill = is_dead[em].astype(np.int64)
            nm = (role == 4) & ~is_dead
            surv = node[nm]
            return pa.table({
                "pk": pa.array(np.concatenate(
                    [out_pk, np.full(len(surv), -3, np.int64), [-2]]),
                    pa.int64()),
                "kill": pa.array(np.concatenate(
                    [out_kill, np.zeros(len(surv), np.int64), [0]]),
                    pa.int64()),
                "node": pa.array(np.concatenate(
                    [np.full(len(out_pk), _SENT, np.int64), surv,
                     [_SENT]]), pa.int64())})

        tagged = bucketed_group_agg(
            und_edges.map_batches(edge_side_rows, batch_format="pyarrow")
            .union(verdicts.map_batches(
                lambda t: pa.table({
                    "node": t.column("node"),
                    "pk": pa.array([-2] * t.num_rows, pa.int64()),
                    "role": t.column("role")}),
                batch_format="pyarrow"))
            .union(und_nodes.map_batches(und_node_rows,
                                         batch_format="pyarrow")),
            lambda t: t, "node", dead_tag,
            num_buckets=num_buckets).materialize()

        und_nodes = tagged.map_batches(
            lambda t: pa.table({"node": pa.concat_arrays([
                t.filter(pc.greater_equal(t.column("node"), 0))
                .column("node").combine_chunks(),
                pa.array([_SENT], pa.int64())])}),
            batch_format="pyarrow").materialize()

        # --- exchange 3: an edge survives iff no endpoint row was killed
        und_edges = _surviving_edges(
            tagged.map_batches(
                lambda t: t.filter(pc.not_equal(t.column("pk"), -3))
                .select(["pk", "kill"]),
                batch_format="pyarrow"), num_buckets)
        n_left = _count_pk(und_edges)

    import logging

    if n_left > 0:
        # round budget exhausted with live edges: appending every
        # undecided node would VIOLATE independence (pairs still joined
        # by surviving edges) — keep only the edge-free undecided nodes
        # and warn that the result may not be maximal.
        logging.getLogger("raykg").warning(
            "maximal_independent_set: round budget %d exhausted with %d "
            "edges remaining — engaged undecided nodes are EXCLUDED, so "
            "the set is independent but may not be maximal; raise "
            "max_iters", max_iters, n_left)

        def engaged_rows(t: pa.Table) -> pa.Table:
            pk = _np(t.column("pk"))
            pk = pk[pk >= 0]
            return pa.table({"node": pa.array(np.concatenate(
                [pk // _SHIFT, pk % _SHIFT, [_SENT]]), pa.int64()),
                "tag": pa.array(np.concatenate(
                    [np.ones(2 * len(pk), np.int64), [0]]), pa.int64())})

        def free_only(t: pa.Table) -> pa.Table:
            node = _np(t.column("node"))
            keep = node >= 0
            node = node[keep]
            tag = _np(t.column("tag"))[keep]
            engaged = np.unique(node[tag == 1])
            und = np.unique(node[tag == 0])
            return pa.table({"node": pa.array(np.concatenate(
                [und[~np.isin(und, engaged)], [_SENT]]), pa.int64())})

        und_nodes = bucketed_group_agg(
            und_nodes.map_batches(
                lambda t: pa.table({
                    "node": t.column("node"),
                    "tag": pa.array([0] * t.num_rows, pa.int64())}),
                batch_format="pyarrow")
            .union(und_edges.map_batches(engaged_rows,
                                         batch_format="pyarrow")),
            lambda t: t, "node", free_only, num_buckets=num_buckets)
    else:
        logging.getLogger("raykg").info(
            "maximal_independent_set: settled after %d rounds", rounds)

    # isolated undecided survivors join the set
    mis_parts.append(und_nodes)
    out = mis_parts[0]
    for p in mis_parts[1:]:
        out = out.union(p)
    return bucketed_group_agg(
        out, lambda t: t, "node",
        lambda t: pa.table({"node": pa.array(np.concatenate(
            [np.unique(_np(t.column("node"))[_np(t.column("node")) >= 0]),
             [_SENT]]), pa.int64())}),
        num_buckets=num_buckets).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("node"), 0)),
        batch_format="pyarrow")


def maximal_matching(edges: rd.Dataset, seed: int = 42,
                     max_iters: int = 48,
                     num_buckets: int = 256) -> rd.Dataset:
    """(node_a, node_b) — THE maximal matching selected greedily by a
    fixed sha-derived edge priority (the distributed-matching round of
    Luby-style symmetry breaking; the multilevel-partitioning coarsening
    primitive — METIS pairs vertices exactly this way): each round, an
    edge joins the matching iff its (priority, pk) is the strict minimum
    among ALL edges sharing either endpoint — i.e. it is the argmin at
    BOTH endpoints — then its two vertices leave the graph. Fixed
    priorities make this the sequential greedy matching in priority
    order: deterministic, and the DuckDB twin (rounds unrolled with
    MATERIALIZED CTEs) matches bit-for-bit.

    Scale shape per round, nothing node-sized on the driver:
      1. node-keyed: per-vertex argmin over incident edges
         ((h, pk) lexicographic, h = sha of the packed pair key);
      2. pk-keyed: an edge wins iff BOTH its endpoints nominated it
         (count of nomination rows == 2); winners emit their endpoints
         as dead;
      3. node-keyed + pk-keyed survival, same semi-join shape as
         :func:`maximal_independent_set`."""
    und_edges = _undirected_distinct(edges, "maximal_matching",
                                     num_buckets)

    def edge_prio(pk: np.ndarray) -> np.ndarray:
        return np.fromiter(
            (sha_int(f"mm|{seed}|{int(p)}") for p in pk),
            np.int64, count=len(pk))

    matched_parts: list[rd.Dataset] = []
    rounds = 0
    # end-of-body count doubles as the next round's check (no redundant
    # distributed recount on the convergent exit — same shape as MIS)
    n_left = _count_pk(und_edges)
    while rounds < max_iters and n_left > 0:
        rounds += 1

        # --- exchange 1: per-vertex argmin nomination
        def side_rows(t: pa.Table) -> pa.Table:
            pk = _np(t.column("pk"))
            pk = pk[pk >= 0]
            h = edge_prio(pk)
            return pa.table({
                "node": pa.array(np.concatenate(
                    [pk // _SHIFT, pk % _SHIFT, [_SENT]]), pa.int64()),
                "pk": pa.array(np.concatenate([pk, pk, [-2]]), pa.int64()),
                "h": pa.array(np.concatenate([h, h, [0]]), pa.int64())})

        def nominate(t: pa.Table) -> pa.Table:
            node = _np(t.column("node"))
            keep = node >= 0
            node = node[keep]
            pk = _np(t.column("pk"))[keep]
            h = _np(t.column("h"))[keep]
            if len(node):
                order = np.lexsort((pk, h, node))
                node, pk = node[order], pk[order]
                starts = np.flatnonzero(np.concatenate(
                    ([True], node[1:] != node[:-1])))
                pk = pk[starts]
            else:
                pk = np.empty(0, np.int64)
            return pa.table({"pk": pa.array(
                np.concatenate([pk, [_SENT]]), pa.int64())})

        noms = bucketed_group_agg(
            und_edges.map_batches(side_rows, batch_format="pyarrow"),
            lambda t: t, "node", nominate, num_buckets=num_buckets)

        # --- exchange 2: winner iff nominated by both endpoints
        def winners_fin(t: pa.Table) -> pa.Table:
            pk = _np(t.column("pk"))
            pk = pk[pk >= 0]
            pk.sort()
            if len(pk):
                starts = np.flatnonzero(np.concatenate(
                    ([True], pk[1:] != pk[:-1])))
                cnt = np.diff(np.concatenate([starts, [len(pk)]]))
                win = pk[starts][cnt == 2]
            else:
                win = pk
            return pa.table({"pk": pa.array(
                np.concatenate([win, [_SENT]]), pa.int64())})

        winners = bucketed_group_agg(noms, lambda t: t, "pk", winners_fin,
                                     num_buckets=num_buckets).materialize()
        matched_parts.append(winners)

        # --- exchange 3: drop edges incident to matched vertices
        def dead_rows(t: pa.Table) -> pa.Table:
            pk = _np(t.column("pk"))
            pk = pk[pk >= 0]
            return pa.table({
                "node": pa.array(np.concatenate(
                    [pk // _SHIFT, pk % _SHIFT, [_SENT]]), pa.int64()),
                "pk": pa.array(np.full(2 * len(pk) + 1, -2, np.int64),
                               pa.int64())})

        def edge_rows(t: pa.Table) -> pa.Table:
            pk = _np(t.column("pk"))
            pk = pk[pk >= 0]
            return pa.table({
                "node": pa.array(np.concatenate(
                    [pk // _SHIFT, pk % _SHIFT, [_SENT]]), pa.int64()),
                "pk": pa.array(np.concatenate([pk, pk, [-2]]), pa.int64())})

        def kill_tag(t: pa.Table) -> pa.Table:
            node = _np(t.column("node"))
            keep = node >= 0
            node = node[keep]
            pk = _np(t.column("pk"))[keep]
            dead = np.unique(node[pk == -2])
            em = pk >= 0
            return pa.table({
                "pk": pa.array(np.concatenate([pk[em], [-2]]), pa.int64()),
                "kill": pa.array(np.concatenate(
                    [np.isin(node[em], dead).astype(np.int64), [0]]),
                    pa.int64())})

        tagged = bucketed_group_agg(
            und_edges.map_batches(edge_rows, batch_format="pyarrow")
            .union(winners.map_batches(dead_rows, batch_format="pyarrow")),
            lambda t: t, "node", kill_tag, num_buckets=num_buckets)

        und_edges = _surviving_edges(tagged, num_buckets)
        n_left = _count_pk(und_edges)

    # warn only when edges genuinely remain — the loop condition re-reads
    # the count taken after the final round, so n_left is current here
    if n_left > 0:
        import logging

        logging.getLogger("raykg").warning(
            "maximal_matching: round budget %d exhausted with %d edges "
            "remaining — matching may not be maximal; raise max_iters",
            max_iters, n_left)

    if not matched_parts:
        return und_edges.map_batches(
            lambda t: pa.table({"node_a": pa.array([], pa.int64()),
                                "node_b": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.union(p)

    def decode(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = pk[pk >= 0]
        return pa.table({
            "node_a": pa.array(pk // _SHIFT, pa.int64()),
            "node_b": pa.array(pk % _SHIFT, pa.int64())})

    return out.map_batches(decode, batch_format="pyarrow")


def relation_stats(triples: rd.Dataset, num_buckets: int = 64
                   ) -> rd.Dataset:
    """(pred, n_triples, n_subj, n_obj, n_docs): the per-predicate
    cardinality profile of the constructed KG — triple count plus exact
    distinct subject/object/document counts. The standard KG QA readout:
    a predicate with n_obj ~ 1 is a constant (suspicious), one with
    n_subj ~ n_triples is functional, and n_docs localizes provenance.

    One pred-keyed bucketed exchange: the per-batch combiner emits
    DISTINCT (pred, kind, value) rows for the three distinct-count kinds
    plus an exact per-batch triple-count register, so the exchange
    carries per-batch-distinct rows, never raw triples re-keyed three
    ways — one vectorized Arrow group_by per batch, no per-row Python
    (the entity_salience combiner shape)."""
    def comb(t: pa.Table) -> pa.Table:
        pred = t.column("pred")

        def tagged(kind: int, col) -> pa.Table:
            return pa.table({
                "pred": pred,
                "kind": pa.array(np.full(t.num_rows, kind, np.int64)),
                "val": pc.cast(col, pa.string())})

        dist = pa.concat_tables([
            tagged(0, t.column("subj")),
            tagged(1, t.column("obj")),
            tagged(2, t.column("doc_id"))])             .group_by(["pred", "kind", "val"]).aggregate([])
        counts = pa.table({"pred": pred}).group_by("pred")             .aggregate([([], "count_all")])
        cnt_rows = pa.table({
            "pred": counts.column("pred"),
            "kind": pa.array(np.full(counts.num_rows, 3, np.int64)),
            "val": pc.cast(counts.column("count_all"), pa.string())})
        sent = pa.table({          # sentinel; predicates are non-empty
            "pred": pa.array([""], pa.string()),
            "kind": pa.array([3], pa.int64()),
            "val": pa.array(["0"], pa.string())})
        return pa.concat_tables([dist, cnt_rows, sent])

    def fin(t: pa.Table) -> pa.Table:
        # vectorized: dedup the distinct-value rows and count them per
        # (pred, kind) in Arrow; only the register-sized per-predicate
        # result (<= 3 rows per predicate, not per distinct VALUE) is
        # ever touched in Python
        t = t.filter(pc.not_equal(t.column("pred"), ""))
        dist = t.filter(pc.not_equal(t.column("kind"), 3)) \
            .group_by(["pred", "kind", "val"]).aggregate([]) \
            .group_by(["pred", "kind"]).aggregate([([], "count_all")])
        c3 = t.filter(pc.equal(t.column("kind"), 3))
        tri = pa.table({"pred": c3.column("pred"),
                        "n": pc.cast(c3.column("val"), pa.int64())}) \
            .group_by("pred").aggregate([("n", "sum")])
        stats: dict[str, list] = {}
        for p, nsum in zip(tri.column("pred").to_pylist(),
                           tri.column("n_sum").to_pylist()):
            stats.setdefault(p, [0, 0, 0, 0])[3] = int(nsum)
        for p, k, c in zip(dist.column("pred").to_pylist(),
                           dist.column("kind").to_pylist(),
                           dist.column("count_all").to_pylist()):
            stats.setdefault(p, [0, 0, 0, 0])[int(k)] = int(c)
        preds = sorted(stats)
        out = pa.table({
            "pred": pa.array(preds, pa.string()),
            "n_triples": pa.array([stats[p][3] for p in preds],
                                  pa.int64()),
            "n_subj": pa.array([stats[p][0] for p in preds], pa.int64()),
            "n_obj": pa.array([stats[p][1] for p in preds], pa.int64()),
            "n_docs": pa.array([stats[p][2] for p in preds], pa.int64())})
        sent = pa.table({
            "pred": pa.array([""], pa.string()),
            "n_triples": pa.array([0], pa.int64()),
            "n_subj": pa.array([0], pa.int64()),
            "n_obj": pa.array([0], pa.int64()),
            "n_docs": pa.array([0], pa.int64())})
        return pa.concat_tables([out, sent])

    out = bucketed_group_agg(triples, comb, "pred", fin,
                             num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("pred"), "")),
        batch_format="pyarrow")


def greedy_coloring(edges: rd.Dataset, seed: int = 42,
                    max_iters: int = 64,
                    num_buckets: int = 256) -> rd.Dataset:
    """(node, color): THE greedy vertex coloring in the fixed sha
    priority order — node v takes the smallest color unused by its
    already-colored neighbors, and may do so only once every
    HIGHER-priority neighbor is colored (Jones & Plassmann 1993; the
    third symmetry-breaking primitive beside
    :func:`maximal_independent_set` and :func:`maximal_matching`).
    Colors <= max degree + 1; rounds = the longest strictly-decreasing
    priority path (16 on the fixture graph), O(log n) w.h.p.
    Deterministic, so the DuckDB twin (rounds unrolled MATERIALIZED)
    is bit-exact.

    Scale shape — ONE bucketed exchange per round, state-passing: each
    node's bucket holds its full local state (adjacency rows with the
    neighbor colors it has HEARD, plus one self row), inbound color
    ANNOUNCEMENTS from the previous round update that state, a node
    whose higher-priority neighbors are all colored decides its mex
    locally and emits one announcement per neighbor (routed by the
    neighbor key in the same output table), and the updated state rides
    to the next round. No anti-join, no separate attach pass, no
    broadcast — priorities recompute from sha inside the bucket.
    Termination = a round that makes no announcements; the per-round
    announcement count is a register-sized sum."""
    und = _undirected_distinct(edges, "greedy_coloring", num_buckets,
                               materialize=False)

    # initial state rows: adjacency (node, other, color=-1 "unheard") and
    # one self row (node, -2, -1 "uncolored") per endpoint
    def init_state(t: pa.Table) -> pa.Table:
        pk = _np(t.column("pk"))
        pk = pk[pk >= 0]
        a, b = pk // _SHIFT, pk % _SHIFT
        selfs = np.unique(np.concatenate([a, b])) if len(pk) else             np.empty(0, np.int64)
        return pa.table({
            "node": pa.array(np.concatenate([a, b, selfs, [_SENT]]),
                             pa.int64()),
            "other": pa.array(np.concatenate(
                [b, a, np.full(len(selfs), -2, np.int64), [-3]]),
                pa.int64()),
            "color": pa.array(np.full(2 * len(pk) + len(selfs) + 1, -1,
                                      np.int64), pa.int64())})

    state = und.map_batches(init_state, batch_format="pyarrow")         .materialize()

    def step(t: pa.Table) -> pa.Table:
        """One Jones-Plassmann round, fully vectorized (no per-node
        Python loop): fold announcements into per-(node, neighbor) max
        colors, decide per-segment readiness via masked reduceat, and
        compute each deciding node's smallest unused color (mex) with the
        sorted-distinct-colors rank trick."""
        node = _np(t.column("node"))
        keep = node >= 0
        node = node[keep]
        other = _np(t.column("other"))[keep]
        color = _np(t.column("color"))[keep]
        sent = (pa.array([_SENT], pa.int64()), pa.array([-3], pa.int64()),
                pa.array([-1], pa.int64()))
        if not len(node):
            return pa.table({"node": sent[0], "other": sent[1],
                             "color": sent[2]})
        BIG = np.iinfo(np.int64).max

        # fold adjacency + announcement rows -> best-known (max) color
        # per (node, neighbor); lexsort keys are (primary) node, then
        # neighbor, then DESCENDING color, so the first row of each
        # (node, neighbor) run carries the max
        am = other >= 0
        n2, o2, c2 = node[am], other[am], color[am]
        order = np.lexsort((-c2, o2, n2))
        n2, o2, c2 = n2[order], o2[order], c2[order]
        first = np.concatenate(
            ([True], (n2[1:] != n2[:-1]) | (o2[1:] != o2[:-1])))
        nb_node, nb_other, nb_color = n2[first], o2[first], c2[first]

        # adjacency segments (one per node with neighbors)
        if len(nb_node):
            seg_starts = np.flatnonzero(np.concatenate(
                ([True], nb_node[1:] != nb_node[:-1])))
        else:
            seg_starts = np.empty(0, np.int64)
        seg_len = np.diff(np.concatenate([seg_starts, [len(nb_node)]]))
        seg_nodes = nb_node[seg_starts]
        seg_idx = np.repeat(np.arange(len(seg_starts)), seg_len)

        # self rows -> current color per node (max folds duplicates)
        s_nodes_all = node[other == -2]
        s_colors_all = color[other == -2]
        so = np.argsort(s_nodes_all, kind="stable")
        s_nodes_all, s_colors_all = s_nodes_all[so], s_colors_all[so]
        s_starts = np.flatnonzero(np.concatenate(
            ([True], s_nodes_all[1:] != s_nodes_all[:-1]))) \
            if len(s_nodes_all) else np.empty(0, np.int64)
        su_nodes = s_nodes_all[s_starts]
        su_color = np.maximum.reduceat(s_colors_all, s_starts) \
            if len(s_nodes_all) else s_colors_all

        # per-adjacency-segment terms, aligned onto the self-node axis
        # (every node with rows carries a self row — init and each round
        # emit one per segment; nodes could in principle arrive
        # self-row-only, with vacuous ready=True / mex=0 defaults)
        min_un_prio = np.full(len(su_nodes), BIG, np.int64)
        mex = np.zeros(len(su_nodes), np.int64)
        pos = np.searchsorted(su_nodes, seg_nodes)
        # min priority over UNCOLORED neighbors (BIG where colored)
        prio_nb = np.where(nb_color == -1, _mis_prio(nb_other, seed), BIG)
        min_un_prio[pos] = np.minimum.reduceat(prio_nb, seg_starts)
        # mex over DISTINCT colored-neighbor colors: sort distinct
        # (segment, color) pairs ascending; within a segment the first
        # rank where color != rank is the gap, else the distinct count
        cm = nb_color >= 0
        if cm.any():
            cs_seg, cs_col = seg_idx[cm], nb_color[cm]
            o3 = np.lexsort((cs_col, cs_seg))
            cs_seg, cs_col = cs_seg[o3], cs_col[o3]
            fu = np.concatenate(
                ([True], (cs_seg[1:] != cs_seg[:-1])
                 | (cs_col[1:] != cs_col[:-1])))
            cs_seg, cs_col = cs_seg[fu], cs_col[fu]
            cstarts = np.flatnonzero(np.concatenate(
                ([True], cs_seg[1:] != cs_seg[:-1])))
            clen = np.diff(np.concatenate([cstarts, [len(cs_seg)]]))
            rank = np.arange(len(cs_seg)) - np.repeat(cstarts, clen)
            gap = np.where(cs_col != rank, rank, BIG)
            seg_mex = np.minimum.reduceat(gap, cstarts)
            seg_mex = np.where(seg_mex == BIG, clen, seg_mex)
            mex[pos[cs_seg[cstarts]]] = seg_mex

        decide = (su_color < 0) & (_mis_prio(su_nodes, seed)
                                   <= min_un_prio)
        new_color = np.where(decide, mex, su_color)

        # announcements: deciding nodes tell every folded neighbor their
        # color, keyed BY the neighbor
        dec_row = decide[np.searchsorted(su_nodes, nb_node)]
        out_node = np.concatenate(
            [nb_node, su_nodes, nb_other[dec_row]])
        out_other = np.concatenate(
            [nb_other, np.full(len(su_nodes), -2, np.int64),
             nb_node[dec_row]])
        out_color = np.concatenate(
            [nb_color, new_color,
             new_color[np.searchsorted(su_nodes, nb_node)][dec_row]])
        return pa.table({
            "node": pa.concat_arrays(
                [pa.array(out_node, pa.int64()), sent[0]]),
            "other": pa.concat_arrays(
                [pa.array(out_other, pa.int64()), sent[1]]),
            "color": pa.concat_arrays(
                [pa.array(out_color, pa.int64()), sent[2]])})

    def count_uncolored(st: rd.Dataset) -> int:
        # remaining uncolored self rows (register-sized sum)
        return int(st.map_batches(
            lambda t: pa.table({"n": pa.array([int((
                (_np(t.column("other")) == -2)
                & (_np(t.column("color")) < 0)
                & (_np(t.column("node")) >= 0)).sum())], pa.int64())}),
            batch_format="pyarrow").sum("n") or 0)

    rounds = 0
    # counting up front (instead of only inside the loop) keeps the
    # max_iters=0 warning well-defined and skips the loop on an
    # already-colored (edgeless) state
    n_uncolored = count_uncolored(state)
    while rounds < max_iters and n_uncolored > 0:
        rounds += 1
        state = bucketed_group_agg(state, lambda t: t, "node", step,
                                   num_buckets=num_buckets).materialize()
        n_uncolored = count_uncolored(state)
    if n_uncolored > 0:
        import logging

        logging.getLogger("raykg").warning(
            "greedy_coloring: round budget %d exhausted with %d nodes "
            "uncolored — those nodes are DROPPED from the output (a -1 "
            "placeholder is not a color); raise max_iters",
            max_iters, n_uncolored)

    # self rows with a real color only: on budget exhaustion uncolored
    # nodes carry -1, which must never surface as a color value
    return state.map_batches(
        lambda t: t.filter(pc.and_(
            pc.and_(pc.equal(t.column("other"), -2),
                    pc.greater_equal(t.column("node"), 0)),
            pc.greater_equal(t.column("color"), 0)))
        .select(["node", "color"]),
        batch_format="pyarrow")
