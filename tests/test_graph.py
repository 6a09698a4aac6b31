"""Graph-analytics operators: degree stats, degree-oriented triangle
counting, integer-exact PageRank (raykg/ops/graph.py). The DuckDB oracle
equivalence runs through tools/check_queries.py; these tests pin the
semantics on handcrafted graphs plus partitioning invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raykg.ops import graph


def _edges(pairs):
    t = pa.table({"src": pa.array([a for a, _ in pairs], pa.int64()),
                  "dst": pa.array([b for _, b in pairs], pa.int64())})
    return rd.from_arrow(t)


def _df(ds, key):
    return ds.to_pandas().sort_values(key).reset_index(drop=True)


def test_degree_stats_tiny():
    # multi-edge (0->1 twice) counts twice; 3 is a pure sink
    ds = _edges([(0, 1), (0, 1), (1, 2), (2, 0), (2, 3)])
    d = _df(graph.degree_stats(ds), "node")
    assert d["node"].tolist() == [0, 1, 2, 3]
    assert d["out_deg"].tolist() == [2, 1, 2, 0]
    assert d["in_deg"].tolist() == [1, 2, 1, 1]


def test_triangles_tiny():
    # two triangles sharing node 2; reverse duplicates, a self-loop and a
    # multi-edge must all collapse into the simple undirected graph
    pairs = [(0, 1), (1, 2), (2, 0), (1, 0), (2, 2), (2, 3), (3, 4),
             (4, 2), (4, 2), (5, 6)]
    t = _df(graph.triangle_counts(_edges(pairs)), "node")
    assert dict(zip(t["node"], t["n_triangles"])) == \
        {0: 1, 1: 1, 2: 2, 3: 1, 4: 1}


def _brute_triangles(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for u, nbrs in adj.items():
        for v in nbrs:
            if v <= u:
                continue
            common = nbrs & adj[v]
            for w in common:
                if w > v:
                    for n in (u, v, w):
                        counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_match_bruteforce_on_synth():
    edges = graph.synth_graph_edges(400)
    pairs = list(zip(*[edges.to_pandas()[c].tolist() for c in ("src", "dst")]))
    expect = _brute_triangles(pairs)
    got = _df(graph.triangle_counts(edges), "node")
    assert dict(zip(got["node"], got["n_triangles"])) == expect


def test_triangles_partitioning_invariant():
    edges = graph.synth_graph_edges(400)
    a = _df(graph.triangle_counts(edges), "node")
    b = _df(graph.triangle_counts(edges.repartition(13), num_buckets=7),
            "node")
    assert a.equals(b)


def test_pagerank_two_node_cycle_exact():
    # 0 <-> 1: every iteration each node sends floor(floor(r*85/100)/1)
    # and restarts from 150000 — closed form is checkable by hand
    ds = _edges([(0, 1), (1, 0)])
    r = 1_000_000
    for _ in range(3):
        r = 150_000 + (r * 85) // 100
    got = _df(graph.pagerank(_edges([(0, 1), (1, 0)]), iters=3), "node")
    assert got["rank_int"].tolist() == [r, r]
    del ds


def test_pagerank_star_sink_and_dangling():
    # 1,2,3 -> 0; node 0 dangles (rank mass drops, never divides by zero)
    got = _df(graph.pagerank(_edges([(1, 0), (2, 0), (3, 0)]), iters=1),
              "node")
    spoke = 150_000   # no in-edges
    hub = 150_000 + 3 * ((1_000_000 * 85) // 100)
    assert dict(zip(got["node"], got["rank_int"])) == \
        {0: hub, 1: spoke, 2: spoke, 3: spoke}


def test_pagerank_partitioning_invariant():
    edges = graph.synth_graph_edges(400)
    a = _df(graph.pagerank(edges, iters=2), "node")
    b = _df(graph.pagerank(edges.repartition(11), iters=2, num_buckets=17),
            "node")
    assert a.equals(b)


def test_node_id_bound_is_loud():
    bad = _edges([(0, 1 << 31)])
    with pytest.raises(Exception, match="2\\^31"):
        graph.triangle_counts(bad).materialize()


def test_synth_graph_determinism_and_shape():
    t = graph.synth_graph_edges(400).to_pandas()
    assert len(t) == len(t.drop_duplicates())          # per-node distinct
    assert (t["src"] != t["dst"]).all()                # no self-loops
    assert t["src"].between(0, 399).all() and t["dst"].between(0, 399).all()
    # community structure: most edges stay inside the 40-node community
    intra = (t["src"] // 40 == t["dst"] // 40).mean()
    assert intra > 0.6
    t2 = graph.synth_graph_edges(400).to_pandas()
    assert np.array_equal(t.sort_values(["src", "dst"]).values,
                          t2.sort_values(["src", "dst"]).values)


def test_connected_components_tiny():
    # components {0,1,2} and {5,7}; 9's self-loop drops it from the universe
    got = _df(graph.connected_components(
        _edges([(1, 0), (2, 1), (0, 2), (5, 7), (9, 9)]), num_buckets=8),
        "node")
    assert dict(zip(got["node"], got["component"])) == \
        {0: 0, 1: 0, 2: 0, 5: 5, 7: 5}


def test_connected_components_chain_needs_iterations():
    # a 12-node path: label 0 must travel 11 hops (diameter rounds)
    got = _df(graph.connected_components(
        _edges([(i, i + 1) for i in range(11)]), num_buckets=4), "node")
    assert got["component"].tolist() == [0] * 12


def test_connected_components_big_ids_no_packing_ceiling():
    # ids >= 2^31 are fine here (two-column pair identity, unlike
    # triangle_counts' packed key)
    big = 1 << 40
    got = _df(graph.connected_components(
        _edges([(big, big + 1), (big + 1, 3)]), num_buckets=4), "node")
    assert dict(zip(got["node"], got["component"])) == \
        {3: 3, big: 3, big + 1: 3}


def test_connected_components_partitioning_invariant():
    edges = graph.synth_graph_edges(400, p_intra=1.0)
    a = _df(graph.connected_components(edges), "node")
    b = _df(graph.connected_components(edges.repartition(11),
                                       num_buckets=17), "node")
    assert a.equals(b)
    assert set(a["component"].unique()) <= set(range(0, 400, 40))


def test_bfs_depths_tiny():
    # 0 -> 1 -> 2 -> 3 plus a shortcut 0 -> 2; 9 -> 0 is unreachable
    # (direction matters); 4 isolated
    got = _df(graph.bfs_depths(
        _edges([(0, 1), (1, 2), (2, 3), (0, 2), (9, 0), (4, 4)]),
        source=0, num_buckets=8), "node")
    assert dict(zip(got["node"], got["depth"])) == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_depths_chain_and_source_only():
    # a 10-node directed path needs depth-9 propagation
    got = _df(graph.bfs_depths(_edges([(i, i + 1) for i in range(9)]),
                               source=0, num_buckets=4), "node")
    assert got["depth"].tolist() == list(range(10))
    # source with no out-edges: output is just the source at depth 0
    got = _df(graph.bfs_depths(_edges([(1, 2)]), source=0, num_buckets=4),
              "node")
    assert got["node"].tolist() == [0] and got["depth"].tolist() == [0]


def test_bfs_depths_partitioning_invariant():
    edges = graph.synth_graph_edges(400)
    a = _df(graph.bfs_depths(edges, source=0), "node")
    b = _df(graph.bfs_depths(edges.repartition(11), source=0,
                             num_buckets=17), "node")
    assert a.equals(b)
    assert int(a.loc[a["node"] == 0, "depth"].iloc[0]) == 0


def test_cc_star_tiny():
    got = _df(graph.connected_components_star(
        _edges([(1, 0), (2, 1), (0, 2), (5, 7), (9, 9)]), num_buckets=8),
        "node")
    assert dict(zip(got["node"], got["component"])) == \
        {0: 0, 1: 0, 2: 0, 5: 5, 7: 5}


def test_cc_star_long_chain_in_log_rounds():
    # a 64-node path has diameter 63: propagation needs 63 rounds, star
    # contraction must finish well inside 12 (the O(log^2 n) claim)
    got = _df(graph.connected_components_star(
        _edges([(i, i + 1) for i in range(63)]), max_iters=12,
        num_buckets=4), "node")
    assert got["component"].tolist() == [0] * 64


def test_cc_star_matches_propagation_and_partitioning():
    edges = graph.synth_graph_edges(400)
    a = _df(graph.connected_components(edges), "node")
    b = _df(graph.connected_components_star(edges), "node")
    c = _df(graph.connected_components_star(edges.repartition(11),
                                            num_buckets=17), "node")
    assert a.equals(b) and a.equals(c)


def test_cc_star_big_ids():
    big = 1 << 40
    got = _df(graph.connected_components_star(
        _edges([(big, big + 1), (big + 1, 3)]), num_buckets=4), "node")
    assert dict(zip(got["node"], got["component"])) == \
        {3: 3, big: 3, big + 1: 3}


def test_kcore_triangle_with_pendants(ray_session):
    """2-core of a triangle with pendant chains = exactly the triangle:
    the chain peels inward one node per round (depth > 1 exercises the
    iterative peel, not just one degree filter)."""
    # triangle 0-1-2; chain 2-3-4-5 hangs off it; duplicate/reversed
    # edges must not inflate degrees
    ds = _edges([(0, 1), (1, 2), (2, 0), (0, 2),
                 (2, 3), (3, 4), (4, 5), (5, 4)])
    d = _df(graph.kcore(ds, k=2), "node")
    assert d["node"].tolist() == [0, 1, 2]
    assert d["deg"].tolist() == [2, 2, 2]
    # k=3 peels everything (typed empty result, not a crash)
    assert graph.kcore(ds, k=3).count() == 0


def test_kcore_matches_brute_force_peel(ray_session):
    """Synchronous peel on the synthetic graph == a driver-side
    reference peel, and the result is block-layout invariant."""
    import collections

    rows = graph.synth_graph_edges().to_pandas()
    adj = collections.defaultdict(set)
    for s, t in zip(rows["src"], rows["dst"]):
        if s != t:
            adj[s].add(t)
            adj[t].add(s)
    k = 4
    deg = {n: len(v) for n, v in adj.items()}
    live = set(deg)
    while True:
        dead = [n for n in live if deg[n] < k]
        if not dead:
            break
        for n in dead:
            live.discard(n)
            for m in adj[n]:
                if m in live:
                    deg[m] -= 1
    got = _df(graph.kcore(graph.synth_graph_edges(), k=k), "node")
    assert set(got["node"]) == live
    assert got["deg"].min() >= k
    got2 = _df(graph.kcore(graph.synth_graph_edges().repartition(9), k=k),
               "node")
    assert got.equals(got2)


def test_label_propagation_two_triangles_with_bridge(ray_session):
    """Two triangles joined by one bridge settle into two communities
    (per-triangle min label) within 4 synchronous majority rounds; the
    result is block-layout invariant."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3),
             (1, 0)]   # duplicate/reversed edge must not bias counts
    ds = _edges(edges)
    d = _df(graph.label_propagation(ds, rounds=4), "node")
    assert d["node"].tolist() == [0, 1, 2, 3, 4, 5]
    assert d["community"].tolist() == [0, 0, 0, 2, 2, 2]
    d2 = _df(graph.label_propagation(_edges(edges).repartition(5),
                                     rounds=4), "node")
    assert d.equals(d2)


def test_negative_samples_are_nonedges_and_stable(ray_session):
    """Every sample is a non-edge and non-self-loop; counts respect
    per_node; the draw is reshard-stable."""
    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (1, 3)]
    ds = _edges(edges)
    d = _df(graph.negative_samples(ds, n_nodes=4, per_node=2, draws=16),
            "src")
    eset = set(edges)
    for s, nd in zip(d["src"], d["neg_dst"]):
        assert (s, nd) not in eset and s != nd
    assert (d.groupby("src").size() <= 2).all()
    # n_nodes=4 with dense edges still leaves at least one negative per
    # node here (16 draws cover the 4-value space with certainty ~1)
    assert set(d["src"]) == {0, 1, 2, 3}
    d2 = _df(graph.negative_samples(_edges(edges).repartition(4),
                                    n_nodes=4, per_node=2, draws=16), "src")
    assert d.reset_index(drop=True).equals(d2.reset_index(drop=True))


# ---------------------------------------------------------------------------
# random walks
# ---------------------------------------------------------------------------

def _brute_walks(pairs, walk_len, walks_per_node, seed=42):
    from raykg.functions.hashing import sha_int
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    rows = []
    for start in sorted(adj):
        for r in range(walks_per_node):
            cur = start
            rows.append((start, r, 0, cur))
            for s in range(1, walk_len + 1):
                nbrs = sorted(adj.get(cur, ()))
                if not nbrs:
                    break
                cur = nbrs[sha_int(f"walk|{seed}|{start}|{r}|{s}")
                           % len(nbrs)]
                rows.append((start, r, s, cur))
    return sorted(rows)


def test_random_walks_tiny():
    # 3 is a dead end: walks passing through it stop early
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 0), (2, 3)]
    got = _df(graph.random_walks(_edges(pairs), walk_len=3,
                                 walks_per_node=2), ["start", "walk", "step"])
    rows = sorted(zip(got["start"], got["walk"], got["step"], got["node"]))
    assert rows == _brute_walks(pairs, 3, 2)
    # step-0 rows exist for every distinct src x walk
    step0 = got[got["step"] == 0]
    assert len(step0) == 3 * 2


def test_random_walks_follow_edges():
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 0), (2, 3), (3, 4),
             (4, 0), (4, 5)]
    got = graph.random_walks(_edges(pairs), walk_len=4,
                             walks_per_node=1).to_pandas()
    eset = set(pairs)
    byw = {}
    for _, r in got.iterrows():
        byw.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["node"]
    for (_, _), steps in byw.items():
        seq = [steps[s] for s in sorted(steps)]
        assert all((a, b) in eset for a, b in zip(seq, seq[1:]))
        # no gaps: steps are 0..len-1
        assert sorted(steps) == list(range(len(steps)))


def test_random_walks_partition_invariance():
    pairs = [(i % 7, (i * 3 + 1) % 7) for i in range(30) if i % 7 !=
             (i * 3 + 1) % 7]
    a = graph.random_walks(_edges(pairs).repartition(1), walk_len=2,
                           walks_per_node=2).to_pandas()
    b = graph.random_walks(_edges(pairs).repartition(7), walk_len=2,
                           walks_per_node=2).to_pandas()
    key = ["start", "walk", "step"]
    pa_ = a.sort_values(key).reset_index(drop=True)
    pb_ = b.sort_values(key).reset_index(drop=True)
    assert pa_.equals(pb_)


# ---------------------------------------------------------------------------
# link-prediction scores (common neighbors + Adamic-Adar)
# ---------------------------------------------------------------------------

def _brute_linkpred(pairs, min_cn):
    import math

    from raykg.functions.hashing import round_half_away
    adj = {}
    und = set()
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        und.add((min(a, b), max(a, b)))
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            common = adj[u] & adj[v]
            if len(common) >= min_cn:
                aa = sum(sorted(1.0 / math.log(len(adj[w]))
                                for w in common))
                out[(u, v)] = (len(common), float(round_half_away(aa, 4)),
                               1 if (u, v) in und else 0)
    return out


def test_link_prediction_tiny():
    # 0 and 3 share neighbors {1, 2}; 1-2 are also an edge themselves
    pairs = [(0, 1), (0, 2), (3, 1), (3, 2), (1, 2), (4, 0)]
    got = _df(graph.link_prediction_scores(_edges(pairs), min_cn=1),
              ["u", "v"])
    want = _brute_linkpred(pairs, 1)
    assert {(r["u"], r["v"]): (r["cn"], r["aa"], r["is_edge"])
            for _, r in got.iterrows()} == want
    # the flagship prediction: (0, 3) is NOT an edge but shares 2 neighbors
    row = got[(got["u"] == 0) & (got["v"] == 3)].iloc[0]
    assert row["cn"] == 2 and row["is_edge"] == 0


def test_link_prediction_dedups_multiedges_and_directions():
    pairs = [(0, 1), (1, 0), (0, 1), (2, 0), (2, 1), (1, 1)]
    got = _df(graph.link_prediction_scores(_edges(pairs), min_cn=1),
              ["u", "v"])
    assert {(r["u"], r["v"]): (r["cn"], r["aa"], r["is_edge"])
            for _, r in got.iterrows()} == _brute_linkpred(pairs, 1)


def test_link_prediction_hub_cap():
    # star around node 0 with 6 leaves: cap at 4 skips the hub entirely
    # (the warning fires inside the Ray worker; behavior is what we pin)
    pairs = [(0, i) for i in range(1, 7)]
    got = graph.link_prediction_scores(_edges(pairs), min_cn=1,
                                       max_neighbors=4).to_pandas()
    assert len(got) == 0
    # uncapped, every leaf pair shares the hub
    full = graph.link_prediction_scores(_edges(pairs), min_cn=1).to_pandas()
    assert len(full) == 15


def test_link_prediction_partition_invariance():
    pairs = [(i % 9, (i * 5 + 2) % 9) for i in range(40) if i % 9 !=
             (i * 5 + 2) % 9]
    a = _df(graph.link_prediction_scores(_edges(pairs).repartition(1),
                                         min_cn=1), ["u", "v"])
    b = _df(graph.link_prediction_scores(_edges(pairs).repartition(8),
                                         min_cn=1), ["u", "v"])
    assert len(a) > 0
    assert a.equals(b)


def _emb_ds(vecs):
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32())})
    return rd.from_arrow(t)


def test_neighbor_embedding_mean_tiny():
    # node 0 -> {1, 2}: mean of vecs 1 and 2; node 3 maps to vec 3 % 3 = 0.
    # multi-edges count twice (mean weights repeat neighbors), matching
    # the SQL twin's plain inner-join + AVG-over-rows semantics
    edges = _edges([(0, 1), (0, 2), (1, 2), (1, 2), (2, 3)])
    vecs = [[1.0, -2.0], [3.0, 0.5], [5.0, 0.25]]
    out = _df(graph.neighbor_embedding_mean(edges, _emb_ds(vecs)),
              ["node", "dim"])
    got = {(n, d): v for n, d, v in
           zip(out["node"], out["dim"], out["nbr_mean"])}
    assert got[(0, 0)] == pytest.approx((3.0 + 5.0) / 2)
    assert got[(0, 1)] == pytest.approx((0.5 + 0.25) / 2)
    # node 1: vec 2 twice -> exactly vec 2
    assert got[(1, 0)] == pytest.approx(5.0)
    assert got[(1, 1)] == pytest.approx(0.25)
    # node 2 -> dst 3 -> vec_id 3 % 3 = 0
    assert got[(2, 0)] == pytest.approx(1.0)
    assert got[(2, 1)] == pytest.approx(-2.0)
    assert set(out["node"]) == {0, 1, 2}


def test_neighbor_embedding_mean_partition_invariance(ray_session):
    pairs = [(i, (i * 7 + 3) % 20) for i in range(20) for _ in range(2)]
    pairs = [(a, b) for a, b in pairs if a != b]
    vecs = [[float(i), float(-i), 0.5 * i] for i in range(7)]
    base = None
    for blocks in (1, 5):
        e = _edges(pairs).repartition(blocks)
        out = _df(graph.neighbor_embedding_mean(e, _emb_ds(vecs),
                                                num_buckets=8),
                  ["node", "dim"])
        if base is None:
            base = out
        else:
            assert base.equals(out)


def _triples(rows):
    t = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "doc_id": pa.array([r[3] for r in rows], pa.string()),
        "span_offset": pa.array([0] * len(rows), pa.int32())})
    return rd.from_arrow(t)


def test_co_mention_edges_crafted(ray_session):
    D = "sdpg.gr/Document/x"
    a, b, c = "sdpg.gr/Person/a", "sdpg.gr/Person/b", "sdpg.gr/Place/c"
    rows = [
        # doc 1: a mentioned twice (dedup within doc), b once, and a
        # relation a->c puts both endpoints in the doc's entity set
        (D, "mentions", a, "d1"), (D, "mentions", a, "d1"),
        (D, "mentions", b, "d1"), (a, "born_in", c, "d1"),
        # doc 2: a and b again -> (a, b) count rises to 2
        (D, "mentions", a, "d2"), (D, "depicts", b, "d2"),
        # doc 3: c alone -> no pairs
        (D, "mentions", c, "d3"),
    ]
    out = _df(graph.co_mention_edges(_triples(rows), num_buckets=8),
              ["ent_a", "ent_b"])
    got = {(r.ent_a, r.ent_b): int(r.n_docs) for r in out.itertuples()}
    assert got == {(a, b): 2, (a, c): 1, (b, c): 1}


def test_co_mention_edges_partition_invariance(ray_session):
    D = "sdpg.gr/Document/x"
    ents = [f"sdpg.gr/Person/e{i}" for i in range(6)]
    rows = [(D, "mentions", ents[(i * 5 + j) % 6], f"d{i}")
            for i in range(12) for j in range(3)]
    base = None
    for blocks in (1, 7):
        ds = _triples(rows).repartition(blocks)
        out = _df(graph.co_mention_edges(ds, num_buckets=8),
                  ["ent_a", "ent_b"])
        if base is None:
            base = out
        else:
            assert base.equals(out)


def _brute_hits(pairs, iters):
    nodes = sorted({x for p in pairs for x in p})
    h = {n: 1 for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(iters):
        a = {n: 0 for n in nodes}
        for u, v in pairs:
            a[v] += h[u]
        h = {n: 0 for n in nodes}
        for u, v in pairs:
            h[u] += a[v]
    return {n: (h[n], a[n]) for n in nodes}


def test_hits_matches_bruteforce(ray_session):
    # multi-edge 3->2 counts twice; 4's self-loop keeps it self-reinforcing;
    # 1 has in- and out-edges (both scores nonzero)
    pairs = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 2), (4, 4)]
    got = _df(graph.hits(_edges(pairs), iters=2, num_buckets=8), "node")
    eng = {int(r.node): (int(r.hub_int), int(r.auth_int))
           for r in got.itertuples()}
    assert eng == _brute_hits(pairs, 2)


def test_hits_partition_invariance(ray_session):
    edges = graph.synth_graph_edges(400)
    a = _df(graph.hits(edges, iters=2), "node")
    b = _df(graph.hits(edges.repartition(11), iters=2, num_buckets=17),
            "node")
    assert a.equals(b)


def test_hits_overflow_guard(ray_session):
    # a dense bipartite 30x30 graph multiplies scores by ~900 per round:
    # 900^7 > 2^60 -> the loud guard must trip before int64 wraps
    pairs = [(i, 100 + j) for i in range(30) for j in range(30)]
    with pytest.raises(Exception, match="2\\^60"):
        graph.hits(_edges(pairs), iters=7, num_buckets=8).materialize()


def test_cross_modal_alignment_crafted(ray_session):
    D = "sdpg.gr/Document/x"
    a, b = "sdpg.gr/Person/a", "sdpg.gr/Person/b"
    rows = [
        # d1: a depicted AND mentioned (aligned); b text-only
        (D, "depicts", a, "d1"), (D, "mentions", a, "d1"),
        (D, "mentions", b, "d1"),
        # d2: a depicted only; b is a relation SUBJECT (text side) whose
        # object a counts as text too -> a: dep+txt aligned again
        (D, "depicts", a, "d2"), (b, "knows", a, "d2"),
        # d3: b depicted only
        (D, "depicts", b, "d3"),
    ]
    out = _df(graph.cross_modal_alignment(_triples(rows), num_buckets=8),
              "uri")
    got = {r.uri: (int(r.n_depicted), int(r.n_texted), int(r.n_both))
           for r in out.itertuples()}
    assert got == {a: (2, 2, 2), b: (1, 2, 0)}


def test_cross_modal_alignment_partition_invariance(ray_session):
    D = "sdpg.gr/Document/x"
    ents = [f"sdpg.gr/Person/e{i}" for i in range(5)]
    rows = []
    for i in range(15):
        rows.append((D, "depicts", ents[i % 5], f"d{i}"))
        rows.append((D, "mentions", ents[(i + 1) % 5], f"d{i}"))
    base = None
    for blocks in (1, 6):
        out = _df(graph.cross_modal_alignment(
            _triples(rows).repartition(blocks), num_buckets=8), "uri")
        if base is None:
            base = out
        else:
            assert base.equals(out)


def test_personalized_pagerank_two_node_cycle():
    # 0 <-> 1, teleport to 0: r0 starts at SCALE, r1 at 0; closed form by
    # hand for 2 rounds of the integer recurrence
    base = 150_000
    r0, r1 = 1_000_000, 0
    for _ in range(2):
        s0 = (r0 * 85) // 100
        s1 = (r1 * 85) // 100
        r0, r1 = base + s1, s0
    got = _df(graph.pagerank(_edges([(0, 1), (1, 0)]), iters=2,
                             teleport_to=0), "node")
    assert dict(zip(got["node"], got["rank_int"])) == {0: r0, 1: r1}


def test_personalized_pagerank_localizes_mass(ray_session):
    # with p_intra=1.0 communities are disconnected: a walk restarting at
    # node 0 must put zero mass outside node 0's 40-node community
    edges = graph.synth_graph_edges(400, p_intra=1.0)
    got = _df(graph.pagerank(edges, iters=3, teleport_to=0), "node")
    inside = got[got["node"] < 40]
    outside = got[got["node"] >= 40]
    assert int(inside["rank_int"].sum()) > 0
    assert int(outside["rank_int"].sum()) == 0
    # and the seed holds the largest rank
    assert int(got.loc[got["rank_int"].idxmax(), "node"]) == 0


def test_degree_assortativity_matches_corrcoef(ray_session):
    edges = graph.synth_graph_edges(400)
    out = graph.degree_assortativity(edges).to_pandas()
    assert len(out) == 1
    pdf = edges.to_pandas()
    od = pdf.groupby("src").size()
    idg = pdf.groupby("dst").size()
    x = od.loc[pdf["src"]].values.astype(float)
    y = idg.loc[pdf["dst"]].values.astype(float)
    assert out.r[0] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=5e-7)
    assert int(out.n_edges[0]) == len(pdf)
    assert int(out.sum_x[0]) == int(x.sum())


def test_degree_assortativity_perfect_line(ray_session):
    # x == y on every edge of a 3-cycle (all degrees 1) -> zero variance
    # denominator -> r = 0.0 by the guard, registers still exact
    out = graph.degree_assortativity(
        _edges([(0, 1), (1, 2), (2, 0)]), num_buckets=8).to_pandas()
    assert int(out.n_edges[0]) == 3 and int(out.sum_xy[0]) == 3
    assert out.r[0] == 0.0
    # degree variety across edges: registers count multi-edges per
    # occurrence (x = out_deg(src) repeats for each of src's edges)
    pairs = [(0, 9), (0, 8), (1, 9), (5, 9), (6, 7)]
    out2 = graph.degree_assortativity(_edges(pairs),
                                      num_buckets=8).to_pandas()
    assert int(out2.n_edges[0]) == 5
    assert int(out2.sum_x[0]) == 2 + 2 + 1 + 1 + 1   # out_deg(0) twice


def test_degree_assortativity_partition_invariance(ray_session):
    edges = graph.synth_graph_edges(400)
    a = graph.degree_assortativity(edges).to_pandas()
    b = graph.degree_assortativity(edges.repartition(11),
                                   num_buckets=17).to_pandas()
    assert a.equals(b)


def test_reciprocity_crafted(ray_session):
    # 0<->1 reciprocal; 1->2 one-way; self-loop and multi-edge collapse
    pairs = [(0, 1), (1, 0), (1, 2), (1, 2), (3, 3)]
    out = graph.reciprocity(_edges(pairs), num_buckets=8).to_pandas()
    assert out.to_dict("records") == [
        {"n_edges": 3, "n_reciprocal": 2, "reciprocity": 0.666667}]


def test_reciprocity_partition_invariance(ray_session):
    edges = graph.synth_graph_edges(400)
    a = graph.reciprocity(edges).to_pandas()
    b = graph.reciprocity(edges.repartition(13),
                          num_buckets=7).to_pandas()
    assert a.equals(b)


def _dijkstra(pairs, weights, source, budget):
    import heapq

    adj = {}
    for (a, b), w in zip(pairs, weights):
        adj.setdefault(a, []).append((b, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return {n: d for n, d in dist.items() if d <= budget}


def test_sssp_weighted_matches_dijkstra(ray_session):
    from raykg.functions.hashing import sha_int

    edges = graph.synth_graph_edges(400)
    pdf = edges.to_pandas()
    pairs = list(zip(pdf["src"].astype(int), pdf["dst"].astype(int)))
    ws = [1 + sha_int(f"gw|42|{a}|{b}") % 9 for a, b in pairs]
    got = _df(graph.sssp_weighted(edges, source=0, max_dist=30), "node")
    assert dict(zip(got["node"], got["dist"])) == \
        _dijkstra(pairs, ws, 0, 30)


def test_sssp_weighted_budget_and_cheap_detour(ray_session):
    # direct 0->2 has a sha weight; so does the 0->1->2 detour — whichever
    # is cheaper must win, and a node beyond the budget must vanish
    from raykg.functions.hashing import sha_int

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    ws = {p: 1 + sha_int(f"gw|42|{p[0]}|{p[1]}") % 9 for p in pairs}
    best2 = min(ws[(0, 2)], ws[(0, 1)] + ws[(1, 2)])
    got = _df(graph.sssp_weighted(_edges(pairs), source=0,
                                  max_dist=best2, num_buckets=8), "node")
    d = dict(zip(got["node"], got["dist"]))
    assert d[2] == best2
    assert 3 not in d                     # budget excludes the tail


def test_sssp_weighted_partition_invariance(ray_session):
    edges = graph.synth_graph_edges(400)
    a = _df(graph.sssp_weighted(edges, source=0, max_dist=30), "node")
    b = _df(graph.sssp_weighted(edges.repartition(11), source=0,
                                max_dist=30, num_buckets=17), "node")
    assert a.equals(b)


def test_clustering_coefficient_crafted(ray_session):
    # triangle 0-1-2 plus pendant 2-3: C(0)=C(1)=1 (deg 2, one triangle),
    # C(2)=2*1/(3*2)=1/3, C(3)=0 (deg 1); duplicate/reverse edges collapse
    pairs = [(0, 1), (1, 2), (2, 0), (0, 1), (2, 1), (2, 3)]
    out = _df(graph.clustering_coefficient(_edges(pairs), num_buckets=8),
              "node")
    got = {int(r.node): (int(r.deg), int(r.n_triangles), float(r.coeff))
           for r in out.itertuples()}
    assert got == {0: (2, 1, 1.0), 1: (2, 1, 1.0),
                   2: (3, 1, 0.333333), 3: (1, 0, 0.0)}


def test_clustering_coefficient_partition_invariance(ray_session):
    edges = graph.synth_graph_edges(400)
    a = _df(graph.clustering_coefficient(edges), "node")
    b = _df(graph.clustering_coefficient(edges.repartition(13),
                                         num_buckets=7), "node")
    assert a.equals(b)


def test_scc_of_crafted(ray_session):
    # cycle 0->1->2->0 is one SCC; 3 is reachable from 0 but cannot return;
    # 4->0 reaches 0 but is unreachable from it
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (4, 0)]
    out = _df(graph.scc_of(_edges(pairs), source=0, num_buckets=8), "node")
    assert out["node"].tolist() == [0, 1, 2]
    # a source with no cycle: SCC is just itself
    out = _df(graph.scc_of(_edges([(0, 1), (1, 2)]), source=0,
                           num_buckets=8), "node")
    assert out["node"].tolist() == [0]


def test_scc_of_partition_invariance(ray_session):
    edges = graph.synth_graph_edges(400)
    a = _df(graph.scc_of(edges, source=0), "node")
    b = _df(graph.scc_of(edges.repartition(11), source=0,
                         num_buckets=17), "node")
    assert a.equals(b)


def test_co_mention_pmi_crafted(ray_session):
    import math

    D = "sdpg.gr/Document/x"
    a, b, c = "sdpg.gr/Person/a", "sdpg.gr/Person/b", "sdpg.gr/Place/c"
    # 4 docs: (a,b) together twice, a alone once, c alone once
    rows = [(D, "mentions", a, "d1"), (D, "mentions", b, "d1"),
            (D, "mentions", a, "d2"), (D, "mentions", b, "d2"),
            (D, "mentions", a, "d3"),
            (D, "mentions", c, "d4")]
    out = graph.co_mention_pmi(_triples(rows), num_buckets=8).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # n_both=2, N=4, n_a=3, n_b=2 -> pmi = log2(2*4/(3*2))
    assert (r.ent_a, r.ent_b, int(r.n_both)) == (a, b, 2)
    assert r.pmi == pytest.approx(math.log2(8 / 6), abs=1e-6)


def test_co_mention_pmi_partition_invariance(ray_session):
    D = "sdpg.gr/Document/x"
    ents = [f"sdpg.gr/Person/e{i}" for i in range(6)]
    rows = [(D, "mentions", ents[(i * 5 + j) % 6], f"d{i}")
            for i in range(12) for j in range(3)]
    base = None
    for blocks in (1, 7):
        out = graph.co_mention_pmi(_triples(rows).repartition(blocks),
                                   num_buckets=8).to_pandas() \
            .sort_values(["ent_a", "ent_b"]).reset_index(drop=True)
        if base is None:
            base = out
        else:
            assert base.equals(out)


def test_entity_pagerank_crafted(ray_session):
    # hub entity a co-mentioned with b and c; b-c never together -> a must
    # outrank b and c, and the undirected 2-cycle symmetry makes b == c
    D = "sdpg.gr/Document/x"
    a, b, c = "sdpg.gr/Person/a", "sdpg.gr/Person/b", "sdpg.gr/Place/c"
    rows = [(D, "mentions", a, "d1"), (D, "mentions", b, "d1"),
            (D, "mentions", a, "d2"), (D, "mentions", c, "d2")]
    out = graph.entity_pagerank(_triples(rows), iters=3,
                                num_buckets=8).to_pandas()
    got = dict(zip(out.uri, out.rank_int))
    assert set(got) == {a, b, c}
    assert got[a] > got[b] == got[c]


def test_entity_pagerank_partition_invariance(ray_session):
    D = "sdpg.gr/Document/x"
    ents = [f"sdpg.gr/Person/e{i}" for i in range(6)]
    rows = [(D, "mentions", ents[(i * 5 + j) % 6], f"d{i}")
            for i in range(12) for j in range(3)]
    base = None
    for blocks in (1, 7):
        out = graph.entity_pagerank(_triples(rows).repartition(blocks),
                                    iters=2, num_buckets=8).to_pandas() \
            .sort_values("uri").reset_index(drop=True)
        if base is None:
            base = out
        else:
            assert base.equals(out)


def test_pagerank_weighted_two_node_cycle(ray_session):
    # 0 <-> 1 with single out-edges: weight cancels (w_e == W_u), so the
    # weighted recurrence equals the unweighted closed form
    r = 1_000_000
    for _ in range(2):
        r = 150_000 + (r * 85) // 100
    got = _df(graph.pagerank_weighted(_edges([(0, 1), (1, 0)]), iters=2,
                                      num_buckets=8), "node")
    assert got["rank_int"].tolist() == [r, r]


def test_pagerank_weighted_split_proportional(ray_session):
    # node 0 -> {1, 2}: contributions split by the sha weights, floor-div
    from raykg.functions.hashing import sha_int

    w1 = 1 + sha_int("gw|42|0|1") % 9
    w2 = 1 + sha_int("gw|42|0|2") % 9
    send = (1_000_000 * 85) // 100
    got = _df(graph.pagerank_weighted(_edges([(0, 1), (0, 2)]), iters=1,
                                      num_buckets=8), "node")
    d = dict(zip(got["node"], got["rank_int"]))
    assert d[1] == 150_000 + (send * w1) // (w1 + w2)
    assert d[2] == 150_000 + (send * w2) // (w1 + w2)
    assert d[0] == 150_000


def test_pagerank_weighted_partition_invariance(ray_session):
    edges = graph.synth_graph_edges(400)
    a = _df(graph.pagerank_weighted(edges, iters=2), "node")
    b = _df(graph.pagerank_weighted(edges.repartition(11), iters=2,
                                    num_buckets=17), "node")
    assert a.equals(b)


def test_entity_pagerank_weighted_prefers_heavy_edge(ray_session):
    # a co-mentioned with b in 3 docs, with c in 1 -> weighted walk sends
    # 3x more of a's rank to b than to c; unweighted would tie them
    D = "sdpg.gr/Document/x"
    a, b, c = "sdpg.gr/Person/a", "sdpg.gr/Person/b", "sdpg.gr/Place/c"
    rows = []
    for i in range(3):
        rows += [(D, "mentions", a, f"d{i}"), (D, "mentions", b, f"d{i}")]
    rows += [(D, "mentions", a, "d9"), (D, "mentions", c, "d9")]
    w = graph.entity_pagerank(_triples(rows), iters=3, weighted=True,
                              num_buckets=8).to_pandas()
    u = graph.entity_pagerank(_triples(rows), iters=3, weighted=False,
                              num_buckets=8).to_pandas()
    gw = dict(zip(w.uri, w.rank_int))
    gu = dict(zip(u.uri, u.rank_int))
    assert gw[b] > gw[c]
    assert gu[b] == gu[c]


# ---------------------------------------------------------------------------
# jaccard_link_scores
# ---------------------------------------------------------------------------

def _brute_jaccard(pairs, min_cn):
    import math
    from collections import defaultdict

    from raykg.functions.hashing import round_half_away

    adj = defaultdict(set)
    und = set()
    for a, b in pairs:
        if a == b:
            continue
        adj[a].add(b)
        adj[b].add(a)
        und.add((min(a, b), max(a, b)))
    nodes = sorted(adj)
    out = {}
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            cn = len(adj[u] & adj[v])
            if cn >= min_cn:
                jac = cn / (len(adj[u]) + len(adj[v]) - cn)
                out[(u, v)] = (cn, float(round_half_away(jac, 4)),
                               1 if (u, v) in und else 0)
    return out


def test_jaccard_tiny():
    # 0 and 3 share {1, 2}: jac = 2 / (3 + 2 - 2) = 0.6667
    pairs = [(0, 1), (0, 2), (3, 1), (3, 2), (1, 2), (4, 0)]
    got = _df(graph.jaccard_link_scores(_edges(pairs), min_cn=1),
              ["u", "v"])
    want = _brute_jaccard(pairs, 1)
    assert {(r["u"], r["v"]): (r["cn"], r["jac"], r["is_edge"])
            for _, r in got.iterrows()} == want
    row = got[(got["u"] == 0) & (got["v"] == 3)].iloc[0]
    assert row["jac"] == pytest.approx(0.6667) and row["is_edge"] == 0


def test_jaccard_hub_cap_keeps_true_degrees():
    # star around 0 with 6 leaves plus a 1-2 edge: capping centers at 4
    # kills all wedges THROUGH the hub (so the leaf-leaf pair (1, 2) loses
    # its only common neighbor and vanishes), but pairs (0, 1) and (0, 2)
    # survive through the degree-2 centers 2 and 1 — and the hub's TRUE
    # degree 6 stays in their denominators: jac = 1 / (6 + 2 - 1) = 1/7.
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2)]
    got = _df(graph.jaccard_link_scores(_edges(pairs), min_cn=1,
                                        max_neighbors=4), ["u", "v"])
    assert {(r["u"], r["v"]) for _, r in got.iterrows()} == {(0, 1), (0, 2)}
    assert got["jac"].tolist() == [0.1429, 0.1429]
    assert got["cn"].tolist() == [1, 1]
    # uncapped: (1, 2) has cn = 1 via hub 0, deg(1) = deg(2) = 2
    full = _df(graph.jaccard_link_scores(_edges(pairs), min_cn=1), ["u", "v"])
    row = full[(full["u"] == 1) & (full["v"] == 2)].iloc[0]
    assert row["cn"] == 1 and row["jac"] == pytest.approx(1 / 3, abs=5e-5)
    assert row["is_edge"] == 1


def test_jaccard_partition_invariance():
    pairs = [(i % 9, (i * 5 + 2) % 9) for i in range(40) if i % 9 !=
             (i * 5 + 2) % 9]
    a = _df(graph.jaccard_link_scores(_edges(pairs).repartition(1),
                                      min_cn=1), ["u", "v"])
    b = _df(graph.jaccard_link_scores(_edges(pairs).repartition(8),
                                      min_cn=1), ["u", "v"])
    assert len(a) > 0
    assert a.equals(b)
    assert a.equals(
        _df(graph.jaccard_link_scores(_edges(pairs), min_cn=1,
                                      num_buckets=7), ["u", "v"]))


# ---------------------------------------------------------------------------
# metapath_counts
# ---------------------------------------------------------------------------

def _kg_edges(rows):
    def uri(label, i):
        return f"sdpg.gr/{label}/{i:064x}"
    t = pa.table({
        "subj": pa.array([uri(la, a) for la, a, _, _, _ in rows]),
        "pred": pa.array([p for _, _, p, _, _ in rows]),
        "obj": pa.array([uri(lc, c) for _, _, _, lc, c in rows]),
        "count": pa.array([1] * len(rows), pa.int64())})
    return rd.from_arrow(t)


def test_metapath_tiny():
    # Person/1 -works_at-> Org/2 -based_in-> Place/3   (1 path)
    # Person/4 -works_at-> Org/2 -based_in-> Place/3   (same mid: 1 more)
    # Org/2 also -owns-> Product/5 (two 2-hop combos through Org/2)
    rows = [("Person", 1, "works_at", "Organisation", 2),
            ("Person", 4, "works_at", "Organisation", 2),
            ("Organisation", 2, "based_in", "Place", 3),
            ("Organisation", 2, "owns", "Product", 5)]
    got = _df(graph.metapath_counts(_kg_edges(rows), num_buckets=4),
              ["label_a", "pred_ab", "pred_mc", "label_c"])
    want = {("Person", "works_at", "Organisation", "based_in", "Place"): 2,
            ("Person", "works_at", "Organisation", "owns", "Product"): 2}
    assert {(r["label_a"], r["pred_ab"], r["label_m"], r["pred_mc"],
             r["label_c"]): r["n_paths"] for _, r in got.iterrows()} == want


def test_metapath_counts_products_not_paths():
    # hub mid with 3 in and 2 out of the same types: 3 x 2 = 6 paths from
    # ONE product row per bucket — never enumerated pairwise
    rows = [("Person", i, "works_at", "Organisation", 9) for i in range(3)] \
        + [("Organisation", 9, "owns", "Product", 100 + j)
           for j in range(2)]
    got = graph.metapath_counts(_kg_edges(rows), num_buckets=4).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["n_paths"] == 6


def test_metapath_partition_invariance():
    rows = []
    labels = ["Person", "Organisation", "Place", "Product"]
    preds = ["works_at", "based_in", "owns"]
    for i in range(60):
        rows.append((labels[i % 4], i % 7, preds[i % 3],
                     labels[(i * 3 + 1) % 4], (i * 5 + 2) % 7))
    a = _df(graph.metapath_counts(_kg_edges(rows), num_buckets=4),
            ["label_a", "pred_ab", "label_m", "pred_mc", "label_c"])
    ds = _kg_edges(rows).repartition(8)
    b = _df(graph.metapath_counts(ds, num_buckets=16),
            ["label_a", "pred_ab", "label_m", "pred_mc", "label_c"])
    assert len(a) > 0
    assert a.equals(b)


# ---------------------------------------------------------------------------
# betweenness_sampled
# ---------------------------------------------------------------------------

def _brute_betweenness(pairs, sources, scale=10**6):
    """Plain-Python Brandes with the engine's exact integer contract:
    delta(v) = sum over shortest-path successors w of
    (sigma_v * (scale + delta_w)) // sigma_w, bc = sum over sources."""
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
    bc = defaultdict(int)
    for s in sources:
        dist, sigma = {s: 0}, {s: 1}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(int)
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    delta[v] += (sigma[v] * (scale + delta[w])) // sigma[w]
        for v, d in delta.items():
            if v != s:
                bc[v] += d
    return {v: d for v, d in bc.items() if d > 0}


def test_betweenness_path_and_diamond():
    got = _df(graph.betweenness_sampled(
        _edges([(0, 1), (1, 2), (2, 3)]), sources=(0,), num_buckets=4),
        "node")
    assert dict(zip(got.node, got.bc_micro)) == {1: 2_000_000, 2: 1_000_000}
    got = _df(graph.betweenness_sampled(
        _edges([(0, 1), (0, 2), (1, 3), (2, 3)]), sources=(0,),
        num_buckets=4), "node")
    # two shortest paths to 3 split the dependency: 1/2 each
    assert dict(zip(got.node, got.bc_micro)) == {1: 500_000, 2: 500_000}


def test_betweenness_matches_brute_force():
    pairs = [(i % 11, (i * 7 + 3) % 11) for i in range(60)
             if i % 11 != (i * 7 + 3) % 11]
    # duplicate edges must not double-count paths
    pairs = pairs + pairs[:10]
    srcs = (0, 4, 9)
    got = _df(graph.betweenness_sampled(_edges(pairs), sources=srcs,
                                        num_buckets=8), "node")
    assert dict(zip(got.node, got.bc_micro)) == \
        _brute_betweenness(pairs, srcs)


def test_betweenness_partition_invariance():
    pairs = [(i % 13, (i * 5 + 2) % 13) for i in range(70)
             if i % 13 != (i * 5 + 2) % 13]
    a = _df(graph.betweenness_sampled(_edges(pairs).repartition(1),
                                      sources=(0, 3), num_buckets=4),
            "node")
    b = _df(graph.betweenness_sampled(_edges(pairs).repartition(8),
                                      sources=(0, 3), num_buckets=16),
            "node")
    assert len(a) > 0
    assert a.equals(b)
    assert dict(zip(a.node, a.bc_micro)) == \
        _brute_betweenness(pairs, (0, 3))


def test_harmonic_tiny_and_invariance():
    # path 0 -> 1 -> 2 -> 3 from source 0: 10^6/d floor terms
    got = _df(graph.harmonic_sampled(_edges([(0, 1), (1, 2), (2, 3)]),
                                     sources=(0,), num_buckets=4), "node")
    assert dict(zip(got.node, got.harm_micro)) == \
        {1: 1_000_000, 2: 500_000, 3: 333_333}
    # two sources sum their terms; duplicate edges don't change distances
    pairs = [(i % 13, (i * 5 + 2) % 13) for i in range(70)
             if i % 13 != (i * 5 + 2) % 13]
    a = _df(graph.harmonic_sampled(_edges(pairs), sources=(0, 3),
                                   num_buckets=4), "node")
    b = _df(graph.harmonic_sampled(_edges(pairs + pairs).repartition(8),
                                   sources=(0, 3), num_buckets=16), "node")
    assert len(a) > 0 and a.equals(b)

    # brute force over BFS distances with the same floor contract
    from collections import deque
    import collections
    adj = collections.defaultdict(set)
    for x, y in pairs:
        adj[x].add(y)
    want = collections.defaultdict(int)
    for s in (0, 3):
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for t_, d_ in dist.items():
            if d_ > 0:
                want[t_] += 10**6 // d_
    assert dict(zip(a.node, a.harm_micro)) == dict(want)


# ---------------------------------------------------------------------------
# ktruss_edges
# ---------------------------------------------------------------------------

def _brute_ktruss(pairs, k):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nxt = {(a, b) for a, b in und
               if len(adj[a] & adj[b]) >= k - 2}
        if nxt == und:
            return und
        und = nxt


def test_ktruss_k4_peels_cascade():
    # K4 on {0,1,2,3} (every edge closes 2 triangles) survives k=4;
    # a triangle hanging off it ({3,4,5}) has support-1 edges -> peeled,
    # and the bridge 3-4 peels with it
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    extra = [(3, 4), (3, 5), (4, 5)]
    pairs = k4 + extra
    got = _df(graph.ktruss_edges(_edges(pairs), k=4, num_buckets=8),
              ["a", "b"])
    assert {(r.a, r.b) for r in got.itertuples()} == set(k4)
    assert _brute_ktruss(pairs, 4) == set(k4)
    # at k=3 everything with one triangle survives
    got3 = _df(graph.ktruss_edges(_edges(pairs), k=3, num_buckets=8),
               ["a", "b"])
    assert {(r.a, r.b) for r in got3.itertuples()} == \
        _brute_ktruss(pairs, 3) == set(pairs)


def test_ktruss_matches_brute_force_and_invariance():
    edges = graph.synth_graph_edges(200)
    df = edges.to_pandas()
    pairs = list(zip(df["src"].tolist(), df["dst"].tolist()))
    want = _brute_ktruss(pairs, 4)
    assert len(want) > 0           # the dense communities keep a 4-truss
    a = _df(graph.ktruss_edges(edges, k=4, num_buckets=8), ["a", "b"])
    assert {(r.a, r.b) for r in a.itertuples()} == want
    b = _df(graph.ktruss_edges(edges.repartition(8), k=4,
                               num_buckets=16), ["a", "b"])
    assert a.equals(b)


def test_ktruss_empty_and_nonconvergence_guard():
    # triangle-free graph: everything peels to empty on round 1
    got = graph.ktruss_edges(_edges([(0, 1), (1, 2), (2, 3)]), k=4,
                             num_buckets=4).to_pandas()
    assert len(got) == 0
    import pytest as _pt
    with _pt.raises(ValueError, match="k >= 3"):
        graph.ktruss_edges(_edges([(0, 1)]), k=2)


def test_eccentricity_tiny_and_invariance():
    # directed path 0 -> 1 -> 2 -> 3 plus unreachable island 8 -> 9
    pairs = [(0, 1), (1, 2), (2, 3), (8, 9)]
    got = graph.eccentricity_sampled(_edges(pairs), sources=(0, 3, 8),
                                     num_buckets=4).to_pandas()
    by = {r.source: (r.ecc, r.n_reached) for r in got.itertuples()}
    assert by[0] == (3, 4)      # reaches 0,1,2,3; depth 3
    assert by[3] == (0, 1)      # sink: itself only
    assert by[8] == (1, 2)      # island edge

    # brute force + duplicate-edge/partitioning invariance
    from collections import deque
    import collections
    rnd = [(i % 13, (i * 5 + 2) % 13) for i in range(70)
           if i % 13 != (i * 5 + 2) % 13]
    a = graph.eccentricity_sampled(_edges(rnd), sources=(0, 3),
                                   num_buckets=4).to_pandas()
    b = graph.eccentricity_sampled(_edges(rnd + rnd).repartition(8),
                                   sources=(0, 3),
                                   num_buckets=16).to_pandas()
    assert a.equals(b)
    adj = collections.defaultdict(set)
    for x, y in rnd:
        adj[x].add(y)
    for s in (0, 3):
        dist = {s: 0}
        dq = deque([s])
        while dq:
            u = dq.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        row = a[a.source == s].iloc[0]
        assert row.ecc == max(dist.values())
        assert row.n_reached == len(dist)


def test_triad_motifs_crafted(ray_session):
    """Directed-closure census on a hand-built graph: one pure transitive
    triangle, one pure 3-cycle, a reciprocal pair (no triad), a
    reciprocal-plus-apex cluster (two transitive closures), duplicate and
    self-loop edges that the distinct pass must drop. Cross-checked
    against an in-test brute force over the distinct edge set."""
    import pyarrow as pa

    import ray.data as rd

    from raykg.ops.graph import triad_motifs

    e = [(0, 1), (1, 2), (0, 2), (0, 1),          # transitive + dup
         (3, 4), (4, 5), (5, 3),                  # 3-cycle
         (6, 6),                                  # self-loop (dropped)
         (7, 8), (8, 7),                          # reciprocal, no triad
         (9, 10), (10, 9), (10, 11), (9, 11)]     # two transitive closures
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in e], pa.int64()),
        "dst": pa.array([b for _, b in e], pa.int64())}))
    row = triad_motifs(edges, num_buckets=16).take_all()[0]

    es = {(a, b) for a, b in e if a != b}
    n_tr = sum(1 for a, b in es for c in range(12)
               if c != a and (b, c) in es and (a, c) in es)
    n_cy = sum(1 for a, b in es for c in range(12)
               if c != a and (b, c) in es and (c, a) in es) // 3
    assert (row["n_transitive"], row["n_cyclic"]) == (n_tr, n_cy) == (3, 1)


def test_entity_salience_crafted(ray_session):
    """Integer lead-mention weights: offset 0 -> 1e6, offset 1 -> 5e5,
    offset 999999 -> 1; doc-subject rows contribute their object only;
    multiplicity kept for n_mentions/salience, docs deduped for n_docs."""
    from raykg.ops.graph import entity_salience

    D = "sdpg.gr/Document/d"
    E1, E2 = "sdpg.gr/Person/aaa", "sdpg.gr/City/bbb"
    t = pa.table({
        "subj": pa.array([D + "1", D + "1", E1, D + "2"], pa.string()),
        "pred": pa.array(["mentions"] * 4, pa.string()),
        "obj": pa.array([E1, E1, E2, E1], pa.string()),
        "doc_id": pa.array(["d1", "d1", "d1", "d2"], pa.string()),
        "span_offset": pa.array([0, 1, 3, 999999], pa.int32()),
    })
    got = {r["uri"]: r for r in
           entity_salience(rd.from_arrow(t), num_buckets=8).take_all()}
    # E1: obj mentions at offsets 0, 1 (d1) and 999999 (d2), PLUS the
    # entity-subject row at offset 3 (non-Document subj counts for the
    # subject uri too, mirroring _doc_entity_rows / the SQL twin)
    assert got[E1]["n_mentions"] == 4
    assert got[E1]["n_docs"] == 2
    assert got[E1]["salience"] == 1_000_000 + 500_000 + 250_000 + 1
    # E2: one obj mention at offset 3
    assert got[E2]["n_mentions"] == 1
    assert got[E2]["n_docs"] == 1
    assert got[E2]["salience"] == 250_000


def test_maximal_independent_set_properties(ray_session):
    """Independence + maximality on a crafted graph (path, triangle,
    pendant pair, plus a duplicate and reversed edge the distinct pass
    must collapse), and determinism across num_buckets — the sha
    priority order fixes THE greedy MIS, not just some MIS."""
    from raykg.ops.graph import maximal_independent_set

    e = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4), (7, 8),
         (1, 0), (0, 1)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in e], pa.int64()),
        "dst": pa.array([b for _, b in e], pa.int64())}))
    mis = sorted(r["node"] for r in
                 maximal_independent_set(edges, num_buckets=8).take_all())
    es = {(a, b) for a, b in e} | {(b, a) for a, b in e}
    assert all((a, b) not in es for a in mis for b in mis if a != b)
    nodes = {n for p in e for n in p}
    assert all(n in mis or any((n, m) in es for m in mis) for n in nodes)
    # exactly one of each triangle corner, one of the pendant pair
    assert len([n for n in mis if n in (4, 5, 6)]) == 1
    assert len([n for n in mis if n in (7, 8)]) == 1
    mis2 = sorted(r["node"] for r in
                  maximal_independent_set(edges, num_buckets=32).take_all())
    assert mis == mis2


def test_maximal_matching_properties(ray_session):
    """Vertex-disjointness + maximality + edge membership on a crafted
    graph, determinism across bucket counts, duplicate/reverse edges
    collapsed."""
    from raykg.ops.graph import maximal_matching

    e = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4), (7, 8), (1, 0)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in e], pa.int64()),
        "dst": pa.array([b for _, b in e], pa.int64())}))
    m = sorted((r["node_a"], r["node_b"]) for r in
               maximal_matching(edges, num_buckets=8).take_all())
    used = [n for p in m for n in p]
    assert len(used) == len(set(used))            # vertex-disjoint
    es = {(min(a, b), max(a, b)) for a, b in e if a != b}
    assert all(p in es for p in m)                # real edges only
    un = {n for p in es for n in p} - set(used)
    assert not any(a in un and b in un for a, b in es)   # maximal
    # triangle contributes exactly one pair, pendant pair matches itself
    assert (7, 8) in m
    assert len([p for p in m if set(p) <= {4, 5, 6}]) == 1
    m2 = sorted((r["node_a"], r["node_b"]) for r in
                maximal_matching(edges, num_buckets=32).take_all())
    assert m == m2


def test_relation_stats_crafted(ray_session):
    """Exact distinct counts per predicate: repeated triples inflate
    n_triples only; subjects/objects/docs dedupe."""
    from raykg.ops.graph import relation_stats

    t = pa.table({
        "subj": pa.array(["s1", "s1", "s2", "s1"], pa.string()),
        "pred": pa.array(["p", "p", "p", "q"], pa.string()),
        "obj": pa.array(["o1", "o1", "o1", "o2"], pa.string()),
        "doc_id": pa.array(["d1", "d2", "d1", "d1"], pa.string()),
        "span_offset": pa.array([0, 1, 2, 3], pa.int32()),
    })
    got = {r["pred"]: r for r in
           relation_stats(rd.from_arrow(t), num_buckets=8).take_all()}
    p = got["p"]
    assert (p["n_triples"], p["n_subj"], p["n_obj"], p["n_docs"]) \
        == (3, 2, 1, 2)
    q = got["q"]
    assert (q["n_triples"], q["n_subj"], q["n_obj"], q["n_docs"]) \
        == (1, 1, 1, 1)


def test_greedy_coloring_matches_sequential(ray_session):
    """The distributed Jones-Plassmann rounds must reproduce the
    SEQUENTIAL greedy coloring in sha-priority order exactly — proper
    coloring, identical colors, bucket-count determinism."""
    from raykg.ops.graph import _mis_prio, greedy_coloring

    e = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4), (7, 8), (1, 0)]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([a for a, _ in e], pa.int64()),
        "dst": pa.array([b for _, b in e], pa.int64())}))
    got = {r["node"]: r["color"] for r in
           greedy_coloring(edges, num_buckets=8).take_all()}
    es = {(a, b) for a, b in e if a != b} | \
        {(b, a) for a, b in e if a != b}
    assert all(got[a] != got[b] for a, b in es)          # proper
    nodes = sorted({n for p in es for n in p})
    pr = {n: int(_mis_prio(np.array([n]), 42)[0]) for n in nodes}
    ref = {}
    for n in sorted(nodes, key=lambda n: pr[n]):
        used = {ref[m] for m in nodes if (n, m) in es and m in ref}
        c = 0
        while c in used:
            c += 1
        ref[n] = c
    assert got == ref
    got2 = {r["node"]: r["color"] for r in
            greedy_coloring(edges, num_buckets=32).take_all()}
    assert got2 == got


def test_symmetry_breaking_trio_randomized(ray_session):
    """Seeded random graphs (isolated nodes, multi-component, dense
    pockets): MIS, matching and coloring must each equal the SEQUENTIAL
    greedy reference in sha-priority order — the round logic may change
    scheduling, never the answer."""
    import random

    from raykg.ops.graph import (_mis_prio, greedy_coloring,
                                 maximal_independent_set,
                                 maximal_matching)

    for seed in (3, 41):
        rng = random.Random(seed)
        n = 30
        pairs = sorted({(rng.randrange(n), rng.randrange(n))
                        for _ in range(45)})
        edges = rd.from_arrow(pa.table({
            "src": pa.array([a for a, _ in pairs], pa.int64()),
            "dst": pa.array([b for _, b in pairs], pa.int64())}))
        es = {(a, b) for a, b in pairs if a != b} | \
            {(b, a) for a, b in pairs if a != b}
        nodes = sorted({x for p in es for x in p})
        pr = {v: int(_mis_prio(np.array([v]), 42)[0]) for v in nodes}

        # sequential greedy MIS in priority order
        mis_ref, blocked = set(), set()
        for v in sorted(nodes, key=lambda v: pr[v]):
            if v not in blocked:
                mis_ref.add(v)
                blocked.update(u for u in nodes if (v, u) in es)
        got = sorted(r["node"] for r in maximal_independent_set(
            edges, num_buckets=8).take_all())
        assert got == sorted(mis_ref), seed

        # sequential greedy matching by (h, pk) edge priority
        from raykg.functions.hashing import sha_int
        und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
        SHIFT = 1 << 31
        order = sorted(und, key=lambda e: (
            sha_int(f"mm|42|{e[0] * SHIFT + e[1]}"), e[0] * SHIFT + e[1]))
        used, m_ref = set(), []
        for a, b in order:
            if a not in used and b not in used:
                used.update((a, b))
                m_ref.append((a, b))
        got_m = sorted((r["node_a"], r["node_b"]) for r in
                       maximal_matching(edges, num_buckets=8).take_all())
        assert got_m == sorted(m_ref), seed

        # sequential greedy coloring in priority order
        col_ref = {}
        for v in sorted(nodes, key=lambda v: pr[v]):
            usedc = {col_ref[u] for u in nodes
                     if (v, u) in es and u in col_ref}
            c = 0
            while c in usedc:
                c += 1
            col_ref[v] = c
        got_c = {r["node"]: r["color"] for r in
                 greedy_coloring(edges, num_buckets=8).take_all()}
        assert got_c == col_ref, seed
