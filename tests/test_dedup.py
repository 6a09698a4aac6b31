"""Skew guards in the dedup operators: a degenerate (hot) blocking key must
cap with a logged warning — never hang quadratic or truncate silently."""

import logging

import pyarrow as pa

import ray.data as rd

from raykg.ops.dedup import _cap_block, lsh_candidate_pairs


def test_cap_block_warns_and_keeps_smallest(caplog):
    docs = list(range(100, 0, -1))
    with caplog.at_level(logging.WARNING, logger="raykg"):
        capped = _cap_block(docs, ("band", "key"), 10, "someop")
    assert capped == list(range(1, 11))          # smallest ids, sorted
    assert any("someop" in r.message and "cap 10" in r.message
               for r in caplog.records)
    # under the cap: no warning, None (caller keeps the full block)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="raykg"):
        assert _cap_block(docs, "k", 1000, "someop") is None
    assert not caplog.records


def test_lsh_hot_band_is_capped_not_quadratic(ray_session):
    """Identical texts put every doc in the same band bucket (the
    boilerplate-heavy-corpus degenerate case): with max_bucket=10 only the
    10 smallest ids are compared — C(10,2)=45 pairs, not C(60,2)=1770 —
    and the job terminates promptly instead of going quadratic."""
    n = 60
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon"] * n, pa.string()),
    }))
    pairs = lsh_candidate_pairs(docs, max_bucket=10).take_all()
    assert len(pairs) == 45
    assert all(p["doc_a"] < 10 and p["doc_b"] < 10 for p in pairs)
    assert all(p["jaccard"] == 1.0 for p in pairs)


def _emb_table(vecs):
    return pa.table({
        "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


def test_semantic_dedup_keep_crafted(ray_session):
    from raykg.ops.dedup import semantic_dedup_keep

    # two orthogonal clusters seeded by vec 0 and vec 1 (nlist=2 uses
    # them as centroids); 2,3 near-duplicate 0; 4 near 1; 5 orthogonal
    # to everything (kept; lands in some cluster but below threshold)
    vecs = [
        (1.0, 0.0, 0.0, 0.0),   # 0: centroid A          -> keep
        (0.0, 1.0, 0.0, 0.0),   # 1: centroid B          -> keep
        (0.99, 0.1, 0.0, 0.0),  # 2: ~dup of 0           -> drop
        (0.98, 0.15, 0.0, 0.0),  # 3: ~dup of 0 and 2    -> drop
        (0.1, 0.99, 0.0, 0.0),  # 4: ~dup of 1           -> drop
        (0.0, 0.0, 1.0, 0.0),   # 5: orthogonal          -> keep
    ]
    got = sorted(r["vec_id"] for r in semantic_dedup_keep(
        rd.from_arrow(_emb_table(vecs)), threshold=0.9,
        nlist=2).take_all())
    assert got == [0, 1, 5]


def test_semantic_dedup_kmeans_variant(ray_session):
    from raykg.ops.ann import kmeans_centroids
    from raykg.ops.dedup import semantic_dedup_keep

    vecs = [(float(i % 4 == d) + 0.01 * i, float(d == 1), float(d == 2),
             float(d == 3)) for i, d in
            ((i, i % 4) for i in range(40))]
    emb = rd.from_arrow(_emb_table(vecs))
    cent = kmeans_centroids(emb, k=4, iters=3)
    a = sorted(r["vec_id"] for r in semantic_dedup_keep(
        emb, threshold=0.95, cent=cent).take_all())
    b = sorted(r["vec_id"] for r in semantic_dedup_keep(
        emb.repartition(7), threshold=0.95, cent=cent).take_all())
    assert a == b and 0 < len(a) < 40   # deterministic, actually dedups


def test_dup_span_stats_crafted(ray_session):
    from raykg.ops.dedup import dup_span_stats

    shared = "one two three four five six seven eight"       # 8 tokens
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            shared + " tail1 tail2",     # 1: windows 1-3, window 1 shared
            "head " + shared,            # 2: windows 1-2, window 2 shared
            "alpha beta gamma delta epsilon zeta eta theta iota",  # unique
            "short doc",                 # < span tokens -> omitted
        ], pa.string()),
    })
    got = {r["doc_id"]: (r["n_windows"], r["dup_windows"],
                         r["dup_fraction"])
           for r in dup_span_stats(rd.from_arrow(docs), span=8,
                                   num_buckets=8).take_all()}
    # doc1: 3 windows, the first ("one..eight") also ends doc2 -> 1 dup
    # doc2: 2 windows, the second is the shared one -> 1 dup
    # doc3: 2 windows, none shared
    assert got == {1: (3, 1, 0.3333), 2: (2, 1, 0.5), 3: (2, 0, 0.0)}


def test_dup_span_stats_self_repeat_not_dup(ray_session):
    from raykg.ops.dedup import dup_span_stats

    # the same 8-token span twice WITHIN one doc is not cross-doc dup
    s = "a b c d e f g h"
    docs = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([s + " " + s], pa.string()),
    })
    got = dup_span_stats(rd.from_arrow(docs), span=8,
                         num_buckets=4).take_all()
    assert len(got) == 1 and got[0]["dup_windows"] == 0
    assert got[0]["n_windows"] == 9


def test_decontaminate_crafted(ray_session):
    """A train doc sharing an exact 8-token window with a test doc is
    flagged; a clean train doc is not; test/val docs never appear."""
    import pyarrow as pa

    import ray.data as rd

    from raykg.functions.hashing import hex_threshold8, sha_hex
    from raykg.ops.dedup import decontaminate

    thr_val, thr_test = hex_threshold8(0.1), hex_threshold8(0.2)

    def split(d):
        h = sha_hex(f"split|42|{d}")[:8]
        return "val" if h < thr_val else "test" if h < thr_test else "train"

    ids = list(range(300))
    test_id = next(d for d in ids if split(d) == "test")
    tr = [d for d in ids if split(d) == "train"]
    leaked, clean, short = tr[0], tr[1], tr[2]

    shared = "q w e r t y u i"                      # the 8-token leak
    rows = {
        test_id: shared + " tail tok",
        leaked: "head tok " + shared,               # shares the window
        clean: "a b c d e f g h i j",               # 8+ tokens, no leak
        short: "too short",                         # < 8 tokens -> omitted
    }
    t = pa.table({"doc_id": pa.array(list(rows), pa.int64()),
                  "text": pa.array(list(rows.values()), pa.string())})
    got = {r["doc_id"]: r for r in
           decontaminate(rd.from_arrow(t), num_buckets=16).take_all()}
    assert set(got) == {leaked, clean}
    assert got[leaked]["contaminated"] == 1
    assert got[leaked]["contam_windows"] == 1
    assert got[leaked]["n_windows"] == 3            # 10 tokens -> 3 windows
    assert got[clean]["contaminated"] == 0
    assert got[clean]["contam_windows"] == 0


def test_segment_dedup_crafted(ray_session):
    """First corpus-wide occurrence (doc_id, then position) survives;
    later exact segments are stripped; ragged tails segment separately."""
    from raykg.ops.dedup import segment_dedup

    seg_a = "a b c d e f g h"                # 8 tokens = one segment
    seg_b = "p q r s t u v w"
    rows = {
        # doc 0: A + B -> keeps both (first occurrences)
        0: f"{seg_a} {seg_b}",
        # doc 1: B + A -> both already owned by doc 0 -> text_clean ''
        1: f"{seg_b} {seg_a}",
        # doc 2: A twice -> within-doc repeat also stripped
        2: f"{seg_a} {seg_a}",
        # doc 3: A + ragged 3-token tail -> tail is its own segment, kept
        3: f"{seg_a} x y z",
    }
    t = pa.table({"doc_id": pa.array(list(rows), pa.int64()),
                  "text": pa.array(list(rows.values()), pa.string())})
    got = {r["doc_id"]: r for r in
           segment_dedup(rd.from_arrow(t), span=8, num_buckets=16)
           .take_all()}
    assert got[0]["text_clean"] == f"{seg_a} {seg_b}"
    assert (got[0]["n_segs"], got[0]["kept_segs"]) == (2, 2)
    assert got[1]["text_clean"] == ""
    assert (got[1]["n_segs"], got[1]["kept_segs"]) == (2, 0)
    assert got[2]["text_clean"] == ""
    assert (got[2]["n_segs"], got[2]["kept_segs"]) == (2, 0)
    assert got[3]["text_clean"] == "x y z"
    assert (got[3]["n_segs"], got[3]["kept_segs"]) == (2, 1)


def test_ed_le1_unit():
    from raykg.ops.dedup import _ed_le1

    assert _ed_le1("cold ring", "old ring")      # deletion
    assert _ed_le1("red", "rod")                 # substitution
    assert _ed_le1("cat", "cats")                # insertion
    assert _ed_le1("same", "same")               # equal
    assert not _ed_le1("ab", "ba")               # shared delete, ED 2
    assert not _ed_le1("red", "blue")
    assert not _ed_le1("a", "abc")               # length gap 2


def test_fuzzy_name_pairs_crafted(ray_session):
    """Deletion blocking must surface all three ED-1 shapes (substitution,
    insertion/deletion, exact-duplicate input rows collapse first) and the
    verify must kill shared-variant ED-2 collisions like ab/ba."""
    from raykg.ops.dedup import fuzzy_name_pairs

    names = ["red bolt", "rod bolt",   # substitution
             "cold gear", "old gear",  # deletion
             "ab", "ba",               # shared deletion variant, ED 2
             "red bolt",               # duplicate row: one distinct name
             "widget"]                 # isolated
    ds = rd.from_arrow(pa.table({"name": pa.array(names, pa.string())}))
    got = sorted((r["name_a"], r["name_b"])
                 for r in fuzzy_name_pairs(ds).take_all())
    assert got == [("cold gear", "old gear"), ("red bolt", "rod bolt")]


def test_fuzzy_name_pairs_no_dup_pairs(ray_session):
    """A pair sharing MANY deletion keys (equal-length, one substitution
    shares every other-position delete) must still appear exactly once."""
    from raykg.ops.dedup import fuzzy_name_pairs

    ds = rd.from_arrow(pa.table({
        "name": pa.array(["abcdefgh", "abcdefgx"], pa.string())}))
    got = fuzzy_name_pairs(ds).take_all()
    assert [(r["name_a"], r["name_b"]) for r in got] == \
        [("abcdefgh", "abcdefgx")]


def test_containment_pairs_vs_oracle(ray_session):
    """Short doc fully quoted in a long one: containment fires one
    DIRECTION only (sub -> super); Jaccard at the same pair is 0.5.
    Cross-source pairs must not be compared (blocking key)."""
    import duckdb

    import __ray_entry__ as e
    from raykg.ops.dedup import containment_pairs

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "source": pa.array(["s1", "s1", "s2", "s1"], pa.string()),
        "text": pa.array([
            "a b c d e f",     # grams abc bcd cde def
            "a b c d",         # grams abc bcd — subset of doc 1
            "a b c d",         # same text, other source: no pair
            "x y",             # single-gram fallback, disjoint
        ], pa.string())})
    ds = rd.from_arrow(docs)
    got = containment_pairs(ds).to_pandas()

    con = duckdb.connect()
    con.register("documents", docs)
    want = con.sql(e.oracle_sql()["containment_pairs"]).df()
    con.close()

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns)).reset_index(drop=True) \
            .astype(str).values.tolist()

    assert norm(got) == norm(want)
    assert [(r.doc_sub, r.doc_super, r.containment)
            for r in got.itertuples()] == [(2, 1, 1.0)]


def _brute_jaccard_pairs(texts: dict[int, str], gram: int, t: float):
    from raykg.ops.dedup import _grams
    g = {d: set(_grams(s, gram)) for d, s in texts.items()}
    out = []
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not g[a] or not g[b]:
                continue
            jac = len(g[a] & g[b]) / len(g[a] | g[b])
            if jac >= t:
                out.append((a, b, round(jac, 4)))
    return sorted(out)


def test_set_similarity_join_matches_bruteforce(ray_session):
    """Prefix filtering must reproduce the brute-force global quadratic
    EXACTLY (no false negatives, no extras) — including pairs straddling
    different 'source' partitions (which the blocked op would miss), an
    identical pair, a just-at-threshold pair, and sub-gram-length docs."""
    from raykg.ops.dedup import set_similarity_join
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    texts = {
        0: base,
        1: base,                                      # identical -> 1.0
        2: base + " tonight",                         # near-dup
        3: "completely different words entirely unrelated content here",
        4: "the quick brown fox jumps over the lazy dog",  # high overlap
        5: "short one",                               # < gram tokens
        6: "short one",                               # identical tiny pair
        7: "",                                        # empty -> no grams
    }
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[d] for d in sorted(texts)], pa.string()),
    }))
    got = sorted((r["doc_a"], r["doc_b"], r["jaccard"])
                 for r in set_similarity_join(docs, threshold=0.5,
                                              num_buckets=16).take_all())
    want = _brute_jaccard_pairs(texts, 3, 0.5)
    assert got == want
    assert (0, 1, 1.0) in got          # identical docs survive
    assert (5, 6, 1.0) in got          # sub-gram-length identical pair


def test_set_similarity_join_threshold_is_exact(ray_session):
    """Fraction-exact prefix length: a pair EXACTLY at the threshold is
    kept (>=, not >), which a float-rounded ceil(t*n) can silently lose."""
    from raykg.ops.dedup import set_similarity_join
    # grams(a) = 10 distinct 3-grams, grams(b) shares exactly 6 of them and
    # adds none -> J = 6/10 = 0.6 exactly at threshold 0.6
    a_toks = [f"w{i}" for i in range(12)]            # 10 distinct 3-grams
    b_toks = a_toks[:8]                              # 6 shared 3-grams
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([" ".join(a_toks), " ".join(b_toks)], pa.string()),
    }))
    got = set_similarity_join(docs, threshold=0.6,
                              num_buckets=8).take_all()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in got] \
        == [(0, 1, 0.6)]


def test_set_similarity_join_hot_prefix_capped(ray_session, caplog):
    """A degenerate corpus where one gram lands in EVERY doc's prefix must
    cap with a logged warning, not go quadratic."""
    from raykg.ops.dedup import set_similarity_join
    n = 40
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(["alpha beta gamma delta"] * n, pa.string()),
    }))
    with caplog.at_level(logging.WARNING, logger="raykg"):
        pairs = set_similarity_join(docs, threshold=0.9, num_buckets=8,
                                    max_prefix_bucket=10).take_all()
    assert len(pairs) == 45                     # C(10,2), smallest ids
    assert all(p["doc_a"] < 10 and p["doc_b"] < 10 for p in pairs)


def test_neardup_keep_best_prefers_quality(ray_session):
    """Three near-identical docs where the HIGHEST doc_id has the best
    quality (longest, most distinct tokens) must keep that one — the
    policy neardup_keep (min-id) cannot express — while the unrelated
    singleton keeps itself."""
    from raykg.ops.corpus import neardup_keep, neardup_keep_best

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 7], pa.int64()),
        "text": pa.array([
            base + " the the the the the the",          # stop-heavy
            base + " the the the the the the",          # dup of 0
            base + " phi chi psi omega aleph bet",      # cleanest twin
            "completely different content here now",    # singleton
        ], pa.string()),
    }))
    kept = sorted(r["doc_id"] for r in
                  neardup_keep_best(docs, num_buckets=16).take_all())
    assert 7 in kept                       # singleton keeps itself
    # docs 0/1/2 near-dup: winner must be 2 (highest quality), NOT 0
    assert kept == [2, 7], kept
    # contrast with the min-id policy
    kept_min = sorted(r["doc_id"] for r in
                      neardup_keep(docs, num_buckets=16).take_all())
    assert kept_min == [0, 7], kept_min


def test_containment_join_global_and_asymmetric(ray_session):
    """A short doc wholly quoted inside a much longer one must surface as
    (sub, super) ONLY in that direction, ACROSS source partitions (which
    the blocked containment_pairs cannot see), exactly matching a brute
    force; Jaccard at the same threshold would miss it (union drowns the
    overlap)."""
    from raykg.ops.dedup import _grams, containment_join

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i} word{i} extra{i}" for i in range(20))
    texts = {
        0: quote,                                  # sub
        1: filler + " " + quote + " " + filler,    # super (quotes 0)
        2: "entirely different content with no shared phrases at all",
    }
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[d] for d in sorted(texts)], pa.string()),
    }))
    got = sorted((r["doc_sub"], r["doc_super"], r["containment"])
                 for r in containment_join(docs, threshold=0.8,
                                           num_buckets=16).take_all())
    g = {d: set(_grams(s, 3)) for d, s in texts.items()}
    want = sorted(
        (a, b, round(len(g[a] & g[b]) / len(g[a]), 4))
        for a in texts for b in texts
        if a != b and g[a] and len(g[a] & g[b]) / len(g[a]) >= 0.8)
    assert got == want
    assert got and got[0][:2] == (0, 1)        # sub -> super direction
    assert all(p[:2] != (1, 0) for p in got)   # never the reverse


def test_prefix_filter_joins_no_false_negatives_randomized(ray_session):
    """THE correctness claim of the prefix-filter family: across seeded
    random corpora drawn from a tiny vocabulary (forcing heavy gram
    collisions), both global joins must equal their brute-force
    references exactly — no false negatives from the prefix/size
    filters, no extras."""
    import random

    from raykg.functions.hashing import round_half_away
    from raykg.ops.dedup import (_grams, containment_join,
                                 set_similarity_join)

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    for seed in (7, 23, 99):
        rng = random.Random(seed)
        texts = {}
        for d in range(18):
            L = rng.randint(0, 12)
            texts[d] = " ".join(rng.choice(vocab) for _ in range(L))
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[d] for d in sorted(texts)],
                             pa.string())}))
        g = {d: set(_grams(s, 3)) for d, s in texts.items()}

        for thr in (0.5, 0.75):
            got = sorted((r["doc_a"], r["doc_b"], r["jaccard"])
                         for r in set_similarity_join(
                             docs, threshold=thr,
                             num_buckets=8).take_all())
            want = sorted(
                (a, b, round_half_away(
                    len(g[a] & g[b]) / len(g[a] | g[b]), 4))
                for a in texts for b in texts
                if a < b and g[a] and g[b]
                and len(g[a] & g[b]) / len(g[a] | g[b]) >= thr)
            assert got == want, (seed, thr)

        got_c = sorted((r["doc_sub"], r["doc_super"], r["containment"])
                       for r in containment_join(
                           docs, threshold=0.75,
                           num_buckets=8).take_all())
        want_c = sorted(
            (a, b, round_half_away(len(g[a] & g[b]) / len(g[a]), 4))
            for a in texts for b in texts
            if a != b and g[a]
            and len(g[a] & g[b]) / len(g[a]) >= 0.75)
        assert got_c == want_c, seed
