"""Corpus-level training-data ops: near-dup graph resolution, splits,
vocabulary stats, contamination — semantics pinned on a crafted corpus and
cross-checked against the DuckDB oracles."""

import duckdb
import pyarrow as pa

import ray.data as rd

from raykg.ops import corpus


def _crafted_docs() -> pa.Table:
    rows = [
        # identical triple -> one near-dup component, canonical 20
        (20, "alpha beta gamma delta epsilon zeta", "web"),
        (21, "alpha beta gamma delta epsilon zeta", "web"),
        (22, "alpha beta gamma delta epsilon zeta", "books"),
        # cross-source exact duplicate pair
        (30, "one two three four five six seven", "web"),
        (31, "one two three four five six seven", "books"),
        # unique docs
        (40, "quick brown fox jumps over lazy dog", "web"),
        (41, "pack my box with five dozen liquor jugs", "books"),
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })


def test_neardup_components_and_keep(ray_session):
    docs = rd.from_arrow(_crafted_docs())
    comps = {r["doc_id"]: r["component"]
             for r in corpus.neardup_components(docs).take_all()}
    assert comps == {20: 20, 21: 20, 22: 20, 30: 30, 31: 30}

    keep = {r["doc_id"]
            for r in corpus.neardup_keep(rd.from_arrow(_crafted_docs()))
            .take_all()}
    assert keep == {20, 30, 40, 41}


def test_cross_source_overlap(ray_session):
    t = corpus.cross_source_overlap(rd.from_arrow(_crafted_docs()))
    got = {(r["source_a"], r["source_b"]): r["n_hashes"]
           for r in t.to_pylist()}
    # two distinct texts are shared between books and web (20/22 and 30/31)
    assert got == {("books", "web"): 2}


def test_hash_split_deterministic_and_partitioning_invariant(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(2000)), pa.int64()),
        "text": pa.array(["t"] * 2000, pa.string()),
    }))
    a = {r["doc_id"]: r["split"]
         for r in corpus.hash_split(docs).take_all()}
    b = {r["doc_id"]: r["split"]
         for r in corpus.hash_split(
             rd.from_arrow(pa.table({
                 "doc_id": pa.array(list(range(2000)), pa.int64()),
                 "text": pa.array(["t"] * 2000, pa.string()),
             })).repartition(17)).take_all()}
    assert a == b                      # stable under repartitioning
    frac_val = sum(1 for v in a.values() if v == "val") / len(a)
    frac_test = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.07 < frac_val < 0.13 and 0.07 < frac_test < 0.13


def test_top_ngrams_matches_duckdb(ray_session):
    docs = _crafted_docs()
    got = [(r["gram"], r["n"])
           for r in corpus.top_ngrams(rd.from_arrow(docs), k=5).take_all()]
    con = duckdb.connect()
    con.register("documents", docs)
    import __ray_entry__ as e

    want_sql = e.oracle_sql()["top_ngrams"].replace("LIMIT 20", "LIMIT 5")
    want = [tuple(r) for r in con.sql(want_sql).fetchall()]
    assert got == want
    assert got[0][1] >= got[-1][1]


def test_neardup_components_long_chain_matches_recursive_oracle(ray_session):
    """A path-shaped near-dup graph needs diameter rounds of label
    propagation; the engine must reach the same fixpoint as the recursive
    DuckDB closure (regression: max_iters used to cap at 4 silently)."""
    words = [f"w{i:03d}" for i in range(40)]
    rows = [(i, " ".join(words[2 * i: 2 * i + 10]), "s") for i in range(8)]
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    got = {r["doc_id"]: r["component"]
           for r in corpus.neardup_components(rd.from_arrow(docs)).take_all()}
    import __ray_entry__ as e

    con = duckdb.connect()
    con.register("documents", docs)
    want = dict(con.sql(e.oracle_sql()["neardup_components"]).fetchall())
    con.close()
    assert got == want
    assert len(got) >= 3       # the chain actually produced pairs


def test_neardup_components_many_clusters_stay_separate(ray_session):
    """Many small components spread across many blocks: edge identity must
    be global (regression: per-batch edge counters collided across blocks
    and merged unrelated components)."""
    rows = []
    for c in range(60):
        text = " ".join(f"t{c}w{j}" for j in range(8))
        for m in range(3):
            rows.append((c * 10 + m, text))
    docs = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
    })
    got = {r["doc_id"]: r["component"]
           for r in corpus.neardup_components(rd.from_arrow(docs)).take_all()}
    want = {c * 10 + m: c * 10 for c in range(60) for m in range(3)}
    assert got == want


def test_pack_sequences_partitioning_and_bucket_invariant(ray_session):
    """Bin assignment is a pure function of (doc_id order, token counts):
    identical across block layouts AND across range-bucket widths (the
    distributed prefix-sum's offsets must compose exactly)."""
    t = pa.table({
        "doc_id": pa.array(list(range(50)), pa.int64()),
        "text": pa.array([("w " * ((i * 7) % 13 + 1)).strip()
                          for i in range(50)], pa.string()),
    })

    def run(ds, **kw):
        return sorted((r["doc_id"], r["n_tokens"], r["bin"]) for r in
                      corpus.pack_sequences(ds, target_tokens=20,
                                            **kw).take_all())

    base = run(rd.from_arrow(t))
    assert run(rd.from_arrow(t).repartition(7)) == base
    assert run(rd.from_arrow(t).repartition(7), bucket_docs=8) == base
    # exact rule: bin = tokens_before // target, in doc_id order
    cum = 0
    for doc_id, n, b in base:
        assert b == cum // 20
        cum += n


def test_stratified_sample_rates_and_determinism(ray_session):
    n = 400
    t = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "source": pa.array(["a" if i % 2 else "b" for i in range(n)],
                           pa.string()),
    })
    out = corpus.stratified_sample(rd.from_arrow(t), {"a": 0.9, "b": 0.1})
    rows = sorted((r["doc_id"], r["source"]) for r in out.take_all())
    # deterministic under resharding
    out2 = corpus.stratified_sample(rd.from_arrow(t).repartition(9),
                                    {"a": 0.9, "b": 0.1})
    assert sorted((r["doc_id"], r["source"]) for r in out2.take_all()) == rows
    n_a = sum(1 for _, s in rows if s == "a")
    n_b = sum(1 for _, s in rows if s == "b")
    assert 150 < n_a <= 200 and 0 < n_b < 50   # ~90% of 200, ~10% of 200


def test_hll_estimate_accuracy_and_merge_invariance(ray_session):
    import math

    import ray.data as rd

    from raykg.ops.corpus import HLL_M, hll_estimate, hll_token_registers

    # 20k distinct tokens spread over many docs: exercises the raw-HLL
    # branch (not linear counting) — standard error is 1.04/sqrt(256) ~ 6.5%
    n_tok = 20000
    rows = [{"doc_id": i, "text": " ".join(
        f"w{j}" for j in range(i * 20, (i + 1) * 20))}
        for i in range(n_tok // 20)]
    docs = rd.from_items(rows)
    est = hll_estimate(docs).to_pandas()
    e = float(est["estimate"][0])
    assert abs(e - n_tok) / n_tok < 0.15
    assert int(est["n_registers_hit"][0]) == HLL_M   # all registers hit
    # register table is invariant to partitioning (mergeable sketch)
    a = hll_token_registers(docs).to_pandas()
    b = hll_token_registers(docs.repartition(13)).to_pandas()
    assert a.values.tolist() == b.values.tolist()


def test_bloom_contamination_semantics(ray_session):
    import numpy as np
    import ray.data as rd

    from raykg.ops.corpus import (BLOOM_K, _bloom_positions,
                                  bloom_contamination,
                                  bloom_train_positions)

    # doc 3 duplicates doc 1's text across the split -> genuine hit;
    # every other probe doc is distinct (may still FP, checked exactly)
    texts = {0: "probe zero unique", 1: "shared text body",
             2: "train two", 3: "shared text body", 4: "train four",
             6: "probe six unique", 5: "train five"}
    docs = rd.from_items([{"doc_id": k, "text": v}
                          for k, v in sorted(texts.items())])
    got = bloom_contamination(docs, probe_mod=3).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == [0, 3, 6]
    hits = dict(zip(got["doc_id"], got["bloom_hit"]))
    assert hits[3] == 1   # exact duplicate always hits
    # brute-force the exact Bloom decision for the others
    train_pos = set(bloom_train_positions(
        docs.map_batches(lambda t: t.filter(
            pa.array((t.column("doc_id").to_numpy(zero_copy_only=False)
                      % 3) != 0)), batch_format="pyarrow"))
        .column("position").to_pylist())
    for d in (0, 6):
        expect = int(all(int(p) in train_pos
                         for p in _bloom_positions([texts[d]])[0]))
        assert hits[d] == expect
    # mergeability: the set-bit table is invariant to partitioning
    a = bloom_train_positions(docs).to_pydict()
    b = bloom_train_positions(docs.repartition(5)).to_pydict()
    assert a == b


def test_cms_estimates_and_merge_invariance(ray_session):
    import ray.data as rd

    from raykg.ops.corpus import cms_estimate_tokens, cms_token_counts

    docs = rd.from_items(
        [{"doc_id": i, "text": "alpha beta " + ("gamma " * (i + 1))}
         for i in range(6)])
    est = cms_estimate_tokens(docs, ["alpha", "gamma", "nothere"]) \
        .to_pandas().set_index("token")["est"]
    # CMS estimates upper-bound true counts; with 3 tokens in a 4x1024
    # sketch there are no collisions, so they are exact
    assert est["alpha"] == 6
    assert est["gamma"] == sum(range(1, 7))
    assert est["nothere"] == 0
    # linear sketch: register table invariant to partitioning
    a = cms_token_counts(docs).to_pydict()
    b = cms_token_counts(docs.repartition(4)).to_pydict()
    assert a == b


def test_bottomk_sample_matches_bruteforce_and_partitioning(ray_session):
    from raykg.functions.hashing import sha_hex

    ids = list(range(0, 4000, 3))
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["t"] * len(ids), pa.string()),
    })
    want = sorted(((sha_hex(f"sample|42|{d}")[:16], d) for d in ids))[:50]
    got = corpus.bottomk_sample(rd.from_arrow(docs), k=50).take_all()
    assert [(r["sample_rank"], r["doc_id"]) for r in got] == want
    # resharding must not change the sample (the reservoir-beating property)
    got2 = corpus.bottomk_sample(
        rd.from_arrow(docs).repartition(13), k=50).take_all()
    assert sorted(r["doc_id"] for r in got) == \
        sorted(r["doc_id"] for r in got2)
    # k >= corpus: every doc comes back
    small = pa.table({"doc_id": pa.array([7, 8], pa.int64()),
                      "text": pa.array(["a", "b"], pa.string())})
    assert len(corpus.bottomk_sample(
        rd.from_arrow(small), k=50).take_all()) == 2


def test_vocab_ids_dense_and_stable(ray_session):
    from raykg.functions.hashing import sha_hex

    texts = ["red green blue", "green blue yellow", "red", ""]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    got = {r["tok"]: r["id"] for r in corpus.vocab_ids(
        rd.from_arrow(docs), num_buckets=8).take_all()}
    vocab = {"red", "green", "blue", "yellow"}
    assert set(got) == vocab
    assert sorted(got.values()) == [0, 1, 2, 3]       # dense 0..V-1
    want_order = sorted(vocab, key=lambda w: (
        int(sha_hex(w)[:8], 16) % 8, w))
    assert [t for t, _ in sorted(got.items(), key=lambda kv: kv[1])] \
        == want_order
    got2 = {r["tok"]: r["id"] for r in corpus.vocab_ids(
        rd.from_arrow(docs).repartition(3), num_buckets=8).take_all()}
    assert got2 == got


def test_encode_documents_roundtrip(ray_session):
    """Decoding the id sequences through the vocab reproduces the
    original token streams; zero-token docs are omitted."""
    texts = ["red green blue", "green blue yellow", "red red", ""]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(docs).repartition(2)
    vocab = {r["id"]: r["tok"] for r in corpus.vocab_ids(
        ds, num_buckets=8).take_all()}
    got = {r["doc_id"]: (r["ids"], r["n_tokens"])
           for r in corpus.encode_documents(ds, num_buckets=8).take_all()}
    assert set(got) == {0, 1, 2}                      # doc 3 omitted
    for d, (ids, n) in got.items():
        toks = [vocab[int(x)] for x in ids.split("_")]
        assert toks == texts[d].split() and n == len(toks)


def test_source_similarity_sketch_exact_when_k_covers(ray_session):
    """With k >= the union vocabulary, the estimate IS the exact token
    Jaccard; identical sources read 1.0 and disjoint ones 0.0."""
    rows = [("a", "x y z"), ("a", "x q"), ("b", "x y z q"),
            ("c", "p r"), ("d", "x y z"), ("d", "q")]
    docs = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    t = corpus.source_similarity_sketch(
        rd.from_arrow(docs).repartition(3), k=64, num_buckets=16)
    got = {(a, b): (j, ku) for a, b, j, ku in zip(
        t.column("source_a").to_pylist(), t.column("source_b").to_pylist(),
        t.column("est_jaccard").to_pylist(), t.column("k_used").to_pylist())}
    vocab = {"a": {"x", "y", "z", "q"}, "b": {"x", "y", "z", "q"},
             "c": {"p", "r"}, "d": {"x", "y", "z", "q"}}
    for (a, b), (j, ku) in got.items():
        want = len(vocab[a] & vocab[b]) / len(vocab[a] | vocab[b])
        assert abs(j - want) < 1e-9, (a, b, j, want)
        assert ku == len(vocab[a] | vocab[b])
    assert got[("a", "b")][0] == 1.0 and got[("a", "c")][0] == 0.0


def test_corpus_diff_classifies_delta(ray_session):
    old = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["one", "two", "three", "four"], pa.string()),
    })
    new = pa.table({
        "doc_id": pa.array([2, 3, 4, 9], pa.int64()),
        "text": pa.array(["two", "three CHANGED", "four", "nine"],
                         pa.string()),
    })
    got = {r["doc_id"]: r["status"] for r in corpus.corpus_diff(
        rd.from_arrow(old).repartition(2),
        rd.from_arrow(new).repartition(3), num_buckets=16).take_all()}
    # doc 2 and 4 unchanged -> absent; 1 removed; 3 changed; 9 added
    assert got == {1: "removed", 3: "changed", 9: "added"}


def test_source_unigram_kl_matches_bruteforce(ray_session):
    import math
    from collections import Counter

    from raykg.functions.hashing import round_half_away

    rows = [("a", "x x y"), ("a", "x z"), ("b", "y y y w"), ("b", "w")]
    docs = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })
    cst: Counter = Counter()
    for s, txt in rows:
        for tok in txt.split():
            cst[(s, tok)] += 1
    ts = Counter()
    ct = Counter()
    for (s, tok), n in cst.items():
        ts[s] += n
        ct[tok] += n
    grand = sum(ts.values())
    want = {}
    for s in ts:
        kl = sum((n / ts[s]) * math.log2((n / ts[s]) / (ct[tok] / grand))
                 for (s2, tok), n in cst.items() if s2 == s)
        want[s] = (round_half_away(kl, 6), ts[s])
    got = {r["source"]: (r["kl_bits"], r["n_tokens"])
           for r in corpus.source_unigram_kl(
               rd.from_arrow(docs), num_buckets=64).take_all()}
    assert got == want
    assert all(v[0] > 0 for v in got.values())   # distinct distributions
    # invariant under resharding
    got2 = {r["source"]: (r["kl_bits"], r["n_tokens"])
            for r in corpus.source_unigram_kl(
                rd.from_arrow(docs).repartition(3),
                num_buckets=64).take_all()}
    assert got2 == got


def test_freq_spectrum_matches_bruteforce(ray_session):
    from collections import Counter

    texts = ["a a a b b c", "a b d", "e", ""]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    tok_counts = Counter()
    for s in texts:
        tok_counts.update(s.split())
    want = Counter(tok_counts.values())   # {5:1('a'), 3:1('b'), 1:3(c,d,e)}
    got = {r["freq"]: r["n_tokens"] for r in corpus.freq_spectrum(
        rd.from_arrow(docs), num_buckets=64).take_all()}
    assert got == dict(want)
    # invariant under resharding
    got2 = {r["freq"]: r["n_tokens"] for r in corpus.freq_spectrum(
        rd.from_arrow(docs).repartition(3), num_buckets=64).take_all()}
    assert got2 == got


def test_weighted_sample_matches_bruteforce_and_partitioning(ray_session):
    import math

    from raykg.functions.hashing import round_half_away, sha_hex

    ids = list(range(300))
    srcs = ["s0" if i % 3 else "s1" for i in ids]
    ws = [(i % 17) * 10 for i in ids]          # some zero weights (i%17==0)
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_chars": pa.array(ws, pa.int64()),
        "source": pa.array(srcs, pa.string()),
    })

    def key(d, w):
        u = (int(sha_hex(f"ws|42|{d}")[:8], 16) + 1) / 4294967296.0
        return round_half_away(math.log(u) / w, 6)

    want = {}
    for g in ("s0", "s1"):
        rows = sorted(((key(d, w), d) for d, w, s in zip(ids, ws, srcs)
                       if s == g and w > 0), key=lambda p: (-p[0], p[1]))
        want[g] = [d for _, d in rows[:5]]
    got = corpus.weighted_sample(rd.from_arrow(docs), k=5,
                                 num_buckets=16).take_all()
    by_g = {}
    for r in sorted(got, key=lambda r: (r["source"], r["rk"])):
        by_g.setdefault(r["source"], []).append(r["doc_id"])
    assert by_g == want
    # resharding must not change the sample
    got2 = corpus.weighted_sample(rd.from_arrow(docs).repartition(11), k=5,
                                  num_buckets=16).take_all()
    assert sorted((r["source"], r["doc_id"]) for r in got) == \
        sorted((r["source"], r["doc_id"]) for r in got2)
    # heavier docs win more often: mean weight of winners > corpus mean
    win_w = [ws[d] for d in want["s0"]]
    pool = [w for w, s in zip(ws, srcs) if s == "s0" and w > 0]
    assert sum(win_w) / len(win_w) > sum(pool) / len(pool)


def test_source_cap_matches_bruteforce_partitioning_and_merges(ray_session):
    from raykg.functions.hashing import sha_hex

    ids = list(range(300))
    srcs = [f"s{i % 4}" for i in ids]           # 4 sources x 75 docs
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "source": pa.array(srcs, pa.string()),
    })

    def rank(d):
        return sha_hex(f"cap|42|{d}")[:16]

    want = {}
    for g in sorted(set(srcs)):
        rows = sorted((rank(d), d) for d, s in zip(ids, srcs) if s == g)
        want[g] = [d for _, d in rows[:10]]

    got = corpus.source_cap(rd.from_arrow(docs), k=10,
                            num_buckets=16).take_all()
    by_g = {}
    for r in sorted(got, key=lambda r: (r["source"], r["rn"])):
        by_g.setdefault(r["source"], []).append(r["doc_id"])
    assert by_g == want
    assert all(1 <= r["rn"] <= 10 for r in got)
    # resharding must not change the capped set
    got2 = corpus.source_cap(rd.from_arrow(docs).repartition(11), k=10,
                             num_buckets=16).take_all()
    assert sorted((r["source"], r["doc_id"]) for r in got) == \
        sorted((r["source"], r["doc_id"]) for r in got2)
    # mergeability: re-capping the union of two shards' capped outputs
    # equals the one-pass cap (the incremental-crawl re-cap property)
    half_a = corpus.source_cap(
        rd.from_arrow(docs.slice(0, 150)), k=10, num_buckets=16).take_all()
    half_b = corpus.source_cap(
        rd.from_arrow(docs.slice(150)), k=10, num_buckets=16).take_all()
    union = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in half_a + half_b],
                           pa.int64()),
        "source": pa.array([r["source"] for r in half_a + half_b],
                           pa.string())})
    recap = corpus.source_cap(rd.from_arrow(union), k=10,
                              num_buckets=16).take_all()
    assert sorted((r["source"], r["doc_id"]) for r in recap) == \
        sorted((r["source"], r["doc_id"]) for r in got)
    # a source with fewer than k docs survives whole
    small = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "source": pa.array(["only"] * 3, pa.string())})
    got3 = corpus.source_cap(rd.from_arrow(small), k=10,
                             num_buckets=16).take_all()
    assert sorted(r["doc_id"] for r in got3) == [1, 2, 3]


def test_temperature_mix_flattens_and_is_deterministic(ray_session):
    from raykg.functions.hashing import hex_threshold8, sha_hex

    # 900 docs in 'big', 100 in 'small' — alpha=0.5 must upweight 'small'
    ids = list(range(1000))
    srcs = ["big" if i < 900 else "small" for i in ids]
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["t"] * 1000, pa.string()),
        "source": pa.array(srcs, pa.string()),
    })
    got = corpus.temperature_mix(rd.from_arrow(docs), alpha=0.5,
                                 target_frac=0.5).take_all()
    kept = {r["doc_id"]: r["source"] for r in got}

    # brute-force the exact expected keep set with the same float path
    counts = {"big": 900.0, "small": 100.0}
    wsum = sum(c ** 0.5 for c in counts.values())
    thr = {s: hex_threshold8(min(1.0, 0.5 * 1000.0 * (c ** 0.5 / wsum) / c))
           for s, c in counts.items()}
    want = {d: s for d, s in zip(ids, srcs)
            if sha_hex(f"mix|42|{d}")[:8] < thr[s]}
    assert kept == want

    n_small = sum(1 for s in kept.values() if s == "small")
    n_big = sum(1 for s in kept.values() if s == "big")
    # alpha=0.5 weights: big 0.75, small 0.25 of the 500-doc target ->
    # small keeps ~100% of its docs (p clamps to 1.0), big ~42%
    assert n_small > 90 and 0.3 < n_big / 900 < 0.55

    got2 = corpus.temperature_mix(
        rd.from_arrow(docs).repartition(13), alpha=0.5,
        target_frac=0.5).take_all()
    assert {r["doc_id"] for r in got2} == set(kept)


def test_hll_group_estimates_accuracy_and_invariance(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from raykg.ops.corpus import hll_group_estimates

    # two groups with very different cardinalities + one tiny group that
    # must take the linear-counting branch
    rows_a = [("a", i) for i in range(5000)] * 2          # 5k distinct, dup'd
    rows_b = [("b", i) for i in range(200)]
    rows_c = [("c", 0), ("c", 1), ("c", 0)]
    allr = rows_a + rows_b + rows_c
    t = pa.table({"event_type": pa.array([r[0] for r in allr], pa.string()),
                  "user_id": pa.array([r[1] for r in allr], pa.int64())})
    got = hll_group_estimates(rd.from_arrow(t)).to_pandas() \
        .set_index("event_type")
    assert abs(got.loc["a", "estimate"] - 5000) / 5000 < 0.15
    assert abs(got.loc["b", "estimate"] - 200) / 200 < 0.15
    assert abs(got.loc["c", "estimate"] - 2) < 0.5
    # duplicates don't inflate, partitioning doesn't change the numbers
    g2 = hll_group_estimates(rd.from_arrow(t).repartition(11)).to_pandas() \
        .set_index("event_type")
    assert got.equals(g2)


# ---------------------------------------------------------------------------
# BPE tokenizer training
# ---------------------------------------------------------------------------

def _brute_bpe(texts, n_merges):
    """Sennrich et al. 2016 reference: most frequent adjacent symbol pair,
    ties -> lexicographically smallest (l, r); greedy left-to-right
    non-overlapping merge."""
    from collections import Counter
    wc = Counter(w for t in texts for w in t.split())
    vocab = {w: list(w) for w in wc}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, c in wc.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (lft, rgt), cnt = min(pairs.items(), key=lambda x: (-x[1], x[0]))
        merges.append((rank, lft, rgt, cnt))
        for w in vocab:
            syms, out, i = vocab[w], [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == lft
                        and syms[i + 1] == rgt):
                    out.append(lft + rgt)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def _text_ds(texts, parts=1):
    import pyarrow as pa

    import ray.data as rd
    return rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})) \
        .repartition(parts)


def test_bpe_train_matches_brute_force():
    from raykg.ops.corpus import bpe_train
    texts = ["low low low lower lowest", "new newer newest low",
             "wide wider widest new new", "low lower newest wide"]
    got = bpe_train(_text_ds(texts, parts=3), n_merges=6)
    rows = list(zip(got.column("rank").to_pylist(),
                    got.column("lft").to_pylist(),
                    got.column("rgt").to_pylist(),
                    got.column("cnt").to_pylist()))
    assert rows == _brute_bpe(texts, 6)


def test_bpe_train_overlapping_runs():
    # "aaaa" stresses greedy non-overlapping: merge (a,a) twice gives
    # [aa, aa], then (aa, aa) -> [aaaa]
    from raykg.ops.corpus import bpe_train
    texts = ["aaaa aaaa aaa ab", "aaaa aaa ab ab"]
    got = bpe_train(_text_ds(texts, parts=2), n_merges=4)
    rows = list(zip(got.column("rank").to_pylist(),
                    got.column("lft").to_pylist(),
                    got.column("rgt").to_pylist(),
                    got.column("cnt").to_pylist()))
    assert rows == _brute_bpe(texts, 4)
    assert rows[0][1:3] == ("a", "a")


def test_bpe_pair_counts_tiny():
    from collections import Counter

    from raykg.ops.corpus import bpe_pair_counts
    texts = ["abc abc ab", "bcd ab abc"]
    want = Counter()
    for t in texts:
        for w in t.split():
            for a, b in zip(w, w[1:]):
                want[(a, b)] += 1
    got = bpe_pair_counts(_text_ds(texts, parts=2), k=10).to_pandas()
    got_d = {(r["l"], r["r"]): r["cnt"] for _, r in got.iterrows()}
    assert got_d == dict(want)
    # descending count, ties by (l, r)
    keys = [(-r["cnt"], r["l"], r["r"]) for _, r in got.iterrows()]
    assert keys == sorted(keys)


def test_bpe_rejects_control_chars():
    import pytest

    from raykg.ops.corpus import bpe_train
    with pytest.raises(Exception, match="control char"):
        bpe_train(_text_ds(["ok ok", "bad\x01token ok"]), n_merges=1)
