"""tfidf_top_terms (raykg/ops/text.py): handcrafted-corpus semantics
(argmax, tie-break, empty-doc omission) and partitioning invariance.
DuckDB oracle equivalence runs through tools/check_queries.py."""

import math

import pyarrow as pa

import ray.data as rd

from raykg.ops.text import tfidf_top_terms


def _docs(rows, blocks=1):
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_tfidf_argmax_and_tie_break(ray_session):
    # corpus of 4 docs; "rare" appears only in doc 0 -> top there.
    # doc 3 is empty -> omitted. doc 2: "aa" and "bb" appear only there,
    # both tf=1/2 and df=1 -> equal score; tie-break picks "aa".
    got = tfidf_top_terms(_docs([
        (0, "common rare"),
        (1, "common common common zz"),
        (2, "bb aa"),
        (3, "   "),
    ]), num_buckets=8).to_pandas().set_index("doc_id").sort_index()
    assert got.index.tolist() == [0, 1, 2]
    assert got.loc[0, "term"] == "rare"
    assert abs(got.loc[0, "score"]
               - round(0.5 * math.log(4 / 1), 4)) < 1e-12
    # doc 1: common tf=3/4 df=2 (0.520) beats zz tf=1/4 df=1 (0.347)
    assert got.loc[1, "term"] == "common"
    assert got.loc[2, "term"] == "aa"


def test_tfidf_partitioning_invariant(ray_session):
    rows = [(i, f"tok{i % 7} tok{i % 3} shared word{i}") for i in range(40)]
    a = tfidf_top_terms(_docs(rows), num_buckets=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = tfidf_top_terms(_docs(rows, blocks=9), num_buckets=17).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_bigram_logprob_hand_computed_and_modes_agree(ray_session):
    from raykg.ops.text import bigram_logprob

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b c", "x", "a b"], pa.string()),
    })
    # corpus bigrams: (a,b)x3, (b,a)x1, (b,c)x1; c(a)=3, c(b)=2
    # doc 1: [0, 1, 0, 1] bits / 4 = 0.5; doc 3: 0.0; doc 2 omitted (<2 toks)
    got = {r["doc_id"]: r["mean_nll"] for r in
           bigram_logprob(rd.from_arrow(docs)).take_all()}
    assert got == {1: 0.5, 3: 0.0}
    gj = {r["doc_id"]: r["mean_nll"] for r in
          bigram_logprob(rd.from_arrow(docs), mode="join",
                         num_buckets=8).take_all()}
    assert gj == got


def test_bigram_logprob_join_partitioning_invariant(ray_session):
    from raykg.ops.text import bigram_logprob

    n = 300
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"w{i % 7} w{i % 5} w{i % 3} w{i % 7}"
                          for i in range(n)], pa.string()),
    })
    a = {r["doc_id"]: r["mean_nll"] for r in
         bigram_logprob(rd.from_arrow(docs), mode="join").take_all()}
    b = {r["doc_id"]: r["mean_nll"] for r in
         bigram_logprob(rd.from_arrow(docs).repartition(11),
                        mode="join", num_buckets=17).take_all()}
    c = {r["doc_id"]: r["mean_nll"] for r in
         bigram_logprob(rd.from_arrow(docs)).take_all()}
    assert a == b == c and len(a) == n


def test_score_percentiles_matches_percent_rank(ray_session):
    import duckdb

    from raykg.ops.text import score_percentiles

    docs = pa.table({
        "doc_id": pa.array(list(range(40)), pa.int64()),
        "text": pa.array(
            ["the a " + " ".join(f"w{j}" for j in range(i + 1))
             for i in range(40)], pa.string()),
    })
    got = {r["doc_id"]: (r["quality"], r["pct_rank"]) for r in
           score_percentiles(rd.from_arrow(docs)).take_all()}
    con = duckdb.connect()
    con.register("documents", docs)
    import __ray_entry__ as e

    want = {d: (q, p) for d, q, p in
            con.execute(e.oracle_sql()["score_percentiles"]).fetchall()}
    assert got == want
    # repartition invariance (the CDF must be global, not per-block)
    got2 = {r["doc_id"]: (r["quality"], r["pct_rank"]) for r in
            score_percentiles(
                rd.from_arrow(docs).repartition(7)).take_all()}
    assert got2 == got


def test_dsir_weights_hand_computed(ray_session):
    """Target = docs with >=2 marker tokens. A token shared with the
    target scores higher than one seen only outside it; empty docs are
    omitted; partitioning does not change the numbers."""
    import numpy as np

    from raykg.functions.hashing import sha_int
    from raykg.ops.text import dsir_weights

    rows = [
        (0, "the a good good"),     # target (two markers)
        (1, "good junk"),           # raw only
        (2, "junk junk junk"),      # raw only
        (3, ""),                    # omitted
    ]
    got = {r["doc_id"]: r["dsir_logratio"]
           for r in dsir_weights(_docs(rows), num_features=64).take_all()}
    assert set(got) == {0, 1, 2}

    # brute-force the same numbers
    NF = 64
    t_arr, r_arr = np.zeros(NF), np.zeros(NF)
    for _, s in rows:
        toks = s.split()
        tgt = sum(1 for w in toks if w in ("the", "a")) >= 2
        for w in toks:
            b = sha_int(w) % NF
            r_arr[b] += 1
            if tgt:
                t_arr[b] += 1
    lr = (np.log2((t_arr + 1) / (t_arr.sum() + NF))
          - np.log2((r_arr + 1) / (r_arr.sum() + NF)))
    for d, s in rows:
        toks = s.split()
        if not toks:
            continue
        want = round(float(np.mean([lr[sha_int(w) % NF] for w in toks])), 4)
        assert abs(got[d] - want) < 1e-12
    # target doc should look more target-like than the junk doc
    assert got[0] > got[2]

    # partitioning invariance
    many = [(i, f"the a tok{i % 5}" if i % 3 == 0 else f"tok{i % 5} junk{i}")
            for i in range(30)]
    a = dsir_weights(_docs(many), num_features=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = dsir_weights(_docs(many, blocks=7), num_features=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_bm25_hand_computed(ray_session):
    """Crafted corpus: hand-computed Okapi BM25 (Lucene idf), no-match and
    empty docs omitted, partitioning invariance."""
    import math

    from raykg.ops.text import bm25_scores

    rows = [
        (0, "data data query x"),   # both terms
        (1, "x y z w"),             # no query term -> omitted
        (2, "spark"),               # one term, short doc
        (3, ""),                    # empty -> omitted
    ]
    got = {r["doc_id"]: r["bm25"] for r in
           bm25_scores(_docs(rows)).take_all()}
    assert set(got) == {0, 2}

    # brute force: N=3 scored docs (0,1,2 have tokens), avgdl=(4+4+1)/3=3
    N, avgdl, k1, b = 3.0, 3.0, 1.2, 0.75

    def idf(df):
        return math.log((N - df + 0.5) / (df + 0.5) + 1.0)

    def term(f, dl, df):
        return idf(df) * f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))

    want0 = round(term(2, 4, 1) + term(1, 4, 1), 4)   # data f=2, query f=1
    want2 = round(term(1, 1, 1), 4)                   # spark f=1, dl=1
    assert abs(got[0] - want0) < 1e-12
    assert abs(got[2] - want2) < 1e-12

    many = [(i, f"data tok{i % 5} query" if i % 2 else f"tok{i % 7} spark x")
            for i in range(40)]
    a = bm25_scores(_docs(many)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bdf = bm25_scores(_docs(many, blocks=9)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(bdf)


def test_inverted_index_cap_and_prefix_merge(ray_session):
    """df keeps the true document count while postings truncate to the
    max_postings smallest doc ids — and the truncated per-batch prefixes
    must still merge to the exact global prefix (top-k merge property),
    so the 9-block run must equal the 1-block run."""
    from raykg.ops.text import inverted_index

    # term "hot" in 40 docs (ids 0..39), "cold" in docs 5 and 17 only
    rows = [(i, "hot cold" if i in (5, 17) else "hot") for i in range(40)]
    got = {r["term"]: r for r in
           inverted_index(_docs(rows), max_postings=8,
                          num_buckets=16).take_all()}
    assert got["hot"]["df"] == 40
    assert got["hot"]["postings"] == ",".join(map(str, range(8)))
    assert got["cold"]["df"] == 2
    assert got["cold"]["postings"] == "5,17"

    a = inverted_index(_docs(rows), max_postings=8, num_buckets=16) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    b = inverted_index(_docs(rows, blocks=9), max_postings=8,
                       num_buckets=16) \
        .to_pandas().sort_values("term").reset_index(drop=True)
    assert a.equals(b)


def test_gopher_rules_each_flag(ray_session):
    """One crafted doc per rule: every flag must be falsifiable
    independently, and keep is the AND of all five."""
    from raykg.ops.text import gopher_rules

    base = "the a " + " ".join(["word"] * 58)          # 60 tokens, clean
    rows = [
        (0, base),                                      # all flags pass
        (1, "the a word"),                              # too few words
        (2, "the a " + " ".join(["##"] * 10 + ["word"] * 48)),  # symbols
        (3, "the a " + " ".join(["11"] * 58)),          # non-alpha words
        (4, "the a " + " ".join(["extraordinarily"] * 58)),  # long words
        (5, " ".join(["word"] * 60)),                   # no stop words
    ]
    got = {r["doc_id"]: r for r in gopher_rules(_docs(rows, blocks=3))
           .take_all()}
    assert got[0]["keep"] == 1
    assert got[1]["ok_words"] == 0 and got[1]["ok_stops"] == 1
    assert got[2]["ok_symbols"] == 0 and got[2]["ok_alpha"] == 1
    assert got[3]["ok_alpha"] == 0
    assert got[4]["ok_mean_len"] == 0
    assert got[5]["ok_stops"] == 0 and got[5]["ok_words"] == 1
    for d in (1, 2, 3, 4, 5):
        assert got[d]["keep"] == 0
    assert got[0]["n_words"] == 60
    assert got[2]["symbol_ratio"] == round(20 / 60, 4)


def test_quality_funnel_matches_flags(ray_session):
    """The funnel's per-source counts must equal column sums of
    gopher_rules' flags, whatever the block layout."""
    import pyarrow as pa

    from raykg.ops.text import gopher_rules, quality_funnel

    base = "the a " + " ".join(["word"] * 58)
    rows = [(i, "s" + str(i % 2),
             base if i % 3 else "the a short") for i in range(12)]
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "source": pa.array([r[1] for r in rows], pa.string()),
                  "text": pa.array([r[2] for r in rows], pa.string())})
    ds = rd.from_arrow(t).repartition(5)
    fun = quality_funnel(ds).to_pandas().set_index("source").sort_index()
    flags = gopher_rules(ds).to_pandas()
    flags["source"] = flags["doc_id"].map({r[0]: r[1] for r in rows})
    by = flags.groupby("source")
    assert (fun["n_docs"] == by.size()).all()
    assert (fun["kept"] == by["keep"].sum()).all()
    assert (fun["fail_words"] == by["ok_words"].agg(lambda c: (1 - c).sum())).all()
    assert fun["n_docs"].sum() == 12


def test_cooccurrence_pmi_vs_reference(ray_session):
    """Engine PMI == a driver-side reference implementation on a crafted
    corpus (perfect collocation ranks first), block-layout invariant."""
    import math
    from collections import Counter

    from raykg.functions.hashing import round_half_away
    from raykg.ops.text import cooccurrence_pmi

    rows = [(i, "alpha beta " + " ".join(
        f"f{(i * 7 + j) % 11}" for j in range(10))) for i in range(30)]

    def ref(window=2, min_count=2, top_k=10):
        pc_, uc = Counter(), Counter()
        P = N = 0
        for _, s in rows:
            toks = s.split()
            uc.update(toks)
            N += len(toks)
            for i in range(len(toks)):
                for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                    a, b = sorted((toks[i], toks[j]))
                    pc_[(a, b)] += 1
                    P += 1
        out = [(a, b, c,
                round_half_away(math.log2(
                    (c / P) / ((uc[a] / N) * (uc[b] / N))), 4))
               for (a, b), c in pc_.items() if c >= min_count]
        out.sort(key=lambda r: (-r[3], r[0], r[1]))
        return out[:top_k]

    exp = ref()
    got = cooccurrence_pmi(_docs(rows, blocks=4), window=2, min_count=2,
                           top_k=10, num_buckets=32).take_all()
    got_t = [(r["w1"], r["w2"], r["c12"], r["pmi"]) for r in got]
    assert got_t == exp
    # the always-adjacent pair dominates
    assert got_t[0][:2] == ("alpha", "beta")
    got_1 = cooccurrence_pmi(_docs(rows), window=2, min_count=2,
                             top_k=10, num_buckets=32).take_all()
    assert [(r["w1"], r["w2"], r["c12"], r["pmi"]) for r in got_1] == got_t


def test_unigram_logprob_max_vocab_noop_when_large(ray_session):
    # max_vocab >= |V| must be byte-identical to the untruncated model
    from raykg.ops.text import unigram_logprob

    rows = [(i, f"w{i % 5} w{i % 3} shared") for i in range(60)]
    full = {r["doc_id"]: r["mean_nll"] for r in
            unigram_logprob(_docs(rows), num_buckets=8).take_all()}
    capped = {r["doc_id"]: r["mean_nll"] for r in
              unigram_logprob(_docs(rows, blocks=7), num_buckets=8,
                              max_vocab=10**6).take_all()}
    assert capped == full and len(full) == 60


def test_unigram_logprob_max_vocab_truncation_engages(ray_session):
    # top-2 of {a:4, b:3, c:2, d:1}: vocab={a,b}, OOV mass = 3
    from raykg.ops.text import unigram_logprob

    rows = [(1, "a a b c"), (2, "a a b b c d")]
    got = {r["doc_id"]: r["mean_nll"] for r in
           unigram_logprob(_docs(rows), num_buckets=8,
                           max_vocab=2).take_all()}
    tot = 10.0
    p = {"a": 4 / tot, "b": 3 / tot}
    oov = 3 / tot
    exp = {}
    for d, text in rows:
        toks = text.split()
        nll = sum(-math.log2(p.get(w, oov)) for w in toks) / len(toks)
        exp[d] = round(nll, 4)
    assert got == exp
    # and it differs from the untruncated model (truncation engaged)
    full = {r["doc_id"]: r["mean_nll"] for r in
            unigram_logprob(_docs(rows), num_buckets=8).take_all()}
    assert got != full


def test_bigram_logprob_max_vocab_noop_and_truncation(ray_session):
    from collections import Counter

    from raykg.ops.text import bigram_logprob

    rows = [(i, f"w{i % 6} w{i % 4} w{i % 3} end") for i in range(50)]
    full = {r["doc_id"]: r["mean_nll"] for r in
            bigram_logprob(_docs(rows), num_buckets=8).take_all()}
    noop = {r["doc_id"]: r["mean_nll"] for r in
            bigram_logprob(_docs(rows, blocks=5), num_buckets=8,
                           max_vocab=10**6).take_all()}
    assert noop == full and len(full) == 50

    # truncation engaged: brute-force the OOV-rewritten bigram MLE
    K = 3
    tok_c: Counter = Counter()
    for _, text in rows:
        tok_c.update(text.split())
    top = {w for w, _ in sorted(tok_c.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:K]}
    OOV = "\x00oov\x00"

    def norm(toks):
        return [w if w in top else OOV for w in toks]

    bg_c: Counter = Counter()
    w1_c: Counter = Counter()
    for _, text in rows:
        toks = norm(text.split())
        for a, b in zip(toks[:-1], toks[1:]):
            bg_c[(a, b)] += 1
            w1_c[a] += 1
    exp = {}
    for d, text in rows:
        toks = norm(text.split())
        pairs = list(zip(toks[:-1], toks[1:]))
        nll = sum(-math.log2(bg_c[p] / w1_c[p[0]])
                  for p in pairs) / len(pairs)
        exp[d] = round(nll, 4)
    got = {r["doc_id"]: r["mean_nll"] for r in
           bigram_logprob(_docs(rows), num_buckets=8,
                          max_vocab=K).take_all()}
    assert got == exp and got != full


def test_bigram_logprob_max_vocab_rejected_in_join_mode(ray_session):
    import pytest

    from raykg.ops.text import bigram_logprob

    with pytest.raises(ValueError, match="max_vocab"):
        bigram_logprob(_docs([(1, "a b")]), mode="join", max_vocab=5)
