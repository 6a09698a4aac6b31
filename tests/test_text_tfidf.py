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
