"""End-to-end flagship pipeline vs the single-process oracle, plus the
per-row span-sequence invariant (BASELINE.json input_hint)."""

import ray.data as rd

from raykg import synth
from raykg.config import KGConfig
from raykg.oracle import oracle_triple_set, oracle_triples
from raykg.pipelines.evaluate import dataset_triple_set, triple_prf
from raykg.pipelines.kg import build_kg

CFG = KGConfig(n_docs=300, batch_size=256, link_concurrency=2)


def _docs_ds():
    # read via from_arrow in several blocks to exercise partitioning
    t = synth.documents_table(CFG)
    return rd.from_arrow(t).repartition(7)


def test_triples_match_oracle(ray_session):
    result = build_kg(_docs_ds(), CFG)
    pred = dataset_triple_set(result.triples)
    gold = oracle_triple_set(synth.documents_table(CFG), CFG)
    m = triple_prf(pred, gold)
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95, m
    # deterministic engine + deterministic oracle -> exact match expected
    assert m["precision"] == 1.0 and m["recall"] == 1.0, m


def test_canonicalization_merges_duplicates(ray_session):
    result = build_kg(_docs_ds(), CFG)
    # every canonical target must not itself be remapped (idempotent map)
    for v in result.canon_map.values():
        assert v not in result.canon_map
    assert len(result.canon_map) > 0  # duplicates existed and were merged
    # no -dup URI survives in triples
    dup_uris = set(result.canon_map)
    for s, p, o in dataset_triple_set(result.triples):
        assert s not in dup_uris and o not in dup_uris


def test_edges_are_distinct(ray_session):
    result = build_kg(_docs_ds(), CFG)
    rows = result.edges.take_all()
    keys = [(r["subj"], r["pred"], r["obj"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert sum(r["count"] for r in rows) == result.triples.count()


def test_nodes_have_labels_and_props(ray_session):
    result = build_kg(_docs_ds(), CFG)
    rows = result.nodes.take_all()
    uris = [r["uri"] for r in rows]
    assert len(uris) == len(set(uris))
    labels = {r["label"] for r in rows}
    assert "Document" in labels and len(labels) >= 3


def test_span_sequence_invariant(ray_session):
    """Spans (kind, text, media_ref, order) survive the pipeline's document
    pass-through end-to-end (input_hint invariant)."""
    ds = _docs_ds()
    # run the document branch of the pipeline (extraction consumes documents;
    # the materialized node branch passes them through) and re-read spans
    out = ds.map_batches(lambda t: t, batch_format="pyarrow").take_all()
    want = {r: spans for r, spans in zip(
        synth.documents_table(CFG).column("doc_id").to_pylist(),
        synth.documents_table(CFG).column("spans").to_pylist())}
    for row in out:
        spans = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
        expect = [(s["kind"], s["text"], s["media_ref"]) for s in want[row["doc_id"]]]
        assert spans == expect
        offsets = [s["offset"] for s in row["spans"]]
        assert offsets == sorted(offsets)


def test_oracle_provenance_fields():
    t = synth.documents_table(KGConfig(n_docs=50))
    triples = oracle_triples(t, KGConfig(n_docs=50))
    assert all(len(x) == 5 for x in triples)
    assert all(x[3].startswith("doc-") for x in triples)


def test_flagship_exact_matches_duckdb(ray_session):
    """The flagship pipeline over the SQL-exact corpus (synth.sha_doc_rows)
    must reproduce the single-statement DuckDB oracle bit-for-bit: triples,
    deduped edges with counts, and node rows."""
    import duckdb

    import __ray_entry__ as e

    cfg = KGConfig(n_docs=120, typo_rate=0.0, batch_size=64,
                   link_concurrency=2)
    from raykg.pipelines.kg import build_kg

    res = build_kg(synth.sha_documents_dataset(cfg), cfg)
    got_triples = {(r["subj"], r["pred"], r["obj"], r["doc_id"],
                    r["span_offset"]) for r in res.triples.take_all()}
    want_triples = set(map(tuple, duckdb.sql(
        e.flagship_exact_sql(cfg, "triples")).fetchall()))
    assert got_triples == want_triples
    assert len(got_triples) > 100

    got_edges = {(r["subj"], r["pred"], r["obj"], r["count"])
                 for r in res.edges.take_all()}
    want_edges = set(map(tuple, duckdb.sql(
        e.flagship_exact_sql(cfg, "edges")).fetchall()))
    assert got_edges == want_edges

    got_nodes = {(r["uri"], r["label"]) for r in res.nodes.take_all()}
    want_nodes = set(map(tuple, duckdb.sql(
        e.flagship_exact_sql(cfg, "nodes")).fetchall()))
    assert got_nodes == want_nodes


def test_flagship_fuzzy_matches_duckdb(ray_session):
    """The flagship over the TYPO'D sha corpus (typo_rate > 0) must
    reproduce the fuzzy DuckDB oracle bit-for-bit — this drives the
    deletion-variant + shingle-Jaccard-argmax resolution path (the
    corrupted-surface half of the linker) through an external oracle, not
    just the engine's own single-process twin."""
    import duckdb

    import __ray_entry__ as e

    cfg = KGConfig(n_docs=120, typo_rate=0.3, batch_size=64,
                   link_concurrency=2)
    res = build_kg(synth.sha_documents_dataset(cfg), cfg)
    got = {(r["subj"], r["pred"], r["obj"], r["doc_id"], r["span_offset"])
           for r in res.triples.take_all()}
    want = set(map(tuple, duckdb.sql(
        e.flagship_fuzzy_sql(cfg, "triples")).fetchall()))
    assert got == want
    assert len(got) > 100

    got_edges = {(r["subj"], r["pred"], r["obj"], r["count"])
                 for r in res.edges.take_all()}
    want_edges = set(map(tuple, duckdb.sql(
        e.flagship_fuzzy_sql(cfg, "edges")).fetchall()))
    assert got_edges == want_edges


def test_fuzzy_link_modes_agree_on_sha_corpus(ray_session):
    """All three link modes must agree on the typo'd sha corpus (the
    distributed/hybrid deletion-variant joins vs the broadcast index)."""
    cfg = KGConfig(n_docs=120, typo_rate=0.3, batch_size=64,
                   link_concurrency=2)

    def tset(ds):
        return {(r["subj"], r["pred"], r["obj"], r["doc_id"],
                 r["span_offset"]) for r in ds.take_all()}

    want = tset(build_kg(synth.sha_documents_dataset(cfg), cfg).triples)
    assert tset(build_kg(synth.sha_documents_dataset(cfg), cfg,
                         canon_broadcast_limit=0,
                         link_mode="distributed").triples) == want
    assert tset(build_kg(synth.sha_documents_dataset(cfg), cfg,
                         canon_broadcast_limit=0,
                         link_mode="hybrid").triples) == want


def test_join_rewrite_path_matches_broadcast(ray_session):
    """Forcing the join-based canonicalization scale path
    (canon_broadcast_limit=0) must produce the identical triple and edge
    sets as the broadcast path — and must not materialize a canon map on
    the driver."""
    from raykg.pipelines.kg import build_kg as bk

    broadcast = bk(_docs_ds(), CFG)
    joined = bk(_docs_ds(), CFG, canon_broadcast_limit=0)
    assert joined.canon_map == {}

    def tset(ds):
        return {(r["subj"], r["pred"], r["obj"], r["doc_id"],
                 r["span_offset"]) for r in ds.take_all()}

    assert tset(joined.triples) == tset(broadcast.triples)

    def eset(ds):
        return {(r["subj"], r["pred"], r["obj"], r["count"])
                for r in ds.take_all()}

    assert eset(joined.edges) == eset(broadcast.edges)


def test_fully_broadcast_free_configuration(ray_session):
    """distributed linker + join-based rewrite (link_mode='distributed',
    canon_broadcast_limit=0) must equal the broadcast configuration — the
    10^8+-entity path where nothing row-sized touches the driver."""
    from raykg.pipelines.kg import build_kg as bk

    cfg = KGConfig(n_docs=200, batch_size=128, link_concurrency=2)
    broadcast = bk(synth.documents_dataset(cfg), cfg)
    nobroadcast = bk(synth.documents_dataset(cfg), cfg,
                     canon_broadcast_limit=0, link_mode="distributed")
    hybrid = bk(synth.documents_dataset(cfg), cfg,
                canon_broadcast_limit=0, link_mode="hybrid")

    def tset(ds):
        return {(r["subj"], r["pred"], r["obj"], r["doc_id"],
                 r["span_offset"]) for r in ds.take_all()}

    want = tset(broadcast.triples)
    assert tset(nobroadcast.triples) == want
    assert tset(hybrid.triples) == want

    def eset(ds):
        return {(r["subj"], r["pred"], r["obj"], r["count"])
                for r in ds.take_all()}

    ewant = eset(broadcast.edges)
    assert eset(nobroadcast.edges) == ewant
    assert eset(hybrid.edges) == ewant


def test_extreme_entity_skew_matches_oracle(ray_session):
    """Hot-key robustness (north rule: salted/partial handling of skewed
    entity keys): with only 4 entities every mention hits one of 4 keys —
    the canonicalization/dedup shuffles concentrate maximally — and the
    triple set must still match the oracle exactly."""
    from raykg.oracle import oracle_triple_set
    from raykg.pipelines.evaluate import dataset_triple_set, triple_prf

    cfg = KGConfig(n_docs=300, n_entities=4, batch_size=128,
                   link_concurrency=2)
    result = build_kg(synth.documents_dataset(cfg), cfg)
    m = triple_prf(dataset_triple_set(result.triples),
                   oracle_triple_set(synth.documents_table(cfg), cfg))
    assert m["precision"] == 1.0 and m["recall"] == 1.0
