"""The entity vocabulary is DATA (raykg/catalog.py): build_kg must produce
identical graphs whether the alias/metadata tables come from the synthetic
default catalog or from externally supplied (shuffled, pre-materialized)
tables — and must work on a vocabulary that is NOT the synthetic one at all.

This pins round-3 verdict gap #1: no stage of the canonicalize/materialize
tail may call raykg.synth per entity id; everything rides the catalog's
ALIASES and ENTITY_METADATA datasets."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from raykg import synth
from raykg.catalog import ALIASES, ENTITY_METADATA, DatasetCatalog
from raykg.config import KGConfig
from raykg.pipelines.kg import build_kg

CFG = KGConfig(n_docs=300, batch_size=256, link_concurrency=2)


def _docs_ds():
    return rd.from_arrow(synth.documents_table(CFG)).repartition(7)


def _external_tables(cfg, seed=7):
    """The synthetic vocabulary exported to plain Arrow tables and SHUFFLED:
    from the engine's point of view this is an arbitrary external catalog
    (nothing downstream may rely on synth being callable per id, nor on any
    row order)."""
    idx = np.arange(cfg.num_entities)
    meta = synth.entity_metadata_rows(idx, cfg)
    aliases = synth.alias_rows(idx, cfg)
    rng = np.random.default_rng(seed)
    meta = meta.take(pa.array(rng.permutation(meta.num_rows)))
    aliases = aliases.take(pa.array(rng.permutation(aliases.num_rows)))
    return aliases, meta


def _graph_key(result):
    triples = sorted(
        (r["subj"], r["pred"], r["obj"], r["doc_id"], r["span_offset"])
        for r in result.triples.take_all())
    nodes = sorted((r["uri"], r["label"], tuple(sorted(r["properties"])))
                   for r in result.nodes.take_all())
    edges = sorted((r["subj"], r["pred"], r["obj"], r["count"])
                   for r in result.edges.take_all())
    return triples, nodes, edges


def test_dataset_catalog_matches_default(ray_session):
    """build_kg over DatasetCatalog(shuffled external tables) is
    bit-identical to the default (synthetic) catalog, on both the broadcast
    and the distributed link paths."""
    aliases, meta = _external_tables(CFG)
    cat = DatasetCatalog(aliases, meta)
    want = _graph_key(build_kg(_docs_ds(), CFG))
    got = _graph_key(build_kg(_docs_ds(), CFG, catalog=cat))
    assert got == want
    got_dist = _graph_key(build_kg(_docs_ds(), CFG, catalog=cat,
                                   link_mode="distributed",
                                   canon_broadcast_limit=0))
    assert got_dist == want


def test_non_synthetic_vocabulary(ray_session):
    """A hand-written corpus + hand-written vocabulary (entity ids, labels
    and norm-names the synthetic generator can never produce) runs
    end-to-end: linking, canonicalization (two ids share a norm_name and
    must merge), node minting with catalog properties. Surfaces follow the
    extraction contract (mention candidates are digit-bearing tokens —
    stages/extract.py)."""
    from raykg.schema import DOCUMENTS

    aliases = pa.Table.from_pydict({
        "alias": ["ada1", "ada01", "lovelace1", "babbage2", "engine3"],
        "ent": [0, 0, 1, 2, 3],
    }, schema=ALIASES)
    meta = pa.Table.from_pydict({
        "ent": [0, 1, 2, 3],
        "entity_id": ["person/ada", "person/ada-alt", "person/babbage",
                      "machine/engine"],
        "label": ["Person", "Person", "Person", "Machine"],
        # ada and ada-alt share a norm_name -> canonicalization must merge
        "norm_name": ["ada lovelace", "ada lovelace", "charles babbage",
                      "analytical engine"],
        "properties": [{"born": "1815"}, {"born": "1815"},
                       {"born": "1791"}, {"built": "never"}],
    }, schema=ENTITY_METADATA)

    def span(text, offset):
        return {"kind": "text", "text": text, "media_ref": "",
                "offset": offset}

    docs_t = pa.Table.from_pydict({
        "doc_id": ["d0", "d1"],
        "spans": [
            [span("ada1 knows babbage2 and engine3", 0),
             span("babbage2 founded engine3", 40)],
            [span("lovelace1 works at babbage2", 0)],
        ],
    }, schema=DOCUMENTS)
    res = build_kg(rd.from_arrow(docs_t), CFG,
                   catalog=DatasetCatalog(aliases, meta))
    nodes = {r["uri"]: r for r in res.nodes.take_all()}
    labels = {r["label"] for r in nodes.values()}
    assert labels == {"Person", "Machine", "Document"}
    # ada + ada-alt merged into ONE canonical Person node
    people = [r for r in nodes.values() if r["label"] == "Person"]
    assert len(people) == 2          # ada(+alt merged), babbage
    assert len(res.canon_map) == 1   # exactly one uri was remapped
    props = {tuple(sorted(r["properties"])) for r in people}
    assert (("born", "1815"),) in props and (("born", "1791"),) in props
    # relations resolved and canonicalized: works_at(ada, babbage) must use
    # the SAME canonical ada uri as knows(ada, babbage)
    preds = {}
    for r in res.triples.take_all():
        preds.setdefault(r["pred"], []).append((r["subj"], r["obj"]))
    assert "knows" in preds and "works_at" in preds and "founded" in preds
    assert preds["knows"][0][0] == preds["works_at"][0][0]
    assert all(r["count"] >= 1 for r in res.edges.take_all())
