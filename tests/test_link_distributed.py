"""Distributed (join-based, broadcast-free) linker must produce the same
linked triples as the broadcast AliasIndex path on the synthetic corpus."""

from raykg import synth
from raykg.config import KGConfig
from raykg.pipelines.kg import linked_triples
from raykg.stages.link_distributed import (
    linked_triples_distributed,
    resolve_surfaces,
    alias_dataset,
)

CFG = KGConfig(n_docs=250, batch_size=128, link_concurrency=2)


def _tset(ds):
    return {tuple(r[k] for k in ("subj", "pred", "obj", "doc_id",
                                 "span_offset"))
            for r in ds.take_all()}


def test_distributed_matches_broadcast(ray_session):
    docs = synth.documents_dataset(CFG)
    broadcast = _tset(linked_triples(docs, CFG))
    distributed = _tset(linked_triples_distributed(
        synth.documents_dataset(CFG), CFG, num_partitions=8))
    assert distributed == broadcast
    assert len(distributed) > 0


def test_resolution_tie_breaks(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from raykg.stages.link import AliasIndex

    # exact surfaces, a deletion typo, a substitution + a transposition
    # (neither exact nor single-deletion -> must take the LSH residue path,
    # matching AliasIndex's LSH fallback), and a non-entity string
    surfaces = ["person-000000", "org000001", "place-00002",
                "persxn-000000", "perosn-000000",
                "nonexistent-zzz"]
    ds = rd.from_arrow(pa.table({"surface": surfaces}))
    res = {r["surface"]: r["ent"]
           for r in resolve_surfaces(ds, alias_dataset(CFG), CFG,
                                     num_partitions=4).take_all()}
    idx = AliasIndex(CFG)
    for s in surfaces:
        assert res.get(s) == idx.resolve(s), s
