import pyarrow as pa

from raykg import synth
from raykg.config import KGConfig
from raykg.stages.extract import extract_batch, extract_span_events
from raykg.stages.link import AliasIndex, build_alias_items


def test_extract_relation_sentence():
    events = extract_span_events("d0", 0, "text",
                                 "the person-000001 works at organisation-000002", 0)
    etypes = sorted(e[3] for e in events)
    assert etypes == ["mention", "mention", "relation"]
    rel = [e for e in events if e[3] == "relation"][0]
    assert rel[4] == "works_at"
    assert rel[5] == "person-000001"
    assert rel[6] == "organisation-000002"


def test_extract_caption_and_empty():
    assert extract_span_events("d0", 1, "image", "", 10) == []
    events = extract_span_events("d0", 1, "image", "image of pla000003", 10)
    assert len(events) == 1 and events[0][3] == "caption"


def test_extract_batch_shapes():
    cfg = KGConfig(n_docs=20)
    out = extract_batch(synth.documents_table(cfg))
    assert out.num_rows > 0
    assert set(out.column("etype").to_pylist()) <= {"relation", "mention", "caption"}


def test_alias_index_exact_and_fuzzy():
    cfg = KGConfig(n_docs=100)
    idx = AliasIndex(cfg)
    for i in (0, 5, 13):
        for a in synth.entity_aliases(i, cfg):
            assert idx.resolve(a) == i
    # fuzzy: one dropped character still resolves to the right entity
    surface = synth.entity_aliases(7, cfg)[0]
    typo = synth.apply_typo(surface, 3)
    assert typo != surface
    assert idx.resolve(typo) == 7
    # garbage resolves to nothing
    assert idx.resolve("zz9xx8yy7") is None


def test_alias_items_deterministic():
    cfg = KGConfig(n_docs=100)
    assert build_alias_items(cfg) == build_alias_items(cfg)
