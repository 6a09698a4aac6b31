import numpy as np
import pyarrow as pa

from raykg import schema, synth
from raykg.config import KGConfig, NodeSynthConfig


def test_documents_deterministic_and_schema():
    cfg = KGConfig(n_docs=50)
    t1 = synth.documents_table(cfg)
    t2 = synth.documents_table(cfg)
    assert t1.equals(t2)
    assert t1.schema.equals(schema.DOCUMENTS)
    assert t1.num_rows == 50


def test_documents_batch_independence():
    """Generation is a pure function of (seed, index): any batch split yields
    identical rows — the property that makes distributed generation exact."""
    cfg = KGConfig(n_docs=20)
    full = synth.gen_doc_rows(np.arange(20), cfg)
    parts = pa.concat_tables([synth.gen_doc_rows(np.arange(0, 7), cfg),
                              synth.gen_doc_rows(np.arange(7, 20), cfg)])
    assert full.equals(parts)


def test_span_offsets_monotonic():
    cfg = KGConfig(n_docs=30)
    t = synth.documents_table(cfg)
    for spans in t.column("spans").to_pylist():
        offsets = [s["offset"] for s in spans]
        assert offsets == sorted(offsets)
        assert len(set(offsets)) == len(offsets)


def test_dup_entities_share_norm_name_and_label():
    cfg = KGConfig(n_docs=10)
    i = cfg.dup_entity_rem  # first duplicate index
    assert synth.is_dup_entity(i, cfg)
    assert synth.entity_norm_name(i, cfg) == synth.entity_norm_name(i - 1, cfg)
    assert synth.entity_label(i, cfg) == synth.entity_label(i - 1, cfg)
    assert synth.entity_name(i, cfg).endswith("-dup")


def test_pg_nodes_noise_protocol():
    clean = synth.pg_nodes_table(NodeSynthConfig(n_nodes=200, noise=0.0))
    noisy = synth.pg_nodes_table(NodeSynthConfig(n_nodes=200, noise=0.5))
    n_clean = sum(len(p) for p in clean.column("properties").to_pylist())
    n_noisy = sum(len(p) for p in noisy.column("properties").to_pylist())
    assert n_noisy < n_clean
    # 'id' columns are never nulled (reference src2/main/scala/Noise.scala:15-17)
    for props in noisy.column("properties").to_pylist():
        assert "id" in dict(props)


def test_distributed_generation_matches_local(ray_session):
    cfg = KGConfig(n_docs=64)
    ds = synth.documents_dataset(cfg)
    got = ds.take_all()
    got_ids = sorted(r["doc_id"] for r in got)
    want = synth.documents_table(cfg)
    assert got_ids == sorted(want.column("doc_id").to_pylist())
    by_id = {r["doc_id"]: r["spans"] for r in got}
    for doc_id, spans in zip(want.column("doc_id").to_pylist(),
                             want.column("spans").to_pylist()):
        assert by_id[doc_id] == spans


def test_pg_nodes_label_weights():
    # default stays round-robin (pinned by every existing fixture)
    from collections import Counter

    from raykg.config import LABEL_SIGNATURES

    rr = synth.pg_nodes_table(NodeSynthConfig(n_nodes=70))
    labels = tuple(LABEL_SIGNATURES.keys())
    assert rr.column("labels").to_pylist()[:7] == list(labels)

    # weighted mix: deterministic across calls, proportions track weights
    w = (0.02, 0.60, 0.30, 0.06, 0.012, 0.004, 0.004)
    a = synth.pg_nodes_table(NodeSynthConfig(n_nodes=5000, label_weights=w))
    b = synth.pg_nodes_table(NodeSynthConfig(n_nodes=5000, label_weights=w))
    assert a.column("labels").to_pylist() == b.column("labels").to_pylist()
    c = Counter(a.column("labels").to_pylist())
    assert abs(c["Comment"] / 5000 - 0.60) < 0.03
    assert abs(c["Post"] / 5000 - 0.30) < 0.03
    assert c["Place"] < 60 and c["Organisation"] < 60
