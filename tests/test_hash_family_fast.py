"""``hash_family="fast"`` production mode (VERDICT r3 roadmap #2): the
crc-based vectorized family must make the SAME keep/drop decisions as the
sha oracle family wherever the two agree by construction — identical texts
hash identically within EITHER family — and must preserve each sketch's
structural guarantees (Bloom: no false negatives; CMS: point estimates are
upper bounds). The oracle gate (__ray_entry__) always runs "sha"; these
tests pin the fast family's semantics so a production flip is safe."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from raykg.ops.corpus import (bloom_contamination, cms_estimate_tokens,
                              cms_token_counts)
from raykg.ops.dedup import (lsh_candidate_pairs, minhash_dedup,
                             minhash_signatures, simhash)

def _docs(n=40, dup_every=4):
    """n docs in n/dup_every exact-dup groups: doc i duplicates doc
    i - (i % dup_every). Every token carries the group id, so distinct
    groups share ZERO n-grams — the families "agree by construction"
    (same-group: identical text -> identical sig; cross-group: Jaccard 0,
    so a merge would need a genuine hash collision)."""
    texts = [" ".join(f"g{i - i % dup_every}w{j}" for j in range(6))
             for i in range(n)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def _groups(rows):
    """signature -> sorted doc ids, with signatures anonymized away (the two
    families produce different sig VALUES; only the partition into groups —
    i.e. the keep/drop decisions — must match)."""
    return rows


def test_minhash_dedup_decisions_match_sha(ray_session):
    docs = _docs()
    by_family = {}
    for fam in ("sha", "fast"):
        sigs = minhash_signatures(docs, hash_family=fam) \
            .select_columns(["doc_id", "sig"]).take_all()
        grp = {}
        for r in sigs:
            grp.setdefault(r["sig"], []).append(r["doc_id"])
        by_family[fam] = sorted(sorted(v) for v in grp.values())
        kept = sorted(r["doc_id"] for r in
                      minhash_dedup(docs, hash_family=fam).take_all())
        # exact duplicates collapse to the min id in either family
        assert kept == sorted(min(g) for g in grp.values())
    # the PARTITION into dup groups is identical (exact dups by construction)
    assert by_family["sha"] == by_family["fast"]


def test_fast_minhash_partition_invariant(ray_session):
    docs = _docs()
    a = sorted((r["sig"], r["doc_id"]) for r in
               minhash_dedup(docs, hash_family="fast").take_all())
    b = sorted((r["sig"], r["doc_id"]) for r in
               minhash_dedup(docs.repartition(7),
                             hash_family="fast").take_all())
    assert a == b


def test_lsh_pairs_fast_finds_exact_dup_pairs(ray_session):
    """Exact duplicates share every band in either family, and the Jaccard
    verification join computes EXACT jaccard from the grams (independent of
    hash family) — so every sha-found pair with jaccard 1.0 must also
    surface in fast mode, with the identical score."""
    docs = _docs(n=24)
    pairs = {}
    for fam in ("sha", "fast"):
        pairs[fam] = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
                      lsh_candidate_pairs(docs, hash_family=fam).take_all()}
    exact_sha = {p for p, j in pairs["sha"].items() if j == 1.0}
    assert exact_sha  # fixture guarantees exact-dup pairs exist
    assert exact_sha <= set(pairs["fast"])
    for p in exact_sha:
        assert pairs["fast"][p] == 1.0


def test_simhash_fast_semantics(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta gamma", "alpha beta gamma",
                          "totally different words here", ""], pa.string())}))
    rows = {r["doc_id"]: r["simhash_hex"] for r in
            simhash(docs, hash_family="fast").take_all()}
    assert len(rows[0]) == 16 and int(rows[0], 16) >= 0
    assert rows[0] == rows[1]          # identical text -> identical simhash
    assert rows[0] != rows[2]
    assert rows[3] == "0" * 16         # empty doc convention, both families
    # determinism across runs / partitionings
    again = {r["doc_id"]: r["simhash_hex"] for r in
             simhash(docs.repartition(3), hash_family="fast").take_all()}
    assert again == rows


def test_bloom_fast_no_false_negatives(ray_session):
    """Probe-side docs that exactly duplicate a train-side doc MUST hit
    (Bloom filters have no false negatives) — in either family. probe_mod=3:
    probe = doc_id % 3 == 0; fixture dup groups of 4 guarantee cross-split
    exact duplicates."""
    docs = _docs(n=36)
    texts = {r["doc_id"]: r["text"] for r in docs.take_all()}
    train_texts = {t for d, t in texts.items() if d % 3 != 0}
    for fam in ("sha", "fast"):
        hits = {r["doc_id"]: r["bloom_hit"] for r in
                bloom_contamination(docs, hash_family=fam).take_all()}
        dup_probes = [d for d in hits if texts[d] in train_texts]
        assert dup_probes
        assert all(hits[d] == 1 for d in dup_probes)


def test_cms_fast_upper_bound(ray_session):
    docs = _docs(n=20)
    from collections import Counter

    true = Counter()
    for r in docs.take_all():
        true.update(r["text"].split())
    probes = ["g0w0", "g4w1", "g16w5", "absent-token"]
    for fam in ("sha", "fast"):
        regs = cms_token_counts(docs, hash_family=fam)
        total = sum(regs.column("n").to_pylist())
        # the sketch is linear: every row holds every occurrence once
        assert total == 4 * sum(true.values())
        est = {r["token"]: r["est"] for r in
               cms_estimate_tokens(docs, probes, hash_family=fam).to_pylist()}
        for tok in probes:
            assert est[tok] >= true.get(tok, 0)


def test_unknown_family_rejected(ray_session):
    docs = _docs(n=4)
    for fn in (lambda: minhash_signatures(docs, hash_family="md5"),
               lambda: simhash(docs, hash_family="md5")):
        try:
            fn()
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


def test_assign_clusters_fast_set_and_reshard_invariants(ray_session):
    """The family contract schema discovery relies on: nodes with EQUAL
    property-key sets always share a cluster key (within either family),
    and fast keys are reshard-invariant. Cross-family partition identity
    is deliberately NOT asserted — MinHash is a similarity sketch, so
    near-equal sets collide with probability ~J^tables, a coin each family
    flips with different hashes; the decision-level pin is the quality
    parity test below."""
    from raykg import synth
    from raykg.config import KGConfig, NodeSynthConfig
    from raykg.pipelines.discover import assign_clusters

    nodes = synth.pg_nodes_dataset(NodeSynthConfig(n_nodes=300, noise=0.1))
    for fam in ("sha", "fast"):
        rows = assign_clusters(nodes, KGConfig(), num_tables=8,
                               id_col="node_id", label_col="labels",
                               hash_family=fam).take_all()
        key_of_set: dict = {}
        for r in rows:
            s = tuple(r["props"])
            assert key_of_set.setdefault(s, r["cluster_key"]) == \
                r["cluster_key"], f"{fam}: equal set split across keys"
    again = assign_clusters(nodes.repartition(5), KGConfig(), 8,
                            id_col="node_id", label_col="labels",
                            hash_family="fast").take_all()
    once = assign_clusters(nodes, KGConfig(), 8,
                           id_col="node_id", label_col="labels",
                           hash_family="fast").take_all()
    assert {r["node_id"]: r["cluster_key"] for r in again} == \
        {r["node_id"]: r["cluster_key"] for r in once}


def test_discover_fast_quality_parity(ray_session):
    """Decision-level pin for hash_family="fast" in schema discovery: on
    the reference's own protocol (1000 noise-corrupted nodes, 10% noise —
    SURVEY §5), the fast path must keep recall 1.0 (every node clustered)
    and precision within 0.05 of the sha oracle path."""
    from raykg import synth
    from raykg.config import KGConfig, NodeSynthConfig
    from raykg.pipelines.discover import discover_node_types
    from raykg.pipelines.evaluate import cluster_metrics

    nodes = synth.pg_nodes_dataset(NodeSynthConfig(n_nodes=1000, noise=0.1))
    m = {}
    for fam in ("sha", "fast"):
        res = discover_node_types(nodes, KGConfig(), dataset_size=1000,
                                  id_col="node_id", label_col="labels",
                                  hash_family=fam)
        m[fam] = cluster_metrics(res.clustered)
        assert m[fam]["recall"] == 1.0
    assert m["fast"]["precision"] >= m["sha"]["precision"] - 0.05


def test_discover_node_types_fast_end_to_end(ray_session):
    """The full discovery pipeline under hash_family="fast" recovers the
    same (label, required_props) schema rows as the sha oracle path."""
    from raykg import synth
    from raykg.config import KGConfig, NodeSynthConfig
    from raykg.pipelines.discover import discover_node_types

    nodes = synth.pg_nodes_dataset(NodeSynthConfig(n_nodes=400, noise=0.0))
    schemas = {}
    for fam in ("sha", "fast"):
        res = discover_node_types(nodes, KGConfig(), dataset_size=400,
                                  id_col="node_id", label_col="labels",
                                  hash_family=fam)
        schemas[fam] = sorted(
            (t["label"], tuple(t["required_props"]), t["count"])
            for t in res.node_types.take_all())
    assert schemas["sha"] == schemas["fast"]


def test_dsir_fast_semantics(ray_session):
    """DSIR weights under the fast family: same doc coverage as sha, exact
    duplicates score identically (same text -> same bucket multiset), and
    values are reshard-invariant. Weight VALUES legitimately differ across
    families (different feature-bucket assignment), so only decisions and
    invariants are pinned — the oracle gate always runs sha."""
    import math

    import pyarrow as pa
    import ray.data as rd

    from raykg.ops.text import dsir_weights

    n = 30
    # %3==0 docs carry TWO EN markers ("the", "a") -> they are the DSIR
    # target slice, so n_t is nonzero and the logratio actually varies
    texts = [("the quick a fox " if i % 3 == 0 else "zug blorp qix ")
             + f"g{i - i % 5} tail words" for i in range(n)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = {}
    for fam in ("sha", "fast"):
        rows = dsir_weights(docs, hash_family=fam).take_all()
        out[fam] = {r["doc_id"]: r["dsir_logratio"] for r in rows}
        assert all(math.isfinite(v) for v in out[fam].values())
    assert set(out["fast"]) == set(out["sha"]) == set(range(n))
    for i in range(n):
        for j in range(n):
            if texts[i] == texts[j]:
                assert out["fast"][i] == out["fast"][j]
    resharded = {r["doc_id"]: r["dsir_logratio"] for r in
                 dsir_weights(docs.repartition(7),
                              hash_family="fast").take_all()}
    assert resharded == out["fast"]


def test_fast_family_rejected_in_new_entry_points(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raykg.config import KGConfig
    from raykg.ops.text import dsir_weights
    from raykg.pipelines.discover import assign_clusters

    docs = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                   "text": pa.array(["x"], pa.string())}))
    for fn in (lambda: dsir_weights(docs, hash_family="md5"),
               lambda: assign_clusters(docs, KGConfig(), 4,
                                       hash_family="md5")):
        try:
            fn()
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
