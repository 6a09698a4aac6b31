"""Schema discovery + evaluation against the reference protocol (SURVEY §5):
noise-corrupted property-graph nodes, clustered by property-signature MinHash,
scored with majority-vote cluster purity P/R/F1
(/root/reference output logs: P/R/F1 ~0.99/1.0 at 10% noise, degrading with
noise while recall stays 1.0)."""

from raykg import synth
from raykg.config import KGConfig, LABEL_SIGNATURES, NodeSynthConfig
from raykg.pipelines.discover import discover_edge_types, discover_node_types
from raykg.pipelines.evaluate import cluster_metrics

CFG = KGConfig()


def _discover(ray_session, noise: float):
    nodes = synth.pg_nodes_dataset(NodeSynthConfig(n_nodes=1000, noise=noise))
    return discover_node_types(nodes, CFG, dataset_size=1000,
                               id_col="node_id", label_col="labels")


def test_clean_nodes_recover_exact_schema(ray_session):
    result = _discover(ray_session, 0.0)
    types = result.node_types.take_all()
    # no noise -> one cluster per DISTINCT property signature. Place and
    # Organisation share an identical signature (id,name,url,type) and are
    # inherently indistinguishable to property-signature clustering — they
    # merge into one cluster whose majority label wins (same confusion the
    # reference exhibits on identical-signature labels).
    distinct_sigs = {tuple(sorted(sig)) for sig in LABEL_SIGNATURES.values()}
    assert len(types) == len(distinct_sigs)
    by_label = {t["label"]: t for t in types}
    assert "Place" in by_label and "Organisation" not in by_label
    for label, sig in LABEL_SIGNATURES.items():
        if label in by_label:
            assert by_label[label]["required_props"] == sorted(sig)
            assert by_label[label]["optional_props"] == []
    m = cluster_metrics(result.clustered)
    # the merged Place/Organisation cluster contributes its minority rows as
    # FP; every row still lands in a cluster -> recall 1.0
    assert m["recall"] == 1.0
    assert 0.85 <= m["precision"] < 1.0


def test_noise_sweep_metrics_degrade_gracefully(ray_session):
    """Mirror of the reference's noise sweep: recall stays 1.0 (every node is
    clustered), precision degrades as signatures fragment."""
    prev_clusters = 0
    for noise in (0.1, 0.4):
        result = _discover(ray_session, noise)
        m = cluster_metrics(result.clustered)
        assert m["recall"] == 1.0
        assert m["precision"] >= 0.5
        assert m["num_clusters"] >= prev_clusters
        prev_clusters = m["num_clusters"]


def test_pattern_set_metrics():
    from raykg.pipelines.evaluate import pattern_set_metrics

    truth = {"Person": frozenset({"id", "name"}),
             "Place": frozenset({"id", "url"})}
    detected = {"Person": frozenset({"id", "name"}),       # exact
                "Place": frozenset({"id"}),                # partial
                "Ghost": frozenset({"x"})}                 # spurious
    m = pattern_set_metrics(detected, truth)
    assert m["exact_matches"] == 1
    assert m["precision"] == 1 / 3 and m["recall"] == 1 / 2
    assert m["per_label"]["Place"]["property_precision"] == 1.0
    assert m["per_label"]["Place"]["property_recall"] == 0.5


def test_merge_pattern_snapshot(ray_session, tmp_path):
    from raykg.pipelines.discover import merge_pattern_snapshot

    path = str(tmp_path / "merged_patterns")
    r1 = _discover(ray_session, 0.0)
    first = merge_pattern_snapshot(r1.node_types, path)
    n1 = first.count()
    assert n1 > 0

    # second run with noise discovers additional fragmented patterns;
    # merge unions them with the prior snapshot (S5 semantics)
    r2 = _discover(ray_session, 0.4)
    second = merge_pattern_snapshot(r2.node_types, path)
    n2 = second.count()
    assert n2 > n1

    # idempotent: re-merging the same run changes nothing
    third = merge_pattern_snapshot(r2.node_types, path)
    assert third.count() == n2


def test_edge_types_and_self_cluster_quirk(ray_session):
    rels = synth.pg_relationships_dataset(
        NodeSynthConfig(n_nodes=1000, n_edges=2000))
    node_label = {f"n{i:08d}": synth._pg_label(i) for i in range(1000)}

    def as_triples(t):
        import pyarrow as pa

        return pa.table({"subj": t.column("src_id"),
                         "pred": t.column("rel_type"),
                         "obj": t.column("dst_id")})

    edges = rels.map_batches(as_triples, batch_format="pyarrow")
    types = discover_edge_types(edges, node_label, CFG).take_all()
    keys = {(t["rel_type"], t["src_label"], t["dst_label"]) for t in types}
    assert ("KNOWS", "Person", "Person") in keys or \
           any(k[0] == "KNOWS" and k[1] == k[2] for k in keys)

    import dataclasses

    cfg_drop = dataclasses.replace(CFG, drop_self_cluster_edges=True)
    types2 = discover_edge_types(edges, node_label, cfg_drop).take_all()
    keys2 = {(t["rel_type"], t["src_label"], t["dst_label"]) for t in types2}
    # the reference quirk (Clustering.scala:165-170) drops same-label edges
    assert all(k[1] != k[2] for k in keys2)
    assert keys2 < keys


def test_edge_type_properties_and_cardinalities(ray_session):
    """EDGE_TYPES carries aggregated relationship properties and computed
    cardinalities (reference declares these fields but only ever with
    constant defaults, Pattern.scala:2-20)."""
    from collections import Counter

    import pyarrow as pa

    n_nodes, n_edges = 1000, 2000
    rels = synth.pg_relationships_dataset(
        NodeSynthConfig(n_nodes=n_nodes, n_edges=n_edges))
    node_label = {f"n{i:08d}": synth._pg_label(i) for i in range(n_nodes)}
    label_counts = Counter(node_label.values())

    def as_triples(t):
        return pa.table({"subj": t.column("src_id"),
                         "pred": t.column("rel_type"),
                         "obj": t.column("dst_id"),
                         "properties": t.column("properties")})

    edges = rels.map_batches(as_triples, batch_format="pyarrow")
    types = discover_edge_types(edges, node_label, CFG,
                                label_counts=dict(label_counts)).take_all()
    assert types
    # every synthetic edge carries exactly {creationDate} -> always required
    for t in types:
        assert t["required_props"] == ["creationDate"]
        assert t["optional_props"] == []
        assert 1 <= t["min_cardinality"] <= t["max_cardinality"]
    # all endpoints are labeled -> totals preserved
    assert sum(t["count"] for t in types) == n_edges
    # far fewer edges than nodes per label -> some types must be optional
    assert any(t["is_optional"] for t in types)


def test_node_type_optionality_fields(ray_session):
    clean = _discover(ray_session, 0.0)
    for t in clean.node_types.take_all():
        assert t["is_optional"] is False
        assert t["min_cardinality"] == 1 and t["max_cardinality"] == 1
        assert t["optional_props"] == []
    noisy = _discover(ray_session, 0.4)
    noisy_types = noisy.node_types.take_all()
    assert any(t["is_optional"] for t in noisy_types)
    for t in noisy_types:
        assert t["is_optional"] == (len(t["optional_props"]) > 0)
