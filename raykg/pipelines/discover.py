"""Schema discovery: MinHash-LSH clustering of property-presence signatures.

Reference core (src variant): binary presence matrix
(src/main/scala/DataProcessor.scala:7-23) -> MinHashLSH
(src/main/scala/Clustering.scala:59-68) -> groupBy(hashKey) cluster aggregate
(Clustering.scala:90-97) -> required properties where sum == clusterSize
(Clustering.scala:113-122); optionality threshold 0.95 from the src2 variant
(src2/main/scala/Main.scala:268).

Ray-Data-first differences (SURVEY §1.3, §2.3):
- the binary matrix is never materialized as wide columns — each batch computes
  a property-signature directly from the `properties` map column;
- MinHash is deterministic (sha256-based, seeded) so cluster keys are identical
  across runs, partitionings and cluster sizes — Spark's unseeded fit is not
  (src/main/scala/Clustering.scala:60-63, documented deviation);
- the cluster aggregate is two-phase: a per-batch combiner thins each
  (cluster_key) to one partial row per batch before the groupby shuffle.
"""

from __future__ import annotations

import json
from collections import Counter
from dataclasses import dataclass

import pyarrow as pa

import ray.data as rd

from raykg import schema
from raykg.config import KGConfig
from raykg.functions.hashing import fast_minhash_sigs, minhash_sig_sha


@dataclass
class DiscoveryResult:
    node_types: rd.Dataset     # schema.NODE_TYPES
    clustered: rd.Dataset      # (node_id, cluster_key, label) per input row
    num_hash_tables: int


def assign_clusters(nodes: rd.Dataset, cfg: KGConfig, num_tables: int,
                    id_col: str = "uri", label_col: str = "label",
                    hash_family: str = "sha") -> rd.Dataset:
    """Per node: sorted property-key signature -> deterministic MinHash
    cluster key. Pure map_batches; no state, no shuffle.

    ``hash_family="sha"`` (default, the SQL-replicable oracle contract);
    ``"fast"`` (production): one crc32 per property name spread through the
    vectorized multiply-mod-Mersenne family — one numpy pass per batch
    instead of num_tables x num_props Python sha256 calls per NODE (the
    same tax the dedup stack eliminated in r4; nodes with equal property
    sets get equal keys under either family, so the clustering decision
    semantics are unchanged — pinned by tests/test_hash_family_fast.py)."""
    if hash_family not in ("sha", "fast"):
        raise ValueError(f"unknown hash_family {hash_family!r}")

    def sig_batch(batch: pa.Table) -> pa.Table:
        props = batch.column("properties").to_pylist()
        names_per_node = [
            sorted(k for k, _ in p) if isinstance(p, list) else
            sorted(p.keys()) for p in props]
        if hash_family == "fast":
            keys = fast_minhash_sigs(names_per_node, num_tables, cfg.seed)
        else:
            keys = ["_".join(minhash_sig_sha(names, num_tables, cfg.seed))
                    for names in names_per_node]
        return pa.table({
            "node_id": batch.column(id_col),
            "cluster_key": pa.array(keys, pa.string()),
            "label": batch.column(label_col),
            "props": pa.array(names_per_node, pa.list_(pa.string())),
        })

    return nodes.map_batches(sig_batch, batch_format="pyarrow")


def discover_node_types(nodes: rd.Dataset, cfg: KGConfig,
                        dataset_size: int | None = None,
                        id_col: str = "uri",
                        label_col: str = "label",
                        hash_family: str = "sha") -> DiscoveryResult:
    n = dataset_size if dataset_size is not None else nodes.count()
    num_tables = cfg.derived_minhash_tables(n)
    clustered = assign_clusters(nodes, cfg, num_tables, id_col, label_col,
                                hash_family=hash_family)

    def partial_agg(batch: pa.Table) -> pa.Table:
        """Combiner: one row per cluster_key per batch."""
        by_key: dict[str, tuple[int, Counter, Counter]] = {}
        for key, label, props in zip(batch.column("cluster_key").to_pylist(),
                                     batch.column("label").to_pylist(),
                                     batch.column("props").to_pylist()):
            if key not in by_key:
                by_key[key] = (0, Counter(), Counter())
            n_, pc_, lc_ = by_key[key]
            pc_.update(props)
            lc_[label] += 1
            by_key[key] = (n_ + 1, pc_, lc_)
        return pa.table({
            "cluster_key": pa.array(list(by_key.keys()), pa.string()),
            "n": pa.array([v[0] for v in by_key.values()], pa.int64()),
            "prop_counts": pa.array([json.dumps(v[1]) for v in by_key.values()],
                                    pa.string()),
            "label_counts": pa.array([json.dumps(v[2]) for v in by_key.values()],
                                     pa.string()),
        })

    partial = clustered.map_batches(partial_agg, batch_format="pyarrow")

    def merge_group(t: pa.Table) -> pa.Table:
        key = t.column("cluster_key")[0].as_py()
        n_total = sum(t.column("n").to_pylist())
        pc_, lc_ = Counter(), Counter()
        for s in t.column("prop_counts").to_pylist():
            pc_.update(json.loads(s))
        for s in t.column("label_counts").to_pylist():
            lc_.update(json.loads(s))
        # majority label: max count, ties -> lexicographically smallest
        # (reference: row_number over count desc,
        #  src/main/scala/ClusteringEvaluation.scala:17-21)
        majority = min(lc_.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        required = sorted(p for p, c in pc_.items()
                          if c / n_total >= cfg.optional_threshold)
        optional = sorted(p for p in pc_ if p not in set(required))
        return pa.Table.from_pydict({
            "cluster_key": [key], "label": [majority],
            "required_props": [required], "optional_props": [optional],
            "count": [n_total],
            # reference carries these with constant defaults
            # (Pattern.scala:2-8); computed here: a node type is optional
            # when any of its properties is
            "is_optional": [len(optional) > 0],
            "min_cardinality": [1], "max_cardinality": [1],
        }, schema=schema.NODE_TYPES)

    node_types = partial.groupby("cluster_key").map_groups(
        merge_group, batch_format="pyarrow")
    return DiscoveryResult(node_types=node_types,
                           clustered=clustered.select_columns(
                               ["node_id", "cluster_key", "label"]),
                           num_hash_tables=num_tables)


def merge_pattern_snapshot(node_types: rd.Dataset, path: str) -> rd.Dataset:
    """Incremental merged-pattern snapshot (reference analog S5:
    src2/main/scala/Main.scala:102-113 — read prior parquet if present,
    set-union with the new patterns, overwrite).

    Identity = (label, required_props, optional_props); counts from the new
    run win for existing patterns. The overwrite is crash-safe: the merged
    snapshot is written to ``path + '.tmp'``, the prior snapshot is renamed
    aside (never deleted while it is the only copy), the new one is renamed
    into place, and only then is the old copy removed — a crash at any point
    leaves either the prior snapshot at ``path`` or a complete new one, and a
    leftover ``.old`` directory is cleaned up on the next merge."""
    import os
    import shutil

    import pyarrow.parquet as pq

    new = pa.Table.from_pylist(node_types.take_all(),
                               schema=schema.NODE_TYPES)

    def key(row: dict) -> tuple:
        return (row["label"], tuple(row["required_props"]),
                tuple(row["optional_props"]))

    # recover from a crash that happened between the two renames below
    # (prior snapshot set aside at .old, new one not yet in place)
    if not os.path.isdir(path) and os.path.isdir(path + ".old"):
        os.replace(path + ".old", path)

    merged: dict[tuple, dict] = {}
    if os.path.isdir(path):
        for frag in sorted(os.listdir(path)):
            if frag.endswith(".parquet"):
                for row in pq.read_table(os.path.join(path, frag)).to_pylist():
                    merged[key(row)] = row
    for row in new.to_pylist():
        merged[key(row)] = row      # new run wins
    out = pa.Table.from_pylist(
        sorted(merged.values(), key=lambda r: (r["label"], r["cluster_key"])),
        schema=schema.NODE_TYPES)
    tmp, old = path + ".tmp", path + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)   # debris from a prior crash
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(out, os.path.join(tmp, "part-00000.parquet"))
    if os.path.isdir(path):
        os.replace(path, old)                # prior snapshot set aside, intact
    os.replace(tmp, path)                    # new snapshot in place
    shutil.rmtree(old, ignore_errors=True)
    return rd.from_arrow(out)


def discover_edge_types(edges: rd.Dataset, uri_to_label: dict[str, str],
                        cfg: KGConfig,
                        label_counts: dict[str, int] | None = None
                        ) -> rd.Dataset:
    """Edge-type integration (reference analog:
    src/main/scala/Clustering.scala:156-181 + Pattern.scala:44-51).

    ``uri_to_label`` is the small node->label side, broadcast once. The
    reference quirk of dropping same-cluster edges (Clustering.scala:165-170,
    which loses e.g. Person-KNOWS-Person) is replicated only behind
    ``cfg.drop_self_cluster_edges``.

    Beyond the reference's bare (rel, src, dst, count) rows, each edge type
    aggregates its relationship PROPERTY map (DataLoader.scala:71-86 carries
    it, the reference then ignores it): required/optional at
    ``cfg.optional_threshold``, plus computed cardinalities — min/max edges
    of this type per observed source node — and ``is_optional`` (true iff
    some node of ``src_label`` has no such outgoing edge; needs
    ``label_counts`` = nodes per label, else defaults to the reference's
    False). Two bucketed two-phase aggregations: (type, src) counts first,
    then per-type reduction; nothing row-sized reaches the driver.
    """
    import json

    import ray

    from raykg.functions.shuffle import bucketed_group_agg

    ref = ray.put(uri_to_label)
    SEP = "\x1f"

    class Label:
        """Per batch: one partial row per (rel|src_label|dst_label, subj)
        with edge count + property-presence counts."""

        def __init__(self):
            self.m = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = self.m
            has_props = "properties" in batch.column_names
            rels = batch.column("pred").to_pylist()
            subjs = batch.column("subj").to_pylist()
            objs = batch.column("obj").to_pylist()
            props = batch.column("properties").to_pylist() if has_props \
                else [None] * len(rels)
            agg: dict[tuple, tuple[int, Counter]] = {}
            for r, s, d, p in zip(rels, subjs, objs, props):
                sl, dl = m.get(s), m.get(d)
                if sl is None or dl is None:
                    continue  # reference drops unlabeled endpoints
                if cfg.drop_self_cluster_edges and sl == dl:
                    continue
                key = (r + SEP + sl + SEP + dl, s)
                if key not in agg:
                    agg[key] = (0, Counter())
                n_, pc_ = agg[key]
                if p:
                    pc_.update(k for k, _ in p) if isinstance(p, list) \
                        else pc_.update(p.keys())
                agg[key] = (n_ + 1, pc_)
            return pa.table({
                "k4": pa.array([k3 + SEP + s for (k3, s) in agg],
                               pa.string()),
                "k3": pa.array([k3 for (k3, _) in agg], pa.string()),
                "n": pa.array([v[0] for v in agg.values()], pa.int64()),
                "pj": pa.array([json.dumps(v[1]) for v in agg.values()],
                               pa.string()),
            })

    def fin_per_src(t: pa.Table) -> pa.Table:
        """Global (type, src) totals within a bucket."""
        by: dict[str, tuple[str, int, Counter]] = {}
        for k4, k3, n, pj in zip(t.column("k4").to_pylist(),
                                 t.column("k3").to_pylist(),
                                 t.column("n").to_pylist(),
                                 t.column("pj").to_pylist()):
            if k4 not in by:
                by[k4] = (k3, 0, Counter())
            _, n_, pc_ = by[k4]
            pc_.update(json.loads(pj))
            by[k4] = (k3, n_ + n, pc_)
        return pa.table({
            "k3": pa.array([v[0] for v in by.values()], pa.string()),
            "n": pa.array([v[1] for v in by.values()], pa.int64()),
            "pj": pa.array([json.dumps(v[2]) for v in by.values()],
                           pa.string()),
        })

    lc = dict(label_counts or {})

    def fin_per_type(t: pa.Table) -> pa.Table:
        rows: dict[str, list] = {}
        for k3, n, pj in zip(t.column("k3").to_pylist(),
                             t.column("n").to_pylist(),
                             t.column("pj").to_pylist()):
            if k3 not in rows:
                rows[k3] = [0, 0, None, None, Counter()]
            acc = rows[k3]
            acc[0] += n                                    # total edges
            acc[1] += 1                                    # observed sources
            acc[2] = n if acc[2] is None else min(acc[2], n)
            acc[3] = n if acc[3] is None else max(acc[3], n)
            acc[4].update(json.loads(pj))
        out = {k: [] for k in ["rel_type", "src_label", "dst_label", "count",
                               "required_props", "optional_props",
                               "is_optional", "min_cardinality",
                               "max_cardinality"]}
        for k3, (total, n_src, mn, mx, pc_) in rows.items():
            r, sl, dl = k3.split(SEP)
            required = sorted(p for p, c in pc_.items()
                              if c / total >= cfg.optional_threshold)
            out["rel_type"].append(r)
            out["src_label"].append(sl)
            out["dst_label"].append(dl)
            out["count"].append(total)
            out["required_props"].append(required)
            out["optional_props"].append(
                sorted(p for p in pc_ if p not in set(required)))
            out["is_optional"].append(
                n_src < lc[sl] if sl in lc else False)
            out["min_cardinality"].append(mn)
            out["max_cardinality"].append(mx)
        return pa.Table.from_pydict(out, schema=schema.EDGE_TYPES)

    per_src = bucketed_group_agg(
        edges.map_batches(Label, batch_format="pyarrow", concurrency=(1, 4)),
        lambda t: t, "k4", fin_per_src)
    return bucketed_group_agg(per_src, lambda t: t, "k3", fin_per_type)
