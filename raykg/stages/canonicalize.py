"""Canonicalization: resolve coreferent entities via union-find over a
``groupby(entity_key)`` shuffle, then rewrite triples through the canonical
mapping.

Reference analog: the cluster aggregate + driver-collected label map
(src/main/scala/Clustering.scala:90-105). The reference collects the whole
graph's nodeId->label map to the driver; here only the *entity vocabulary
sized* canonical map (distinct entities, not rows) is ever materialized, and
the rewrite broadcasts it once via ``ray.put`` instead of re-shipping per
batch.

Skew note (north rule): mention observations follow a Zipfian entity
distribution — the hot-key guard is a per-batch combiner (each batch emits
each distinct entity at most once) before the global ``groupby(entity_id)``
dedup, which caps any one key's shuffle fan-in at the number of input blocks.
This is the salted/partial two-phase aggregation pattern: phase 1 (combiner)
runs embarrassingly parallel inside ``map_batches``; phase 2 groups the
already-thinned partials.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from raykg import synth
from raykg.config import KGConfig
from raykg.functions.hashing import mint_uri


def observed_entities(linked: rd.Dataset) -> rd.Dataset:
    """LINKED_TRIPLES -> distinct observed entity ids (two-phase dedup)."""

    def batch_distinct(batch: pa.Table) -> pa.Table:
        ents = pa.concat_arrays([
            batch.column("subj_ent").combine_chunks(),
            batch.column("obj_ent").combine_chunks(),
        ])
        ents = pc.drop_null(ents.filter(pc.not_equal(ents, "")))
        return pa.table({"entity_id": pc.unique(ents)})

    partial = linked.map_batches(batch_distinct, batch_format="pyarrow")
    # phase 2: global exact dedup — grouped first-row per key
    return partial.groupby("entity_id").map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow")


def canonical_groups(entities: rd.Dataset, cfg: KGConfig) -> rd.Dataset:
    """Distinct entities -> (uri, canon_uri, canon_ent) via groupby(norm_name)
    + union-find within each group.

    Today the equivalence evidence within a group is "shares the normalized
    name", so each group is one component; the union-find is kept explicit so
    fuzzy same-as edges can be added without changing the dataflow.
    """

    def add_keys(batch: pa.Table) -> pa.Table:
        ids = batch.column("entity_id").to_pylist()
        idx = [int(e[1:]) for e in ids]
        return pa.table({
            "entity_id": ids,
            "uri": [mint_uri(synth.entity_label(i, cfg), e)
                    for i, e in zip(idx, ids)],
            "norm_name": [synth.entity_norm_name(i, cfg) for i in idx],
        })

    keyed = entities.map_batches(add_keys, batch_format="pyarrow")

    def resolve_group(t: pa.Table) -> pa.Table:
        ids = t.column("entity_id").to_pylist()
        uris = t.column("uri").to_pylist()
        # union-find over equivalence pairs; all members of a norm_name group
        # are pairwise equivalent -> single component
        parent = list(range(len(ids)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a: int, b: int) -> None:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

        for k in range(1, len(ids)):
            union(0, k)
        comp: dict[int, list[int]] = {}
        for k in range(len(ids)):
            comp.setdefault(find(k), []).append(k)
        out_uri, out_canon, out_ent = [], [], []
        for members in comp.values():
            canon = min(members, key=lambda k: uris[k])
            for k in members:
                out_uri.append(uris[k])
                out_canon.append(uris[canon])
                out_ent.append(ids[canon])
        return pa.table({"uri": out_uri, "canon_uri": out_canon,
                         "canon_ent": out_ent})

    return keyed.groupby("norm_name").map_groups(
        resolve_group, batch_format="pyarrow")


def rewrite_triples(linked: rd.Dataset, canon_map: dict[str, str]) -> rd.Dataset:
    """Rewrite subj/obj through the canonical map (broadcast once)."""
    ref = ray.put(canon_map)

    class Rewrite:
        def __init__(self):
            self.map = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = self.map
            subj = [m.get(s, s) for s in batch.column("subj").to_pylist()]
            obj = [m.get(o, o) for o in batch.column("obj").to_pylist()]
            return pa.table({
                "subj": pa.array(subj, pa.string()),
                "pred": batch.column("pred"),
                "obj": pa.array(obj, pa.string()),
                "doc_id": batch.column("doc_id"),
                "span_offset": batch.column("span_offset"),
            })

    return linked.map_batches(Rewrite, batch_format="pyarrow",
                              concurrency=(2, 16))
