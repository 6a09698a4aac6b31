"""Canonicalization: resolve coreferent entities via union-find over a
bucketed ``groupby(entity_key)`` shuffle, then rewrite triples through the
canonical mapping.

Reference analog: the cluster aggregate + driver-collected label map
(src/main/scala/Clustering.scala:90-105). The reference collects the whole
graph's nodeId->label map to the driver; here only the *entity vocabulary
sized* canonical map (distinct entities, not rows) is ever materialized, and
the rewrite broadcasts it once via ``ray.put`` instead of re-shipping per
batch.

Skew note (north rule): mention observations follow a Zipfian entity
distribution — the hot-key guard is a per-batch combiner (each batch emits
each distinct entity at most once) before the bucketed global dedup, which
caps any one key's shuffle fan-in at the number of input blocks, and the
exchange key is a uniform crc bucket, so hot entities cannot overload one
partition. This is the salted/partial two-phase aggregation pattern.

All wide steps go through functions/shuffle.bucketed_group_agg: Ray's
per-group ``map_groups`` costs ~0.3 ms of block slicing per group — at one
group per distinct entity that overhead alone dwarfed the actual union-find
work, so groups are processed per *bucket* with vectorized boundaries
instead.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from raykg import synth
from raykg.config import KGConfig
from raykg.functions.hashing import mint_uri
from raykg.functions.shuffle import bucketed_group_agg


def observed_entities(linked: rd.Dataset) -> rd.Dataset:
    """LINKED_TRIPLES -> distinct observed entity ids (two-phase dedup)."""

    def combiner(batch: pa.Table) -> pa.Table:
        ents = pa.concat_arrays([
            batch.column("subj_ent").combine_chunks(),
            batch.column("obj_ent").combine_chunks(),
        ])
        ents = pc.drop_null(ents.filter(pc.not_equal(ents, "")))
        return pa.table({"entity_id": pc.unique(ents)})

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"entity_id": pc.unique(t.column("entity_id").combine_chunks())})

    return bucketed_group_agg(linked, combiner, "entity_id", finalize)


def canonical_groups(entities: rd.Dataset, cfg: KGConfig) -> rd.Dataset:
    """Distinct entities -> (uri, canon_uri, canon_ent): bucketed shuffle on
    ``norm_name``, union-find within each name group.

    Today the equivalence evidence within a group is "shares the normalized
    name", so each group is one component; the union-find is kept explicit so
    fuzzy same-as edges can be added without changing the dataflow.
    """

    def add_keys(batch: pa.Table) -> pa.Table:
        ids = batch.column("entity_id").to_pylist()
        idx = [int(e[1:]) for e in ids]
        return pa.table({
            "entity_id": pa.array(ids, pa.string()),
            "uri": pa.array([mint_uri(synth.entity_label(i, cfg), e)
                             for i, e in zip(idx, ids)], pa.string()),
            "norm_name": pa.array([synth.entity_norm_name(i, cfg)
                                   for i in idx], pa.string()),
        })

    def resolve_slice(ids: list[str], uris: list[str]
                      ) -> tuple[list, list, list, list]:
        """Union-find over one norm_name group (all members pairwise
        equivalent -> one component; canon = min uri)."""
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
        out_id, out_uri, out_canon, out_ent = [], [], [], []
        for members in comp.values():
            canon = min(members, key=lambda k: uris[k])
            for k in members:
                out_id.append(ids[k])
                out_uri.append(uris[k])
                out_canon.append(uris[canon])
                out_ent.append(ids[canon])
        return out_id, out_uri, out_canon, out_ent

    def finalize(t: pa.Table) -> pa.Table:
        # one sorted pass over the bucket; per-group union-find on slices
        t = t.sort_by("norm_name")
        names = t.column("norm_name").to_pylist()
        ids = t.column("entity_id").to_pylist()
        uris = t.column("uri").to_pylist()
        out_id: list[str] = []
        out_uri: list[str] = []
        out_canon: list[str] = []
        out_ent: list[str] = []
        lo = 0
        for hi in range(1, len(names) + 1):
            if hi == len(names) or names[hi] != names[lo]:
                i_, u, c, e = resolve_slice(ids[lo:hi], uris[lo:hi])
                out_id.extend(i_)
                out_uri.extend(u)
                out_canon.extend(c)
                out_ent.extend(e)
                lo = hi
        return pa.table({
            "entity_id": pa.array(out_id, pa.string()),
            "uri": pa.array(out_uri, pa.string()),
            "canon_uri": pa.array(out_canon, pa.string()),
            "canon_ent": pa.array(out_ent, pa.string()),
        })

    keyed = entities.map_batches(add_keys, batch_format="pyarrow")
    return bucketed_group_agg(keyed, lambda t: t, "norm_name", finalize)


def rewrite_triples_joined(linked: rd.Dataset, groups: rd.Dataset,
                           num_partitions: int = 32) -> rd.Dataset:
    """Broadcast-free canonical rewrite — the 10^8+-entity scale path.

    ``rewrite_triples`` materializes the canon map on the driver and
    broadcasts it; beyond a vocabulary-sized map that is the flagship's one
    driver ceiling. Here the map stays a Dataset and the rewrite is two
    left-outer hash joins on the LINKED_TRIPLES entity-id columns (subj_ent,
    obj_ent — compact ids, not URI strings), with the engine's schema-guard
    conventions (validate_schemas, per-block sentinel rows, one join per
    execution). Doc-subject rows (subj_ent == "", the mention/caption
    majority) would all hash to ONE subj-join partition — a skew bomb — so
    they bypass the subj join entirely and only their objects are joined.
    Same output as rewrite_triples; equality is asserted in
    tests/test_kg_pipeline.py."""
    SENT = "\x00S"   # sentinel row marker (doc_id), filtered in finalize
    LKEY = "\x00L"   # left-side sentinel join key
    RKEY = "\x00R"   # right-side sentinel join key (never matches LKEY)

    def side(key_col: str, canon_col: str):
        def f(t: pa.Table) -> pa.Table:
            ids = pa.concat_arrays([
                t.column("entity_id").combine_chunks(),
                pa.array([RKEY], pa.string())])
            canons = pa.concat_arrays([
                t.column("canon_uri").combine_chunks(),
                pa.array([""], pa.string())])
            return pa.table({key_col: ids, canon_col: canons})
        return f

    def _cat(col, tail: str) -> pa.Array:
        return pa.concat_arrays([col.combine_chunks(),
                                 pa.array([tail], pa.string())])

    def ent_side(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.not_equal(t.column("subj_ent"), ""))
        return pa.table({
            "subj": _cat(t2.column("subj"), SENT),
            "pred": _cat(t2.column("pred"), SENT),
            "obj": _cat(t2.column("obj"), SENT),
            "doc_id": _cat(t2.column("doc_id"), SENT),
            "span_offset": pa.concat_arrays([
                t2.column("span_offset").combine_chunks(),
                pa.array([0], pa.int32())]),
            "subj_ent": _cat(t2.column("subj_ent"), LKEY),
            "obj_ent": _cat(t2.column("obj_ent"), LKEY),
        })

    ORDER = ["subj", "pred", "obj", "doc_id", "span_offset", "obj_ent",
             "canon_s"]

    def doc_side(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.equal(t.column("subj_ent"), ""))
        return pa.table({
            "subj": _cat(t2.column("subj"), SENT),
            "pred": _cat(t2.column("pred"), SENT),
            "obj": _cat(t2.column("obj"), SENT),
            "doc_id": _cat(t2.column("doc_id"), SENT),
            "span_offset": pa.concat_arrays([
                t2.column("span_offset").combine_chunks(),
                pa.array([0], pa.int32())]),
            "obj_ent": _cat(t2.column("obj_ent"), LKEY),
            "canon_s": pa.array([None] * (t2.num_rows + 1), pa.string()),
        })

    def norm1(t: pa.Table) -> pa.Table:
        if "canon_s" not in t.column_names:
            return pa.schema([(c, pa.int32() if c == "span_offset"
                               else pa.string()) for c in ORDER]).empty_table()
        return t.select(ORDER)

    gs = groups.map_batches(side("subj_ent", "canon_s"),
                            batch_format="pyarrow")
    go = groups.map_batches(side("obj_ent", "canon_o"),
                            batch_format="pyarrow")
    j1 = linked.map_batches(ent_side, batch_format="pyarrow") \
        .join(gs, join_type="left_outer", num_partitions=num_partitions,
              on=("subj_ent",), right_on=("subj_ent",),
              validate_schemas=True).materialize()
    merged = j1.map_batches(norm1, batch_format="pyarrow") \
        .union(linked.map_batches(doc_side, batch_format="pyarrow"))
    j2 = merged.join(go, join_type="left_outer",
                     num_partitions=num_partitions,
                     on=("obj_ent",), right_on=("obj_ent",),
                     validate_schemas=True)

    def finalize(t: pa.Table) -> pa.Table:
        if "canon_o" not in t.column_names:
            return pa.schema([
                ("subj", pa.string()), ("pred", pa.string()),
                ("obj", pa.string()), ("doc_id", pa.string()),
                ("span_offset", pa.int32())]).empty_table()
        t = t.filter(pc.not_equal(t.column("doc_id"), SENT))
        return pa.table({
            "subj": pc.coalesce(t.column("canon_s"), t.column("subj")),
            "pred": t.column("pred"),
            "obj": pc.coalesce(t.column("canon_o"), t.column("obj")),
            "doc_id": t.column("doc_id"),
            "span_offset": t.column("span_offset"),
        })

    return j2.map_batches(finalize, batch_format="pyarrow")


def rewrite_triples(linked: rd.Dataset, canon_map: dict[str, str]) -> rd.Dataset:
    """Rewrite subj/obj through the canonical map — broadcast once, applied
    vectorized (pc.index_in + take; no per-row Python)."""
    keys = pa.array(list(canon_map.keys()), pa.string())
    vals = pa.array(list(canon_map.values()), pa.string())
    ref = ray.put((keys, vals))

    class Rewrite:
        def __init__(self):
            self.keys, self.vals = ray.get(ref)

        def _remap(self, col: pa.ChunkedArray) -> pa.Array:
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            idx = pc.index_in(col, value_set=self.keys)
            mapped = self.vals.take(idx)          # null where no mapping
            return pc.coalesce(mapped, col)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return pa.table({
                "subj": self._remap(batch.column("subj")),
                "pred": batch.column("pred"),
                "obj": self._remap(batch.column("obj")),
                "doc_id": batch.column("doc_id"),
                "span_offset": batch.column("span_offset"),
            })

    return linked.map_batches(Rewrite, batch_format="pyarrow",
                              concurrency=(2, 16))
