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

from raykg.functions.hashing import mint_uri
from raykg.functions.shuffle import bucketed_group_agg

# Sentinel markers for the two exchanges below. "\x00"-prefixed strings are
# impossible in real data: entity ids come from the catalog contract
# (catalog.py forbids control bytes) and norm_names from its metadata table.
ESENT = "\x00S"        # sentinel entity_id / norm_name
ESENT_URI = "￿"   # sorts after every real URI, so it never wins canon


def _obs_partial(batch: pa.Table) -> pa.Table:
    """Per-batch distinct observed entity ids (the combiner half of
    observed_entities — each batch emits each entity at most once, the
    hot-key guard for the Zipfian mention stream)."""
    ents = pa.concat_arrays([
        batch.column("subj_ent").combine_chunks(),
        batch.column("obj_ent").combine_chunks(),
    ])
    ents = pc.drop_null(ents.filter(pc.not_equal(ents, "")))
    return pa.table({"entity_id": pc.unique(ents)})


def observed_entity_partials(linked: rd.Dataset) -> rd.Dataset:
    """LINKED_TRIPLES -> per-batch-distinct entity ids (no exchange; global
    dedup happens inside canonical_groups' metadata-attach exchange, so the
    pipeline pays the same two exchanges as before metadata became data)."""
    return linked.map_batches(_obs_partial, batch_format="pyarrow",
                              batch_size=65536)


def observed_entities(linked: rd.Dataset) -> rd.Dataset:
    """LINKED_TRIPLES -> distinct observed entity ids (two-phase dedup)."""

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"entity_id": pc.unique(t.column("entity_id").combine_chunks())})

    return bucketed_group_agg(linked, _obs_partial, "entity_id", finalize)


def canonical_groups(entities: rd.Dataset, metadata: rd.Dataset) -> rd.Dataset:
    """Observed entity ids -> (entity_id, uri, canon_uri, canon_ent, label,
    properties): one bucketed exchange on ``entity_id`` that deduplicates the
    observed ids AND attaches the catalog metadata (label -> minted uri,
    norm_name, properties), then one bucketed exchange on ``norm_name`` with
    union-find within each name group.

    ``entities`` may carry duplicate ids across blocks (feed it
    observed_entity_partials' output); ``metadata`` is the catalog's
    ENTITY_METADATA dataset (catalog.py) — label / norm_name / properties
    ride the dataflow as data, never synthesized per id (the reference's
    label map is likewise data collected from the graph,
    src/main/scala/Clustering.scala:100-105).

    Today the equivalence evidence within a name group is "shares the
    normalized name", so each group is one component; the union-find is kept
    explicit so fuzzy same-as edges can be added without changing the
    dataflow.

    Sentinels: each exchange appends one marker row per bucket (zero-row
    map outputs become schema-less blocks — functions/shuffle.py note). The
    second exchange's sentinels SURVIVE into the output (≤ num_buckets rows
    with entity_id == ESENT): like resolve_surfaces' resolution sentinel,
    they match no real entity key in any consumer (entity_nodes and the
    driver-side canon maps filter them; the rewrite exchanges attach them to
    nothing) and keep every block non-empty for downstream keyed stages.
    """
    empty_props = pa.array([[]], pa.map_(pa.string(), pa.string()))

    def obs_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "entity_id": t.column("entity_id"),
            "label": pa.array([""] * n, pa.string()),
            "norm_name": pa.array([""] * n, pa.string()),
            "properties": pa.nulls(n, pa.map_(pa.string(), pa.string())),
            "role": pa.array([0] * n, pa.int8()),
        })

    def meta_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "entity_id": t.column("entity_id"),
            "label": t.column("label"),
            "norm_name": t.column("norm_name"),
            "properties": t.column("properties"),
            "role": pa.array([1] * n, pa.int8()),
        })

    def attach(t: pa.Table) -> pa.Table:
        meta = t.filter(pc.equal(t.column("role"), 1))
        obs = t.filter(pc.equal(t.column("role"), 0))
        obs_ids = pc.unique(obs.column("entity_id").combine_chunks())
        idx = pc.index_in(obs_ids, value_set=meta.column("entity_id")
                          .combine_chunks())
        if idx.null_count > 0:
            missing = obs_ids.filter(pc.is_null(idx)).to_pylist()[:5]
            raise ValueError(
                f"entity catalog is missing metadata for observed entity "
                f"ids {missing}; the alias and metadata tables must cover "
                f"the same entity space")
        labels = meta.column("label").combine_chunks().take(idx)
        norms = meta.column("norm_name").combine_chunks().take(idx)
        props = meta.column("properties").combine_chunks().take(idx)
        uris = pa.array([mint_uri(lb, e)
                         for lb, e in zip(labels.to_pylist(),
                                          obs_ids.to_pylist())], pa.string())
        out = pa.table({
            "entity_id": obs_ids, "uri": uris, "norm_name": norms,
            "label": labels, "properties": props,
        })
        sent = pa.table({
            "entity_id": pa.array([ESENT], pa.string()),
            "uri": pa.array([ESENT_URI], pa.string()),
            "norm_name": pa.array([ESENT], pa.string()),
            "label": pa.array([""], pa.string()),
            "properties": empty_props,
        })
        return pa.concat_tables([out, sent])

    def resolve_slice(ids: list[str], uris: list[str]
                      ) -> tuple[list[int], list[str], list[str]]:
        """Union-find over one norm_name group (all members pairwise
        equivalent -> one component; canon = min uri). Returns slice-local
        row indices plus per-row canon uri/entity — the caller gathers the
        ride-along columns (label, properties) with one vectorized take."""
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
        out_row, out_canon, out_ent = [], [], []
        for members in comp.values():
            canon = min(members, key=lambda k: uris[k])
            for k in members:
                out_row.append(k)
                out_canon.append(uris[canon])
                out_ent.append(ids[canon])
        return out_row, out_canon, out_ent

    def finalize(t: pa.Table) -> pa.Table:
        # drop the first exchange's per-bucket sentinels (one whole
        # norm-name group), then one sorted pass over the bucket with
        # per-group union-find on slices; label/properties ride through by
        # row index (vectorized take at the end)
        t = t.filter(pc.not_equal(t.column("norm_name"), ESENT))
        t = t.sort_by("norm_name")
        names = t.column("norm_name").to_pylist()
        ids = t.column("entity_id").to_pylist()
        uris = t.column("uri").to_pylist()
        out_row: list[int] = []
        out_canon: list[str] = []
        out_ent: list[str] = []
        lo = 0
        for hi in range(1, len(names) + 1):
            if hi == len(names) or names[hi] != names[lo]:
                rows, c, e = resolve_slice(ids[lo:hi], uris[lo:hi])
                out_row.extend(r + lo for r in rows)
                out_canon.extend(c)
                out_ent.extend(e)
                lo = hi
        take = pa.array(out_row, pa.int64())
        body = pa.table({
            "entity_id": t.column("entity_id").combine_chunks().take(take),
            "uri": t.column("uri").combine_chunks().take(take),
            "canon_uri": pa.array(out_canon, pa.string()),
            "canon_ent": pa.array(out_ent, pa.string()),
            "label": t.column("label").combine_chunks().take(take),
            "properties": t.column("properties").combine_chunks().take(take),
        })
        # surviving sentinel (uri == canon_uri, canon of itself): keeps the
        # block non-empty; every consumer treats it as an entity that is
        # observed nowhere
        sent = pa.table({
            "entity_id": pa.array([ESENT], pa.string()),
            "uri": pa.array([ESENT_URI], pa.string()),
            "canon_uri": pa.array([ESENT_URI], pa.string()),
            "canon_ent": pa.array([ESENT], pa.string()),
            "label": pa.array([""], pa.string()),
            "properties": empty_props,
        })
        return pa.concat_tables([body, sent])

    both = entities.map_batches(obs_rows, batch_format="pyarrow") \
        .union(metadata.map_batches(meta_rows, batch_format="pyarrow"))
    keyed = bucketed_group_agg(both, lambda t: t, "entity_id", attach)
    return bucketed_group_agg(keyed, lambda t: t, "norm_name", finalize)


def rewrite_triples_joined(linked: rd.Dataset, groups: rd.Dataset,
                           num_buckets: int = 512) -> rd.Dataset:
    """Broadcast-free canonical rewrite — the 10^8+-entity scale path.

    ``rewrite_triples`` materializes the canon map on the driver and
    broadcasts it; beyond a vocabulary-sized map that is the flagship's one
    driver ceiling. Here the map stays a Dataset and the rewrite is two
    BUCKETED attach shuffles on the LINKED_TRIPLES entity-id columns
    (obj_ent, then subj_ent): canon rows and triple rows co-shuffle on the
    entity key, each bucket builds its slice of the canon map and applies
    it vectorized (index_in + coalesce). Acero hash joins measured ~13.5 s
    per join over a 3.3M-row stream at 32 CPUs vs ~2 s per bucketed sort
    exchange — and no schema-less/validate_schemas hazards. Doc-subject
    rows (subj_ent == "", the mention/caption majority) would concentrate
    one key, so they bypass the subj-side shuffle entirely. Same output as
    rewrite_triples; equality is asserted in tests/test_kg_pipeline.py."""
    from raykg.functions.shuffle import bucketed_group_agg

    SENT = "\x00S"   # sentinel row marker (doc_id), filtered at the end

    def canon_rows(key_name: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                key_name: t.column("entity_id"),
                "role": pa.array([1] * n, pa.int8()),
                "subj": pa.array([""] * n, pa.string()),
                "pred": pa.array([""] * n, pa.string()),
                "obj": pa.array([""] * n, pa.string()),
                "doc_id": pa.array([""] * n, pa.string()),
                "span_offset": pa.array([0] * n, pa.int32()),
                "subj_ent": pa.array([""] * n, pa.string()),
                "canon": t.column("canon_uri"),
            })
        return f

    def _sent_tail(key_name: str) -> pa.Table:
        return pa.table({
            key_name: pa.array(["\x00K"], pa.string()),
            "role": pa.array([0], pa.int8()),
            "subj": pa.array([SENT], pa.string()),
            "pred": pa.array([SENT], pa.string()),
            "obj": pa.array([SENT], pa.string()),
            "doc_id": pa.array([SENT], pa.string()),
            "span_offset": pa.array([0], pa.int32()),
            "subj_ent": pa.array([""], pa.string()),
            "canon": pa.array([""], pa.string()),
        })

    def triple_rows_obj(t: pa.Table) -> pa.Table:
        body = pa.table({
            "key": t.column("obj_ent"),
            "role": pa.array([0] * t.num_rows, pa.int8()),
            "subj": t.column("subj"),
            "pred": t.column("pred"),
            "obj": t.column("obj"),
            "doc_id": t.column("doc_id"),
            "span_offset": t.column("span_offset"),
            "subj_ent": t.column("subj_ent"),
            "canon": pa.array([""] * t.num_rows, pa.string()),
        })
        return pa.concat_tables([body, _sent_tail("key")])

    def attach(rewrite_col: str):
        def f(t: pa.Table) -> pa.Table:
            canon = t.filter(pc.equal(t.column("role"), 1))
            rows = t.filter(pc.equal(t.column("role"), 0))
            keys = canon.column("key").combine_chunks()
            vals = canon.column("canon").combine_chunks()
            idx = pc.index_in(rows.column("key").combine_chunks(),
                              value_set=keys)
            mapped = pc.coalesce(vals.take(idx),
                                 rows.column(rewrite_col).combine_chunks())
            out = rows.drop_columns(["key", "role", "canon"])
            out = out.set_column(out.column_names.index(rewrite_col),
                                 rewrite_col, mapped)
            # a bucket holding only canon rows would emit zero rows ->
            # schema-less block; always append one sentinel output row
            sent = pa.table({
                "subj": pa.array([SENT], pa.string()),
                "pred": pa.array([SENT], pa.string()),
                "obj": pa.array([SENT], pa.string()),
                "doc_id": pa.array([SENT], pa.string()),
                "span_offset": pa.array([0], pa.int32()),
                "subj_ent": pa.array([""], pa.string()),
            }).select(out.column_names)
            return pa.concat_tables([out, sent])
        return f

    stage1_in = linked.map_batches(triple_rows_obj, batch_format="pyarrow") \
        .union(groups.map_batches(canon_rows("key"), batch_format="pyarrow"))
    stage1 = bucketed_group_agg(stage1_in, lambda t: t, "key",
                                attach("obj"), num_buckets=num_buckets)

    # stage 2: entity-subject rows shuffle on subj_ent; doc-subject rows
    # (skew key "") pass straight through
    def ent_rows_subj(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.not_equal(t.column("subj_ent"), ""))
        body = pa.table({
            "key": t2.column("subj_ent"),
            "role": pa.array([0] * t2.num_rows, pa.int8()),
            "subj": t2.column("subj"),
            "pred": t2.column("pred"),
            "obj": t2.column("obj"),
            "doc_id": t2.column("doc_id"),
            "span_offset": t2.column("span_offset"),
            "subj_ent": t2.column("subj_ent"),
            "canon": pa.array([""] * t2.num_rows, pa.string()),
        })
        return pa.concat_tables([body, _sent_tail("key")])

    def doc_rows(t: pa.Table) -> pa.Table:
        t2 = t.filter(pc.equal(t.column("subj_ent"), ""))
        return pa.table({
            "subj": pa.concat_arrays([t2.column("subj").combine_chunks(),
                                      pa.array([SENT], pa.string())]),
            "pred": pa.concat_arrays([t2.column("pred").combine_chunks(),
                                      pa.array([SENT], pa.string())]),
            "obj": pa.concat_arrays([t2.column("obj").combine_chunks(),
                                     pa.array([SENT], pa.string())]),
            "doc_id": pa.concat_arrays([t2.column("doc_id").combine_chunks(),
                                        pa.array([SENT], pa.string())]),
            "span_offset": pa.concat_arrays([
                t2.column("span_offset").combine_chunks(),
                pa.array([0], pa.int32())]),
            "subj_ent": pa.concat_arrays([
                t2.column("subj_ent").combine_chunks(),
                pa.array([""], pa.string())]),
        })

    stage1 = stage1.materialize()    # consumed by both stage-2 branches
    stage2 = bucketed_group_agg(
        stage1.map_batches(ent_rows_subj, batch_format="pyarrow")
        .union(groups.map_batches(canon_rows("key"), batch_format="pyarrow")),
        lambda t: t, "key", attach("subj"), num_buckets=num_buckets) \
        .union(stage1.map_batches(doc_rows, batch_format="pyarrow"))

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("doc_id"), SENT))
        return t.select(["subj", "pred", "obj", "doc_id", "span_offset"])

    return stage2.map_batches(finalize, batch_format="pyarrow")


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
