"""Fully-distributed entity linking — the 10^12-document scale path.

The default linker (stages/link.py) broadcasts one AliasIndex to every
actor, which assumes the alias dictionary fits in a worker heap. At
10^8+ entities it does not: here the dictionary is a *Dataset* (at
production scale a Lance table) and resolution is pure keyed shuffle —
no broadcast state anywhere:

1. distinct mention surfaces           (bucketed two-phase dedup)
2. exact resolution                    hash join surfaces ⋈ aliases
3. corrupted-surface resolution        hash join surfaces ⋈ the aliases'
                                       single-deletion variant table, then
                                       exact-Jaccard argmax per surface
                                       (same scoring rule as AliasIndex)
4. LSH residue resolution              surfaces matched by NEITHER join
                                       (substitutions, transpositions, ...)
                                       hash join on MinHash band keys ⋈ the
                                       aliases' band table — the distributed
                                       twin of AliasIndex's LSH fallback
5. triple assembly                     hash joins extractions ⋈ resolution

Tie-breaks replicate AliasIndex exactly: exact hits take the smallest
entity index (the broadcast dict's first-writer-wins under ascending build
order); fuzzy hits argmax Jaccard with ties to the smallest alias string.
One documented divergence: AliasIndex blocks deletion candidates by crc32
hash, so a hash *collision* can add a spurious candidate that could in
principle win; the join path matches variant strings exactly and has no
such candidates. On the synthetic corpora both paths produce identical
triples (tests/test_link_distributed.py asserts set equality).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raykg.config import MEDIA_PREDICATE, KGConfig
from raykg.functions.hashing import (
    _perm_params,
    char_shingles,
    crc_hash_array,
    minhash_matrix,
    mint_uri,
)
from raykg.functions.shuffle import bucketed_group_agg, crc_bucket_array
from functools import partial

from raykg.stages.extract import extract_batch
from raykg.stages.link import LINKED_TRIPLES


def alias_dataset(cfg: KGConfig, catalog=None) -> rd.Dataset:
    """The alias dictionary as data: (alias, ent). At production scale this
    is a read of the curated alias table (catalog.DatasetCatalog), not an
    in-memory build; default is the synthetic vocabulary."""
    from raykg.catalog import default_catalog

    return (catalog or default_catalog(cfg)).aliases_dataset()


def minted_resolution(resolution: rd.Dataset, metadata: rd.Dataset,
                      num_partitions: int = 32) -> rd.Dataset:
    """resolution (surface, ent) -> (surface, eid, uri): entity ids and URIs
    attached from the catalog's ENTITY_METADATA dataset via one bucketed
    exchange on ``ent`` — the broadcast-free twin of AliasIndex.mint, so no
    linker path ever synthesizes metadata per id. Both sides are small
    (distinct corpus surfaces / vocabulary), never the corpus stream.

    Resolution sentinel rows (surface "\\x00S", ent -1 — see argmax_fin)
    pass through with empty eid/uri: they match no extraction surface in any
    consumer and keep every output block non-empty."""
    RSENT = "\x00S"

    def res_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "ent": pc.cast(t.column("ent"), pa.int64()),
            "surface": t.column("surface"),
            "entity_id": pa.array([""] * n, pa.string()),
            "label": pa.array([""] * n, pa.string()),
            "role": pa.array([0] * n, pa.int8()),
        })

    def meta_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "ent": t.column("ent"),
            "surface": pa.array([""] * n, pa.string()),
            "entity_id": t.column("entity_id"),
            "label": t.column("label"),
            "role": pa.array([1] * n, pa.int8()),
        })

    def attach(t: pa.Table) -> pa.Table:
        meta = t.filter(pc.equal(t.column("role"), 1))
        res = t.filter(pc.equal(t.column("role"), 0))
        idx = pc.index_in(res.column("ent").combine_chunks(),
                          value_set=meta.column("ent").combine_chunks())
        eids = meta.column("entity_id").combine_chunks().take(idx)
        labels = meta.column("label").combine_chunks().take(idx)
        surfaces = res.column("surface").to_pylist()
        eid_l = eids.to_pylist()
        lab_l = labels.to_pylist()
        memo: dict[str, str] = {}
        out_uri: list[str] = []
        for s, eid, lb in zip(surfaces, eid_l, lab_l):
            if eid is None:
                if s != RSENT:
                    raise ValueError(
                        f"entity catalog is missing metadata for the entity "
                        f"resolved from surface {s!r}; the alias and "
                        f"metadata tables must cover the same ent space")
                out_uri.append("")
                continue
            hit = memo.get(eid)
            if hit is None:
                hit = mint_uri(lb, eid)
                memo[eid] = hit
            out_uri.append(hit)
        out = pa.table({
            "surface": pa.array(surfaces, pa.string()),
            "eid": pa.array([e if e is not None else "" for e in eid_l],
                            pa.string()),
            "uri": pa.array(out_uri, pa.string()),
        })
        # per-bucket sentinel: a bucket holding only metadata rows would
        # otherwise emit zero rows (schema-less block hazard)
        sent = pa.table({"surface": pa.array([RSENT], pa.string()),
                         "eid": pa.array([""], pa.string()),
                         "uri": pa.array([""], pa.string())})
        return pa.concat_tables([out, sent])

    both = resolution.map_batches(res_rows, batch_format="pyarrow") \
        .union(metadata.map_batches(meta_rows, batch_format="pyarrow"))

    def with_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", crc_bucket_array(t.column("ent"), num_partitions))

    return both.map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: attach(t.drop_columns(["bucket"])),
            batch_format="pyarrow")


def variant_dataset(aliases: rd.Dataset) -> rd.Dataset:
    """Single-deletion variants of every alias: (variant, alias, ent)."""

    def explode(t: pa.Table) -> pa.Table:
        va, al, en = [], [], []
        for a, e in zip(t.column("alias").to_pylist(),
                        t.column("ent").to_pylist()):
            for k in range(len(a)):
                va.append(a[:k] + a[k + 1:])
                al.append(a)
                en.append(e)
        return pa.table({"variant": pa.array(va, pa.string()),
                         "alias": pa.array(al, pa.string()),
                         "ent": pa.array(en, pa.int64())})

    return aliases.map_batches(explode, batch_format="pyarrow")


def band_table(strings_ds: rd.Dataset, col: str, cfg: KGConfig,
               carry: list[str] | None = None) -> rd.Dataset:
    """MinHash-LSH band keys as data: one row per (string, band) with the
    band key hex-encoded — the join-able twin of AliasIndex._ensure_bands
    (identical shingling, permutation params and band layout, so a band
    collision here IFF the broadcast index would bucket them together)."""
    import numpy as np

    carry = carry or []
    r = cfg.link_num_hashes // cfg.link_num_bands

    def explode(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_pylist()
        flat: list[str] = []
        offsets = [0]
        for s in vals:
            flat.extend(frozenset(char_shingles(s, cfg.link_shingle_k)))
            offsets.append(len(flat))
        sig = minhash_matrix(crc_hash_array(flat), np.array(offsets),
                             cfg.link_num_hashes, cfg.seed,
                             params=_perm_params(cfg.link_num_hashes, cfg.seed))
        out_val, out_band, out_key = [], [], []
        carried: dict[str, list] = {c: [] for c in carry}
        for idx, s in enumerate(vals):
            for b in range(cfg.link_num_bands):
                out_val.append(s)
                out_band.append(b)
                out_key.append(sig[idx, b * r:(b + 1) * r].tobytes().hex())
                for c in carry:
                    carried[c].append(t.column(c)[idx].as_py())
        cols = {col: pa.array(out_val, pa.string()),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_key, pa.string())}
        for c in carry:
            cols[c] = pa.array(carried[c])
        return pa.table(cols)

    return strings_ds.map_batches(explode, batch_format="pyarrow")


def distinct_surfaces(extractions: rd.Dataset) -> rd.Dataset:
    """All distinct mention surfaces in the corpus (subject and object)."""

    def combiner(batch: pa.Table) -> pa.Table:
        s1 = batch.column("surface").combine_chunks()
        rel = batch.filter(pc.equal(batch.column("etype"), "relation"))
        s2 = rel.column("surface2").combine_chunks()
        surf = pc.unique(pa.concat_arrays([s1, s2]))
        return pa.table({"surface": surf})

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"surface": pc.unique(t.column("surface").combine_chunks())})

    return bucketed_group_agg(extractions, combiner, "surface", finalize)


def resolve_surfaces(surfaces: rd.Dataset, aliases: rd.Dataset,
                     cfg: KGConfig, num_partitions: int = 32) -> rd.Dataset:
    """surfaces (surface) -> resolution table (surface, ent). Surfaces with
    no exact or single-deletion match are absent from the output."""
    # --- exact: min(ent) per surface == AliasIndex first-writer-wins ---
    exact_join = surfaces.join(aliases, join_type="left_outer",
                               num_partitions=num_partitions,
                               on=("surface",), right_on=("alias",),
                               validate_schemas=True) \
        .materialize()   # single-join executions; see linked_triples_distributed

    # join partitions with no rows can come through schema-less; every
    # filter below is a schema-guarded map_batches so downstream joins
    # always see (surface[, ent]) blocks
    def hits_only(t: pa.Table) -> pa.Table:
        if "ent" not in t.column_names:
            return pa.table({"surface": pa.array([], pa.string()),
                             "ent": pa.array([], pa.int64())})
        t = t.filter(pc.is_valid(t.column("ent")))
        return pa.table({"surface": t.column("surface"),
                         "ent": pc.cast(t.column("ent"), pa.int64())})

    def misses_only(t: pa.Table) -> pa.Table:
        if "ent" not in t.column_names:
            missing = pa.array([], pa.string())
        else:
            missing = t.filter(pc.is_null(t.column("ent"))) \
                .column("surface").combine_chunks()
        # sentinel "" row: Ray replaces a ZERO-ROW map output with a
        # schema-less block, and join partitions crash on those
        # (pa.Table.join FieldRef "no match"). Extraction never emits an
        # empty surface, so "" matches nothing and the inner join drops it.
        return pa.table({"surface": pa.concat_arrays(
            [missing, pa.array([""], pa.string())])})

    exact = exact_join.map_batches(hits_only, batch_format="pyarrow") \
        .groupby("surface").min("ent") \
        .map_batches(lambda t: t.rename_columns(["surface", "ent"]),
                     batch_format="pyarrow")
    misses = exact_join.map_batches(misses_only, batch_format="pyarrow")

    # --- fuzzy: join against deletion variants, Jaccard argmax ---
    # (materialized: both the scoring pass and the residue computation
    # consume it, and each execution should contain at most one hash join)
    variants = variant_dataset(aliases)
    cand = misses.join(variants, join_type="inner",
                       num_partitions=num_partitions,
                       on=("surface",), right_on=("variant",),
                       validate_schemas=True).materialize()

    k = cfg.link_shingle_k
    thr = cfg.link_jaccard_threshold

    def score(t: pa.Table) -> pa.Table:
        if "alias" not in t.column_names:
            return pa.table({"surface": pa.array([], pa.string()),
                             "alias": pa.array([], pa.string()),
                             "ent": pa.array([], pa.int64()),
                             "jac": pa.array([], pa.float64())})
        surf, alias, ent, jac = [], [], [], []
        for s, a, e in zip(t.column("surface").to_pylist(),
                           t.column("alias").to_pylist(),
                           t.column("ent").to_pylist()):
            ss, sa = char_shingles(s, k), char_shingles(a, k)
            j = len(ss & sa) / len(ss | sa)
            if j >= thr:
                surf.append(s)
                alias.append(a)
                ent.append(e)
                jac.append(j)
        return pa.table({"surface": pa.array(surf, pa.string()),
                         "alias": pa.array(alias, pa.string()),
                         "ent": pa.array(ent, pa.int64()),
                         "jac": pa.array(jac, pa.float64())})

    scored = cand.map_batches(score, batch_format="pyarrow")

    # --- per-surface argmax as a bucketed two-phase aggregation ---
    # groupby("surface").map_groups would slice one block per DISTINCT
    # corrupted surface (~0.3 ms each, measured in stages/canonicalize.py)
    # and dies at 10^7+ damaged surfaces; instead: per-batch partial argmax
    # (associative under the total order below) -> bucketed exchange ->
    # per-bucket vectorized argmax via sort + segment-boundary mask.
    def best_per_surface(t: pa.Table) -> pa.Table:
        """max Jaccard, ties -> smallest alias string (AliasIndex._score):
        sort (surface asc, jac desc, alias asc), keep each surface segment's
        first row — no per-group slicing."""
        t = t.sort_by([("surface", "ascending"), ("jac", "descending"),
                       ("alias", "ascending")])
        s = t.column("surface").combine_chunks()
        if len(s) == 0:
            return t
        first = pa.concat_arrays([
            pa.array([True]),
            pc.not_equal(s.slice(1), s.slice(0, len(s) - 1))])
        return t.filter(first)

    # NOT "" — non-relation extraction rows carry surface2 == "", so an ""
    # row in the resolution table would MATCH (and fan out across) every
    # one of them in the j2 join. No real surface contains a NUL byte.
    RSENT = "\x00S"

    def argmax_comb(t: pa.Table) -> pa.Table:
        t = best_per_surface(t)
        # sentinel row per block (zero-row guard, see misses_only); its
        # group is dropped in argmax_fin
        return pa.concat_tables([t, pa.table({
            "surface": pa.array([RSENT], pa.string()),
            "alias": pa.array([""], pa.string()),
            "ent": pa.array([-1], pa.int64()),
            "jac": pa.array([-1.0], pa.float64())})])

    def argmax_fin(t: pa.Table) -> pa.Table:
        t = best_per_surface(t)
        t = t.filter(pc.not_equal(t.column("surface"), RSENT))
        out = pa.table({"surface": t.column("surface"),
                        "ent": pc.cast(t.column("ent"), pa.int64())})
        # the sentinel survives into the resolution table: it matches no
        # extraction surface in any consumer (left_outer join / index_in)
        # and keeps every finalize output non-empty for downstream shuffles
        return pa.concat_tables([out, pa.table({
            "surface": pa.array([RSENT], pa.string()),
            "ent": pa.array([-1], pa.int64())})])

    fuzzy = bucketed_group_agg(scored, argmax_comb, "surface", argmax_fin)

    # --- LSH residue: surfaces with NO deletion candidate at all
    # (substitutions, transpositions, multi-char damage). AliasIndex falls
    # back to LSH exactly when _deletion_candidates returns None — a surface
    # whose candidates all scored below threshold stays unresolved — so the
    # residue is misses MINUS surfaces that appeared in ``cand``, computed as
    # a bucketed tag-max group (no extra hash join). Same band layout as
    # AliasIndex._ensure_bands; at production scale the alias band table is
    # precomputed next to the alias table, not rebuilt per run.
    def tag_miss(t: pa.Table) -> pa.Table:
        return pa.table({"surface": t.column("surface"),
                         "had_cand": pa.array([0] * t.num_rows, pa.int8())})

    def tag_cand(t: pa.Table) -> pa.Table:
        if "surface" not in t.column_names:
            surf = pa.array([], pa.string())
        else:
            surf = pc.unique(t.column("surface").combine_chunks())
        # sentinel "" per block: zero-row map outputs become schema-less
        # blocks that crash downstream shuffles (see misses_only)
        surf = pa.concat_arrays([surf, pa.array([""], pa.string())])
        return pa.table({"surface": surf,
                         "had_cand": pa.array([1] * len(surf), pa.int8())})

    def residue_comb(t: pa.Table) -> pa.Table:
        g = t.group_by("surface").aggregate([("had_cand", "max")])
        return pa.table({"surface": g.column("surface"),
                         "had_cand": pc.cast(g.column("had_cand_max"),
                                             pa.int8())})

    def residue_fin(t: pa.Table) -> pa.Table:
        g = t.group_by("surface").aggregate([("had_cand", "max")])
        surf = g.filter(pc.equal(g.column("had_cand_max"), 0)) \
            .column("surface").combine_chunks()
        # sentinel "" again: its shingle set {"^$"} scores ~0 Jaccard against
        # any alias, so even a freak band collision dies at the threshold
        return pa.table({"surface": pa.concat_arrays(
            [surf, pa.array([""], pa.string())])})

    tagged = misses.map_batches(tag_miss, batch_format="pyarrow") \
        .union(cand.map_batches(tag_cand, batch_format="pyarrow"))
    residue = bucketed_group_agg(tagged, residue_comb, "surface", residue_fin,
                                 num_buckets=num_partitions)
    lsh_cand = band_table(residue, "surface", cfg).join(
        band_table(aliases, "alias", cfg, carry=["ent"]),
        join_type="inner", num_partitions=num_partitions,
        on=("band", "band_key"), right_on=("band", "band_key"),
        validate_schemas=True)
    lsh_hits = bucketed_group_agg(
        lsh_cand.map_batches(score, batch_format="pyarrow"),
        argmax_comb, "surface", argmax_fin)
    return exact.union(fuzzy).union(lsh_hits)


def linked_triples_hybrid(documents: rd.Dataset, cfg: KGConfig,
                          num_partitions: int = 32, catalog=None) -> rd.Dataset:
    """Hybrid scale path: the alias DICTIONARY stays a Dataset (distributed
    keyed-shuffle resolution, like linked_triples_distributed), but triple
    assembly broadcasts the RESOLUTION TABLE — distinct observed surfaces
    only, typically orders of magnitude smaller than the dictionary — and
    runs as a plain map over the extraction stream, skipping the two
    extraction-stream hash joins that dominate the fully-distributed
    path's wall time. Memory envelope: the resolution table (distinct
    corpus surfaces) must fit BOTH the driver heap — it is concatenated
    driver-side below before the one ray.put — and a worker heap; the
    alias dictionary need not fit either. Past that envelope, use
    linked_triples_distributed."""
    import ray

    from raykg.catalog import default_catalog
    from raykg.stages.link import assemble_linked

    catalog = catalog or default_catalog(cfg)
    extractions = documents.map_batches(
        partial(extract_batch, detector=cfg.mention_detector),
        batch_format="pyarrow", batch_size=cfg.batch_size).materialize()
    resolution = minted_resolution(
        resolve_surfaces(distinct_surfaces(extractions),
                         catalog.aliases_dataset(), cfg, num_partitions),
        catalog.metadata_dataset(), num_partitions).materialize()
    # distinct-surface sized; fetched as Arrow blocks (zero per-row Python,
    # no row-dict blowup on the driver) and re-broadcast once
    res_t = pa.concat_tables(
        list(resolution.iter_batches(batch_format="pyarrow",
                                     batch_size=None)))
    surf_arr = res_t.column("surface").combine_chunks()
    uri_arr = res_t.column("uri").combine_chunks()
    eid_arr = res_t.column("eid").combine_chunks()
    ref = ray.put((surf_arr, uri_arr, eid_arr))

    class Assemble:
        def __init__(self):
            self.surf, self.uris, self.eids = ray.get(ref) \
                if isinstance(ref, ray.ObjectRef) else ref

        def _resolver(self, uniq: list[str]):
            # URIs arrive pre-minted from the catalog exchange; a surface
            # absent from the resolution table takes a null (unresolved)
            idx = pc.index_in(pa.array(uniq, pa.string()),
                              value_set=self.surf)
            return (self.uris.take(idx), self.eids.take(idx))

        def __call__(self, batch: pa.Table) -> pa.Table:
            return assemble_linked(batch, self._resolver)

    # pool sized like the broadcast linker (pipelines/kg.py): floor == the
    # target concurrency (the autoscaler barely climbs in short jobs),
    # ceiling below cluster CPUs so read/shuffle tasks never starve
    total_cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    cap = max(1, total_cpus - 2)
    floor = min(cfg.link_concurrency, cap)
    ceiling = min(floor + max(2, floor // 6), cap)
    return extractions.map_batches(Assemble, batch_format="pyarrow",
                                   batch_size=max(cfg.batch_size, 4096),
                                   concurrency=(floor, max(floor, ceiling)))


def linked_triples_distributed(documents: rd.Dataset, cfg: KGConfig,
                               num_partitions: int = 32,
                               catalog=None) -> rd.Dataset:
    """documents -> LINKED_TRIPLES via pure keyed shuffles (no broadcast)."""
    from raykg.catalog import default_catalog

    catalog = catalog or default_catalog(cfg)
    extractions = documents.map_batches(
        partial(extract_batch, detector=cfg.mention_detector),
        batch_format="pyarrow", batch_size=cfg.batch_size).materialize()
    # materialize boundaries keep each execution to a single hash-shuffle
    # join: stacking several JoinOperators (each with its own aggregator
    # actors) plus the linker pool into one DAG deadlocks small clusters.
    # The resolution table is distinct-surface sized — the natural
    # checkpoint between the dictionary phase and triple assembly. URIs are
    # pre-minted into it from the catalog's metadata dataset (one
    # vocabulary-sized bucketed exchange), so triple assembly below is pure
    # column selection — no metadata synthesis anywhere.
    resolution = minted_resolution(
        resolve_surfaces(distinct_surfaces(extractions),
                         catalog.aliases_dataset(), cfg, num_partitions),
        catalog.metadata_dataset(), num_partitions).materialize()

    # join subject surfaces (every extraction row has one), then — for
    # RELATION rows only — object surfaces. The split BEFORE the second
    # join is load-bearing at scale: mention/caption rows carry
    # surface2 == "" (schema.EXTRACTIONS), so shuffling the full stream by
    # surface2 would funnel the mention majority into the single ""-key
    # hash partition — a multi-GiB block whose string columns overflow
    # Arrow's int32 offsets in downstream combine_chunks (observed at 4M
    # docs / 68M extraction rows). Relations are a small minority with
    # real, well-spread surface2 keys, so their join stays balanced — and
    # the mention majority never pays the second shuffle at all.
    j1 = extractions.join(resolution, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=("surface",), right_on=("surface",),
                          right_suffix="_r",
                          validate_schemas=True).materialize()

    REL_J1 = pa.schema([
        ("doc_id", pa.string()), ("span_offset", pa.int32()),
        ("pred", pa.string()), ("surface2", pa.string()),
        ("eid", pa.string()), ("uri", pa.string())])
    MEN_J1 = pa.schema([
        ("doc_id", pa.string()), ("span_offset", pa.int32()),
        ("etype", pa.string()), ("eid", pa.string()), ("uri", pa.string())])

    def relations_only(t: pa.Table) -> pa.Table:
        # project to exactly what the second join + assembly need, so the
        # relation shuffle carries no mention columns
        if "uri" not in t.column_names or t.num_rows == 0:
            return REL_J1.empty_table()
        t = t.filter(pc.equal(t.column("etype"), "relation"))
        return t.select(REL_J1.names).cast(REL_J1)

    def mentions_only(t: pa.Table) -> pa.Table:
        if "uri" not in t.column_names or t.num_rows == 0:
            return MEN_J1.empty_table()
        t = t.filter(pc.not_equal(t.column("etype"), "relation"))
        return t.select(MEN_J1.names).cast(MEN_J1)

    res2 = resolution.map_batches(
        lambda t: t.rename_columns(["surface2", "eid2", "uri2"]),
        batch_format="pyarrow")
    j2 = j1.map_batches(relations_only, batch_format="pyarrow") \
        .join(res2, join_type="left_outer",
              num_partitions=num_partitions,
              on=("surface2",), right_on=("surface2",),
              right_suffix="_r2", validate_schemas=True)

    # bounded batches: Ray slices blocks zero-copy to this row count, so
    # combine_chunks below always operates far under the int32 offset limit
    # even if an upstream partition came out skewed
    ASSEMBLE_ROWS = 262_144

    def assemble_relations(t: pa.Table) -> pa.Table:
        """Vectorized relation-triple assembly — the same filter shape as
        stages/link.py assemble_linked, except URIs and entity ids arrive
        pre-joined as string columns; the stream is never iterated
        row-by-row in Python."""
        if "uri2" not in t.column_names or t.num_rows == 0:
            return LINKED_TRIPLES.empty_table()
        uri1 = t.column("uri").combine_chunks()
        uri2 = t.column("uri2").combine_chunks()
        keep = pc.fill_null(
            pc.and_kleene(pc.is_valid(uri1), pc.is_valid(uri2)), False)
        return pa.Table.from_arrays(
            [uri1.filter(keep),
             pc.cast(t.column("pred").combine_chunks(),
                     pa.string()).filter(keep),
             uri2.filter(keep),
             pc.cast(t.column("doc_id").combine_chunks(),
                     pa.string()).filter(keep),
             pc.cast(t.column("span_offset").combine_chunks(),
                     pa.int32()).filter(keep),
             t.column("eid").combine_chunks().filter(keep),
             t.column("eid2").combine_chunks().filter(keep)],
            schema=LINKED_TRIPLES)

    def assemble_mentions(t: pa.Table) -> pa.Table:
        """Mention/caption rows become (document URI) -[mentions]-> entity
        triples straight from the subject join — no second shuffle."""
        if "uri" not in t.column_names or t.num_rows == 0:
            return LINKED_TRIPLES.empty_table()
        uri1 = t.column("uri").combine_chunks()
        keep = pc.fill_null(pc.is_valid(uri1), False)
        m_doc = pc.cast(t.column("doc_id").combine_chunks(),
                        pa.string()).filter(keep)
        uniq_docs = pc.unique(m_doc)
        doc_uris = pa.array(
            [mint_uri("Document", d) for d in uniq_docs.to_pylist()],
            pa.string())
        m_subj = doc_uris.take(pc.index_in(m_doc, value_set=uniq_docs))
        m_pred = pc.if_else(
            pc.equal(t.column("etype").combine_chunks().filter(keep),
                     "caption"),
            MEDIA_PREDICATE, "mentions")
        n_men = len(m_doc)
        return pa.Table.from_arrays(
            [m_subj, pc.cast(m_pred, pa.string()), uri1.filter(keep),
             m_doc,
             pc.cast(t.column("span_offset").combine_chunks(),
                     pa.int32()).filter(keep),
             pa.array([""] * n_men, pa.string()),
             t.column("eid").combine_chunks().filter(keep)],
            schema=LINKED_TRIPLES)

    rel_triples = j2.map_batches(assemble_relations, batch_format="pyarrow",
                                 batch_size=ASSEMBLE_ROWS).materialize()
    men_triples = j1.map_batches(mentions_only, batch_format="pyarrow") \
        .map_batches(assemble_mentions, batch_format="pyarrow",
                     batch_size=ASSEMBLE_ROWS).materialize()
    # union of two MATERIALIZED branches: executes as pure block
    # concatenation (both inputs are InputDataBuffers). A streaming union
    # here wedged the executor at 4M docs — UnionOperator held every queued
    # bundle against the resource manager's budget while both upstream maps
    # sat output-backpressured on it, so nothing could finish. The
    # materialize boundary matches the join-isolation discipline documented
    # above (and build_kg materializes the linked stream right after
    # anyway, so this adds no extra pass).
    return rel_triples.union(men_triples)
