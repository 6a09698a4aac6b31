"""The flagship end-to-end KG-construction pipeline (north star).

documents (interleaved text+media spans)
  -> stateless extraction           map_batches, zero-copy Arrow
  -> stateful entity linking        actor pool (alias dict + LSH blocking)
  -> canonicalization               two-phase dedup + groupby(norm_name)
                                    union-find + broadcast rewrite
  -> graph materialization          dedup'd node/edge tables

Stage boundaries that feed two consumers (linked triples feed both the
canonical-map build and the rewrite) are either checkpointed to partitioned
Parquet (resumable; pass ``checkpoint_dir``) or pinned via ``materialize()``
(small runs). Nothing else materializes; every hot stage streams.

Reference lifecycle analog: src/main/scala/Main.scala:6-62 — but with zero
driver-side funneling of row-level data (SURVEY §4): only the canonical map
(distinct-entity sized) and final metrics ever reach the driver.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from raykg import schema, synth
from raykg.config import KGConfig
from raykg.functions.hashing import mint_uri
from raykg.sources.io import read_table, write_table
from raykg.stages.canonicalize import (
    ESENT,
    canonical_groups,
    observed_entity_partials,
    rewrite_triples,
    rewrite_triples_joined,
)
from raykg.stages.extract import extract_batch
from raykg.stages.link import LinkBatches, build_index_ref


@dataclass
class KGResult:
    triples: rd.Dataset          # canonical (subj, pred, obj, doc_id, span_offset)
    nodes: rd.Dataset            # (uri, label, properties)
    edges: rd.Dataset            # distinct (subj, pred, obj, count)
    canon_map: dict[str, str]    # uri -> canonical uri (distinct entities
                                 # only; EMPTY when the join-based scale path
                                 # was selected — the map never reaches the
                                 # driver there)


def linked_triples(documents: rd.Dataset, cfg: KGConfig,
                   catalog=None) -> rd.Dataset:
    """documents -> extraction -> linking (lazy). ``catalog`` supplies the
    alias dictionary and entity metadata (catalog.EntityCatalog; default =
    the synthetic fixture vocabulary)."""
    extractions = documents.map_batches(
        partial(extract_batch, detector=cfg.mention_detector),
        batch_format="pyarrow", batch_size=cfg.batch_size)
    index_ref = build_index_ref(cfg, catalog)
    # Pool floor == the target concurrency: Ray Data's actor-pool autoscaler
    # is too conservative to climb from a low floor within a short job
    # (measured 12.6s -> 8.9s at 200k docs just by lifting the floor from 12
    # to 24 of 32 CPUs). The ceiling stays a little higher for burst, but
    # must remain below the cluster CPU count — a pool holding EVERY CPU
    # deadlocks upstream read tasks. link_concurrency is therefore sized by
    # callers at ~3/4 of CPUs.
    total_cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    cap = max(1, total_cpus - 2)     # always leave CPUs for read/write tasks
    floor = min(cfg.link_concurrency, cap)
    ceiling = min(cfg.link_concurrency
                  + max(2, cfg.link_concurrency // 6), cap)
    # Link batches are EVENT rows (~16x denser than documents): a larger
    # batch amortizes the per-batch resolve/index_in setup while still
    # yielding hundreds of tasks for the pool.
    return extractions.map_batches(
        LinkBatches,
        fn_constructor_kwargs={"cfg": cfg, "index_ref": index_ref},
        batch_format="pyarrow", batch_size=max(cfg.batch_size, 4096),
        concurrency=(floor, max(floor, ceiling)),
        num_cpus=1)


def entity_nodes(groups: rd.Dataset) -> rd.Dataset:
    """Canonical entities -> node rows. Label and properties arrive as
    columns of the canonical-groups table (catalog metadata riding the
    dataflow — never synthesized per id), so this is pure vectorized column
    selection: keep each group's canonical row, drop the per-bucket
    sentinels."""
    import pyarrow.compute as pc

    def mint(batch: pa.Table) -> pa.Table:
        uri = batch.column("uri").combine_chunks()
        keep = pc.and_(
            pc.equal(uri, batch.column("canon_uri").combine_chunks()),
            pc.not_equal(batch.column("entity_id").combine_chunks(), ESENT))
        t = batch.filter(keep)
        return pa.table({
            "uri": t.column("canon_uri"),
            "label": t.column("label"),
            "properties": t.column("properties"),
        })

    return groups.map_batches(mint, batch_format="pyarrow")


def document_nodes(documents: rd.Dataset) -> rd.Dataset:
    def mint(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        n_spans = [len(s) for s in batch.column("spans").to_pylist()]
        return pa.table({
            "uri": pa.array([mint_uri("Document", d) for d in doc_ids]),
            "label": pa.array(["Document"] * len(doc_ids)),
            "properties": pa.array(
                [{"n_spans": str(n)} for n in n_spans],
                pa.map_(pa.string(), pa.string())),
        })

    return documents.map_batches(mint, batch_format="pyarrow")


def dedup_edges(triples: rd.Dataset) -> rd.Dataset:
    """Exact edge dedup (reference analog O7) via the engine's bucketed
    two-phase aggregate (functions/shuffle.py): per-batch combiner collapses
    duplicate (subj,pred,obj) keys, the exchange moves partials keyed by an
    int32 crc bucket (4x faster than sort-shuffling ~1M unique string keys),
    and one vectorized Arrow hash-agg per bucket finalizes counts. Exact —
    the full joined key rides along, nothing is lossy-hashed."""
    import pyarrow.compute as pc

    from raykg.functions.shuffle import bucketed_group_agg

    SEP = "\x1f"

    def combiner(batch: pa.Table) -> pa.Table:
        t = batch.select(["subj", "pred", "obj"]).group_by(
            ["subj", "pred", "obj"]).aggregate([([], "count_all")])
        key = pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"), SEP)
        return pa.table({"k": key, "n": t.column("count_all")})

    def finalize(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("n", "sum")])
        parts = pc.split_pattern(g.column("k"), SEP)
        return pa.table({
            "subj": pc.list_element(parts, 0),
            "pred": pc.list_element(parts, 1),
            "obj": pc.list_element(parts, 2),
            "count": g.column("n_sum"),
        })

    return bucketed_group_agg(triples, combiner, "k", finalize)


def dedup_edges_ids(linked: rd.Dataset, ent_canon: dict[str, str],
                    ent_uris: dict[str, str]) -> rd.Dataset:
    """Edge dedup in compact ID space — the scale path used by build_kg.

    The generic ``dedup_edges`` exchanges full URI strings (~160 B/key);
    here the combiner keys on (entity-id | pred | entity-id) (~25 B/key,
    canonicalized through the broadcast ent->canon map), and URIs are
    attached AFTER the aggregate from the broadcast ``ent_uris`` map
    (entity_id -> uri, built from the canonical-groups table — i.e. catalog
    metadata, never a per-id synth call), vectorized via index_in/take.
    Document URIs are the only per-bucket minting (one sha256 per distinct
    doc id). Same output table as ``dedup_edges``, ~6x less shuffle volume
    and ~10^6 fewer sha256 calls at 13M triples.
    """
    import pyarrow.compute as pc

    from raykg.functions.shuffle import bucketed_group_agg

    SEP = "\x1f"
    DSEP = "\x02"   # doc-subject internal separator: keys stay 3 SEP fields
    ent_keys = pa.array(list(ent_canon.keys()), pa.string())
    ent_vals = pa.array(list(ent_canon.values()), pa.string())
    ent_ref = ray.put((ent_keys, ent_vals))
    uri_ref = ray.put((pa.array(list(ent_uris.keys()), pa.string()),
                       pa.array(list(ent_uris.values()), pa.string())))

    def combiner(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(ent_ref)

        def canon(col: pa.ChunkedArray) -> pa.Array:
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            mapped = vals.take(pc.index_in(col, value_set=keys))
            return pc.coalesce(mapped, col)

        subj_ent = batch.column("subj_ent").combine_chunks()
        doc_keys = pc.binary_join_element_wise(
            pa.scalar("D"), batch.column("doc_id").combine_chunks(), DSEP)
        subj_keys = pc.if_else(pc.equal(subj_ent, ""), doc_keys,
                               canon(subj_ent))
        t = pa.table({
            "s": subj_keys,
            "p": batch.column("pred"),
            "o": canon(batch.column("obj_ent")),
        }).group_by(["s", "p", "o"]).aggregate([([], "count_all")])
        key = pc.binary_join_element_wise(
            t.column("s"), t.column("p"), t.column("o"), SEP)
        return pa.table({"k": key, "n": t.column("count_all")})

    def finalize(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("n", "sum")])
        uk, uv = ray.get(uri_ref)
        parts = pc.split_pattern(g.column("k").combine_chunks(), SEP)
        s = pc.list_element(parts, 0)
        pred = pc.list_element(parts, 1)
        o = pc.list_element(parts, 2)

        def ent_uri(col: pa.Array, allow_doc: bool) -> pa.Array:
            mapped = uv.take(pc.index_in(col, value_set=uk))
            if not allow_doc:
                if mapped.null_count > 0:
                    missing = col.filter(pc.is_null(mapped)).to_pylist()[:5]
                    raise ValueError(
                        f"canonical-groups table is missing URIs for entity "
                        f"ids {missing}")
                return mapped
            return mapped

        is_doc = pc.starts_with(s, "D" + DSEP)
        doc_ids = pc.utf8_slice_codeunits(s, 2)
        uniq_docs = pc.unique(doc_ids.filter(is_doc))
        minted = pa.array([mint_uri("Document", d)
                           for d in uniq_docs.to_pylist()], pa.string())
        doc_uri = minted.take(pc.index_in(doc_ids, value_set=uniq_docs)) \
            if len(uniq_docs) else pa.nulls(len(s), pa.string())
        subj = pc.if_else(is_doc, doc_uri, ent_uri(s, allow_doc=True))
        if subj.null_count > 0:
            missing = s.filter(pc.is_null(subj)).to_pylist()[:5]
            raise ValueError(
                f"canonical-groups table is missing URIs for subject "
                f"entity ids {missing}")
        return pa.table({
            "subj": subj,
            "pred": pred,
            "obj": ent_uri(o, allow_doc=False),
            "count": g.column("n_sum"),
        })

    return bucketed_group_agg(linked, combiner, "k", finalize)


def _finish_kg(linked: rd.Dataset, documents: rd.Dataset, cfg: KGConfig,
               checkpoint_dir: str | None,
               canon_broadcast_limit: int,
               triples_snapshot: tuple | None = None,
               catalog=None) -> KGResult:
    """Shared canonicalize + materialize tail for build_kg and
    build_kg_resumable (path selection documented on build_kg).

    ``triples_snapshot``: optional ``(LineageCheckpoint, fingerprint)`` —
    the rewritten triples commit atomically as checkpoint partition 0, and
    a resumed run whose snapshot is already committed SKIPS the rewrite
    entirely (the lazy rewrite dataset is never executed) and streams the
    snapshot instead.

    ``catalog`` (catalog.EntityCatalog, default = synthetic fixture): its
    metadata dataset rides the canonicalization exchange, so every label /
    norm_name / property / URI below comes from data, never a synth call."""
    from raykg.catalog import default_catalog

    catalog = catalog or default_catalog(cfg)
    groups = canonical_groups(observed_entity_partials(linked),
                              catalog.metadata_dataset()).materialize()

    def _commit_or_read(make_triples):
        """Triples pin selection: snapshot commit > plain checkpoint dir >
        in-memory materialize handled by the caller."""
        if triples_snapshot is not None:
            tck, fp = triples_snapshot
            tck.run_partition(0, make_triples, fingerprint=fp)
            return tck.dataset()
        if checkpoint_dir:
            write_table(make_triples(),
                        _fresh_dir(f"{checkpoint_dir}/triples"))
            return read_table(f"{checkpoint_dir}/triples")
        return None

    if groups.count() > canon_broadcast_limit:
        # --- shuffle-based scale path: no driver-side canon map ---
        # bucket count >= cluster cores so every node gets exchange work
        total_cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        # ONE rewrite definition for both the checkpointed and the pinned
        # path, so their arguments can never drift apart
        def make_joined():
            return rewrite_triples_joined(
                linked, groups, num_buckets=max(512, total_cpus * 16))

        triples = _commit_or_read(make_joined)
        if triples is None:
            # pinned: both the caller and the edge dedup consume it, and the
            # two rewrite joins must not re-execute per consumer
            triples = make_joined().materialize()
        edges = dedup_edges(triples)
        nodes = entity_nodes(groups).union(document_nodes(documents))
        return KGResult(triples=triples, nodes=nodes, edges=edges,
                        canon_map={})

    # distinct-entity sized; small by design. Drop the per-bucket exchange
    # sentinels (entity_id == ESENT) before building the driver-side maps.
    canon_rows = [r for r in groups.take_all() if r["entity_id"] != ESENT]
    canon_map = {r["uri"]: r["canon_uri"] for r in canon_rows
                 if r["uri"] != r["canon_uri"]}
    ent_map = {r["entity_id"]: r["canon_ent"] for r in canon_rows
               if r["entity_id"] != r["canon_ent"]}
    ent_uris = {r["entity_id"]: r["uri"] for r in canon_rows}

    def make_rewrite():
        return rewrite_triples(linked, canon_map)

    triples = _commit_or_read(make_rewrite)
    if triples is None:
        # leave lazy — a map-only stage over the pinned ``linked`` table;
        # materializing it only paid an extra multi-GB object-store round trip
        triples = make_rewrite()

    edges = dedup_edges_ids(linked, ent_map, ent_uris)
    nodes = entity_nodes(groups).union(document_nodes(documents))
    return KGResult(triples=triples, nodes=nodes, edges=edges,
                    canon_map=canon_map)


def _link_cfg_hash(cfg: KGConfig) -> str:
    """Corpus-size-free config hash shared by build_kg_resumable (stamped
    into each shard manifest) and ingest_increment (validated before
    extending a checkpoint): everything but n_docs, plus the DERIVED
    num_entities — doc generation depends on it, so an append whose
    corpus-size change shifts the vocabulary fails loudly instead of
    silently linking a different corpus."""
    import dataclasses
    import json as _json

    from raykg.functions.hashing import sha_hex

    d = dataclasses.asdict(cfg)
    d.pop("n_docs")
    d["num_entities"] = cfg.num_entities
    return sha_hex(_json.dumps(d, sort_keys=True))[:12]


def build_kg_resumable(cfg: KGConfig, checkpoint_dir: str,
                       n_shards: int = 8,
                       fail_after_shards: int | None = None,
                       canon_broadcast_limit: int = 2_000_000,
                       snapshot_triples: bool = True) -> KGResult:
    """Flagship pipeline over the synthetic corpus with per-partition lineage
    checkpointing (north rule). The dominant extract+link phase runs shard by
    shard; each shard's LINKED_TRIPLES output commits atomically with a
    lineage manifest (rows + doc counters), so a killed run resumes by
    skipping committed shards. Downstream (canonicalize / materialize)
    streams over the union of committed shards.

    With ``snapshot_triples`` (default), the canonical-rewrite output also
    commits atomically (``<checkpoint_dir>/triples`` partition 0): a run
    killed AFTER that commit resumes by skipping linking AND the rewrite —
    only edge dedup / node minting re-execute, streaming from the snapshot.

    ``fail_after_shards`` is a test hook: raise after that many shards have
    been newly committed (simulates a mid-job crash).
    """
    import dataclasses
    import json as _json

    from raykg.functions.hashing import sha_hex
    from raykg.state.checkpoint import LineageCheckpoint, shard_bounds

    cfg_hash = sha_hex(_json.dumps(dataclasses.asdict(cfg), sort_keys=True))[:12]
    ckpt = LineageCheckpoint(f"{checkpoint_dir}/linked")
    ran = 0
    for part, (lo, hi) in enumerate(shard_bounds(cfg.n_docs, n_shards)):
        status = ckpt.run_partition(
            part,
            lambda lo=lo, hi=hi: linked_triples(
                synth.documents_dataset_range(lo, hi, cfg), cfg),
            counters={"n_docs": hi - lo},
            # link_cfg makes a checkpointed BATCH build appendable: it is
            # the corpus-size-free hash ingest_increment validates, so a
            # later append can extend this checkpoint instead of failing
            # with "committed under config None"
            fingerprint={"lo": lo, "hi": hi, "n_docs": cfg.n_docs,
                         "n_shards": n_shards, "cfg": cfg_hash,
                         "link_cfg": _link_cfg_hash(cfg)})
        if status == "ran":
            ran += 1
            if fail_after_shards is not None and ran >= fail_after_shards:
                raise RuntimeError(
                    f"injected failure after {ran} shards (test hook)")

    linked = ckpt.dataset()
    snapshot = None
    if snapshot_triples:
        snapshot = (LineageCheckpoint(f"{checkpoint_dir}/triples"),
                    {"n_docs": cfg.n_docs, "n_shards": n_shards,
                     "cfg": cfg_hash, "stage": "triples",
                     "canon_broadcast_limit": canon_broadcast_limit})
    return _finish_kg(linked, synth.documents_dataset(cfg), cfg,
                      checkpoint_dir=None,
                      canon_broadcast_limit=canon_broadcast_limit,
                      triples_snapshot=snapshot)


def ingest_increment(cfg: KGConfig, checkpoint_dir: str,
                     docs_for_range=None, n_shards: int = 4,
                     link_only: bool = False,
                     canon_broadcast_limit: int = 2_000_000,
                     catalog=None) -> KGResult | None:
    """Incremental crawl ingestion (delta append): extend a checkpointed KG
    build to ``cfg.n_docs`` documents WITHOUT re-linking the already-ingested
    corpus. The dominant extract+link phase runs only over the NEW doc range
    (committed as additional lineage partitions under
    ``<checkpoint_dir>/linked``); canonicalization, rewrite and
    materialization then re-run over the UNION of all committed shards —
    they must, because an append can change canonical entity choices
    retroactively (a new observation can add a smaller-URI member to an
    existing norm-name group), so correct incremental maintenance re-derives
    the canon map rather than patching it. Bit-equality of the appended
    result with a from-scratch batch build is asserted in tests and by the
    ``kg_incremental_append`` driver oracle.

    Reference analog: the reference re-serializes its whole pattern map
    after every ingested file (src2/main/scala/Main.scala:69,178-202) to get
    incremental restartability; here the unit of increment is a document
    range and only the linking of NEW ranges is ever paid.

    ``docs_for_range(lo, hi)`` supplies the corpus slice (defaults to the
    tape corpus ``synth.documents_dataset_range``). ``link_only`` commits
    the link shards and returns None (the bootstrap half of an append
    sequence, where materializing the intermediate graph would be wasted).

    Each committed shard's fingerprint carries (lo, hi) and a config hash
    that EXCLUDES ``n_docs`` — linking a doc is a pure function of
    (seed, index), never of corpus size — so chained appends validate all
    prior shards regardless of the corpus size they were committed under.
    Shards must tile [0, covered) contiguously in part order; gaps, overlaps
    or a foreign config hash fail loudly.
    """
    import dataclasses
    import json as _json

    from raykg.functions.hashing import sha_hex
    from raykg.state.checkpoint import LineageCheckpoint, shard_bounds

    if docs_for_range is None:
        def docs_for_range(lo, hi):
            return synth.documents_dataset_range(lo, hi, cfg)

    link_cfg = _link_cfg_hash(cfg)

    ckpt = LineageCheckpoint(f"{checkpoint_dir}/linked")
    parts = ckpt.committed_parts()
    covered = 0
    for part in sorted(parts):
        fp = parts[part].get("fingerprint") or {}
        if fp.get("link_cfg") != link_cfg:
            raise ValueError(
                f"ingest shard {part} at {checkpoint_dir} was committed "
                f"under config {fp.get('link_cfg')!r}, this run is "
                f"{link_cfg!r}; the checkpoint belongs to a different "
                "corpus — delete it or restore the original config")
        if fp.get("lo") != covered:
            raise ValueError(
                f"ingest shards at {checkpoint_dir} do not tile the doc "
                f"range: part {part} starts at {fp.get('lo')}, expected "
                f"{covered}")
        covered = fp["hi"]
    if covered > cfg.n_docs:
        raise ValueError(
            f"checkpoint at {checkpoint_dir} already covers {covered} docs "
            f"> cfg.n_docs={cfg.n_docs}; appends only grow the corpus")

    next_part = len(parts)
    delta = cfg.n_docs - covered
    if delta > 0:
        for i, (lo, hi) in enumerate(shard_bounds(delta, n_shards)):
            lo, hi = lo + covered, hi + covered
            ckpt.run_partition(
                next_part + i,
                lambda lo=lo, hi=hi: linked_triples(docs_for_range(lo, hi),
                                                    cfg, catalog),
                counters={"n_docs": hi - lo},
                fingerprint={"lo": lo, "hi": hi, "link_cfg": link_cfg})
    if link_only:
        return None
    return _finish_kg(ckpt.dataset(), docs_for_range(0, cfg.n_docs), cfg,
                      checkpoint_dir=None,
                      canon_broadcast_limit=canon_broadcast_limit,
                      catalog=catalog)


def ingest_files(cfg: KGConfig, checkpoint_dir: str, input_dir: str,
                 link_only: bool = False,
                 canon_broadcast_limit: int = 2_000_000,
                 catalog=None) -> KGResult | None:
    """File-based incremental ingestion for EXTERNAL corpora — the
    real-corpus twin of ``ingest_increment`` (whose unit of increment is a
    synthetic doc-index range). The unit here is a parquet or JSONL file
    under ``input_dir``: a crawler drops new document files into the
    directory,
    re-running this job links ONLY the files not yet committed (one lineage
    partition per file, in stable sorted-name order), and canonicalize /
    rewrite / materialize re-run over the union of all committed shards —
    required for correctness, because a new observation can retroactively
    change a canonical entity choice (see ingest_increment's docstring).

    Shard fingerprints carry the source file's path and row count plus a
    config hash, so a re-run validates that every committed shard still
    matches its file; a committed file that disappeared or changed size
    fails loudly (the linked shard would silently disagree with the corpus
    union otherwise). Appends only grow the corpus.
    """
    import dataclasses
    import json as _json

    from raykg.functions.hashing import sha_hex
    from raykg.state.checkpoint import LineageCheckpoint

    d = dataclasses.asdict(cfg)
    d.pop("n_docs")
    # hash the DERIVED entity count (same rationale as ingest_increment:
    # with the default synth catalog the vocabulary depends on it)
    d["num_entities"] = cfg.num_entities
    link_cfg = sha_hex(_json.dumps(d, sort_keys=True))[:12]

    files = sorted(
        os.path.join(input_dir, f) for f in os.listdir(input_dir)
        if f.endswith((".parquet", ".lance", ".jsonl")))
    if not files:
        raise ValueError(f"no document files under {input_dir}")
    rows_of = {f: pq.read_metadata(f).num_rows for f in files
               if f.endswith(".parquet")}
    size_of = {f: os.path.getsize(f) for f in files}

    ckpt = LineageCheckpoint(f"{checkpoint_dir}/linked")
    parts = ckpt.committed_parts()
    seen: set[str] = set()
    for part in sorted(parts):
        fp = parts[part].get("fingerprint") or {}
        if fp.get("link_cfg") != link_cfg:
            raise ValueError(
                f"ingest shard {part} at {checkpoint_dir} was committed "
                f"under config {fp.get('link_cfg')!r}, this run is "
                f"{link_cfg!r}; delete the checkpoint or restore the "
                "original config")
        src = fp.get("source")
        if src not in size_of:
            raise ValueError(
                f"ingest shard {part} came from {src!r}, which is no "
                f"longer under {input_dir}; appends only grow the corpus")
        if "bytes_in" in fp:
            if size_of[src] != fp["bytes_in"]:
                raise ValueError(
                    f"{src} is {size_of[src]} bytes but shard {part} was "
                    f"committed at {fp['bytes_in']}; ingested files are "
                    "immutable — add NEW files instead of editing old ones")
        elif rows_of.get(src) != fp.get("rows_in"):
            # pre-bytes_in checkpoints recorded parquet row counts only
            raise ValueError(
                f"{src} has {rows_of.get(src)} rows but shard {part} was "
                f"committed at {fp.get('rows_in')}; ingested files are "
                "immutable — add NEW files instead of editing old ones")
        seen.add(src)

    next_part = len(parts)
    for f in files:
        if f in seen:
            continue
        n_rows = rows_of.get(f)
        if n_rows is None and f.endswith(".jsonl"):
            n_rows = _count_jsonl_rows(f)
        ckpt.run_partition(
            next_part,
            lambda f=f: linked_triples(
                read_table(f, cast_to=schema.DOCUMENTS), cfg, catalog),
            counters={"n_docs": n_rows if n_rows is not None else 0},
            fingerprint={"source": f, "rows_in": n_rows,
                         "bytes_in": size_of[f], "link_cfg": link_cfg})
        next_part += 1
    if link_only:
        return None
    return _finish_kg(ckpt.dataset(), _read_document_files(files), cfg,
                      checkpoint_dir=None,
                      canon_broadcast_limit=canon_broadcast_limit,
                      catalog=catalog)


def _count_jsonl_rows(path: str) -> int:
    """Non-empty line count of a JSONL file — one buffered sequential pass
    at commit time for the shard's ``n_docs`` counter (parquet gets this
    from footer metadata for free; JSONL has no footer). Runs ONCE per NEW
    file; re-runs validate immutability by byte size instead."""
    n = 0
    last = b"\n"
    with open(path, "rb") as fh:
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            n += chunk.count(b"\n")
            last = chunk
    if not last.endswith(b"\n"):
        n += 1
    return n


def _read_document_files(files: list[str]) -> rd.Dataset:
    """Distributed read of a mixed-format ingest directory: one
    read_parquet over all parquet shards + one read_json over all JSONL
    shards, unioned (read_parquet on the bare directory would choke on the
    JSONL files). Lance shards go through read_table's gated reader."""
    pq_files = [f for f in files if f.endswith(".parquet")]
    jl_files = [f for f in files if f.endswith(".jsonl")]
    parts: list[rd.Dataset] = []
    if pq_files:
        parts.append(rd.read_parquet(pq_files))
    if jl_files:
        parts.append(
            rd.read_json(jl_files, file_extensions=["jsonl"]).map_batches(
                lambda t: t.select(schema.DOCUMENTS.names)
                .cast(schema.DOCUMENTS), batch_format="pyarrow"))
    for f in files:
        if f.endswith(".lance"):  # pragma: no cover - no Lance wheel here
            parts.append(read_table(f))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _fresh_dir(path: str) -> str:
    """Wipe a checkpoint subdirectory before writing: ``write_parquet``
    APPENDS part files to an existing directory, so re-running the same
    command against the same checkpoint dir (the crash-resume scenario this
    path exists for) would otherwise duplicate every row downstream."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    return path


def build_kg(documents: rd.Dataset, cfg: KGConfig,
             checkpoint_dir: str | None = None,
             canon_broadcast_limit: int = 2_000_000,
             link_mode: str = "broadcast",
             catalog=None) -> KGResult:
    """Run the full pipeline. ``documents`` must follow schema.DOCUMENTS.

    ``catalog`` (catalog.EntityCatalog): the alias dictionary and the
    entity-metadata table the pipeline links/canonicalizes against. Default
    is the synthetic fixture vocabulary; a real corpus passes
    catalog.DatasetCatalog over its own curated tables.

    Canonicalization path selection: up to ``canon_broadcast_limit`` distinct
    observed entities the canon map is collected once on the driver and
    broadcast (cheapest at vocabulary scale); above it NOTHING row-sized
    reaches the driver — the map stays a Dataset and the rewrite + edge
    dedup run as hash joins / URI-space aggregation
    (stages/canonicalize.rewrite_triples_joined). Force the scale path in
    tests with ``canon_broadcast_limit=0``.

    ``link_mode`` (memory envelope, fastest first):
    - "broadcast" (default): the AliasIndex rides one ray.put — right while
      the alias DICTIONARY fits a worker heap;
    - "hybrid": dictionary stays a Dataset (keyed-shuffle resolution) but
      the distinct-surface RESOLUTION table broadcasts for assembly — for
      dictionaries too large to broadcast while observed surfaces still fit;
    - "distributed": nothing broadcasts, assembly is hash joins — the
      unbounded-everything path. "distributed" + ``canon_broadcast_limit=0``
      is fully broadcast-free for 10^8+-entity vocabularies; equality of
      all configurations is asserted in tests."""
    if link_mode in ("distributed", "hybrid"):
        from raykg.stages.link_distributed import (
            linked_triples_distributed,
            linked_triples_hybrid,
        )

        total_cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        fn = linked_triples_distributed if link_mode == "distributed" \
            else linked_triples_hybrid
        linked = fn(documents, cfg,
                    num_partitions=max(4, min(32, total_cpus)),
                    catalog=catalog)
    else:
        linked = linked_triples(documents, cfg, catalog)
    if checkpoint_dir:
        write_table(linked, _fresh_dir(f"{checkpoint_dir}/linked"))
        linked = read_table(f"{checkpoint_dir}/linked")
    else:
        linked = linked.materialize()

    return _finish_kg(linked, documents, cfg, checkpoint_dir,
                      canon_broadcast_limit, catalog=catalog)
