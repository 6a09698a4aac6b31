"""End-to-end KG-construction job — the ``ray job submit`` entry point.

Reads an interleaved-span documents table (parquet/Lance directory, schema
``raykg.schema.DOCUMENTS``) or generates the deterministic synthetic corpus,
runs the full pipeline (extract → link → canonicalize → materialize →
schema discovery), and writes every output as partitioned parquet under
``--output``::

    output/
      triples/        canonical (subj, pred, obj, doc_id, span_offset)
      nodes/          (uri, label, properties)
      edges/          distinct (subj, pred, obj, count)
      node_types/     discovered schema (merged snapshot across runs)
      metrics.json    row counts + discovery stats

With ``--checkpoint`` the extract+link phase commits per-partition lineage
manifests (state/checkpoint.py), so re-running the same command resumes
after a crash instead of starting over.

Usage:
    python -m raykg.job --synth-docs 10000 --output /tmp/kg_out
    python -m raykg.job --input /data/documents --output /tmp/kg_out \
        --checkpoint /tmp/kg_ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import time


def run_job(args) -> dict:
    from raykg import synth
    from raykg.config import KGConfig
    from raykg.pipelines.discover import (
        discover_node_types,
        merge_pattern_snapshot,
    )
    from raykg.pipelines.kg import (
        build_kg,
        build_kg_resumable,
        ingest_increment,
    )
    from raykg.sources.io import read_table, write_table

    cfg = KGConfig(n_docs=args.synth_docs,
                   n_entities=args.entities,
                   batch_size=args.batch_size,
                   link_concurrency=args.link_concurrency,
                   mention_detector=args.mention_detector)
    t0 = time.perf_counter()
    kw = {"canon_broadcast_limit": args.canon_broadcast_limit,
          "link_mode": args.link_mode}
    if bool(args.aliases) != bool(args.entity_metadata):
        raise SystemExit("--aliases and --entity-metadata go together "
                         "(the catalog contract needs both tables)")
    if args.aliases:
        # real-corpus path: the entity vocabulary rides the dataflow as two
        # curated tables (catalog.DatasetCatalog) instead of the synthetic
        # default. See fixtures/demo for a checked-in example.
        from raykg.catalog import DatasetCatalog

        kw["catalog"] = DatasetCatalog(read_table(args.aliases),
                                       read_table(args.entity_metadata))
    if args.input and getattr(args, "incremental", False):
        # file-based append: each NEW parquet file under --input becomes a
        # lineage shard; committed files are never re-linked
        from raykg.pipelines.kg import ingest_files

        if not args.checkpoint:
            raise SystemExit("--incremental --input requires --checkpoint "
                             "(the lineage dir that records which files "
                             "are already ingested)")
        if args.link_mode != "broadcast":
            raise SystemExit(
                f"--link-mode={args.link_mode} is not supported with "
                "--incremental (per-shard linking owns its lineage)")
        result = ingest_files(
            cfg, args.checkpoint, args.input,
            canon_broadcast_limit=args.canon_broadcast_limit,
            catalog=kw.get("catalog"))
    elif args.input:
        # cast_to only applies to JSONL inputs (JSON inference widens the
        # int32 span offsets); parquet/lance schemas are authoritative
        from raykg import schema as _schema

        docs = read_table(args.input, cast_to=_schema.DOCUMENTS)
        result = build_kg(docs, cfg, checkpoint_dir=args.checkpoint, **kw)
    elif args.checkpoint:
        # the resumable path shares the canonicalize/materialize tail, so
        # --canon-broadcast-limit applies; per-shard linking stays on the
        # broadcast linker (the shard runner owns its lineage), so reject a
        # contradictory flag instead of silently ignoring it
        if args.link_mode != "broadcast":
            raise SystemExit(
                f"--link-mode={args.link_mode} is not supported with the "
                "synth+checkpoint resume path; use --input")
        if getattr(args, "incremental", False):
            # delta append: grow the checkpointed corpus to --synth-docs;
            # only the new doc range runs extract+link (pipelines/kg.py
            # ingest_increment), re-canonicalizing over the shard union
            result = ingest_increment(
                cfg, args.checkpoint, n_shards=args.shards,
                canon_broadcast_limit=args.canon_broadcast_limit)
        else:
            result = build_kg_resumable(
                cfg, args.checkpoint, n_shards=args.shards,
                canon_broadcast_limit=args.canon_broadcast_limit)
    else:
        docs = synth.documents_dataset(cfg)
        result = build_kg(docs, cfg, **kw)

    import shutil

    out = args.output
    for sub in ("triples", "edges", "nodes"):
        # idempotent overwrite: write_parquet otherwise APPENDS part files
        # to a prior run's directory (node_types below accumulates on
        # purpose — that one is the incremental snapshot)
        shutil.rmtree(os.path.join(out, sub), ignore_errors=True)
    write_table(result.triples, os.path.join(out, "triples"))
    write_table(result.edges, os.path.join(out, "edges"))
    nodes = result.nodes.materialize()   # consumed twice: write + discovery
    write_table(nodes, os.path.join(out, "nodes"))

    discovery = discover_node_types(nodes, cfg)
    node_types = merge_pattern_snapshot(
        discovery.node_types, os.path.join(out, "node_types"))

    metrics = {
        "wall_s": round(time.perf_counter() - t0, 3),
        "n_triples": result.triples.count(),
        "n_nodes": nodes.count(),
        "n_edges": result.edges.count(),
        "n_node_types": node_types.count(),
        "n_canonicalized": len(result.canon_map),
        "num_hash_tables": discovery.num_hash_tables,
        "config": {"n_docs": cfg.n_docs, "n_entities": cfg.num_entities,
                   "seed": cfg.seed},
    }
    tmp = os.path.join(out, "metrics.json.tmp")
    with open(tmp, "w") as f:
        json.dump(metrics, f, indent=2)
    os.replace(tmp, os.path.join(out, "metrics.json"))
    return metrics


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default=None,
                   help="documents table dir (parquet/lance); omit for synth")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="lineage checkpoint dir (enables resume)")
    p.add_argument("--incremental", action="store_true",
                   help="with --checkpoint: append-only ingestion that "
                        "links ONLY new data and re-derives the canonical "
                        "map over the union. With --input, each NEW "
                        "parquet file under the input dir becomes a "
                        "lineage shard (file-based crawl append); without "
                        "--input, delta-appends the synth corpus up to "
                        "--synth-docs")
    p.add_argument("--aliases", default=None,
                   help="alias-dictionary table dir (alias, ent); with "
                        "--entity-metadata, supplies the entity vocabulary "
                        "as data instead of the synthetic default")
    p.add_argument("--entity-metadata", default=None,
                   help="entity-metadata table dir "
                        "(ent, entity_id, label, norm_name, properties)")
    p.add_argument("--mention-detector", choices=["digit", "capitalized"],
                   default="digit",
                   help="candidate-token rule: 'digit' (synthetic "
                        "vocabulary) or 'capitalized' (real text / "
                        "proper nouns, e.g. fixtures/demo)")
    p.add_argument("--synth-docs", type=int, default=10000)
    p.add_argument("--entities", type=int, default=0)
    p.add_argument("--shards", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--link-concurrency", type=int, default=0)
    p.add_argument("--link-mode",
                   choices=["broadcast", "hybrid", "distributed"],
                   default="broadcast",
                   help="'hybrid'/'distributed' = alias dictionary stays a "
                        "Dataset (keyed-shuffle resolution); hybrid "
                        "broadcasts only the distinct-surface resolution "
                        "table for assembly, distributed broadcasts nothing")
    p.add_argument("--canon-broadcast-limit", type=int, default=2_000_000,
                   help="distinct-entity count above which the canonical "
                        "rewrite switches to the join-based scale path; "
                        "0 forces it")
    p.add_argument("--num-cpus", type=int,
                   default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = p.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    if args.link_concurrency <= 0:
        args.link_concurrency = max(2, args.num_cpus * 3 // 4)
    metrics = run_job(args)
    print(json.dumps(metrics))
    if owns_ray:
        ray.shutdown()


if __name__ == "__main__":
    main()
