"""JSONL as a first-class ingest format for file-based incremental
ingestion (pipelines/kg.py::ingest_files): a crawler dropping `.jsonl`
shards next to parquet ones gets the same lineage / immutability contract,
and the mixed-directory build equals the one-shot batch build exactly."""

import json
import os

import pyarrow.parquet as pq
import pytest

from raykg import synth
from raykg.config import KGConfig
from raykg.pipelines.evaluate import dataset_triple_set
from raykg.pipelines.kg import build_kg, ingest_files


def _write_jsonl(table, path):
    with open(path, "w") as f:
        for row in table.to_pylist():
            f.write(json.dumps(row) + "\n")


def test_ingest_files_jsonl_matches_batch(ray_session, tmp_path):
    cfg = KGConfig(n_docs=120, batch_size=64)
    tbl = synth.documents_table(cfg)
    input_dir = tmp_path / "crawl"
    os.makedirs(input_dir)
    pq.write_table(tbl.slice(0, 60),
                   str(input_dir / "crawl-000.parquet"))
    _write_jsonl(tbl.slice(60), str(input_dir / "crawl-001.jsonl"))

    res = ingest_files(cfg, str(tmp_path / "ckpt"), str(input_dir))
    batch = build_kg(synth.documents_dataset(cfg), cfg)
    assert dataset_triple_set(res.triples) == \
        dataset_triple_set(batch.triples)

    # two shards committed, each carrying its byte-size fingerprint and the
    # JSONL shard's line-counted n_docs
    from raykg.state.checkpoint import LineageCheckpoint

    parts = LineageCheckpoint(
        str(tmp_path / "ckpt" / "linked")).committed_parts()
    assert len(parts) == 2
    fps = {p["fingerprint"]["source"]: p for p in parts.values()}
    jl = fps[str(input_dir / "crawl-001.jsonl")]
    assert jl["fingerprint"]["bytes_in"] == os.path.getsize(
        str(input_dir / "crawl-001.jsonl"))
    assert jl["fingerprint"]["rows_in"] == 60
    assert jl["counters"]["n_docs"] == 60


def test_ingest_files_jsonl_immutability(ray_session, tmp_path):
    cfg = KGConfig(n_docs=40, batch_size=32)
    tbl = synth.documents_table(cfg)
    input_dir = tmp_path / "crawl"
    os.makedirs(input_dir)
    jl = str(input_dir / "crawl-000.jsonl")
    _write_jsonl(tbl, jl)
    ingest_files(cfg, str(tmp_path / "ckpt"), str(input_dir),
                 link_only=True)

    # editing a committed JSONL file (even keeping the row count) fails
    # loudly on the byte-size fingerprint
    with open(jl, "a") as f:
        f.write(json.dumps({"doc_id": "evil", "spans": []}) + "\n")
    with pytest.raises(ValueError, match="immutable"):
        ingest_files(cfg, str(tmp_path / "ckpt"), str(input_dir),
                     link_only=True)
