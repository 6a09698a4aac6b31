"""Non-synthetic end-to-end demo: the checked-in real-text corpus
(fixtures/demo, see tools/make_demo_fixture.py) runs through the full job —
external documents + external catalog tables, zero raykg.synth involvement —
and produces the expected triples, including the fuzzy-linked typo and the
canonicalized coreferent duplicate (round-3 verdict items #1/#7)."""

import json
import os
import subprocess
import sys

import pyarrow.dataset as pads

from raykg.functions.hashing import mint_uri

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(REPO, "fixtures", "demo")

CURIE = mint_uri("Person", "demo:P-curie")
CURIE_DUP = mint_uri("Person", "demo:P-curie-dup")
CURIE_CANON = min(CURIE, CURIE_DUP)   # canon = min uri of the norm_name group
EINSTEIN = mint_uri("Person", "demo:P-einstein")
SORBONNE = mint_uri("Organisation", "demo:O-sorbonne")
PARIS = mint_uri("Place", "demo:L-paris")
RADIUM = mint_uri("Product", "demo:PR-radium")


def _run_job(out):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "raykg.job",
         "--input", os.path.join(FIX, "documents"),
         "--aliases", os.path.join(FIX, "aliases"),
         "--entity-metadata", os.path.join(FIX, "entity_metadata"),
         "--mention-detector", "capitalized",
         "--output", out, "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=420, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_demo_corpus_end_to_end(tmp_path):
    out = str(tmp_path / "out")
    metrics = _run_job(out)
    assert metrics["n_triples"] > 0 and metrics["n_nodes"] > 0

    triples = pads.dataset(os.path.join(out, "triples")).to_table()
    got = set(zip(triples.column("subj").to_pylist(),
                  triples.column("pred").to_pylist(),
                  triples.column("obj").to_pylist()))

    # exact alias hit (demo-d01)
    assert (CURIE_CANON, "works_at", SORBONNE) in got
    # typo'd mention resolved by single-deletion blocking (demo-d05
    # "Sklodowsk") lands on the SAME canonical triple
    d05 = [o for s, p, o, d in zip(triples.column("subj").to_pylist(),
                                   triples.column("pred").to_pylist(),
                                   triples.column("obj").to_pylist(),
                                   triples.column("doc_id").to_pylist())
           if d == "demo-d05" and p == "works_at" and s == CURIE_CANON]
    assert d05 == [SORBONNE]
    # coreferent duplicate (demo-d08 "MadameCurie") canonicalized into the
    # Curie group: no triple may reference the non-canonical uri
    non_canon = {CURIE, CURIE_DUP} - {CURIE_CANON}
    assert not any(s in non_canon or o in non_canon for s, _, o in got)
    # the rest of the relation surface
    assert (SORBONNE, "located_in", PARIS) in got
    assert (CURIE_CANON, "acquired", RADIUM) in got
    assert (EINSTEIN, "knows", CURIE_CANON) in got
    # media caption -> depicts (demo-d01 image span; demo-d09 media-only doc)
    assert (mint_uri("Document", "demo-d01"), "depicts", CURIE_CANON) in got
    assert (mint_uri("Document", "demo-d09"), "depicts", SORBONNE) in got

    # node properties come from the catalog metadata table, not synth
    nodes = pads.dataset(os.path.join(out, "nodes")).to_table()
    by_uri = dict(zip(nodes.column("uri").to_pylist(),
                      (dict(p) for p in
                       nodes.column("properties").to_pylist())))
    assert by_uri[CURIE_CANON]["name"] == "Marie Curie"
    assert by_uri[PARIS]["latitude"] == "48.85"
    # every node uri is canonical and every label real
    assert CURIE_DUP not in by_uri or CURIE_DUP == CURIE_CANON
    labels = set(nodes.column("label").to_pylist())
    assert labels <= {"Person", "Organisation", "Place", "Product",
                      "Document"}


def _second_batch_table():
    """Two more documents 'crawled' later: reuse known entities and add a
    relation that only exists in the delta."""
    import pyarrow as pa

    from raykg import schema

    spans = [
        [{"kind": "text", "text": "recently Einstein located in Zurich",
          "media_ref": "", "offset": 0}],
        [{"kind": "text", "text": "sources confirmed Paris knows Warsaw",
          "media_ref": "", "offset": 0}],
    ]
    return pa.Table.from_arrays(
        [pa.array(["demo-d11", "demo-d12"], pa.string()),
         pa.array(spans, pa.list_(schema.SPAN_STRUCT))],
        schema=schema.DOCUMENTS)


def _run_append(input_dir, ckpt, out):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "raykg.job",
         "--input", input_dir,
         "--aliases", os.path.join(FIX, "aliases"),
         "--entity-metadata", os.path.join(FIX, "entity_metadata"),
         "--mention-detector", "capitalized",
         "--incremental", "--checkpoint", ckpt,
         "--output", out, "--num-cpus", "4"],
        capture_output=True, text=True, env=env, timeout=420, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_demo_file_append(tmp_path):
    import shutil

    import pyarrow.parquet as pq

    input_dir = str(tmp_path / "crawl")
    os.makedirs(input_dir)
    shutil.copy(os.path.join(FIX, "documents", "part-0.parquet"),
                os.path.join(input_dir, "crawl-000.parquet"))
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    m1 = _run_append(input_dir, ckpt, out)
    lineage = os.path.join(ckpt, "linked", "_lineage")
    parts1 = {f for f in os.listdir(lineage) if f.endswith(".json")}
    assert len(parts1) == 1 and m1["n_triples"] > 0

    # the crawler drops a second file; ONLY it gets linked
    pq.write_table(_second_batch_table(),
                   os.path.join(input_dir, "crawl-001.parquet"))
    manifest0 = os.path.join(lineage, sorted(parts1)[0])
    mtime0 = os.path.getmtime(manifest0)
    m2 = _run_append(input_dir, ckpt, out)
    parts2 = {f for f in os.listdir(lineage) if f.endswith(".json")}
    assert len(parts2) == 2 and parts1 <= parts2
    assert os.path.getmtime(manifest0) == mtime0, "shard 0 was re-run"
    assert m2["n_triples"] > m1["n_triples"]

    # the delta-only relation made it into the graph
    import pyarrow.dataset as pads

    triples = pads.dataset(os.path.join(out, "triples")).to_table()
    got = set(zip(triples.column("subj").to_pylist(),
                  triples.column("pred").to_pylist(),
                  triples.column("obj").to_pylist()))
    assert (EINSTEIN, "located_in",
            mint_uri("Place", "demo:L-zurich")) not in got  # not in vocab
    assert (mint_uri("Place", "demo:L-paris"), "knows",
            mint_uri("Place", "demo:L-warsaw")) in got
