"""End-to-end job CLI: runs in a fresh subprocess (its own Ray session),
writes all output tables, and resumes from lineage on a second invocation."""

import json
import os
import subprocess
import sys


def _run(args):
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-m", "raykg.job", *args],
        capture_output=True, text=True, env=env, timeout=420,
        cwd="/root/repo")
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_job_cli_writes_outputs_and_resumes(tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    m1 = _run(["--synth-docs", "800", "--output", out,
               "--checkpoint", ckpt, "--num-cpus", "4", "--shards", "4"])
    assert m1["n_triples"] > 0 and m1["n_nodes"] > 0 and m1["n_edges"] > 0
    for sub in ("triples", "nodes", "edges", "node_types"):
        assert os.path.isdir(os.path.join(out, sub)), sub
    assert os.path.exists(os.path.join(out, "metrics.json"))
    manifests = os.listdir(os.path.join(ckpt, "linked", "_lineage"))
    assert len([m for m in manifests if m.endswith(".json")]) == 4

    # second run resumes (skips all shards) and reproduces identical counts
    m2 = _run(["--synth-docs", "800", "--output", out,
               "--checkpoint", ckpt, "--num-cpus", "4", "--shards", "4"])
    for k in ("n_triples", "n_nodes", "n_edges", "n_node_types"):
        assert m2[k] == m1[k], k


def test_job_cli_incremental_append(tmp_path):
    out = str(tmp_path / "out_i")
    ckpt = str(tmp_path / "ckpt_i")
    base = ["--output", out, "--checkpoint", ckpt, "--incremental",
            "--num-cpus", "4", "--shards", "2", "--entities", "300"]
    m1 = _run(["--synth-docs", "400", *base])
    parts1 = os.listdir(os.path.join(ckpt, "linked", "_lineage"))
    m2 = _run(["--synth-docs", "800", *base])
    parts2 = os.listdir(os.path.join(ckpt, "linked", "_lineage"))
    # the append added delta shards without touching the old ones
    assert len(parts1) == 2 and len(parts2) == 4
    assert set(parts1) <= set(parts2)
    assert m2["n_triples"] > m1["n_triples"] > 0
    # equal to a fresh batch run over the full corpus
    out2 = str(tmp_path / "out_b")
    mb = _run(["--synth-docs", "800", "--entities", "300",
               "--output", out2, "--num-cpus", "4"])
    assert m2["n_triples"] == mb["n_triples"]
    assert m2["n_edges"] == mb["n_edges"]
    assert m2["n_nodes"] == mb["n_nodes"]
