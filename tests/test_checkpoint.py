"""Resume-after-kill test (SURVEY §5d / north rule): a run killed mid-job
restarts from per-partition lineage and produces the identical triple set,
without re-running committed shards."""

import pytest

from raykg import synth
from raykg.config import KGConfig
from raykg.pipelines.kg import build_kg, build_kg_resumable
from raykg.state.checkpoint import LineageCheckpoint, shard_bounds

CFG = KGConfig(n_docs=160, batch_size=64, link_concurrency=2)


def _triple_set(ds):
    return {(r["subj"], r["pred"], r["obj"], r["doc_id"], r["span_offset"])
            for r in ds.take_all()}


def test_shard_bounds():
    b = shard_bounds(10, 4)
    assert b == [(0, 3), (3, 6), (6, 9), (9, 10)]
    assert shard_bounds(2, 8) == [(0, 1), (1, 2)]


def test_resume_after_kill(ray_session, tmp_path):
    root = str(tmp_path / "ckpt")

    # crash after 2 of 4 shards committed
    with pytest.raises(RuntimeError, match="injected failure"):
        build_kg_resumable(CFG, root, n_shards=4, fail_after_shards=2)
    ckpt = LineageCheckpoint(f"{root}/linked")
    committed = ckpt.committed_parts()
    assert len(committed) == 2
    for m in committed.values():
        assert m["rows"] > 0 and m["counters"]["n_docs"] == 40

    # restart: skips the 2 committed shards, finishes the rest
    result = build_kg_resumable(CFG, root, n_shards=4)
    total = ckpt.total_counters()
    assert total["parts"] == 4 and total["n_docs"] == CFG.n_docs

    # identical triple set to a clean unsharded run
    clean = build_kg(synth.documents_dataset(CFG), CFG)
    assert _triple_set(result.triples) == _triple_set(clean.triples)


def test_stale_checkpoint_rejected(ray_session, tmp_path):
    """Resuming with changed bounds/config must fail loudly, not silently mix
    shards generated under the old parameters into the output."""
    root = str(tmp_path / "ckpt_stale")
    build_kg_resumable(CFG, root, n_shards=2)

    # changed doc count -> different shard bounds -> stale fingerprint
    with pytest.raises(ValueError, match="stale"):
        build_kg_resumable(KGConfig(n_docs=320, batch_size=64,
                                    link_concurrency=2), root, n_shards=2)
    # changed shard count on the same corpus -> also stale
    with pytest.raises(ValueError, match="stale"):
        build_kg_resumable(CFG, root, n_shards=4)
    # unchanged parameters -> clean skip
    result = build_kg_resumable(CFG, root, n_shards=2)
    assert result.triples.count() > 0


def test_build_kg_checkpoint_rerun_no_duplicates(ray_session, tmp_path):
    """Re-running build_kg against the SAME checkpoint dir (the crash-resume
    scenario) must not append duplicate part files / double the counts."""
    ckpt = str(tmp_path / "bk")
    cfg = KGConfig(n_docs=80, batch_size=64, link_concurrency=2)
    first = build_kg(synth.documents_dataset(cfg), cfg, checkpoint_dir=ckpt)
    n1 = first.triples.count()
    first_set = _triple_set(first.triples)
    second = build_kg(synth.documents_dataset(cfg), cfg, checkpoint_dir=ckpt)
    assert second.triples.count() == n1
    assert _triple_set(second.triples) == first_set


def test_triples_snapshot_resume(ray_session, tmp_path):
    """The canonical-rewrite output commits as its own checkpoint partition:
    a re-run skips the rewrite (manifest untouched), and a run killed during
    the rewrite (linked shards committed, snapshot absent) resumes without
    re-linking."""
    import shutil

    root = str(tmp_path / "ckpt3")
    r1 = build_kg_resumable(CFG, root, n_shards=2)
    t1 = _triple_set(r1.triples)
    tck = LineageCheckpoint(f"{root}/triples")
    m1 = tck.committed_parts()[0]
    assert m1["rows"] == len(t1)

    # clean re-run: linking AND rewrite both skip
    r2 = build_kg_resumable(CFG, root, n_shards=2)
    assert tck.committed_parts()[0]["committed_at"] == m1["committed_at"]
    assert _triple_set(r2.triples) == t1

    # crash-during-rewrite scenario: linked shards committed, snapshot not.
    # Resume must not re-run any linking shard.
    shutil.rmtree(f"{root}/triples")
    linked = LineageCheckpoint(f"{root}/linked")
    stamps = {p: m["committed_at"]
              for p, m in linked.committed_parts().items()}
    r3 = build_kg_resumable(CFG, root, n_shards=2)
    assert {p: m["committed_at"]
            for p, m in linked.committed_parts().items()} == stamps
    assert _triple_set(r3.triples) == t1


def test_skip_is_free(ray_session, tmp_path):
    root = str(tmp_path / "ckpt2")
    build_kg_resumable(CFG, root, n_shards=2)
    ckpt = LineageCheckpoint(f"{root}/linked")

    calls = []

    def boom(part):
        def make():
            calls.append(part)
            raise AssertionError("make_ds must not run for committed shards")
        return make

    for part in range(2):
        assert ckpt.run_partition(part, boom(part)) == "skipped"
    assert calls == []
