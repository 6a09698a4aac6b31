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


def _canon_df(ds, cols):
    df = ds.to_pandas()[cols]
    return df.sort_values(cols).reset_index(drop=True)


_TC = ["subj", "pred", "obj", "doc_id", "span_offset"]


def test_ingest_increment_equals_batch(ray_session, tmp_path):
    """Delta append (40 -> 80 docs, only the new range linked) must be
    bit-equal to a from-scratch batch build — including retroactive
    canonical-entity changes, which this config provably exercises (a doc
    < 40's triples differ between the 40- and 80-doc builds)."""
    import dataclasses

    from raykg.pipelines.kg import ingest_increment

    cfg80 = KGConfig(n_docs=80, n_entities=300, typo_rate=0.0,
                     batch_size=512, link_concurrency=2)
    cfg40 = dataclasses.replace(cfg80, n_docs=40)
    root = str(tmp_path / "incr")

    def rng(c):
        return lambda lo, hi: synth.sha_documents_dataset_range(lo, hi, c)

    r40 = ingest_increment(cfg40, root, docs_for_range=rng(cfg40),
                           n_shards=2)
    ckpt = LineageCheckpoint(f"{root}/linked")
    assert len(ckpt.committed_parts()) == 2

    r80 = ingest_increment(cfg80, root, docs_for_range=rng(cfg80),
                           n_shards=2)
    # only the delta was linked: 2 more shards, tiling [40, 80)
    parts = ckpt.committed_parts()
    assert len(parts) == 4
    assert [parts[p]["fingerprint"]["lo"] for p in sorted(parts)] == \
        [0, 20, 40, 60]

    batch = build_kg(synth.sha_documents_dataset(cfg80), cfg80)
    assert _canon_df(r80.triples, _TC).equals(_canon_df(batch.triples, _TC))
    ec = sorted(batch.edges.schema().names)
    assert _canon_df(r80.edges, ec).equals(_canon_df(batch.edges, ec))
    nc = ["uri", "label"]
    assert _canon_df(r80.nodes.select_columns(nc), nc).equals(
        _canon_df(batch.nodes.select_columns(nc), nc))

    # the retro-canonicalization path was actually exercised: some doc<40
    # triple changed its canonical endpoint after the append
    t40 = _canon_df(r40.triples, _TC)
    t80_old = _canon_df(r80.triples, _TC)
    t80_old = t80_old[t80_old.doc_id.isin(set(t40.doc_id))] \
        .reset_index(drop=True)
    assert not t40.equals(t80_old)

    # idempotent re-append: no new shards, equal output
    r80b = ingest_increment(cfg80, root, docs_for_range=rng(cfg80))
    assert len(ckpt.committed_parts()) == 4
    assert _canon_df(r80b.triples, _TC).equals(
        _canon_df(batch.triples, _TC))


def test_ingest_increment_guards(ray_session, tmp_path):
    """Shrinking the corpus, or appending with a different (possibly
    n_docs-derived) entity vocabulary, must fail loudly."""
    import dataclasses

    from raykg.pipelines.kg import ingest_increment

    cfg = KGConfig(n_docs=40, n_entities=300, typo_rate=0.0,
                   batch_size=512, link_concurrency=2)
    root = str(tmp_path / "incr_g")

    def rng(c):
        return lambda lo, hi: synth.sha_documents_dataset_range(lo, hi, c)

    assert ingest_increment(cfg, root, docs_for_range=rng(cfg), n_shards=2,
                            link_only=True) is None

    small = dataclasses.replace(cfg, n_docs=20)
    with pytest.raises(ValueError, match="appends only grow"):
        ingest_increment(small, root, docs_for_range=rng(small))

    # derived vocabulary (n_entities=0 -> max(64, n_docs // 8)) is hashed:
    # a config whose derived count differs is a different corpus
    other = dataclasses.replace(cfg, n_entities=301, n_docs=80)
    with pytest.raises(ValueError, match="different\n?.*corpus|different "
                       "corpus"):
        ingest_increment(other, root, docs_for_range=rng(other))


def test_batch_checkpoint_appendable(ray_session, tmp_path):
    """A checkpointed BATCH build (build_kg_resumable) is extendable by
    ingest_increment: batch shards carry the same corpus-size-free
    link_cfg fingerprint the append validates, so the bootstrap of an
    append chain can be either entry point. Appended output must equal a
    from-scratch build of the larger corpus."""
    import dataclasses

    from raykg.pipelines.kg import ingest_increment

    cfg160 = dataclasses.replace(CFG, n_entities=100)
    cfg240 = dataclasses.replace(cfg160, n_docs=240)
    root = str(tmp_path / "batch_append")

    build_kg_resumable(cfg160, root, n_shards=2)
    appended = ingest_increment(cfg240, root, n_shards=2)

    parts = LineageCheckpoint(f"{root}/linked").committed_parts()
    assert len(parts) == 4                      # 2 batch + 2 delta shards
    assert [parts[p]["fingerprint"]["lo"] for p in sorted(parts)] == \
        [0, 80, 160, 200]

    batch = build_kg(synth.documents_dataset(cfg240), cfg240)
    assert _triple_set(appended.triples) == _triple_set(batch.triples)
