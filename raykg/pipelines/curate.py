"""End-to-end training-corpus curation flagship: Gopher quality rules ->
exact content dedup -> GPT-3-style train/test decontamination ->
deterministic split assignment, as ONE streaming Ray Data pipeline.

This is the composition a 100 TB pretraining-data run would actually
execute, built from the engine's individually-oracle-checked pieces
(``ops/text.gopher_rules``, ``ops/dedup.exact_dedup`` /
``ops/dedup.decontaminate`` semantics, ``ops/corpus.hash_split`` rule).
The whole composite is itself hash-checked against one DuckDB statement
(`__ray_entry__.oracle_sql()["curate_corpus"]`).

Scale shape — one pass over the corpus text, three bucketed exchanges:

1. quality filter: stateless ``map_batches`` (text never leaves a task
   that drops it);
2. exact dedup: ONE exchange keyed on sha256(text) — the per-batch
   combiner collapses duplicates before anything moves, the finalize
   keeps the min-doc_id winner per hash;
3. decontamination rides ONE union stream: every surviving doc emits a
   baseline row (``d|<id>``) and, per the decontaminate contract, its
   ``span``-token windows (``w|<window>``; val docs emit none). The
   window-keyed exchange marks train docs sharing a window with any
   test doc; the doc-keyed exchange drops them. Baseline rows pass
   through the first exchange as singleton groups, so the survivors
   stream is consumed exactly ONCE — no mid-pipeline materialize, no
   second scan of the text.

Exchange volume: stage 2 moves one (hash, id, text) partial per
distinct text per batch; stage 3 moves the window stream (the same
volume as ``decontaminate``) plus one register-sized row per doc.
Nothing is ever driver-resident.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raykg.functions.hashing import hex_threshold8, sha_hex
from raykg.functions.shuffle import bucketed_group_agg
from raykg.ops.text import _tokens, gopher_doc_stats, gopher_flags

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("split", pa.string())])


def curate_corpus(documents: rd.Dataset, span: int = 8,
                  val_frac: float = 0.1, test_frac: float = 0.1,
                  seed: int = 42, num_buckets: int = 1024,
                  **gopher_params) -> rd.Dataset:
    """(doc_id, split) for every document that survives curation:
    passes the Gopher rules, is the min-doc_id owner of its exact text,
    and (train docs only) shares no ``span``-token window with any
    surviving test document. Split follows the engine's deterministic
    sha rule, so it is stable under resharding and re-runs."""
    thr_val = hex_threshold8(val_frac)
    thr_test = hex_threshold8(val_frac + test_frac)

    def _split(doc_id: int) -> str:
        h = sha_hex(f"split|{seed}|{doc_id}")[:8]
        return "val" if h < thr_val else \
            "test" if h < thr_test else "train"

    # ---- stage 1: quality filter (stateless; also validates the id
    # space the stage-3 sentinel relies on) ----
    def quality(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        if ids and min(ids) < 0:
            raise ValueError("curate_corpus requires non-negative doc ids "
                             "(doc_id=-1 is the exchange sentinel)")
        keep = [gopher_flags(*gopher_doc_stats(s), **gopher_params)["keep"]
                for s in t.column("text").to_pylist()]
        return t.select(["doc_id", "text"]).filter(
            pa.array(keep, pa.bool_()))

    kept = documents.map_batches(quality, batch_format="pyarrow")

    # ---- stage 2: exact dedup, one exchange on sha256(text) ----
    # sentinel: text_hash "" cannot occur (sha hex is 64 chars)
    def dedup_combine(t: pa.Table) -> pa.Table:
        best: dict[str, tuple[int, str]] = {}
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            h = sha_hex(s)
            if h not in best or d < best[h][0]:
                best[h] = (d, s)
        best[""] = (-1, "")
        return pa.table({
            "text_hash": pa.array(list(best.keys()), pa.string()),
            "doc_id": pa.array([v[0] for v in best.values()], pa.int64()),
            "text": pa.array([v[1] for v in best.values()], pa.string()),
        })

    def dedup_finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("text_hash"), ""))
        idx = pc.sort_indices(t, sort_keys=[("text_hash", "ascending"),
                                            ("doc_id", "ascending")])
        t = t.take(idx)
        hashes = t.column("text_hash").to_pylist()
        first = pa.array([i == 0 or hashes[i] != hashes[i - 1]
                          for i in range(len(hashes))], pa.bool_())
        return t.filter(first).select(["doc_id", "text"])

    survivors = bucketed_group_agg(kept, dedup_combine, "text_hash",
                                   dedup_finalize, num_buckets=num_buckets)

    # ---- stage 3: decontamination on ONE union stream ----
    # row kinds by key prefix: "d|<id>" baseline (carries split),
    # "w|<window>" window occurrence (is_test marks test-side).
    # sentinel: key "" cannot occur (every real key has a prefix).
    def emit(t: pa.Table) -> pa.Table:
        keys, ids, splits, is_test = [""], [-1], [""], [0]
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            sp = _split(d)
            keys.append(f"d|{d}")
            ids.append(d)
            splits.append(sp)
            is_test.append(0)
            if sp == "val":
                continue
            toks = _tokens(s)
            flag = 1 if sp == "test" else 0
            seen: set[str] = set()
            for i in range(len(toks) - span + 1):
                w = " ".join(toks[i:i + span])
                if w not in seen:          # per-doc distinct windows
                    seen.add(w)
                    keys.append("w|" + w)
                    ids.append(d)
                    splits.append("")
                    is_test.append(flag)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "doc_id": pa.array(ids, pa.int64()),
                         "split": pa.array(splits, pa.string()),
                         "is_test": pa.array(is_test, pa.int8())})

    def leak_finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("key"), ""))
        kind_w = pc.starts_with(t.column("key"), "w|")
        base = t.filter(pc.invert(kind_w))
        out_id = base.column("doc_id").to_pylist()
        out_split = base.column("split").to_pylist()
        out_contam = [0] * len(out_id)
        wrows = t.filter(kind_w)
        if wrows.num_rows:
            g = wrows.group_by("key").aggregate([("is_test", "max")])
            leaked = set(g.filter(pc.equal(g.column("is_test_max"), 1))
                         .column("key").to_pylist())
            if leaked:
                tr = wrows.filter(pc.and_(
                    pc.equal(wrows.column("is_test"), 0),
                    pc.is_in(wrows.column("key"),
                             value_set=pa.array(leaked, pa.string()))))
                for d in set(tr.column("doc_id").to_pylist()):
                    out_id.append(d)
                    out_split.append("")
                    out_contam.append(1)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "split": pa.array(out_split, pa.string()),
                         "contam": pa.array(out_contam, pa.int8())})

    marked = bucketed_group_agg(survivors, emit, "key", leak_finalize,
                                num_buckets=num_buckets)

    # ---- stage 4: per-doc verdict, one exchange on doc_id ----
    # sentinel: doc_id -1 cannot occur (validated in stage 1); its
    # contam=1 makes it self-dropping even if it leaked through.
    def verdict_combine(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("split", "max"),
                                            ("contam", "max")])
        return pa.table({
            "doc_id": pa.concat_arrays(
                [g.column("doc_id").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "split": pa.concat_arrays(
                [g.column("split_max").combine_chunks(),
                 pa.array([""], pa.string())]),
            "contam": pa.concat_arrays(
                [g.column("contam_max").cast(pa.int8()).combine_chunks(),
                 pa.array([1], pa.int8())]),
        })

    def verdict_finalize(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("split", "max"),
                                            ("contam", "max")])
        ok = pc.and_(pc.equal(g.column("contam_max"), 0),
                     pc.not_equal(g.column("doc_id"), -1))
        g = g.filter(ok)
        return pa.table({"doc_id": g.column("doc_id"),
                         "split": g.column("split_max")},
                        schema=_OUT_SCHEMA)

    return bucketed_group_agg(marked, verdict_combine, "doc_id",
                              verdict_finalize, num_buckets=num_buckets)


def curate_and_write(documents: rd.Dataset, out_dir: str,
                     num_buckets: int = 1024, **curate_params) -> dict:
    """Run :func:`curate_corpus` and export the surviving documents WITH
    their text as hive-partitioned parquet (``out_dir/split=train/...``)
    — one part file per block inside each split, so a rerun can skip or
    re-emit individual partitions, and a trainer can mount each split
    directory independently.

    The split verdicts re-attach to the text with ONE doc_id-keyed
    tag-join exchange (verdict rows are register-sized relative to the
    text stream; a doc without a verdict row was dropped by curation
    and is filtered in the bucket — the anti-join falls out of the same
    exchange). Returns per-split row counts (vocabulary-sized)."""
    verdicts = curate_corpus(documents, num_buckets=num_buckets,
                             **curate_params)

    def doc_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": pa.concat_arrays(
                [t.column("doc_id").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "text": pa.concat_arrays(
                [t.column("text").combine_chunks(),
                 pa.array([""], pa.string())]),
            "split": pa.array([""] * (n + 1), pa.string()),
            "tag": pa.array([0] * n + [0], pa.int8())})

    def verdict_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": pa.concat_arrays(
                [t.column("doc_id").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "text": pa.array([""] * (n + 1), pa.string()),
            "split": pa.concat_arrays(
                [t.column("split").combine_chunks(),
                 pa.array([""], pa.string())]),
            "tag": pa.array([1] * n + [1], pa.int8())})

    def attach(t: pa.Table) -> pa.Table:
        tags = t.column("tag").combine_chunks()
        probe = t.filter(pc.equal(tags, 0))
        probe = probe.filter(pc.greater_equal(probe.column("doc_id"), 0))
        build = t.filter(pc.equal(tags, 1))
        build = build.filter(pc.greater_equal(build.column("doc_id"), 0))
        idx = pc.index_in(probe.column("doc_id"), build.column("doc_id"))
        split = pc.take(build.column("split"), idx)
        keep = pc.is_valid(split)
        return pa.table({"doc_id": probe.column("doc_id").filter(keep),
                         "text": probe.column("text").filter(keep),
                         "split": split.filter(keep)})

    from raykg.functions.shuffle import bucketed_group_agg as _bga
    joined = _bga(
        documents.select_columns(["doc_id", "text"])
        .map_batches(doc_rows, batch_format="pyarrow")
        .union(verdicts.map_batches(verdict_rows, batch_format="pyarrow")),
        lambda t: t, "doc_id", attach, num_buckets=num_buckets)
    joined.write_parquet(out_dir, partition_cols=["split"])

    try:
        out = rd.read_parquet(out_dir)
    except FileNotFoundError:
        # zero survivors: write_parquet emits nothing, not an empty dir
        return {}
    counts = dict(out.groupby("split").count().to_pandas()
                  .itertuples(index=False, name=None))
    return {str(k): int(v) for k, v in counts.items()}
