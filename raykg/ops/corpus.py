"""Corpus-level training-data operators: near-dup graph resolution,
deterministic dataset splitting, vocabulary statistics, and cross-source
contamination detection.

These extend the reference's operator surface with the operations a
100 TB training-data pipeline needs around the dedup/ANN core (task brief;
same role as ops/dedup.py / ops/text.py). Every operator here is
deterministic and SQL-exact — the sha256 hash family and the engine's
bucketed two-phase shuffle pattern keep a DuckDB oracle bit-for-bit.

Scale notes:
- ``neardup_components`` delegates to the vectorized min-label propagation
  in ops/graph.py (connected_components); near-dup components are shallow
  (clique-ish), so it converges in 2-3 rounds, each a fixed set of bucketed
  shuffles with no driver loop. ``max_iters`` caps the worst case and
  convergence is checked with a distributed count.
- ``neardup_keep`` is the one-shuffle industrial dedup filter: drop any doc
  with a smaller near-duplicate partner.
- ``top_ngrams`` pre-aggregates counts per batch before the exchange, then
  takes a global sorted top-k (only k rows reach the driver's consumer).
- ``cross_source_overlap`` groups text hashes, emits source pairs per
  duplicated hash, and aggregates pair counts — contamination between
  sources without any all-pairs scan.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raykg.functions.hashing import (fast_string_hashes, hex_threshold8,
                                     round_half_away, sha_hex)
from raykg.functions.shuffle import bucketed_group_agg
from raykg.ops.dedup import _grams, lsh_candidate_pairs
from raykg.ops.text import _tokens


# ---------------------------------------------------------------------------
# near-dup graph resolution
# ---------------------------------------------------------------------------


def neardup_keep(documents: rd.Dataset, num_buckets: int = 1024,
                 **lsh_kwargs) -> rd.Dataset:
    """Near-dup dedup filter: (doc_id) for every doc that has NO smaller
    near-duplicate partner (pairs from MinHash-LSH at the configured
    threshold). The standard 'drop later duplicates' policy: transitive
    chains are handled because any doc with a smaller partner is dropped.

    Fully distributed anti-set: corpus ids (tag 0) union pair ``doc_b`` ids
    (tag 1) flow through ONE bucketed tag-max group keyed on the int
    doc_id — at real dedup rates the drop set is a large fraction of the
    corpus, so it must never be collected to or broadcast from the driver."""
    pairs = lsh_candidate_pairs(documents, **lsh_kwargs)

    def corpus_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        # -1 is the internal dropped-tag sentinel below; a corpus containing
        # negative ids would silently collide with it and lose rows
        if t.num_rows and pc.min(ids).as_py() < 0:
            raise ValueError(
                "neardup_keep requires non-negative doc ids (-1 is the "
                "internal dropped-tag sentinel)")
        # sentinel -1 tagged DROPPED keeps zero-row blocks typed and can
        # never surface in the keep output
        return pa.table({
            "doc_id": pa.concat_arrays(
                [ids.combine_chunks()
                 if isinstance(ids, pa.ChunkedArray) else ids,
                 pa.array([-1], pa.int64())]),
            "dropped": pa.array([0] * t.num_rows + [1], pa.int8())})

    def drop_rows(t: pa.Table) -> pa.Table:
        # sentinel -1 per block (zero-row map outputs turn schema-less);
        # it carries tag 1 and is filtered with every other dropped id
        ids = pa.concat_arrays([
            pc.unique(pc.cast(t.column("doc_b").combine_chunks(),
                              pa.int64())),
            pa.array([-1], pa.int64())])
        return pa.table({"doc_id": ids,
                         "dropped": pa.array([1] * len(ids), pa.int8())})

    tagged = documents.select_columns(["doc_id"]) \
        .map_batches(corpus_rows, batch_format="pyarrow") \
        .union(pairs.map_batches(drop_rows, batch_format="pyarrow"))

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("dropped", "max")])
        return pa.table({"doc_id": g.filter(
            pc.equal(g.column("dropped_max"), 0)).column("doc_id")})

    return bucketed_group_agg(tagged, lambda t: t, "doc_id", fin,
                              num_buckets=num_buckets)


def neardup_components(documents: rd.Dataset, max_iters: int = 32,
                       algorithm: str = "propagation",
                       **lsh_kwargs) -> rd.Dataset:
    """Connected components over the near-dup pair graph:
    (doc_id, component) where component = min doc_id reachable via
    candidate pairs. Docs with no near-dup partner are their own component
    and are omitted (matching the SQL oracle's pair-node universe).

    ``algorithm="propagation"`` delegates to
    :func:`raykg.ops.graph.connected_components` — fully vectorized
    min-label propagation (three bucketed exchanges per round,
    ``searchsorted`` label attach, ``minimum.reduceat`` edge-min; no
    per-row Python anywhere), with a distributed fixpoint count and a
    logged warning on non-convergence. O(diameter) rounds — right for
    near-dup graphs, whose components are clique-ish and converge in 2-3
    rounds; ``max_iters`` is a runaway bound.

    ``algorithm="star"`` delegates to
    :func:`raykg.ops.graph.connected_components_star` — alternating
    large-star/small-star contraction, O(log^2 n) rounds independent of
    diameter; the scale path for long-chain graphs. Both produce
    identical output (same min-id component convention).

    Pair identity travels as two int64 columns either way, so doc ids
    only need to be non-negative (no 2^31 packing ceiling)."""
    from raykg.ops.graph import connected_components, \
        connected_components_star

    pairs = lsh_candidate_pairs(documents, **lsh_kwargs) \
        .select_columns(["doc_a", "doc_b"])

    def as_edges(t: pa.Table) -> pa.Table:
        return pa.table({"src": t.column("doc_a"),
                         "dst": t.column("doc_b")})

    algos = {"propagation": connected_components,
             "star": connected_components_star}
    if algorithm not in algos:
        raise ValueError(
            f"neardup_components: unknown algorithm {algorithm!r} "
            f"(valid: {sorted(algos)})")
    cc = algos[algorithm]
    comp = cc(pairs.map_batches(as_edges, batch_format="pyarrow"),
              max_iters=max_iters)
    return comp.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "component": t.column("component")}),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic split / vocabulary / contamination
# ---------------------------------------------------------------------------


def hash_split(documents: rd.Dataset, val_frac: float = 0.1,
               test_frac: float = 0.1, seed: int = 42) -> rd.Dataset:
    """(doc_id, split): deterministic train/val/test assignment from
    sha256('split|<seed>|<doc_id>') — stable under any repartitioning,
    resharding or re-run, the property a training pipeline needs so a doc
    never migrates between splits."""
    thr_val = hex_threshold8(val_frac)
    thr_test = hex_threshold8(val_frac + test_frac)

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        hs = [sha_hex(f"split|{seed}|{d}")[:8] for d in ids]
        split = ["val" if h < thr_val else
                 "test" if h < thr_test else "train" for h in hs]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "split": pa.array(split, pa.string())})

    return documents.select_columns(["doc_id"]).map_batches(
        assign, batch_format="pyarrow")


def bottomk_sample(documents: rd.Dataset, k: int = 50,
                   seed: int = 42) -> rd.Dataset:
    """(doc_id, rank): a deterministic uniform sample of exactly ``k``
    docs — the k smallest sha256('sample|<seed>|<doc_id>') ranks
    (bottom-k sketch; Cohen & Kaplan, "Summarizing data using bottom-k
    sketches", PODC'07). Equivalent in distribution to a uniform
    without-replacement sample, but fully deterministic, mergeable, and
    stable under repartitioning — unlike a classic reservoir, two runs
    (or two shards) always agree, so a training pipeline can re-draw the
    exact sample after a resume.

    Scale path: each batch keeps only its local bottom-k, so the final
    sort sees #blocks x k rows, never the corpus. The driver receives k
    rows."""

    def local_bottomk(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        ranks = [sha_hex(f"sample|{seed}|{d}")[:16] for d in ids]
        order = sorted(range(len(ranks)), key=ranks.__getitem__)[:k]
        return pa.table({
            "doc_id": pa.array([ids[i] for i in order], pa.int64()),
            "sample_rank": pa.array([ranks[i] for i in order],
                                    pa.string())})

    partials = documents.select_columns(["doc_id"]).map_batches(
        local_bottomk, batch_format="pyarrow")
    return partials.sort("sample_rank").limit(k)


def vocab_ids(documents: rd.Dataset,
              num_buckets: int = 256) -> rd.Dataset:
    """(tok, id): dense consecutive ids 0..V-1 over the corpus's
    distinct tokens — the vocabulary-construction step of a tokenizer
    build, i.e. distributed zipWithIndex without a global sort or a
    driver-resident vocabulary. Ordering contract (what makes the id
    assignment deterministic AND SQL-replicable): id = rank of the
    token in (bucket, tok) order, bucket = first-8-sha-hex(tok) %
    num_buckets — so DuckDB's ``row_number() OVER (ORDER BY bucket,
    tok) - 1`` reproduces every id bit-for-bit.

    Scale shape: per-batch distinct thins the ONE token-keyed exchange;
    each bucket enumerates its sorted distinct tokens locally; only the
    ``num_buckets`` bucket counts visit the driver to become exclusive
    offsets (broadcast back via closure); a final stateless map adds
    offset + local position. Nothing vocabulary-sized ever lands on the
    driver."""

    def tok_rows(t: pa.Table) -> pa.Table:
        toks: set = set()
        for s in t.column("text").to_pylist():
            toks.update(_tokens(s))
        out = sorted(toks)
        bucket = [int(sha_hex(tok)[:8], 16) % num_buckets for tok in out]
        # sentinel bucket -1 keeps zero-row blocks typed; dropped below
        return pa.table({
            "bucket": pa.array(bucket + [-1], pa.int32()),
            "tok": pa.array(out + [""], pa.string())})

    return _dense_ids(
        documents.select_columns(["text"])
        .map_batches(tok_rows, batch_format="pyarrow"),
        "tok", num_buckets)


def encode_documents(documents: rd.Dataset,
                     num_buckets: int = 256) -> rd.Dataset:
    """(doc_id, ids, n_tokens): every document encoded as its
    '_'-joined dense vocabulary id sequence (token order preserved) —
    the corpus-encoding half of the tokenizer path whose vocabulary
    half is :func:`vocab_ids`. Docs with no tokens are omitted.

    Broadcast-free: the vocabulary never ships to workers as a whole
    and the text never rides a shuffle. Two exchanges: (1) token-keyed
    tag-join of the (tok, doc, pos) occurrence stream against the
    (tok, id) vocab stream (vectorized ``index_in``); (2) doc-keyed
    ordered reassembly (one lexsort per bucket). Occurrences cross the
    wire twice as register-sized rows — the canonical encode shape."""
    import numpy as np

    vocab = vocab_ids(documents, num_buckets=num_buckets)

    def occ_rows(t: pa.Table) -> pa.Table:
        docs, toks, pos = [-1], [""], [0]
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            for i, tok in enumerate(_tokens(s)):
                docs.append(d)
                toks.append(tok)
                pos.append(i)
        return pa.table({"tok": pa.array(toks, pa.string()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "vid": pa.array([-1] * len(docs), pa.int64()),
                         "tag": pa.array([0] * len(docs), pa.int8())})

    def vocab_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "tok": pa.concat_arrays([t.column("tok").combine_chunks(),
                                     pa.array([""], pa.string())]),
            "doc_id": pa.array([-1] * (n + 1), pa.int64()),
            "pos": pa.array([0] * (n + 1), pa.int64()),
            "vid": pa.concat_arrays([t.column("id").combine_chunks(),
                                     pa.array([-1], pa.int64())]),
            "tag": pa.array([1] * (n + 1), pa.int8())})

    def attach(t: pa.Table) -> pa.Table:
        tags = t.column("tag").combine_chunks()
        build = t.filter(pc.equal(tags, 1))
        probe = t.filter(pc.equal(tags, 0))
        probe = probe.filter(pc.greater_equal(probe.column("doc_id"), 0))
        idx = pc.index_in(probe.column("tok"),
                          build.column("tok").combine_chunks())
        vid = pc.take(build.column("vid").combine_chunks(), idx)
        if isinstance(vid, pa.ChunkedArray):
            vid = vid.combine_chunks()
        # every occurrence's token is in the vocab by construction
        return pa.table({
            "doc_id": pa.concat_arrays(
                [probe.column("doc_id").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "pos": pa.concat_arrays(
                [probe.column("pos").combine_chunks(),
                 pa.array([0], pa.int64())]),
            "vid": pa.concat_arrays([vid, pa.array([-1], pa.int64())])})

    joined = bucketed_group_agg(
        documents.select_columns(["doc_id", "text"])
        .map_batches(occ_rows, batch_format="pyarrow")
        .union(vocab.map_batches(vocab_rows, batch_format="pyarrow")),
        lambda t: t, "tok", attach, num_buckets=num_buckets)

    def rebuild(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        real = d >= 0
        d = d[real]
        if not len(d):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "ids": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        p = t.column("pos").to_numpy(zero_copy_only=False)[real]
        v = t.column("vid").to_numpy(zero_copy_only=False)[real]
        order = np.lexsort((p, d))
        d, v = d[order], v[order]
        bounds = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        ends = np.concatenate([bounds[1:], [len(d)]])
        out_d, out_s, out_n = [], [], []
        for s, e in zip(bounds, ends):
            out_d.append(int(d[s]))
            out_s.append("_".join(str(int(x)) for x in v[s:e]))
            out_n.append(int(e - s))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "ids": pa.array(out_s, pa.string()),
                         "n_tokens": pa.array(out_n, pa.int64())})

    return bucketed_group_agg(joined, lambda t: t, "doc_id", rebuild,
                              num_buckets=num_buckets)


def source_similarity_sketch(documents: rd.Dataset, k: int = 256,
                             num_buckets: int = 64) -> pa.Table:
    """(source_a, source_b, est_jaccard, k_used): pairwise LEXICAL
    similarity between sources, estimated from per-source bottom-k
    sketches of the distinct-token sets (Cohen & Kaplan PODC'07 — the
    same sketch family as :func:`bottomk_sample`, here used as a
    set-similarity estimator): J_hat = |{r in bottom-k(S_a u S_b):
    r in S_a and r in S_b}| / k_used, k_used = min(k, |merged|),
    membership judged against the sketches (the standard estimator).
    Rounded to 6. The cheap way to compare two 10 TB slices without
    touching their cross product.

    Scale shape: each batch ships its local per-source bottom-k of
    sha token ranks (k x sources rows per batch, never the vocabulary);
    ONE source-keyed exchange merges them; the pair arithmetic runs on
    the driver over the sketch table (k x sources rows — register-
    sized, like cross_source_overlap's output)."""

    def local(t: pa.Table) -> pa.Table:
        per: dict[str, set] = {}
        memo: dict[str, str] = {}
        for s, txt in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            bucket = per.setdefault(s, set())
            for tok in _tokens(txt):
                r = memo.get(tok)
                if r is None:
                    r = memo[tok] = sha_hex(tok)[:16]
                bucket.add(r)
        # sentinel source "": real sources are non-empty
        out_s, out_r = [""], [""]
        for s, ranks in per.items():
            for r in sorted(ranks)[:k]:
                out_s.append(s)
                out_r.append(r)
        return pa.table({"source": pa.array(out_s, pa.string()),
                         "r": pa.array(out_r, pa.string())})

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("source"), ""))
        t = t.take(pc.sort_indices(t, sort_keys=[("source", "ascending"),
                                                 ("r", "ascending")]))
        srcs = t.column("source").to_pylist()
        rs = t.column("r").to_pylist()
        out_s, out_r = [""], [""]
        last_s, last_r, n = None, None, 0
        for s, r in zip(srcs, rs):
            if s != last_s:
                last_s, last_r, n = s, None, 0
            if r == last_r:              # cross-batch duplicate rank
                continue
            last_r = r
            n += 1
            if n <= k:
                out_s.append(s)
                out_r.append(r)
        return pa.table({"source": pa.array(out_s, pa.string()),
                         "r": pa.array(out_r, pa.string())})

    sk = bucketed_group_agg(
        documents.select_columns(["source", "text"]).map_batches(
            local, batch_format="pyarrow"),
        lambda t: t, "source", fin, num_buckets=num_buckets)

    sketches: dict[str, list] = {}
    for row in sk.take_all():                 # k x sources rows
        if row["source"]:
            sketches.setdefault(row["source"], []).append(row["r"])
    names = sorted(sketches)
    a_col, b_col, j_col, k_col = [], [], [], []
    for i, a in enumerate(names):
        sa = set(sketches[a])
        for b in names[i + 1:]:
            sb = set(sketches[b])
            merged = sorted(sa | sb)[:k]
            k_used = len(merged)
            inter = sum(1 for r in merged if r in sa and r in sb)
            a_col.append(a)
            b_col.append(b)
            j_col.append(round_half_away(inter / k_used, 6)
                         if k_used else 0.0)
            k_col.append(k_used)
    return pa.table({"source_a": pa.array(a_col, pa.string()),
                     "source_b": pa.array(b_col, pa.string()),
                     "est_jaccard": pa.array(j_col, pa.float64()),
                     "k_used": pa.array(k_col, pa.int64())})


def pack_sequences(documents: rd.Dataset, target_tokens: int = 256,
                   bucket_docs: int = 4096) -> rd.Dataset:
    """Sequence packing for training: assign each doc (in doc_id order) to a
    token bin of ~``target_tokens`` via the cumulative-offset rule
    ``bin = tokens_before_this_doc // target_tokens`` — the standard
    streaming approximation of greedy packing (a doc may straddle a bin
    boundary; no bin assignment ever depends on a later doc).
    Output: (doc_id, n_tokens, bin).

    Distributed prefix sum, no global sort: docs range-bucket by
    ``doc_id // bucket_docs``; per-bucket token sums (one small aggregate,
    bucket-count-sized) turn into exclusive offsets broadcast to a
    per-bucket pass that sorts WITHIN its bucket and cumsums locally.
    Envelope: the offset table is ~1 row per ``bucket_docs`` docs."""
    import numpy as np

    import ray

    def tok_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        n = pa.array([len(_tokens(s))
                      for s in t.column("text").to_pylist()], pa.int64())
        return pa.table({
            "doc_id": ids,
            "n_tokens": n,
            "bucket": pc.cast(pc.divide(ids, bucket_docs), pa.int64()),
        })

    # narrow (3 int cols) and consumed twice -> pin it
    tok = documents.select_columns(["doc_id", "text"]).map_batches(
        tok_rows, batch_format="pyarrow").materialize()

    def bucket_sums(t: pa.Table) -> pa.Table:
        g = t.group_by("bucket").aggregate([("n_tokens", "sum")])
        return pa.table({"bucket": g.column("bucket"),
                         "s": g.column("n_tokens_sum")})

    sums: dict[int, int] = {}
    for row in tok.map_batches(bucket_sums,
                               batch_format="pyarrow").take_all():
        sums[row["bucket"]] = sums.get(row["bucket"], 0) + row["s"]
    offsets = {}
    acc = 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    off_ref = ray.put(offsets)

    def finalize(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref) if isinstance(off_ref, ray.ObjectRef) \
            else off_ref
        t = t.sort_by([("doc_id", "ascending")])
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        before = np.concatenate(([0], np.cumsum(n)[:-1])) \
            + off[t.column("bucket")[0].as_py()]
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": t.column("n_tokens"),
            "bin": pa.array(before // target_tokens, pa.int64()),
        })

    return tok.groupby("bucket").map_groups(finalize, batch_format="pyarrow")


def stratified_sample(documents: rd.Dataset, rates: dict[str, float],
                      default_rate: float = 1.0,
                      seed: int = 42) -> rd.Dataset:
    """(doc_id, source) for docs surviving a per-source deterministic
    sampling rate (corpus mixing/reweighting): keep iff
    sha256('ssamp|seed|doc_id')[:8] < hex(rate(source) * 2^32). Stable
    under repartitioning and re-runs, like hash_split."""

    # thresholds precomputed per distinct source (per-row work = one sha)
    thr = {s: hex_threshold8(r) for s, r in rates.items()}
    thr_default = hex_threshold8(default_rate)

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        mask = [sha_hex(f"ssamp|{seed}|{d}")[:8] < thr.get(s, thr_default)
                for d, s in zip(ids, srcs)]
        t = t.filter(pa.array(mask, pa.bool_()))
        return pa.table({"doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                         "source": t.column("source")})

    return documents.select_columns(["doc_id", "source"]).map_batches(
        keep, batch_format="pyarrow")


def weighted_sample(documents: rd.Dataset, k: int = 20,
                    weight_col: str = "n_chars", group_col: str = "source",
                    seed: int = 42, num_buckets: int = 64) -> rd.Dataset:
    """(source, doc_id, es_key, rk): a weighted without-replacement
    sample of ``k`` docs per group — Efraimidis & Spirakis 2006
    ("Weighted random sampling with a reservoir"), where each doc draws
    u = sha-uniform and the k largest exponential keys ln(u)/w win, so
    selection probability is proportional to the weight. The
    quality-weighted subsampling step of corpus curation, deterministic
    and reshard/resume-stable like :func:`bottomk_sample`.

    Ranking contract (shared with the SQL twin): es_key = ln((h+1)/2^32)
    / w rounded to 6, h = first 8 sha hex digits of 'ws|<seed>|<doc_id>';
    order es_key DESC then doc_id ASC; rows with weight <= 0 (or null)
    are excluded. ln() is libm double on both sides — the same float
    parity contract PMI/bigram scoring already rely on.

    Scale shape: each batch keeps only its local per-group top-k, so the
    ONE group-keyed exchange carries at most k x groups rows per batch
    (never the corpus); the finalize re-ranks k x groups x batches
    partials per bucket."""
    import math

    def local_topk(t: pa.Table) -> pa.Table:
        per_group: dict[str, list] = {}
        for d, w, g in zip(t.column("doc_id").to_pylist(),
                           t.column(weight_col).to_pylist(),
                           t.column(group_col).to_pylist()):
            if w is None or w <= 0:
                continue
            u = (int(sha_hex(f"ws|{seed}|{d}")[:8], 16) + 1) / 4294967296.0
            per_group.setdefault(g, []).append(
                (round_half_away(math.log(u) / w, 6), d))
        # sentinel row: doc_id -1 keeps zero-row blocks typed (shuffle
        # convention); dropped in the finalize
        out_g, out_d, out_k = [""], [-1], [0.0]
        for g, lst in per_group.items():
            lst.sort(key=lambda p: (-p[0], p[1]))
            for key, d in lst[:k]:
                out_g.append(g)
                out_d.append(d)
                out_k.append(key)
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "es_key": pa.array(out_k, pa.float64())})

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        t = t.take(pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"),
                          ("es_key", "descending"),
                          ("doc_id", "ascending")]))
        groups = t.column(group_col).to_pylist()
        rk, keep, last, n = [], [], None, 0
        for g in groups:              # partials-sized, k x groups x batches
            if g != last:
                last, n = g, 0
            n += 1
            rk.append(n)
            keep.append(n <= k)
        t = t.append_column("rk", pa.array(rk, pa.int64()))
        return t.filter(pa.array(keep, pa.bool_()))

    stream = documents.select_columns(["doc_id", weight_col, group_col])
    return bucketed_group_agg(stream, local_topk, group_col, finalize,
                              num_buckets=num_buckets)


def source_cap(documents: rd.Dataset, k: int = 10, seed: int = 42,
               group_col: str = "source",
               num_buckets: int = 64) -> rd.Dataset:
    """(source, doc_id, cap_rank, rn): at most ``k`` docs per source —
    the per-domain document cap of C4/RefinedWeb-style web curation,
    bounding any single domain's share of the corpus before mixing. The
    survivors per source are the k smallest
    sha256('cap|<seed>|<doc_id>')[:16] ranks (ties -> smaller doc_id),
    so — like :func:`bottomk_sample`, whose rank family this is — the
    cap is deterministic, reshard/resume-stable, and mergeable: re-capping
    the union of two shards' capped outputs yields exactly the one-pass
    result, which is what lets an incremental crawl re-apply the cap over
    old + new docs without rereading uncapped history.

    Scale shape: each batch keeps only its local per-source bottom-k, so
    the ONE source-keyed exchange carries at most k x sources rows per
    batch, never the corpus; the finalize re-ranks k x sources x batches
    partials per bucket. A hot domain cannot skew the exchange — its
    volume is bounded by k x batches regardless of its corpus share."""

    def local_bottomk(t: pa.Table) -> pa.Table:
        per_group: dict[str, list] = {}
        for d, g in zip(t.column("doc_id").to_pylist(),
                        t.column(group_col).to_pylist()):
            per_group.setdefault(g, []).append(
                (sha_hex(f"cap|{seed}|{d}")[:16], d))
        # sentinel row: doc_id -1 keeps zero-row blocks typed (shuffle
        # convention); dropped in the finalize
        out_g, out_d, out_r = [""], [-1], [""]
        for g, lst in per_group.items():
            lst.sort()
            for rank, d in lst[:k]:
                out_g.append(g)
                out_d.append(d)
                out_r.append(rank)
        return pa.table({group_col: pa.array(out_g, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "cap_rank": pa.array(out_r, pa.string())})

    def finalize(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        t = t.take(pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"),
                          ("cap_rank", "ascending"),
                          ("doc_id", "ascending")]))
        groups = t.column(group_col).to_pylist()
        rn, keep, last, n = [], [], None, 0
        for g in groups:              # partials-sized, k x groups x batches
            if g != last:
                last, n = g, 0
            n += 1
            rn.append(n)
            keep.append(n <= k)
        t = t.append_column("rn", pa.array(rn, pa.int64()))
        return t.filter(pa.array(keep, pa.bool_()))

    stream = documents.select_columns(["doc_id", group_col])
    return bucketed_group_agg(stream, local_bottomk, group_col, finalize,
                              num_buckets=num_buckets)


def top_ngrams(documents: rd.Dataset, k: int = 20,
               gram: int = 2) -> rd.Dataset:
    """Global top-k token n-grams by count (ties -> lexicographically
    smaller gram). Per-batch counting -> bucketed global aggregation ->
    tiny sorted top-k; only k rows leave the aggregate."""
    from collections import Counter

    def count_batch(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update(_grams(s, gram))
        # sentinel "" keeps zero-row blocks typed (all-empty-text batches
        # yield no grams); grams are never "" — same convention as
        # freq_spectrum's count_batch
        return pa.table({
            "gram": pa.array(list(c.keys()) + [""], pa.string()),
            "n": pa.array(list(c.values()) + [0], pa.int64())})

    def fin(t: pa.Table) -> pa.Table:
        g = t.filter(pc.not_equal(t.column("gram"), "")) \
            .group_by("gram").aggregate([("n", "sum")])
        # re-emit the sentinel (an all-sentinel bucket must stay typed);
        # dropped just before the top-k sort
        return pa.table({
            "gram": pa.concat_arrays(
                [g.column("gram").combine_chunks(),
                 pa.array([""], pa.string())]),
            "n": pa.concat_arrays(
                [g.column("n_sum").combine_chunks(),
                 pa.array([0], pa.int64())])})

    totals = bucketed_group_agg(
        documents.select_columns(["text"]).map_batches(
            count_batch, batch_format="pyarrow"),
        lambda t: t, "gram", fin)
    return totals.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("gram"), "")),
        batch_format="pyarrow") \
        .sort(["n", "gram"], descending=[True, False]).limit(k)


def freq_spectrum(documents: rd.Dataset,
                  num_buckets: int = 1024) -> rd.Dataset:
    """(freq, n_tokens): the corpus token frequency spectrum — how many
    DISTINCT tokens occur exactly ``freq`` times (the count-of-counts /
    Zipf profile that calibrates tokenizer vocab sizes, Good-Turing
    smoothing and rare-token cutoffs).

    Two bucketed exchanges, both vocabulary-sized or smaller: token ->
    total count (per-batch Counter combiner), then the per-bucket
    count histograms re-key on freq (a second, spectrum-sized exchange
    — distinct freq values grow ~sqrt(vocab), far below vocab). Nothing
    driver-resident."""
    from collections import Counter

    def count_batch(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update(_tokens(s))
        # sentinel "" keeps zero-row blocks typed; tokens are never ""
        return pa.table({
            "tok": pa.array(list(c.keys()) + [""], pa.string()),
            "n": pa.array(list(c.values()) + [0], pa.int64())})

    def per_token(t: pa.Table) -> pa.Table:
        g = t.filter(pc.not_equal(t.column("tok"), "")) \
            .group_by("tok").aggregate([("n", "sum")])
        h = g.group_by("n_sum").aggregate([("tok", "count")])
        # sentinel freq -1: real freqs are >= 1
        return pa.table({
            "freq": pa.concat_arrays(
                [h.column("n_sum").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "n_tokens": pa.concat_arrays(
                [pc.cast(h.column("tok_count"), pa.int64()).combine_chunks(),
                 pa.array([0], pa.int64())])})

    counted = bucketed_group_agg(
        documents.select_columns(["text"]).map_batches(
            count_batch, batch_format="pyarrow"),
        lambda t: t, "tok", per_token, num_buckets=num_buckets)

    def spectrum_fin(t: pa.Table) -> pa.Table:
        g = t.filter(pc.greater(t.column("freq"), 0)) \
            .group_by("freq").aggregate([("n_tokens", "sum")])
        return pa.table({"freq": g.column("freq"),
                         "n_tokens": g.column("n_tokens_sum")})

    return bucketed_group_agg(counted, lambda t: t, "freq", spectrum_fin,
                              num_buckets=max(64, num_buckets // 16))


def corpus_diff(old: rd.Dataset, new: rd.Dataset,
                num_buckets: int = 1024) -> rd.Dataset:
    """(doc_id, status): classify every document that differs between
    two corpus snapshots — ``added`` (only in ``new``), ``removed``
    (only in ``old``), ``changed`` (in both, content hash differs).
    Unchanged docs (the overwhelming class between incremental crawls)
    never appear in the output, so the result is delta-sized.

    ONE doc_id-keyed tag-join exchange: each side ships (doc_id,
    sha256(text), side) — register-sized rows, the text itself never
    crosses the wire — and the per-bucket finalize classifies with two
    vectorized ``index_in`` probes. Requires doc_id unique per side."""
    import numpy as np

    def side_rows(side: int):
        def rows(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_pylist()
            hs = [sha_hex(s) for s in t.column("text").to_pylist()]
            # sentinel doc_id -1 keeps zero-row blocks typed; real ids
            # must be non-negative (checked in the finalize)
            return pa.table({
                "doc_id": pa.array(ids + [-1], pa.int64()),
                "h": pa.array(hs + [""], pa.string()),
                "side": pa.array([side] * (len(ids) + 1), pa.int8())})
        return rows

    unioned = old.select_columns(["doc_id", "text"]) \
        .map_batches(side_rows(0), batch_format="pyarrow") \
        .union(new.select_columns(["doc_id", "text"])
               .map_batches(side_rows(1), batch_format="pyarrow"))

    def classify(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        sides = t.column("side").combine_chunks()
        a = t.filter(pc.equal(sides, 0))
        b = t.filter(pc.equal(sides, 1))
        a_ids = a.column("doc_id").combine_chunks()
        b_ids = b.column("doc_id").combine_chunks()
        ia = pc.index_in(b_ids, a_ids)          # new -> old position
        ib = pc.index_in(a_ids, b_ids)          # old -> new position
        added = b_ids.filter(pc.is_null(ia))
        removed = a_ids.filter(pc.is_null(ib))
        both = pc.is_valid(ia)
        old_h = pc.take(a.column("h").combine_chunks(), ia)
        changed = b_ids.filter(pc.and_kleene(
            both, pc.not_equal(b.column("h").combine_chunks(), old_h)))
        ids = pa.concat_arrays([added.combine_chunks()
                                if isinstance(added, pa.ChunkedArray)
                                else added,
                                removed.combine_chunks()
                                if isinstance(removed, pa.ChunkedArray)
                                else removed,
                                changed.combine_chunks()
                                if isinstance(changed, pa.ChunkedArray)
                                else changed])
        status = (["added"] * len(added) + ["removed"] * len(removed)
                  + ["changed"] * len(changed))
        return pa.table({"doc_id": ids,
                         "status": pa.array(status, pa.string())})

    return bucketed_group_agg(unioned, lambda t: t, "doc_id", classify,
                              num_buckets=num_buckets)


def source_unigram_kl(documents: rd.Dataset,
                      num_buckets: int = 1024) -> rd.Dataset:
    """(source, kl_bits, n_tokens): KL divergence (bits) of each
    source's unigram distribution from the corpus-wide distribution —
    the domain-shift / data-mixture diagnostic (which slice of the mix
    looks least like the blend). KL(p_s || p) = sum_t p_s(t) *
    log2(p_s(t) / p(t)); every p_s(t) > 0 implies p(t) > 0, so the sum
    is always finite. kl_bits rounded to 6 (the float-parity contract
    PMI/bigram scoring share with DuckDB).

    Scale shape: per-source token totals come from ONE vocabulary-sized
    aggregate (a handful of rows — the temperature_mix precedent) and
    ride into the closures; the real work is ONE token-keyed exchange
    of per-batch (source, tok) count partials whose finalize computes
    each token's global count and per-source contributions locally,
    emitting source-sized partial sums. A final source-keyed aggregate
    is register-sized. Nothing vocabulary-sized is broadcast."""
    from collections import Counter

    import numpy as np

    def count_batch(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s, txt in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            for tok in _tokens(txt):
                c[(s, tok)] += 1
        # sentinel tok "": tokens are never empty
        return pa.table({
            "source": pa.array([k[0] for k in c] + [""], pa.string()),
            "tok": pa.array([k[1] for k in c] + [""], pa.string()),
            "n": pa.array(list(c.values()) + [0], pa.int64())})

    # materialized once: pass A and the token exchange both consume it —
    # without the pin the tokenize pass would run twice (PMI discipline)
    counted = documents.select_columns(["source", "text"]).map_batches(
        count_batch, batch_format="pyarrow").materialize()

    # pass A: per-source totals via small_key_agg (per-batch source-level
    # pre-aggregate, register-sized remainder on the driver) — a raw
    # groupby("source") over the vocabulary x batches partials table is
    # the low-cardinality sort-shuffle pathology shuffle.py measures at
    # ~6x (the temperature_mix precedent this docstring promises)
    from raykg.ops.relational import small_key_agg

    def src_sums(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("n", "sum")])
        return pa.table({"source": g.column("source"),
                         "n": g.column("n_sum")})

    tot_tbl = small_key_agg(counted.map_batches(
        src_sums, batch_format="pyarrow"), src_sums)
    totals = {s: int(n) for s, n in
              zip(tot_tbl.column("source").to_pylist(),
                  tot_tbl.column("n").to_pylist()) if s}
    grand = float(sum(totals.values()))
    if not grand:
        return rd.from_arrow(pa.table({
            "source": pa.array([], pa.string()),
            "kl_bits": pa.array([], pa.float64()),
            "n_tokens": pa.array([], pa.int64())}))

    # pass B: token-keyed exchange; per-bucket contribution sums
    def contrib(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("tok"), ""))
        g = t.group_by(["tok", "source"]).aggregate([("n", "sum")])
        toks = g.column("tok").to_pylist()
        srcs = g.column("source").to_pylist()
        ns = np.asarray(g.column("n_sum").to_pylist(), np.float64)
        ct = Counter()
        for tok, n in zip(toks, ns):
            ct[tok] += n
        out: dict[str, float] = {}
        for tok, s, n in zip(toks, srcs, ns):
            ps = n / totals[s]
            p = ct[tok] / grand
            out[s] = out.get(s, 0.0) + ps * np.log2(ps / p)
        # sentinel source "": real sources are non-empty
        return pa.table({
            "source": pa.array(list(out.keys()) + [""], pa.string()),
            "kl_part": pa.array(list(out.values()) + [0.0], pa.float64())})

    parts = bucketed_group_agg(counted, lambda t: t, "tok", contrib,
                               num_buckets=num_buckets)

    def fin(t: pa.Table) -> pa.Table:
        g = t.filter(pc.not_equal(t.column("source"), "")) \
            .group_by("source").aggregate([("kl_part", "sum")])
        srcs = g.column("source").to_pylist()
        kl = [round_half_away(x, 6)
              for x in g.column("kl_part_sum").to_pylist()]
        return pa.table({
            "source": pa.array(srcs, pa.string()),
            "kl_bits": pa.array(kl, pa.float64()),
            "n_tokens": pa.array([totals[s] for s in srcs], pa.int64())})

    return bucketed_group_agg(parts, lambda t: t, "source", fin,
                              num_buckets=64)


def cross_source_overlap(documents: rd.Dataset) -> pa.Table:
    """(source_a, source_b, n_hashes): number of distinct text hashes that
    appear in BOTH sources (source_a < source_b) — train/eval contamination
    detection. Grouped by content hash, never an all-pairs document scan.
    Returns a driver-side Table: the output is source-pair-cardinality
    sized (typically a handful of rows), and a typed table keeps the schema
    stable even when the overlap is empty."""
    from itertools import combinations

    def hash_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "h": pa.array([sha_hex(s) for s in
                           t.column("text").to_pylist()], pa.string()),
            "source": t.column("source"),
        })

    def srcs_per_hash(t: pa.Table) -> pa.Table:
        by: dict[str, set] = {}
        for h, s in zip(t.column("h").to_pylist(),
                        t.column("source").to_pylist()):
            by.setdefault(h, set()).add(s)
        a_col, b_col = [], []
        for h, ss in by.items():
            for x, y in combinations(sorted(ss), 2):
                a_col.append(x)
                b_col.append(y)
        # sentinel guards downstream shuffles against schema-less blocks
        a_col.append("")
        b_col.append("")
        return pa.table({"source_a": pa.array(a_col, pa.string()),
                         "source_b": pa.array(b_col, pa.string())})

    per_hash = bucketed_group_agg(
        documents.select_columns(["text", "source"]).map_batches(
            hash_rows, batch_format="pyarrow"),
        lambda t: t, "h", srcs_per_hash)

    def pair_key(t: pa.Table) -> pa.Table:
        # sentinel "" rows keep flowing through the shuffle (that is the
        # point of resent()); they are dropped in fin2 after the exchange
        return t.append_column("k", pc.binary_join_element_wise(
            t.column("source_a"), t.column("source_b"), "\x1f"))

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by(["source_a", "source_b"]).aggregate([([], "count_all")])
        return pa.table({"source_a": g.column("source_a"),
                         "source_b": g.column("source_b"),
                         "n_hashes": g.column("count_all")})

    # sentinel row again for the second shuffle
    def resent(t: pa.Table) -> pa.Table:
        return pa.table({
            "source_a": pa.concat_arrays([
                t.column("source_a").combine_chunks(),
                pa.array([""], pa.string())]),
            "source_b": pa.concat_arrays([
                t.column("source_b").combine_chunks(),
                pa.array([""], pa.string())]),
        })

    def fin2(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("source_a"), ""))
        return fin(t)

    keyed = per_hash.map_batches(resent, batch_format="pyarrow") \
        .map_batches(pair_key, batch_format="pyarrow")
    out = bucketed_group_agg(keyed, lambda t: t, "k",
                             lambda t: fin2(t.drop_columns(["k"])),
                             num_buckets=64)
    return pa.Table.from_pylist(out.take_all(), schema=pa.schema([
        ("source_a", pa.string()), ("source_b", pa.string()),
        ("n_hashes", pa.int64())]))


# ---------------------------------------------------------------------------
# HyperLogLog sketch — mergeable approximate distinct-token count
# ---------------------------------------------------------------------------

HLL_M = 256          # registers (top 8 hash bits)
HLL_WBITS = 56       # remaining bits scored for the rank
# alpha_m for m >= 128 (Flajolet et al. 2007): 0.7213 / (1 + 1.079/m)
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def hll_token_registers(documents: rd.Dataset) -> pa.Table:
    """(register, max_rank): the HyperLogLog register table over the
    corpus's distinct tokens — the canonical MERGEABLE sketch for
    approximate distinct counts at 100 TB: each batch folds its (deduped)
    tokens into a 256-register partial, partials merge by per-register
    MAX (associative + idempotent, so re-execution and re-partitioning
    are free), and only register-sized tables ever move. Registers are
    all-integer, so the DuckDB twin is bit-exact.

    Hash contract (shared with the oracle): h = first 16 hex of
    sha256(token) as uint64; register = h >> 56; rank = number of leading
    zeros of the low 56 bits + 1 (57 when they are all zero). Absent
    registers (no token hashed into them) are omitted — the estimator
    counts them as zeros."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        # tokenize via the engine-wide _tokens contract (Python re,
        # Unicode \s) — the Arrow split_pattern_regex r"\s+" used here
        # before is RE2/ASCII-only, so NBSP/vertical-tab text made the
        # HLL estimate count a different token universe than the exact
        # ops it approximates
        toks = sorted({w for s in t.column("text").to_pylist()
                       for w in _tokens(s)})
        if len(toks) == 0:
            # typed sentinel row (register -1, filtered by the combiner's
            # consumer never — max over {0} is harmless but keep it out
            # of the real id space)
            return pa.table({"register": pa.array([-1], pa.int64()),
                             "max_rank": pa.array([0], pa.int64())})
        h = np.array([int(sha_hex(s)[:16], 16) for s in toks],
                     dtype=np.uint64)
        reg = (h >> np.uint64(HLL_WBITS)).astype(np.int64)
        w = h & np.uint64((1 << HLL_WBITS) - 1)
        bl = np.zeros(len(w), np.int64)
        for k in range(HLL_WBITS):
            bl += (w >= np.uint64(1 << k)).astype(np.int64)
        rank = (HLL_WBITS + 1) - bl
        g = pa.table({"register": pa.array(reg, pa.int64()),
                      "max_rank": pa.array(rank, pa.int64())}) \
            .group_by("register").aggregate([("max_rank", "max")])
        return pa.table({"register": g.column("register"),
                         "max_rank": g.column("max_rank_max")})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("register").aggregate([("max_rank", "max")])
        return pa.table({"register": g.column("register"),
                         "max_rank": g.column("max_rank_max")})

    from raykg.ops.relational import small_key_agg

    out = combine(small_key_agg(
        documents.select_columns(["text"]).map_batches(
            partial, batch_format="pyarrow"), combine))
    return out.filter(pc.greater_equal(out.column("register"), 0)) \
        .sort_by("register")


def hll_estimate(documents: rd.Dataset) -> pa.Table:
    """One-row (estimate, n_registers_hit): the HyperLogLog cardinality
    estimate from :func:`hll_token_registers`, with the standard
    small-range (linear-counting) correction. Float arithmetic happens
    once, on the 256-row register table; the oracle reproduces the same
    formula, and the 4-decimal round absorbs summation-order ulps."""
    import math

    regs = hll_token_registers(documents)
    ranks = regs.column("max_rank").to_pylist()
    n_present = len(ranks)
    zeros = HLL_M - n_present
    sp = sum(2.0 ** -r for r in sorted(ranks)) + zeros
    # one multiply (alpha * m^2 as a single literal product) so the float
    # association matches the SQL twin exactly
    raw = HLL_ALPHA * float(HLL_M * HLL_M) / sp
    if raw <= 2.5 * HLL_M and zeros > 0:
        est = HLL_M * math.log(HLL_M / zeros)
    else:
        est = raw
    return pa.table({
        "estimate": pa.array([round_half_away(est, 4)], pa.float64()),
        "n_registers_hit": pa.array([n_present], pa.int64())})


# ---------------------------------------------------------------------------
# Bloom-filter membership probe — broadcast-sketch contamination check
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 14    # bits; a config constant, independent of corpus size
BLOOM_K = 4          # hash functions


_BLOOM_FAST_SEED = 0xB100


def _bloom_positions(texts: list[str], hash_family: str = "sha") -> "tuple":
    """The BLOOM_K bit positions of each text. "sha": position_i =
    uint64(first 16 hex of sha256('bloom|i|' + text)) % BLOOM_M — shared
    hash contract with the DuckDB oracle, so membership decisions —
    including false positives — are bit-exact. "fast": one crc32 per text
    spread by the vectorized permutation family (no per-position Python
    digest; no DuckDB twin). Build and probe must use the SAME family."""
    import numpy as np

    if hash_family == "fast":
        return fast_string_hashes(texts, BLOOM_K,
                                  _BLOOM_FAST_SEED) % np.uint64(BLOOM_M)
    h = np.array([[int(sha_hex(f"bloom|{i}|{s}")[:16], 16)
                   for i in range(BLOOM_K)] for s in texts],
                 dtype=np.uint64)
    return h % np.uint64(BLOOM_M)


def bloom_train_positions(train: rd.Dataset,
                          hash_family: str = "sha") -> pa.Table:
    """The set-bit table of a Bloom filter over the train-side document
    texts: (position) rows, deduped, at most BLOOM_M of them. Built as
    per-batch distinct-position partials merged by another distinct pass —
    union of sets is associative and idempotent, so the sketch is
    mergeable across batches, partitions and reruns (the same property the
    HLL registers rely on). Only filter-sized tables ever move; the corpus
    is streamed once.

    At 100 TB the filter is sized up (m ~ 10^10 bits for ~10^9 docs at 1%
    FP) and the position set is sharded by position range instead of
    broadcast whole; the build below is the same two-phase distinct."""
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        if not texts:
            return pa.table({"position": pa.array([-1], pa.int64())})
        pos = np.unique(_bloom_positions(texts, hash_family)
                        .astype(np.int64))
        # sentinel keeps zero-row blocks typed (shuffle convention)
        return pa.table({"position": np.concatenate([pos, [-1]])})

    def combine(t: pa.Table) -> pa.Table:
        import numpy as np

        pos = np.unique(t.column("position").combine_chunks()
                        .to_numpy(zero_copy_only=False))
        return pa.table({"position": pos})

    from raykg.ops.relational import small_key_agg

    out = combine(small_key_agg(
        train.select_columns(["text"]).map_batches(
            partial, batch_format="pyarrow"), combine))
    return out.filter(pc.greater_equal(out.column("position"), 0))


def bloom_contamination(documents: rd.Dataset,
                        probe_mod: int = 3,
                        hash_family: str = "sha") -> rd.Dataset:
    """(doc_id, bloom_hit) for every probe-side document: hit = 1 iff ALL
    of its BLOOM_K positions are set in the Bloom filter built over the
    train side. Split is deterministic: probe = doc_id % probe_mod == 0,
    train = the rest (the industrial shape: filter built over the training
    corpus once, eval/bench candidates probed for contamination).

    The filter (<= BLOOM_M set positions, a few KiB) is put in the object
    store ONCE and read per probe task — the broadcast-small-side pattern;
    the probe is a pure map_batches with vectorized searchsorted
    membership. Exact duplicates across the split genuinely hit; any
    additional hit is a Bloom false positive, which the oracle reproduces
    exactly because the bit positions are a shared sha256 contract."""
    import numpy as np
    import ray

    def _split(t: pa.Table, keep_probe: bool) -> pa.Table:
        ids = t.column("doc_id").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        mask = (ids % probe_mod) == 0
        return t.filter(pa.array(mask if keep_probe else ~mask))

    train = documents.map_batches(
        lambda t: _split(t, keep_probe=False), batch_format="pyarrow")
    bits = bloom_train_positions(train, hash_family)
    bits_np = np.sort(bits.column("position").to_numpy(zero_copy_only=False))
    ref = ray.put(bits_np)

    def probe(t: pa.Table) -> pa.Table:
        positions = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        t = _split(t, keep_probe=True)
        texts = t.column("text").to_pylist()
        if not texts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "bloom_hit": pa.array([], pa.int64())})
        pos = _bloom_positions(texts, hash_family) \
            .astype(np.int64)    # (n, BLOOM_K)
        idx = np.searchsorted(positions, pos)
        idx[idx >= len(positions)] = max(len(positions) - 1, 0)
        member = (positions[idx] == pos) if len(positions) \
            else np.zeros_like(pos, bool)
        hit = member.all(axis=1).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id").combine_chunks(),
            "bloom_hit": pa.array(hit, pa.int64())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable approximate token frequencies
# ---------------------------------------------------------------------------

CMS_W = 1024    # columns per row
CMS_D = 4       # hash rows


_CMS_FAST_SEED = 0xC3


def _cms_cols_all(tokens: list[str], hash_family: str = "sha") -> "object":
    """(n_tokens, CMS_D) column indices, one column per sketch row.
    "sha": uint64(first 16 hex of sha256('cms|row|' + token)) % CMS_W —
    the shared hash contract with the DuckDB oracle. "fast": one crc32
    per token spread by the vectorized permutation family (no per-row
    Python digest; no DuckDB twin). Register build and point estimates
    must use the SAME family."""
    import numpy as np

    if hash_family == "fast":
        return (fast_string_hashes(tokens, CMS_D, _CMS_FAST_SEED)
                % np.uint64(CMS_W)).astype(np.int64)
    h = np.array([[int(sha_hex(f"cms|{r}|{s}")[:16], 16)
                   for r in range(CMS_D)] for s in tokens],
                 dtype=np.uint64)
    return (h % np.uint64(CMS_W)).astype(np.int64)


def cms_token_counts(documents: rd.Dataset,
                     hash_family: str = "sha") -> pa.Table:
    """The count-min sketch register table over corpus token OCCURRENCES:
    (row, col, n) for every non-empty cell. The sketch is LINEAR — cells
    add — so per-batch partials merge by plain SUM: associative,
    commutative, re-partitioning-safe, the same mergeability story as the
    HLL registers and the Bloom set bits. Cell counts are integers, so the
    DuckDB twin is bit-exact.

    The sketch is CMS_D x CMS_W regardless of corpus size (at 100 TB you
    widen CMS_W for a tighter epsilon = e/W error bound; the build cost is
    unchanged — one streamed pass, register-sized exchanges only)."""
    from collections import Counter

    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update(tok for tok in s.split() if tok)
        if not c:
            return pa.table({"row": pa.array([-1], pa.int64()),
                             "col": pa.array([-1], pa.int64()),
                             "n": pa.array([0], pa.int64())})
        toks = list(c.keys())
        cnts = np.array(list(c.values()), np.int64)
        cols_all = _cms_cols_all(toks, hash_family)
        rows, cols, ns = [], [], []
        for r in range(CMS_D):
            rows.append(np.full(len(toks), r, np.int64))
            cols.append(cols_all[:, r])
            ns.append(cnts)
        p = pa.table({"row": np.concatenate(rows),
                      "col": np.concatenate(cols),
                      "n": np.concatenate(ns)})
        g = p.group_by(["row", "col"]).aggregate([("n", "sum")])
        return pa.table({"row": g.column("row"), "col": g.column("col"),
                         "n": g.column("n_sum")})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["row", "col"]).aggregate([("n", "sum")])
        return pa.table({"row": g.column("row"), "col": g.column("col"),
                         "n": g.column("n_sum")})

    from raykg.ops.relational import small_key_agg

    out = combine(small_key_agg(
        documents.select_columns(["text"]).map_batches(
            partial, batch_format="pyarrow"), combine))
    return out.filter(pc.greater_equal(out.column("row"), 0)) \
        .sort_by([("row", "ascending"), ("col", "ascending")])


def cms_estimate_tokens(documents: rd.Dataset,
                        probes: list[str],
                        hash_family: str = "sha") -> pa.Table:
    """(token, est) for each probe token: the count-min point estimate
    min over rows of cell(row, col(token)) — an upper bound on the true
    occurrence count, inflated only by hash collisions. Register lookup is
    driver-side (the sketch is a fixed-size table); the corpus pass is the
    one inside :func:`cms_token_counts`."""
    import numpy as np

    regs = cms_token_counts(documents, hash_family)
    cell = {(r, c): n for r, c, n in zip(regs.column("row").to_pylist(),
                                         regs.column("col").to_pylist(),
                                         regs.column("n").to_pylist())}
    probes = sorted(probes)
    ests = []
    for tok in probes:
        cols = _cms_cols_all([tok], hash_family)[0]
        vals = [cell.get((r, int(cols[r])), 0) for r in range(CMS_D)]
        ests.append(min(vals))
    return pa.table({"token": pa.array(probes, pa.string()),
                     "est": pa.array(ests, pa.int64())})


def temperature_mix(documents: rd.Dataset, alpha: float = 0.5,
                    target_frac: float = 0.5, seed: int = 42) -> rd.Dataset:
    """(doc_id, source): temperature-based source rebalancing — sample
    each source s with probability p_s = min(1, T * w_s / c_s) where
    w_s = c_s^alpha / sum_t c_t^alpha and T = target_frac * N. This is
    the multilingual/multi-source mixing rule of mC4 (Raffel et al.,
    JMLR 2020) and XLM-R (alpha in (0,1) upweights small sources toward
    a flatter mix); alpha=1 reduces to a plain uniform target_frac
    sample.

    The per-source counts are a vocabulary-sized aggregate (one partial
    row per source per block, recombined via ``small_key_agg`` — no
    all-to-all), so only #sources rows ever reach the driver; the keep
    decision itself is a stateless deterministic sha draw per doc
    (stable under resharding and resume, same family as
    :func:`hash_split`). DuckDB twin computes the identical thresholds
    with pow/floor/to_hex."""
    from raykg.ops.relational import small_key_agg

    def count_batch(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("source", "count")])
        return pa.table({"source": g.column("source"),
                         "n": g.column("source_count")})

    def recombine(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([("n", "sum")])
        return pa.table({"source": g.column("source"),
                         "n": g.column("n_sum")})

    counts_t = small_key_agg(
        documents.select_columns(["source"]).map_batches(
            count_batch, batch_format="pyarrow"),
        recombine)
    counts = dict(zip(counts_t.column("source").to_pylist(),
                      counts_t.column("n").to_pylist()))
    tot = float(sum(counts.values()))
    wsum = sum(float(c) ** alpha for c in counts.values())
    thr = {s: hex_threshold8(min(
               1.0, target_frac * tot * (float(c) ** alpha / wsum) / c))
           for s, c in counts.items()}

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        srcs = t.column("source").to_pylist()
        mask = [sha_hex(f"mix|{seed}|{d}")[:8] < thr[s]
                for d, s in zip(ids, srcs)]
        return t.filter(pa.array(mask, pa.bool_()))

    return documents.select_columns(["doc_id", "source"]).map_batches(
        keep, batch_format="pyarrow")


def hll_group_estimates(events: rd.Dataset, key: str = "event_type",
                        val: str = "user_id") -> pa.Table:
    """(key, estimate, n_registers_hit): per-group approximate distinct
    count — one HyperLogLog per group (distinct users per event type
    here), the grouped variant of :func:`hll_token_registers`. Same hash
    and estimator contract; partials are (group, register, max_rank)
    rows merged by per-(group, register) MAX, so the exchange is
    groups x 256 rows regardless of event volume — the shape that makes
    per-group cardinality viable at 100 TB where COUNT(DISTINCT) per
    group would shuffle every row. The small-range correction applies
    per group (each group has its own zero-register count)."""
    import math

    import numpy as np

    from raykg.ops.relational import small_key_agg

    def partial(t: pa.Table) -> pa.Table:
        pairs = pa.table({"g": t.column(key),
                          "v": pc.cast(t.column(val), pa.string())}) \
            .group_by(["g", "v"]).aggregate([])
        if pairs.num_rows == 0:
            return pa.table({"g": pa.array([""], pa.string()),
                             "register": pa.array([-1], pa.int64()),
                             "max_rank": pa.array([0], pa.int64())})
        h = np.array([int(sha_hex(s)[:16], 16)
                      for s in pairs.column("v").to_pylist()],
                     dtype=np.uint64)
        reg = (h >> np.uint64(HLL_WBITS)).astype(np.int64)
        w = h & np.uint64((1 << HLL_WBITS) - 1)
        bl = np.zeros(len(w), np.int64)
        for k in range(HLL_WBITS):
            bl += (w >= np.uint64(1 << k)).astype(np.int64)
        rank = (HLL_WBITS + 1) - bl
        g = pa.table({"g": pairs.column("g"),
                      "register": pa.array(reg, pa.int64()),
                      "max_rank": pa.array(rank, pa.int64())}) \
            .group_by(["g", "register"]).aggregate([("max_rank", "max")])
        return pa.table({"g": g.column("g"),
                         "register": g.column("register"),
                         "max_rank": g.column("max_rank_max")})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["g", "register"]).aggregate([("max_rank", "max")])
        return pa.table({"g": g.column("g"),
                         "register": g.column("register"),
                         "max_rank": g.column("max_rank_max")})

    regs = combine(small_key_agg(
        events.select_columns([key, val]).map_batches(
            partial, batch_format="pyarrow"), combine))
    regs = regs.filter(pc.greater_equal(regs.column("register"), 0))

    # estimator over the (groups x <=256)-row table, driver-side
    groups: dict[str, list[int]] = {}
    for r in regs.to_pylist():
        groups.setdefault(r["g"], []).append(r["max_rank"])
    names, ests, hits = [], [], []
    for gname in sorted(groups):
        ranks = groups[gname]
        n_present = len(ranks)
        zeros = HLL_M - n_present
        sp = sum(2.0 ** -r for r in sorted(ranks)) + zeros
        raw = HLL_ALPHA * float(HLL_M * HLL_M) / sp
        if raw <= 2.5 * HLL_M and zeros > 0:
            est = HLL_M * math.log(HLL_M / zeros)
        else:
            est = raw
        names.append(gname)
        ests.append(round_half_away(est, 4))
        hits.append(n_present)
    return pa.table({key: pa.array(names, pa.string()),
                     "estimate": pa.array(ests, pa.float64()),
                     "n_registers_hit": pa.array(hits, pa.int64())})


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016)
# ---------------------------------------------------------------------------

# Symbol sequences are stored as ONE string: single separator at both ends,
# double separator between symbols ("\x1fa\x1f\x1fb\x1f" = [a, b]). The
# double-sep encoding makes "merge pair (l, r) greedily left-to-right,
# non-overlapping" a plain substring replace — '\x1fl\x1f\x1fr\x1f' ->
# '\x1flr\x1f' — which is exactly what Python str.replace, Arrow's
# replace_substring AND DuckDB's replace() all implement, so the engine
# (vectorized pc.replace_substring) and the unrolled SQL twin share the
# merge kernel bit-for-bit. Symbols must not contain chars <= 0x1f
# (asserted at symbolize time); separator-below-alphabet also makes the
# pair-string ordering equal the (l, r) tuple ordering the tie-break uses.
_BPE_SEP = "\x1f"


def _bpe_encode(word: str) -> str:
    return _BPE_SEP + (_BPE_SEP * 2).join(word) + _BPE_SEP


def _bpe_syms(enc: str) -> list[str]:
    return enc.strip(_BPE_SEP).split(_BPE_SEP * 2)


def _bpe_word_counts(documents: rd.Dataset,
                     num_buckets: int) -> rd.Dataset:
    """(word, c): corpus word counts — the ONE corpus-sized scan BPE needs;
    everything after operates on this vocabulary-sized table."""
    from collections import Counter

    def wc_batch(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update(_tokens(s))
        # sentinel "": _tokens never yields an empty string
        return pa.table({
            "word": pa.array(list(c.keys()) + [""], pa.string()),
            "c": pa.array(list(c.values()) + [0], pa.int64())})

    def wc_fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("word"), ""))
        g = t.group_by("word").aggregate([("c", "sum")])
        return pa.table({
            "word": pa.concat_arrays([g.column("word").combine_chunks(),
                                      pa.array([""], pa.string())]),
            "c": pa.concat_arrays([g.column("c_sum").combine_chunks(),
                                   pa.array([0], pa.int64())])})

    return bucketed_group_agg(documents.select_columns(["text"]),
                              wc_batch, "word", wc_fin,
                              num_buckets=num_buckets)


def bpe_pair_counts(documents: rd.Dataset, k: int = 30,
                    num_buckets: int = 1024) -> rd.Dataset:
    """(l, r, cnt): the round-1 BPE statistics — corpus-weighted counts of
    adjacent CHARACTER pairs inside whitespace words, top-k by count (ties
    -> lexicographically smallest (l, r)). This is bpe_train's first
    pair-count exchange exposed as a standalone op with an exact SQL twin
    (the full iterative training is hash-checked via bpe_merges).

    Per-batch Counter partials -> one pair-keyed bucketed exchange ->
    tiny sorted top-k; only k rows leave the aggregate."""
    from collections import Counter

    def pair_batch(t: pa.Table) -> pa.Table:
        # ONE Counter pass over the whole batch: words joined with a char
        # below the symbol alphabet (see _BPE_SEP invariant), so adjacent
        # chars across a word boundary always contain the joiner and are
        # dropped after the count — same exact counts as the per-word
        # nested loop, but zip+Counter iterate in C instead of a Python
        # dict op per character pair (the family's hot-loop rule).
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            joined = _BPE_SEP.join(_tokens(s))
            c.update(zip(joined, joined[1:]))
        pairs = [(a, b) for (a, b) in c
                 if a != _BPE_SEP and b != _BPE_SEP]
        return pa.table({
            "pair": pa.array([a + _BPE_SEP + b for a, b in pairs] + [""],
                             pa.string()),
            "n": pa.array([c[p] for p in pairs] + [0], pa.int64())})

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("pair"), ""))
        g = t.group_by("pair").aggregate([("n", "sum")])
        return pa.table({
            "pair": pa.concat_arrays([g.column("pair").combine_chunks(),
                                      pa.array([""], pa.string())]),
            "n": pa.concat_arrays([g.column("n_sum").combine_chunks(),
                                   pa.array([0], pa.int64())])})

    top = bucketed_group_agg(documents.select_columns(["text"]),
                             pair_batch, "pair", fin,
                             num_buckets=num_buckets) \
        .filter(lambda r: r["pair"] != "") \
        .sort(["n", "pair"], descending=[True, False]).limit(k)

    def split_pair(t: pa.Table) -> pa.Table:
        pairs = t.column("pair").to_pylist()
        return pa.table({
            "l": pa.array([p.split(_BPE_SEP)[0] for p in pairs],
                          pa.string()),
            "r": pa.array([p.split(_BPE_SEP)[1] for p in pairs],
                          pa.string()),
            "cnt": t.column("n")})

    return top.map_batches(split_pair, batch_format="pyarrow")


def bpe_train(documents: rd.Dataset, n_merges: int = 6,
              num_buckets: int = 1024) -> pa.Table:
    """(rank, lft, rgt, cnt): byte-pair-encoding merge table learned over
    the whitespace word vocabulary, Sennrich et al. 2016 semantics — each
    round merges the globally most frequent adjacent symbol pair (count
    weighted by word frequency, every adjacent position counts, ties ->
    lexicographically smallest (l, r) pair), applied greedily
    left-to-right non-overlapping to every word. The tokenizer-training
    op a from-scratch LLM data pipeline needs.

    Scale shape: the corpus is scanned ONCE (the word-count exchange);
    the training state is the (syms, c) VOCABULARY-sized table, kept
    distributed and materialized per round. Each round costs one
    pair-keyed bucketed exchange of per-batch Counter partials whose
    finalize emits ONE candidate row per bucket — the driver reduces
    <= num_buckets register-sized rows to the global argmax and
    broadcasts the merge back as two closure strings; the merge itself
    is one vectorized pc.replace_substring pass. Nothing vocabulary- or
    corpus-sized ever lands on the driver. The DuckDB twin unrolls the
    rounds over the same double-sep string encoding (see _BPE_SEP), so
    the full iterative training is hash-checked, not rows-only."""
    from collections import Counter

    def symbolize(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        cs = t.column("c").to_pylist()
        encs, outc = [], []
        for w, c in zip(words, cs):
            if not w:
                continue
            if min(w) <= _BPE_SEP:
                raise ValueError(
                    "bpe_train: token contains a control char <= 0x1f, "
                    "which collides with the symbol separator encoding")
            encs.append(_bpe_encode(w))
            outc.append(c)
        return pa.table({"syms": pa.array(encs, pa.string()),
                         "c": pa.array(outc, pa.int64())})

    vocab = _bpe_word_counts(documents, num_buckets) \
        .map_batches(symbolize, batch_format="pyarrow").materialize()

    def pair_batch(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for enc, w in zip(t.column("syms").to_pylist(),
                          t.column("c").to_pylist()):
            syms = _bpe_syms(enc)
            for a, b in zip(syms, syms[1:]):
                c[a + _BPE_SEP + b] += w
        return pa.table({
            "pair": pa.array(list(c.keys()) + [""], pa.string()),
            "n": pa.array(list(c.values()) + [0], pa.int64())})

    def bucket_best(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t.column("pair"), ""))
        g = t.group_by("pair").aggregate([("n", "sum")])
        pairs = g.column("pair").to_pylist()
        ns = g.column("n_sum").to_pylist()
        best = min(zip(pairs, ns), key=lambda x: (-x[1], x[0]),
                   default=("", 0))
        return pa.table({"pair": pa.array([best[0]], pa.string()),
                         "n": pa.array([best[1]], pa.int64())})

    ranks, ls, rs, cnts = [], [], [], []
    for rank in range(n_merges):
        cand = bucketed_group_agg(vocab, pair_batch, "pair", bucket_best,
                                  num_buckets=num_buckets).take_all()
        cand = [c for c in cand if c["pair"]]
        if not cand:
            break
        best = min(cand, key=lambda c: (-c["n"], c["pair"]))
        lft, rgt = best["pair"].split(_BPE_SEP)
        ranks.append(rank)
        ls.append(lft)
        rs.append(rgt)
        cnts.append(best["n"])
        pat = _BPE_SEP + lft + _BPE_SEP + _BPE_SEP + rgt + _BPE_SEP
        rep = _BPE_SEP + lft + rgt + _BPE_SEP

        def apply_merge(t: pa.Table, pat: str = pat,
                        rep: str = rep) -> pa.Table:
            return pa.table({
                "syms": pc.replace_substring(t.column("syms"), pattern=pat,
                                             replacement=rep),
                "c": t.column("c")})

        vocab = vocab.map_batches(apply_merge,
                                  batch_format="pyarrow").materialize()

    return pa.table({"rank": pa.array(ranks, pa.int64()),
                     "lft": pa.array(ls, pa.string()),
                     "rgt": pa.array(rs, pa.string()),
                     "cnt": pa.array(cnts, pa.int64())})


def _dense_ids(stream: rd.Dataset, col: str,
               num_buckets: int) -> rd.Dataset:
    """Shared tail of vocab_ids / dense_string_ids: (bucket, col) rows
    (sentinel bucket -1 per block) -> (col, id) dense consecutive ranks
    in (bucket, col) order. Per-bucket local enumeration; only the
    num_buckets bucket counts visit the driver to become exclusive
    offsets. One implementation so the rank-assignment contract (which
    the SQL twins replicate bit-for-bit) cannot drift between the two
    callers."""
    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("bucket"), 0))
        if not t.num_rows:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "pos": pa.array([], pa.int64()),
                             col: pa.array([], pa.string())})
        b = t.column("bucket")[0].as_py()
        vals = sorted(set(t.column(col).to_pylist()))
        return pa.table({
            "bucket": pa.array([b] * len(vals), pa.int32()),
            "pos": pa.array(range(len(vals)), pa.int64()),
            col: pa.array(vals, pa.string())})

    positioned = stream.groupby("bucket") \
        .map_groups(per_bucket, batch_format="pyarrow").materialize()

    counts = {int(r["bucket"]): int(r["count()"])
              for r in positioned.groupby("bucket").count().take_all()}
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]

    def assign(t: pa.Table) -> pa.Table:
        bs = t.column("bucket").to_pylist()
        pos = t.column("pos").to_pylist()
        ids = [offsets[b] + p for b, p in zip(bs, pos)]
        return pa.table({col: t.column(col),
                         "id": pa.array(ids, pa.int64())})

    return positioned.map_batches(assign, batch_format="pyarrow")


def dense_string_ids(ds: rd.Dataset, col: str,
                     num_buckets: int = 256) -> rd.Dataset:
    """(col, id): dense consecutive ids 0..V-1 over the distinct values of
    a string column — :func:`vocab_ids`' distributed zipWithIndex
    generalized to any key column (e.g. entity URIs before an integer
    graph algorithm). Same ordering contract: id = rank in (bucket, value)
    order with bucket = first-8-sha-hex(value) % num_buckets, so DuckDB's
    ``row_number() OVER (ORDER BY bucket, value) - 1`` reproduces every id
    bit-for-bit. Same scale shape too: per-batch distinct thins the one
    value-keyed exchange; only the ``num_buckets`` bucket counts visit the
    driver to become exclusive offsets."""

    def val_rows(t: pa.Table) -> pa.Table:
        vals = sorted(set(t.column(col).to_pylist()))
        bucket = [int(sha_hex(v)[:8], 16) % num_buckets for v in vals]
        # sentinel bucket -1 keeps zero-row blocks typed; dropped below
        return pa.table({
            "bucket": pa.array(bucket + [-1], pa.int32()),
            col: pa.array(vals + [""], pa.string())})

    return _dense_ids(
        ds.select_columns([col])
        .map_batches(val_rows, batch_format="pyarrow"),
        col, num_buckets)


def neardup_keep_best(documents: rd.Dataset, num_buckets: int = 1024,
                      **lsh_kwargs) -> rd.Dataset:
    """(doc_id) keep-list that keeps the HIGHEST-QUALITY member of every
    near-dup component instead of the smallest id — the production dedup
    policy (crawl snapshots: keep the cleanest capture, not the first):
    components from :func:`neardup_components` (min-id over verified
    MinHash-LSH pairs), quality from
    :func:`raykg.ops.text.quality_score`, winner = max quality with ties
    to the smaller doc_id; documents in no component keep themselves.

    Fully distributed: three bucketed exchanges after the component pass
    — (1) doc-keyed attach of quality to component rows, (2)
    component-keyed argmax, (3) doc-keyed keep-set union (corpus rows vs
    member rows vs winner rows) — the keep/drop sets never land on the
    driver, same discipline as :func:`neardup_keep`."""
    from raykg.ops.text import quality_score

    comps = neardup_components(documents, **lsh_kwargs)
    quality = quality_score(documents)

    # exchange 1 (key=doc_id): attach quality to component memberships
    def comp_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        if t.num_rows and pc.min(ids).as_py() < 0:
            raise ValueError("neardup_keep_best requires non-negative "
                             "doc ids (-1 is the internal sentinel)")
        return pa.table({
            "doc_id": pa.concat_arrays([ids.combine_chunks(),
                                        pa.array([-1], pa.int64())]),
            "component": pa.concat_arrays([
                pc.cast(t.column("component"), pa.int64())
                .combine_chunks(), pa.array([-1], pa.int64())]),
            "quality": pa.array([None] * (t.num_rows + 1), pa.float64())})

    def quality_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "component": pa.array([-1] * t.num_rows, pa.int64()),
            "quality": t.column("quality")})

    def attach_quality(t: pa.Table) -> pa.Table:
        qmap: dict[int, float] = {}
        for d, c, q in zip(t.column("doc_id").to_pylist(),
                           t.column("component").to_pylist(),
                           t.column("quality").to_pylist()):
            if c == -1 and q is not None:
                qmap[d] = q
        out_d, out_c, out_q = [], [], []
        for d, c in zip(t.column("doc_id").to_pylist(),
                        t.column("component").to_pylist()):
            if c >= 0:
                out_d.append(d)
                out_c.append(c)
                out_q.append(qmap.get(d, 0.0))
        out_d.append(-1)
        out_c.append(-1)
        out_q.append(0.0)
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "component": pa.array(out_c, pa.int64()),
                         "quality": pa.array(out_q, pa.float64())})

    membered = bucketed_group_agg(
        comps.map_batches(comp_rows, batch_format="pyarrow")
        .union(quality.map_batches(quality_rows, batch_format="pyarrow")),
        lambda t: t, "doc_id", attach_quality, num_buckets=num_buckets)

    # exchange 2 (key=component): argmax quality, ties -> smaller doc_id
    def argmax(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("component"), 0))
        best: dict[int, tuple] = {}
        for d, c, q in zip(t.column("doc_id").to_pylist(),
                           t.column("component").to_pylist(),
                           t.column("quality").to_pylist()):
            cur = best.get(c)
            if cur is None or (-q, d) < cur:
                best[c] = (-q, d)
        wins = sorted(d for _, d in best.values())
        return pa.table({"doc_id": pa.array(wins + [-1], pa.int64()),
                         "winner": pa.array([1] * (len(wins) + 1),
                                            pa.int8())})

    winners = bucketed_group_agg(membered, lambda t: t, "component",
                                 argmax, num_buckets=num_buckets)

    # exchange 3 (key=doc_id): corpus minus members plus winners
    def corpus_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        return pa.table({"doc_id": ids,
                         "member": pa.array([0] * t.num_rows, pa.int8()),
                         "winner": pa.array([0] * t.num_rows, pa.int8())})

    def member_rows(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).combine_chunks()
        ids = pa.concat_arrays([ids, pa.array([-1], pa.int64())])
        return pa.table({"doc_id": ids,
                         "member": pa.array([1] * len(ids), pa.int8()),
                         "winner": pa.array([0] * len(ids), pa.int8())})

    def winner_rows(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "member": pa.array([0] * t.num_rows, pa.int8()),
                         "winner": t.column("winner")})

    tagged = documents.select_columns(["doc_id"]) \
        .map_batches(corpus_rows, batch_format="pyarrow") \
        .union(comps.map_batches(member_rows, batch_format="pyarrow")) \
        .union(winners.map_batches(winner_rows, batch_format="pyarrow"))

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("member", "max"),
                                            ("winner", "max")])
        keep = pc.or_(pc.equal(g.column("member_max"), 0),
                      pc.equal(g.column("winner_max"), 1))
        ids = g.filter(keep).column("doc_id")
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        return pa.table({"doc_id": pa.concat_arrays(
            [ids, pa.array([-1], pa.int64())])})

    out = bucketed_group_agg(tagged, lambda t: t, "doc_id", fin,
                             num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("doc_id"), 0)),
        batch_format="pyarrow")
