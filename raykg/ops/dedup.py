"""Deduplication operators: exact, MinHash-signature, MinHash-LSH candidate
pairs, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale notes (these run at 100 TB, not just on the fixtures):
- every groupby is preceded by a per-batch combiner (partial dedup / partial
  min) so hot content hashes don't concentrate a shuffle partition;
- LSH banding turns the all-pairs problem into per-bucket candidate
  generation — the only quadratic work is within a bucket, and bucket sizes
  are bounded by the band width; skewed buckets would be salted/capped with
  the cap logged (no silent truncation at fixture scale: buckets are tiny);
- the SHA-256-based hash family is shared with the DuckDB oracle so results
  are comparable bit-for-bit;
- ``hash_family="fast"`` (minhash_signatures/minhash_dedup/
  lsh_candidate_pairs/simhash) swaps the per-gram Python sha256 loops for
  ONE vectorized crc32-based pass per batch — the production mode for
  100 TB runs, where sha256-in-Python is 10-50x the CPU of the actual
  dedup logic. Keep/drop semantics are family-internal (identical texts
  hash identically in either family; LSH banding operates on the same
  '_'-joined 8-hex signature format), but the oracle gate always runs
  "sha" — the fast family has no DuckDB twin.
"""

from __future__ import annotations

from fractions import Fraction
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raykg.functions.hashing import (fast_hash64, fast_minhash_sigs,
                                     minhash_sig_sha, round_half_away,
                                     sha_hex, simhash_matrix)
from raykg.ops.text import _tokens


def _require_nonneg_ids(t: pa.Table, op_name: str) -> None:
    """Negative doc ids collide with the -1 exchange sentinels the ops in
    this file use to keep zero-row blocks typed — the same hazard
    segment_dedup and the prefix-filter joins already reject loudly, so
    every sentinel-bearing op validates, none silently drops rows."""
    ids = np.asarray(t.column("doc_id").combine_chunks())
    if len(ids) and int(ids.min()) < 0:
        raise ValueError(
            f"{op_name} requires non-negative doc ids (negative values "
            f"collide with the -1 exchange sentinel), got {int(ids.min())}")


def _grams(text: str, gram: int) -> list[str]:
    toks = _tokens(text)
    if len(toks) < gram:
        return [" ".join(toks)] if toks else []
    return sorted({" ".join(toks[i:i + gram])
                   for i in range(len(toks) - gram + 1)})


def exact_dedup(documents: rd.Dataset) -> rd.Dataset:
    """(text_hash, doc_id=min surviving id) — exact content dedup.
    Two-phase: per-batch min, then groupby(text_hash).min."""

    def batch(t: pa.Table) -> pa.Table:
        best: dict[str, int] = {}
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            h = sha_hex(s)
            if h not in best or d < best[h]:
                best[h] = d
        return pa.table({
            "text_hash": pa.array(list(best.keys()), pa.string()),
            "doc_id": pa.array(list(best.values()), pa.int64()),
        })

    partial = documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")
    return partial.groupby("text_hash").min("doc_id").map_batches(
        lambda t: t.rename_columns(["text_hash", "doc_id"]),
        batch_format="pyarrow")


def minhash_signatures(documents: rd.Dataset, num_hashes: int = 8,
                       gram: int = 3, seed: int = 42,
                       hash_family: str = "sha",
                       include_grams: bool = True) -> rd.Dataset:
    """(doc_id, sig = '_'-joined 8-hex MinHash over token n-grams[, grams]).

    hash_family="sha" (default, SQL-replicable — see
    __ray_entry__.oracle_sql): one Python sha256 per (gram, hash index),
    delegated to hashing.minhash_sig_sha so this file and the discovery
    pipeline can never drift from the one oracle-pinned definition.
    hash_family="fast" (production): one crc32 per gram, spread through
    the vectorized multiply-mod-Mersenne permutation family — the whole
    batch is a single numpy pass (measured >= 3x on minhash_dedup at
    sf0.1; see BASELINE.md). Same output format, no DuckDB twin.

    ``include_grams=False`` skips materializing the n-gram list column —
    it roughly doubles the batch payload and only the LSH verify joins
    need it (minhash_dedup drops it immediately)."""
    if hash_family not in ("sha", "fast"):
        raise ValueError(f"unknown hash_family {hash_family!r}")

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        grams_col = [_grams(s, gram) for s in t.column("text").to_pylist()]
        if hash_family == "fast":
            sigs = fast_minhash_sigs(grams_col, num_hashes, seed)
        else:
            sigs = ["_".join(minhash_sig_sha(gs, num_hashes, seed))
                    for gs in grams_col]
        cols = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "sig": pa.array(sigs, pa.string()),
        }
        if include_grams:
            cols["grams"] = pa.array(grams_col, pa.list_(pa.string()))
        return pa.table(cols)

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")


def minhash_dedup(documents: rd.Dataset, num_hashes: int = 8,
                  gram: int = 3, seed: int = 42,
                  hash_family: str = "sha") -> rd.Dataset:
    """(sig, doc_id=min surviving id) — near-dup dedup at full-signature
    granularity (identical MinHash signature -> duplicate)."""
    sigs = minhash_signatures(documents, num_hashes, gram, seed,
                              hash_family, include_grams=False)

    def batch_min(t: pa.Table) -> pa.Table:
        best: dict[str, int] = {}
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("sig").to_pylist()):
            if s not in best or d < best[s]:
                best[s] = d
        return pa.table({"sig": pa.array(list(best.keys()), pa.string()),
                         "doc_id": pa.array(list(best.values()), pa.int64())})

    return sigs.map_batches(batch_min, batch_format="pyarrow") \
        .groupby("sig").min("doc_id").map_batches(
            lambda t: t.rename_columns(["sig", "doc_id"]),
            batch_format="pyarrow")


def lsh_candidate_pairs(documents: rd.Dataset, num_hashes: int = 8,
                        num_bands: int = 4, gram: int = 3, seed: int = 42,
                        jaccard_threshold: float = 0.6,
                        num_partitions: int = 8,
                        max_bucket: int = 10_000,
                        hash_family: str = "sha") -> rd.Dataset:
    """MinHash-LSH near-dup pairs: shingle -> minhash -> band -> bucket
    groupby -> within-bucket candidate pairs -> exact Jaccard verification
    via a hash join back to the grams table.

    Shuffle discipline: the band explode carries ONLY (doc_id, band,
    band_key) — never the shingle sets, which would amplify exchange bytes
    by num_bands x the full gram payload. The (few) surviving candidate
    pairs are then joined back to the (doc_id, grams) table twice to compute
    exact Jaccard, so gram bytes cross the wire at most twice total instead
    of once per band per doc.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded to 4.
    Deterministic and SQL-replicable (band keys are sha-derived).
    """
    if num_bands < 1 or num_hashes % num_bands != 0:
        # num_bands > num_hashes would make every band key the empty
        # string (all docs collide into one bucket per band); a
        # non-dividing num_bands would silently drop the trailing
        # signature rows — both produce garbage, so fail loudly
        raise ValueError(
            f"lsh_candidate_pairs: num_bands={num_bands} must divide "
            f"num_hashes={num_hashes}")
    rows_per_band = num_hashes // num_bands
    # materialized once: both the band explode and the two verify joins
    # consume it, and the sha MinHash pass must not run twice
    sigs = minhash_signatures(documents, num_hashes, gram, seed,
                              hash_family).materialize()

    def explode(t: pa.Table) -> pa.Table:
        _require_nonneg_ids(t, "lsh_candidate_pairs")
        doc_ids, keys = [], []
        for d, sig in zip(t.column("doc_id").to_pylist(),
                          t.column("sig").to_pylist()):
            parts = sig.split("_")
            for b in range(num_bands):
                doc_ids.append(d)
                keys.append(f"{b}|" + "_".join(
                    parts[b * rows_per_band:(b + 1) * rows_per_band]))
        # sentinel keeps zero-row blocks typed through the exchange;
        # dropped in bucket_pairs_fin
        doc_ids.append(-1)
        keys.append("")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "bkey": pa.array(keys, pa.string()),
        })

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs_fin(t: pa.Table) -> pa.Table:
        # one crc-bucket holds MANY (band, band_key) groups: segment by
        # key, all-pairs within each. The bucketed exchange replaces
        # Ray's sort-based groupby on the high-cardinality band-key
        # strings (functions/shuffle.py measures the sort path ~4x
        # slower at 1M string keys).
        groups: dict[str, list] = {}
        for k, d in zip(t.column("bkey").to_pylist(),
                        t.column("doc_id").to_pylist()):
            if k:
                groups.setdefault(k, []).append(d)
        a_col, b_col = [], []
        for k in sorted(groups):
            docs = sorted(groups[k])
            # skew guard: a degenerate band key (boilerplate-heavy
            # corpora) would otherwise go quadratic silently
            capped = _cap_block(docs, k, max_bucket,
                                "lsh_candidate_pairs")
            if capped is not None:
                docs = capped
            for i, j in combinations(range(len(docs)), 2):
                a_col.append(docs[i])
                b_col.append(docs[j])
        # sentinel; _exact_jaccard_verify drops negative doc_a rows
        a_col.append(-1)
        b_col.append(-1)
        return pa.table({"doc_a": pa.array(a_col, pa.int64()),
                         "doc_b": pa.array(b_col, pa.int64())})

    from raykg.functions.shuffle import bucketed_group_agg

    pairs = bucketed_group_agg(exploded, lambda t: t, "bkey",
                               bucket_pairs_fin, num_buckets=1024)

    return _exact_jaccard_verify(pairs, sigs, jaccard_threshold,
                                 num_partitions)


def _exact_jaccard_verify(pairs: rd.Dataset, grams_ds: rd.Dataset,
                          jaccard_threshold: float,
                          num_partitions: int = 8,
                          metric: str = "jaccard") -> rd.Dataset:
    """Exact set-overlap verification of candidate (doc_a, doc_b) pairs
    against a (doc_id, grams list<string>) table. ``metric="jaccard"``
    (default) scores |A∩B|/|A∪B| on unordered pairs;
    ``metric="containment"`` scores Broder containment |A∩B|/|A| on
    ORDERED pairs (doc_a = the contained side; the pair key preserves
    order, so (a,b) and (b,a) verify independently). Expressed as the
    engine's
    bucketed shuffle pattern (functions/shuffle.py) rather than Acero hash
    joins: grams are list<string> (Acero rejects list payloads) and two
    Dataset.joins cost ~6 s of aggregator-actor setup at fixture scale.
    Stage A shuffles pair-sides and grams together on doc_id and attaches
    each side's grams; stage B shuffles on the pair key and combines the
    two sides into one exact-Jaccard verdict. A pair surfacing from
    several candidate buckets is deduped IN stage B (side-keyed dict), so
    no separate distinct shuffle is needed. Grams bytes cross the wire
    once for the corpus + once per pair side — never once per candidate
    source bucket. Rows with a negative doc_a are upstream sentinels and
    are dropped here. Output: (doc_a, doc_b, jaccard>=threshold, 4 dp)."""
    from raykg.functions.shuffle import bucketed_group_agg

    SEP = "\x1f"    # gram separator inside the packed string
    PSEP = "\x1e"   # pair-key separator ("a\x1eb")

    def pair_side_rows(t: pa.Table) -> pa.Table:
        # per-batch dedup of (pair, side) rows thins duplicates early
        a = t.column("doc_a").to_pylist()
        b = t.column("doc_b").to_pylist()
        seen = sorted({(x, y) for x, y in zip(a, b) if x >= 0})
        doc = [str(x) for x, _ in seen] + [str(y) for _, y in seen]
        pk = [f"{x}{PSEP}{y}" for x, y in seen] * 2
        side = [0] * len(seen) + [1] * len(seen)
        return pa.table({"doc": pa.array(doc, pa.string()),
                         "pair": pa.array(pk, pa.string()),
                         "side": pa.array(side, pa.int8()),
                         "grams": pa.array([""] * len(doc), pa.string())})

    def gram_rows(t: pa.Table) -> pa.Table:
        ids = [str(d) for d in t.column("doc_id").to_pylist()]
        gs = [SEP.join(g) for g in t.column("grams").to_pylist()]
        return pa.table({"doc": pa.array(ids, pa.string()),
                         "pair": pa.array([""] * len(ids), pa.string()),
                         "side": pa.array([0] * len(ids), pa.int8()),
                         "grams": pa.array(gs, pa.string())})

    tagged = pairs.map_batches(pair_side_rows, batch_format="pyarrow") \
        .union(grams_ds.map_batches(gram_rows, batch_format="pyarrow"))

    def attach(t: pa.Table) -> pa.Table:
        docs = t.column("doc").to_pylist()
        pks = t.column("pair").to_pylist()
        sides = t.column("side").to_pylist()
        grs = t.column("grams").to_pylist()
        gmap = {d: g for d, p, g in zip(docs, pks, grs) if not p}
        out_p, out_s, out_g = [], [], []
        seen: set[tuple] = set()
        for d, p, s in zip(docs, pks, sides):
            if p and (p, s) not in seen:      # global (pair, side) dedup
                seen.add((p, s))
                out_p.append(p)
                out_s.append(s)
                out_g.append(gmap.get(d, ""))
        # sentinel row: zero-row map outputs become schema-less blocks that
        # crash downstream stages; "" pairs are dropped in combine()
        out_p.append("")
        out_s.append(0)
        out_g.append("")
        return pa.table({"pair": pa.array(out_p, pa.string()),
                         "side": pa.array(out_s, pa.int8()),
                         "grams": pa.array(out_g, pa.string())})

    sided = bucketed_group_agg(tagged, lambda t: t, "doc", attach,
                               num_buckets=max(64, num_partitions))

    def combine(t: pa.Table) -> pa.Table:
        by_pair: dict[str, dict[int, str]] = {}
        for p, s, g in zip(t.column("pair").to_pylist(),
                           t.column("side").to_pylist(),
                           t.column("grams").to_pylist()):
            if p:
                by_pair.setdefault(p, {})[s] = g
        a_col, b_col, j_col = [], [], []
        for p in sorted(by_pair):
            gs = by_pair[p]
            sx = set(gs.get(0, "").split(SEP)) if gs.get(0) else set()
            sy = set(gs.get(1, "").split(SEP)) if gs.get(1) else set()
            if metric == "containment":
                score = len(sx & sy) / len(sx) if sx else 0.0
            else:
                union = len(sx | sy)
                score = len(sx & sy) / union if union else 0.0
            if score >= jaccard_threshold:
                a, b = p.split(PSEP)
                a_col.append(int(a))
                b_col.append(int(b))
                j_col.append(round_half_away(score, 4))
        return pa.table({"doc_a": pa.array(a_col, pa.int64()),
                         "doc_b": pa.array(b_col, pa.int64()),
                         "jaccard": pa.array(j_col, pa.float64())})

    return bucketed_group_agg(sided, lambda t: t, "pair", combine,
                              num_buckets=max(64, num_partitions))


def simhash(documents: rd.Dataset, seed: int = 42,
            hash_family: str = "sha") -> rd.Dataset:
    """(doc_id, simhash_hex): 64-bit SimHash over tokens, majority bit vote.
    Ties (vote == 0, incl. empty docs) set the bit to 0.

    hash_family="sha" (default, oracle contract): token hash = first 16 hex
    chars of sha256(token#seed), one Python digest per token.
    hash_family="fast" (production): two crc32 passes per token packed to
    64 bits, voted batch-wide in one vectorized reduceat pass
    (:func:`simhash_matrix`) — no per-document Python loop."""
    if hash_family not in ("sha", "fast"):
        raise ValueError(f"unknown hash_family {hash_family!r}")

    def batch_fast(t: pa.Table) -> pa.Table:
        tok_lists = [_tokens(s) for s in t.column("text").to_pylist()]
        lens = np.fromiter((len(ts) for ts in tok_lists), np.int64,
                           count=len(tok_lists))
        offsets = np.zeros(len(tok_lists) + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = [f"{w}#{seed}" for ts in tok_lists for w in ts]
        vals = simhash_matrix(fast_hash64(flat), offsets)
        out = [format(int(v), "016x") for v in vals]
        # cast like the sha branch so both families emit one schema
        # (an int32-doc_id corpus would otherwise make the families'
        # outputs fail schema unification)
        return pa.table({"doc_id": pc.cast(
            t.column("doc_id").combine_chunks(), pa.int64()),
            "simhash_hex": pa.array(out, pa.string())})

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        out = []
        bit_idx = np.arange(64, dtype=np.uint64)
        for s in t.column("text").to_pylist():
            toks = _tokens(s)
            if not toks:
                out.append("0" * 16)
                continue
            hs = np.array([int(sha_hex(f"{w}#{seed}")[:16], 16) for w in toks],
                          dtype=np.uint64)
            bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            v = 0
            for b in range(64):
                if votes[b] > 0:
                    v |= 1 << b
            out.append(format(v, "016x"))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "simhash_hex": pa.array(out, pa.string())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch_fast if hash_family == "fast" else batch,
        batch_format="pyarrow")


def _cap_block(docs: list, label: object, max_block: int,
               op: str) -> list | None:
    """Skew guard for blocked all-pairs ops: a hot blocking key would go
    quadratic silently — instead cap the block to its ``max_block`` smallest
    doc ids and LOG what was dropped (no silent truncation)."""
    if max_block and len(docs) > max_block:
        import logging

        logging.getLogger("raykg").warning(
            "%s: blocking key %r has %d rows > cap %d — comparing only the "
            "%d smallest ids (%d rows skipped); re-block or raise max_block "
            "for full coverage", op, label, len(docs), max_block, max_block,
            len(docs) - max_block)
        return sorted(docs)[:max_block]
    return None


def _grams_stream(documents: rd.Dataset, partition_col: str,
                  gram: int) -> rd.Dataset:
    """(doc_id, part, grams) — the shared front of the blocked-all-pairs
    gram ops (ngram_jaccard_pairs / containment_pairs), so the gram/
    partition contract lives in exactly one place."""
    def add_grams(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "part": t.column(partition_col),
            "grams": pa.array([_grams(s, gram)
                               for s in t.column("text").to_pylist()],
                              pa.list_(pa.string())),
        })

    return documents.select_columns(["doc_id", "text", partition_col]) \
        .map_batches(add_grams, batch_format="pyarrow")


def _capped_docs_grams(t: pa.Table, max_block: int,
                       op: str) -> tuple[list, list]:
    """Shared per-block prologue: doc ids + gram SETS, hot blocks capped
    with a warning via _cap_block."""
    docs = t.column("doc_id").to_pylist()
    grams = [set(g) for g in t.column("grams").to_pylist()]
    capped = _cap_block(docs, t.column("part")[0].as_py() if t.num_rows
                        else None, max_block, op)
    if capped is not None:
        keep = set(capped)
        sel = [i for i, d in enumerate(docs) if d in keep]
        docs = [docs[i] for i in sel]
        grams = [grams[i] for i in sel]
    return docs, grams


def ngram_jaccard_pairs(documents: rd.Dataset, gram: int = 3,
                        threshold: float = 0.5,
                        partition_col: str = "source",
                        max_block: int = 20_000) -> rd.Dataset:
    """Exact n-gram Jaccard similarity for all pairs within a partition key
    (blocked all-pairs — the blocking key bounds the quadratic term; blocks
    beyond ``max_block`` rows are capped WITH a warning, never silently).
    Output: (doc_a, doc_b, jaccard) with jaccard >= threshold, rounded to 4."""
    with_grams = _grams_stream(documents, partition_col, gram)

    def pairs(t: pa.Table) -> pa.Table:
        docs, grams = _capped_docs_grams(t, max_block,
                                         "ngram_jaccard_pairs")
        order = sorted(range(len(docs)), key=lambda k: docs[k])
        a_col, b_col, j_col = [], [], []
        for x, y in combinations(order, 2):
            union = len(grams[x] | grams[y])
            jac = len(grams[x] & grams[y]) / union if union else 0.0
            if jac >= threshold:
                a_col.append(docs[x])
                b_col.append(docs[y])
                j_col.append(round_half_away(jac, 4))
        return pa.table({"doc_a": pa.array(a_col, pa.int64()),
                         "doc_b": pa.array(b_col, pa.int64()),
                         "jaccard": pa.array(j_col, pa.float64())})

    return with_grams.groupby("part").map_groups(pairs, batch_format="pyarrow")


def containment_pairs(documents: rd.Dataset, gram: int = 3,
                      threshold: float = 0.8,
                      partition_col: str = "source",
                      max_block: int = 20_000) -> rd.Dataset:
    """(doc_sub, doc_super, containment): ASYMMETRIC n-gram containment
    |G(sub) ∩ G(super)| / |G(sub)| >= ``threshold`` for ordered pairs
    within a partition key — Broder's containment coefficient, the
    near-dup signal Jaccard misses when a short document is wholly
    quoted inside a much longer one (the union term drowns the overlap).
    Both directions of every pair are tested; a direction is emitted iff
    it passes. Same blocked-all-pairs shape and ``max_block`` cap-with-
    warning discipline as :func:`ngram_jaccard_pairs` (the blocking key
    bounds the quadratic term; intersections are computed once per
    unordered pair and reused for both directions)."""

    with_grams = _grams_stream(documents, partition_col, gram)

    def pairs(t: pa.Table) -> pa.Table:
        docs, grams = _capped_docs_grams(t, max_block, "containment_pairs")
        order = sorted(range(len(docs)), key=lambda k: docs[k])
        sub_col, sup_col, c_col = [], [], []
        for x, y in combinations(order, 2):
            inter = len(grams[x] & grams[y])
            for sub, sup in ((x, y), (y, x)):
                if not grams[sub]:
                    continue
                cont = inter / len(grams[sub])
                if cont >= threshold:
                    sub_col.append(docs[sub])
                    sup_col.append(docs[sup])
                    c_col.append(round_half_away(cont, 4))
        return pa.table({"doc_sub": pa.array(sub_col, pa.int64()),
                         "doc_super": pa.array(sup_col, pa.int64()),
                         "containment": pa.array(c_col, pa.float64())})

    return with_grams.groupby("part").map_groups(pairs, batch_format="pyarrow")


def embedding_neardup_pairs(embeddings: rd.Dataset, threshold: float = 0.35,
                            block_col: str = "label",
                            max_block: int = 50_000) -> rd.Dataset:
    """Embedding-cosine near-dup pairs within a blocking key (blocks beyond
    ``max_block`` rows are capped WITH a warning, never silently).
    Output: (vec_a, vec_b, cos_sim rounded to 3), vec_a < vec_b."""

    def pairs(t: pa.Table) -> pa.Table:
        ids = np.array(t.column("vec_id").to_pylist())
        capped = _cap_block(ids.tolist(),
                            t.column(block_col)[0].as_py() if t.num_rows
                            else None, max_block, "embedding_neardup_pairs")
        if capped is not None:
            t = t.filter(pa.array(np.isin(ids, capped)))
            ids = np.array(t.column("vec_id").to_pylist())
        from raykg.ops.ann import _unit

        # the shared normalizer: the two near-dup ops (and ANN) must agree
        # on cosine semantics, zero-norm guard included
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        unit = _unit(mat)
        order = np.argsort(ids)
        unit = unit[order]
        sorted_ids = ids[order]
        sims = unit @ unit.T
        # vectorized upper-triangle extraction — row-major argwhere emits
        # pairs in the same (xi, yi) order the old nested loop did
        hits = np.argwhere(np.triu(sims >= threshold, k=1))
        a_col = [int(sorted_ids[i]) for i in hits[:, 0]]
        b_col = [int(sorted_ids[j]) for j in hits[:, 1]]
        s_col = [round_half_away(float(sims[i, j]), 3) for i, j in hits]
        return pa.table({"vec_a": pa.array(a_col, pa.int64()),
                         "vec_b": pa.array(b_col, pa.int64()),
                         "cos_sim": pa.array(s_col, pa.float64())})

    return embeddings.groupby(block_col).map_groups(pairs, batch_format="pyarrow")


def semantic_dedup_keep(embeddings: rd.Dataset, threshold: float = 0.35,
                        nlist: int = 16, cent: "np.ndarray | None" = None,
                        max_cluster: int = 50_000) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space, then within each cluster drop every vector that has
    a lower-id cluster-mate with cosine similarity >= ``threshold``.
    Output: (vec_id) — the keep list. Same drop-later-duplicates policy
    as :func:`raykg.ops.corpus.neardup_keep`, but over semantic space.

    ``cent=None`` uses the engine's deterministic coarse quantizer (the
    embeddings of vec_id < nlist, unit-normalized — SQL-exact, same
    stand-in as ann_ivf); pass
    :func:`raykg.ops.ann.kmeans_centroids` output for trained clusters
    (the real SemDeDup configuration; no SQL oracle — iterative float
    means).

    Scale path: assignment is a stateless map with the centroid matrix
    broadcast once via ``ray.put``; the quadratic cosine work happens
    only within a cluster, and SemDeDup sizes nlist ~ sqrt(n) exactly so
    clusters stay bounded — clusters beyond ``max_cluster`` rows are
    capped WITH a warning (never silently)."""
    import ray

    from raykg.ops.ann import _rows_for_ids, _unit

    if cent is None:
        rows = _rows_for_ids(embeddings, list(range(nlist)))
        by_id = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
                 for r in rows}
        cent = _unit(np.stack([by_id[i] for i in sorted(by_id)]))
    cent_ref = ray.put(np.ascontiguousarray(cent))

    def assign(t: pa.Table, cent_ref=cent_ref) -> pa.Table:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) \
            else cent_ref
        mat = _unit(np.array(t.column("embedding").to_pylist(),
                             dtype=np.float64))
        sims_c = mat @ c.T
        # max centroid sim, ties -> smaller centroid id (argmax is
        # first-max, and cids ascend left to right)
        cid = np.argmax(sims_c, axis=1).astype(np.int32)
        return pa.table({"vec_id": t.column("vec_id"),
                         "embedding": t.column("embedding"),
                         "cid": pa.array(cid, pa.int32())})

    def keep_in_cluster(t: pa.Table) -> pa.Table:
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        capped = _cap_block(ids.tolist(),
                            t.column("cid")[0].as_py() if t.num_rows
                            else None, max_cluster, "semantic_dedup_keep")
        if capped is not None:
            t = t.filter(pa.array(np.isin(ids, capped)))
            ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        unit = _unit(np.array(t.column("embedding").to_pylist(),
                              dtype=np.float64))
        order = np.argsort(ids)
        unit, sorted_ids = unit[order], ids[order]
        sims = unit @ unit.T
        dominated = np.triu(sims >= threshold, k=1).any(axis=0)
        return pa.table({"vec_id": pa.array(sorted_ids[~dominated],
                                            pa.int64())})

    assigned = embeddings.select_columns(["vec_id", "embedding"]) \
        .map_batches(assign, batch_format="pyarrow", batch_size=4096)
    return assigned.groupby("cid").map_groups(
        keep_in_cluster, batch_format="pyarrow")


def dup_span_stats(documents: rd.Dataset, span: int = 8,
                   num_buckets: int = 256) -> rd.Dataset:
    """(doc_id, n_windows, dup_windows, dup_fraction): per-doc duplicated
    token-span statistics — the ExactSubstr signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499), where a window is duplicated if its exact
    ``span``-token sequence occurs in at least one OTHER document. Docs
    shorter than ``span`` tokens are omitted. This is the detection half
    of suffix-array dedup, reformulated as rolling window hashes so it
    distributes: no suffix array, no global sort.

    Three bucketed exchanges, nothing driver-resident:
    1. distinct (window-hash, doc_id) pairs -> per-hash distinct-doc
       count; hashes seen in >= 2 docs become the dup set (stays
       distributed);
    2. tag-join the dup flag back onto the per-doc window stream
       (vectorized ``index_in``);
    3. per-doc segment aggregate."""

    from raykg.functions.shuffle import bucketed_group_agg

    def windows(t: pa.Table) -> pa.Table:
        """every window occurrence, multiplicity kept"""
        _require_nonneg_ids(t, "dup_span_stats")
        ids, hs = [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            toks = _tokens(s)
            for i in range(len(toks) - span + 1):
                ids.append(d)
                hs.append(sha_hex(" ".join(toks[i:i + span]))[:16])
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "wh": pa.array(hs, pa.string())})

    win = documents.select_columns(["doc_id", "text"]).map_batches(
        windows, batch_format="pyarrow")

    # ---- pass 1: hashes that appear in >= 2 distinct docs --------------
    def distinct_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["wh", "doc_id"]).aggregate([])
        return pa.table({"wh": g.column("wh"),
                         "doc_id": g.column("doc_id")})

    def dup_hashes(t: pa.Table) -> pa.Table:
        g = distinct_pairs(t).group_by("wh") \
            .aggregate([("doc_id", "count")])
        return g.filter(pc.greater_equal(g.column("doc_id_count"), 2)) \
            .select(["wh"])

    dups = bucketed_group_agg(win, distinct_pairs, "wh", dup_hashes,
                              num_buckets=num_buckets)

    # ---- pass 2: tag-join the flag onto the window stream --------------
    def probe(t: pa.Table) -> pa.Table:
        return pa.table({"wh": t.column("wh"),
                         "doc_id": t.column("doc_id"),
                         "tag": pa.array([0] * t.num_rows, pa.int8())})

    def build(t: pa.Table) -> pa.Table:
        return pa.table({"wh": t.column("wh"),
                         "doc_id": pa.array([-1] * t.num_rows, pa.int64()),
                         "tag": pa.array([1] * t.num_rows, pa.int8())})

    unioned = win.map_batches(probe, batch_format="pyarrow") \
        .union(dups.map_batches(build, batch_format="pyarrow"))

    def attach(t: pa.Table) -> pa.Table:
        tags = t.column("tag").combine_chunks()
        b = t.filter(pc.equal(tags, 1))
        p = t.filter(pc.equal(tags, 0))
        dup = pc.is_in(p.column("wh"),
                       value_set=b.column("wh").combine_chunks())
        return pa.table({"doc_id": p.column("doc_id"),
                         "dup": pc.cast(dup, pa.int64())})

    flagged = bucketed_group_agg(unioned, lambda t: t, "wh", attach,
                                 num_buckets=num_buckets)

    # ---- pass 3: per-doc aggregate --------------------------------------
    def per_doc_part(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("dup", "sum"),
                                            ("dup", "count")])
        out = pa.table({"doc_id": g.column("doc_id"),
                        "dup_windows": g.column("dup_sum"),
                        "n_windows": g.column("dup_count")})
        # sentinel row so zero-row blocks keep the schema
        return pa.table({
            "doc_id": pa.concat_arrays(
                [out.column("doc_id").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "dup_windows": pa.concat_arrays(
                [pc.cast(out.column("dup_windows").combine_chunks(),
                         pa.int64()), pa.array([0], pa.int64())]),
            "n_windows": pa.concat_arrays(
                [pc.cast(out.column("n_windows").combine_chunks(),
                         pa.int64()), pa.array([0], pa.int64())])})

    def per_doc_fin(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("dup_windows", "sum"),
                                            ("n_windows", "sum")])
        g = g.filter(pc.greater_equal(g.column("doc_id"), 0))
        nw = pc.cast(g.column("n_windows_sum"), pa.float64())
        dw = pc.cast(g.column("dup_windows_sum"), pa.float64())
        frac = [round_half_away(d / n, 4) for d, n in
                zip(dw.to_pylist(), nw.to_pylist())]
        return pa.table({"doc_id": g.column("doc_id"),
                         "n_windows": g.column("n_windows_sum"),
                         "dup_windows": g.column("dup_windows_sum"),
                         "dup_fraction": pa.array(frac, pa.float64())})

    return bucketed_group_agg(flagged, per_doc_part, "doc_id",
                              per_doc_fin, num_buckets=num_buckets)


def segment_dedup(documents: rd.Dataset, span: int = 8,
                  num_buckets: int = 256) -> rd.Dataset:
    """(doc_id, text_clean, n_segs, kept_segs): exact duplicated-segment
    REMOVAL — the rewrite half of ExactSubstr dedup (Lee et al. 2022,
    arXiv:2107.06499), where :func:`dup_span_stats` is the detection
    half. Docs are segmented into NON-overlapping ``span``-token windows
    (the trailing window may be shorter); a segment occurrence survives
    iff it is the corpus-wide FIRST occurrence of its exact text in
    (doc_id, segment-index) order. ``text_clean`` is the surviving
    segments re-joined by a single space in original order (possibly
    ``''`` when every segment was removed elsewhere-first). Docs with no
    tokens are omitted (no segment to keep or drop).

    Three bucketed exchanges, nothing driver-resident:
    1. per-segment-hash min of the packed (doc_id << 20 | idx) occurrence
       key — the first-occurrence rule, resolved distributed;
    2. tag-join the winning occurrence key back onto the segment stream
       (vectorized ``index_in``); segment text crosses the wire exactly
       once (this pass), the register-sized (hash, min) pairs twice;
    3. per-doc ordered reassembly.

    Collision envelope: the first-occurrence rule keys on the TRUNCATED
    64-bit segment hash (sha256[:16]) with no text-equality confirmation
    — two distinct segments sharing a hash would merge their occurrence
    groups and strip all but one corpus-wide. Expected collisions are
    ~n^2 / 2^65 (birthday): negligible through ~10^8 distinct segments,
    ~10^4 at the 10^12-segment extreme — widen the hash slice (and the
    DuckDB twin's, which replicates the same truncation) before running
    at that scale. dup_span_stats shares the envelope (there a collision
    only inflates counts, never deletes text).

    Occurrence keys pack as doc_id * 2^20 + idx, so doc_id must be in
    [0, 2^43) and docs are bounded at 2^20 segments (= 8M tokens at
    span 8) — both checked loudly per batch, same discipline as
    kg_edges' 30-bit guard."""

    from raykg.functions.shuffle import bucketed_group_agg

    IDX_BITS = 20
    IDX_CAP = 1 << IDX_BITS

    def segments(t: pa.Table) -> pa.Table:
        ids, idxs, packs, hs, segs = [], [], [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            if not (0 <= d < (1 << 43)):
                raise ValueError(
                    f"segment_dedup requires 0 <= doc_id < 2^43, got {d} "
                    "(occurrence keys pack as doc_id * 2^20 + idx)")
            toks = _tokens(s)
            n_segs = (len(toks) + span - 1) // span
            if n_segs >= IDX_CAP:
                raise ValueError(
                    f"doc {d} has {n_segs} segments >= 2^{IDX_BITS} cap; "
                    "raise span or split the document")
            for i in range(n_segs):
                seg = " ".join(toks[i * span:(i + 1) * span])
                ids.append(d)
                idxs.append(i)
                packs.append(d * IDX_CAP + i)
                hs.append(sha_hex(seg)[:16])
                segs.append(seg)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "idx": pa.array(idxs, pa.int64()),
                         "packed": pa.array(packs, pa.int64()),
                         "sh": pa.array(hs, pa.string()),
                         "seg": pa.array(segs, pa.string())})

    seg_stream = documents.select_columns(["doc_id", "text"]).map_batches(
        segments, batch_format="pyarrow")

    # ---- pass 1: first occurrence (min packed key) per segment hash ----
    def min_part(t: pa.Table) -> pa.Table:
        g = t.select(["sh", "packed"]).group_by("sh") \
            .aggregate([("packed", "min")])
        return pa.table({"sh": g.column("sh"),
                         "packed": g.column("packed_min")})

    winners = bucketed_group_agg(seg_stream, min_part, "sh", min_part,
                                 num_buckets=num_buckets)

    # ---- pass 2: tag-join the winner key onto the segment stream -------
    def probe(t: pa.Table) -> pa.Table:
        return pa.table({"sh": t.column("sh"),
                         "doc_id": t.column("doc_id"),
                         "idx": t.column("idx"),
                         "packed": t.column("packed"),
                         "seg": t.column("seg"),
                         "tag": pa.array([0] * t.num_rows, pa.int8())})

    def build(t: pa.Table) -> pa.Table:
        return pa.table({"sh": t.column("sh"),
                         "doc_id": pa.array([-1] * t.num_rows, pa.int64()),
                         "idx": pa.array([0] * t.num_rows, pa.int64()),
                         "packed": t.column("packed"),
                         "seg": pa.array([""] * t.num_rows, pa.string()),
                         "tag": pa.array([1] * t.num_rows, pa.int8())})

    unioned = seg_stream.map_batches(probe, batch_format="pyarrow") \
        .union(winners.map_batches(build, batch_format="pyarrow"))

    def attach(t: pa.Table) -> pa.Table:
        tags = t.column("tag").combine_chunks()
        b = t.filter(pc.equal(tags, 1))
        p = t.filter(pc.equal(tags, 0))
        pos = pc.index_in(p.column("sh"),
                          value_set=b.column("sh").combine_chunks())
        win = pc.take(b.column("packed").combine_chunks(), pos)
        keep = pc.cast(pc.equal(p.column("packed").combine_chunks(), win),
                       pa.int64())
        if isinstance(keep, pa.ChunkedArray):
            keep = keep.combine_chunks()
        # sentinel row: doc_id=-1 cannot occur (checked in segments());
        # keeps zero-row blocks typed through the next shuffle
        return pa.table({
            "doc_id": pa.concat_arrays(
                [p.column("doc_id").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "idx": pa.concat_arrays(
                [p.column("idx").combine_chunks(), pa.array([0], pa.int64())]),
            "seg": pa.concat_arrays(
                [p.column("seg").combine_chunks(), pa.array([""], pa.string())]),
            "keep": pa.concat_arrays([keep, pa.array([0], pa.int64())])})

    flagged = bucketed_group_agg(unioned, lambda t: t, "sh", attach,
                                 num_buckets=num_buckets)

    # ---- pass 3: per-doc ordered reassembly ----------------------------
    def rebuild(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        out_d, out_t, out_n, out_k = [], [], [], []
        if not t.num_rows:   # sentinel-only bucket; terminal stage, so a
            return pa.table({   # typed zero-row table is fine here
                "doc_id": pa.array(out_d, pa.int64()),
                "text_clean": pa.array(out_t, pa.string()),
                "n_segs": pa.array(out_n, pa.int64()),
                "kept_segs": pa.array(out_k, pa.int64())})
        ids = np.asarray(t.column("doc_id").to_pylist(), np.int64)
        idxs = np.asarray(t.column("idx").to_pylist(), np.int64)
        keeps = np.asarray(t.column("keep").to_pylist(), np.int64)
        segs = t.column("seg").to_pylist()
        order = np.lexsort((idxs, ids))
        ids, idxs, keeps = ids[order], idxs[order], keeps[order]
        segs = [segs[i] for i in order]
        # segment boundaries per doc
        bounds = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        for s, e in zip(bounds, np.r_[bounds[1:], len(ids)]):
            out_d.append(int(ids[s]))
            out_t.append(" ".join(g for g, k in
                                  zip(segs[s:e], keeps[s:e]) if k))
            out_n.append(int(e - s))
            out_k.append(int(keeps[s:e].sum()))
        return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                         "text_clean": pa.array(out_t, pa.string()),
                         "n_segs": pa.array(out_n, pa.int64()),
                         "kept_segs": pa.array(out_k, pa.int64())})

    return bucketed_group_agg(flagged, lambda t: t, "doc_id", rebuild,
                              num_buckets=num_buckets)


def decontaminate(documents: rd.Dataset, span: int = 8,
                  val_frac: float = 0.1, test_frac: float = 0.1,
                  seed: int = 42, num_buckets: int = 256) -> rd.Dataset:
    """(doc_id, n_windows, contam_windows, contaminated): train/test
    decontamination — the GPT-3/PaLM-style n-gram overlap check. Splits
    the corpus with the :func:`raykg.ops.corpus.hash_split` rule (pure
    function of doc_id, so no join against a split table is needed),
    then flags every TRAIN document that shares an exact ``span``-token
    window with any TEST document. Train docs shorter than ``span``
    tokens are omitted (no window to leak through).

    Same three bucketed exchanges as :func:`dup_span_stats`, nothing
    driver-resident: (1) window hashes that occur in >= 1 test doc
    (stays distributed), (2) tag-join the flag onto the train-side
    window stream, (3) per-doc aggregate. The test side is usually tiny
    relative to train, so exchange volume is dominated by the one pass
    over the train windows — the decontamination shape that holds at
    100 TB."""

    from raykg.functions.hashing import hex_threshold8
    from raykg.functions.shuffle import bucketed_group_agg

    thr_val = hex_threshold8(val_frac)
    thr_test = hex_threshold8(val_frac + test_frac)

    def _split(doc_id: int) -> str:
        h = sha_hex(f"split|{seed}|{doc_id}")[:8]
        return "val" if h < thr_val else \
            "test" if h < thr_test else "train"

    def windows(t: pa.Table) -> pa.Table:
        """window occurrences of train/test docs, tagged with the split
        (is_test=1 for test windows, 0 for train; val docs are skipped)"""
        _require_nonneg_ids(t, "decontaminate")
        ids, hs, tst = [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            sp = _split(d)
            if sp == "val":
                continue
            toks = _tokens(s)
            flag = 1 if sp == "test" else 0
            for i in range(len(toks) - span + 1):
                ids.append(d)
                hs.append(sha_hex(" ".join(toks[i:i + span]))[:16])
                tst.append(flag)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "wh": pa.array(hs, pa.string()),
                         "is_test": pa.array(tst, pa.int8())})

    win = documents.select_columns(["doc_id", "text"]).map_batches(
        windows, batch_format="pyarrow")

    # ---- pass 1: window hashes present in any test doc -----------------
    def test_hashes_part(t: pa.Table) -> pa.Table:
        g = t.filter(pc.equal(t.column("is_test"), 1)) \
            .group_by("wh").aggregate([])
        return pa.table({"wh": g.column("wh")})

    def test_hashes_fin(t: pa.Table) -> pa.Table:
        # partials are already test-only; just dedupe per bucket
        return pa.table({"wh": t.group_by("wh").aggregate([]).column("wh")})

    leaks = bucketed_group_agg(win, test_hashes_part, "wh", test_hashes_fin,
                               num_buckets=num_buckets)

    # ---- pass 2: tag-join the leak flag onto the TRAIN window stream ---
    def probe(t: pa.Table) -> pa.Table:
        p = t.filter(pc.equal(t.column("is_test"), 0))
        return pa.table({"wh": p.column("wh"),
                         "doc_id": p.column("doc_id"),
                         "tag": pa.array([0] * p.num_rows, pa.int8())})

    def build(t: pa.Table) -> pa.Table:
        return pa.table({"wh": t.column("wh"),
                         "doc_id": pa.array([-1] * t.num_rows, pa.int64()),
                         "tag": pa.array([1] * t.num_rows, pa.int8())})

    unioned = win.map_batches(probe, batch_format="pyarrow") \
        .union(leaks.map_batches(build, batch_format="pyarrow"))

    def attach(t: pa.Table) -> pa.Table:
        tags = t.column("tag").combine_chunks()
        b = t.filter(pc.equal(tags, 1))
        p = t.filter(pc.equal(tags, 0))
        hit = pc.is_in(p.column("wh"),
                       value_set=b.column("wh").combine_chunks())
        return pa.table({"doc_id": p.column("doc_id"),
                         "hit": pc.cast(hit, pa.int64())})

    flagged = bucketed_group_agg(unioned, lambda t: t, "wh", attach,
                                 num_buckets=num_buckets)

    # ---- pass 3: per-train-doc aggregate --------------------------------
    def per_doc_part(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("hit", "sum"),
                                            ("hit", "count")])
        return pa.table({
            "doc_id": pa.concat_arrays(
                [g.column("doc_id").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "contam_windows": pa.concat_arrays(
                [pc.cast(g.column("hit_sum").combine_chunks(), pa.int64()),
                 pa.array([0], pa.int64())]),
            "n_windows": pa.concat_arrays(
                [pc.cast(g.column("hit_count").combine_chunks(), pa.int64()),
                 pa.array([0], pa.int64())])})

    def per_doc_fin(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("contam_windows", "sum"),
                                            ("n_windows", "sum")])
        g = g.filter(pc.greater_equal(g.column("doc_id"), 0))
        return pa.table({
            "doc_id": g.column("doc_id"),
            "n_windows": g.column("n_windows_sum"),
            "contam_windows": g.column("contam_windows_sum"),
            "contaminated": pc.cast(pc.greater(
                g.column("contam_windows_sum"), 0), pa.int64())})

    return bucketed_group_agg(flagged, per_doc_part, "doc_id",
                              per_doc_fin, num_buckets=num_buckets)


def _ed_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 in one pass (no DP table)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        if a == b:
            return True
        return sum(1 for x, y in zip(a, b) if x != y) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_name_pairs(names: rd.Dataset, col: str = "name",
                     max_bucket: int = 10_000) -> rd.Dataset:
    """(name_a, name_b): all DISTINCT string pairs within Levenshtein
    distance 1, via SymSpell deletion-neighborhood blocking (Garbe 2012):
    two strings are within edit distance 1 iff one appears in the other's
    1-deletion set or they share a 1-deletion variant, so candidate
    generation is a hash-key groupby on {s} ∪ deletes1(s) instead of an
    all-pairs scan. Shared-variant collisions that are really distance 2
    (e.g. "ab"/"ba" both delete to "a") are removed by an exact O(len)
    verify inside the bucket. Same blocking idea as the KG linker's typo
    stage (stages/link_distributed.py), exposed as a standalone
    similarity-join operator; the DuckDB twin is the quadratic
    ``levenshtein(a, b) <= 1`` self-join.

    Scale shape: one distinct-names exchange, a (len+1)-way key explode
    carrying only (key, name), one key groupby whose per-bucket quadratic
    is bounded by the deletion-neighborhood size (and capped WITH a
    warning via ``max_bucket`` — hot keys come from very short strings,
    which callers should pre-filter), then a pair-keyed distinct since a
    pair can surface under several shared keys."""

    def batch_distinct(t: pa.Table) -> pa.Table:
        return pa.table({col: t.column(col).unique()})

    distinct = names.select_columns([col]) \
        .map_batches(batch_distinct, batch_format="pyarrow") \
        .groupby(col).map_groups(lambda t: t.slice(0, 1),
                                 batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        keys, vals = [], []
        for s in t.column(col).to_pylist():
            variants = {s}
            for i in range(len(s)):
                variants.add(s[:i] + s[i + 1:])
            for v in variants:
                keys.append(v)
                vals.append(s)
        return pa.table({"key": pa.array(keys, pa.string()),
                         "name": pa.array(vals, pa.string())})

    exploded = distinct.map_batches(explode, batch_format="pyarrow")

    def bucket_pairs(t: pa.Table) -> pa.Table:
        ns = sorted(set(t.column("name").to_pylist()))
        label = t.column("key")[0].as_py() if t.num_rows else None
        capped = _cap_block(ns, label, max_bucket, "fuzzy_name_pairs")
        if capped is not None:
            ns = capped
        # sentinel pair: NUL-prefixed strings cannot be real names (the
        # explode only emits data-derived strings), and most buckets have
        # no ED-1 pair at all — without the sentinel they would emit
        # schema-less zero-row blocks (functions/shuffle.py convention)
        a_col, b_col = ["\x00S"], ["\x00S"]
        for i, j in combinations(range(len(ns)), 2):
            if _ed_le1(ns[i], ns[j]):
                a_col.append(ns[i])
                b_col.append(ns[j])
        return pa.table({"name_a": pa.array(a_col, pa.string()),
                         "name_b": pa.array(b_col, pa.string())})

    pairs = exploded.groupby("key").map_groups(bucket_pairs,
                                               batch_format="pyarrow")

    def pair_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["name_a", "name_b"]).aggregate([])

    return pairs.map_batches(pair_distinct, batch_format="pyarrow") \
        .groupby(["name_a", "name_b"]) \
        .map_groups(lambda t: t.slice(0, 1), batch_format="pyarrow") \
        .map_batches(
            lambda t: t.filter(pc.not_equal(t.column("name_a"), "\x00S")),
            batch_format="pyarrow")


def set_similarity_join(documents: rd.Dataset, gram: int = 3,
                        threshold: float = 0.6,
                        num_buckets: int = 256,
                        max_prefix_bucket: int = 10_000) -> rd.Dataset:
    """GLOBAL exact Jaccard similarity join via prefix filtering (SSJoin /
    PPJoin — Chaudhuri et al., ICDE 2006; Xiao et al., WWW 2008): the
    scale-exact complement to :func:`ngram_jaccard_pairs` (which bounds its
    quadratic with a partition key) and to :func:`lsh_candidate_pairs`
    (which trades recall for scan volume). No blocking key and NO false
    negatives: under one global gram ordering (ascending document
    frequency, gram text as tiebreak), any pair with J(x, y) >= t must
    share at least one gram inside each side's prefix — the first
    |x| - ceil(t*|x|) + 1 grams — so candidates are generated only inside
    prefix-gram buckets, which the rarity ordering keeps small (a doc's
    prefix is its RAREST grams; hot boilerplate grams sort last and rarely
    enter any prefix). ``threshold`` is converted to an exact Fraction so
    the prefix length and size filter never lose a pair to float rounding.

    Dataflow — three bucketed exchanges plus the shared verify tail:
      1. key=gram: exact global document frequency attach;
      2. key=doc_id: per-doc rarity sort, prefix selection;
      3. key=prefix gram: size-filtered candidate pairs
         (t*|x| <= |y| <= |x|/t, else J >= t is impossible), capped per
         bucket at ``max_prefix_bucket`` docs WITH a warning;
      4. :func:`_exact_jaccard_verify` — grams cross the wire twice total.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= t, 4 dp.
    """
    frac = Fraction(str(threshold))
    t_num, t_den = frac.numerator, frac.denominator
    grams_ds, with_df, prefixes = _prefix_pipeline(
        documents, gram, t_num, t_den, num_buckets, "set_similarity_join")
    from raykg.functions.shuffle import bucketed_group_agg

    # --- exchange 3 (key=prefix gram): size-filtered candidate pairs.
    def gen_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        a_col: list[int] = []
        b_col: list[int] = []
        if t.num_rows:
            order = pc.sort_indices(t, sort_keys=[
                ("gram", "ascending"), ("n", "ascending"),
                ("doc_id", "ascending")])
            t = t.take(order)
            grams_np = t.column("gram").to_pylist()
            docs = t.column("doc_id").to_pylist()
            ns = t.column("n").to_pylist()
            start = 0
            for i in range(1, len(grams_np) + 1):
                if i == len(grams_np) or grams_np[i] != grams_np[start]:
                    seg_docs = docs[start:i]
                    seg_ns = ns[start:i]
                    capped = _cap_block(seg_docs, grams_np[start],
                                        max_prefix_bucket,
                                        "set_similarity_join")
                    if capped is not None:
                        keep = set(capped)
                        sel = [k for k, d in enumerate(seg_docs)
                               if d in keep]
                        seg_docs = [seg_docs[k] for k in sel]
                        seg_ns = [seg_ns[k] for k in sel]
                    # sizes ascend: for j > k need n_k * t_den >= t_num * n_j
                    for k in range(len(seg_docs)):
                        for j in range(k + 1, len(seg_docs)):
                            if seg_ns[k] * t_den < t_num * seg_ns[j]:
                                break   # sizes only grow from here
                            a, b = seg_docs[k], seg_docs[j]
                            if a != b:
                                a_col.append(min(a, b))
                                b_col.append(max(a, b))
                    start = i
        a_col.append(-1)    # sentinel, dropped by _exact_jaccard_verify
        b_col.append(-1)
        return pa.table({"doc_a": pa.array(a_col, pa.int64()),
                         "doc_b": pa.array(b_col, pa.int64())})

    cands = bucketed_group_agg(prefixes, lambda t: t, "gram", gen_pairs,
                               num_buckets=num_buckets)

    return _exact_jaccard_verify(cands, grams_ds, threshold,
                                 num_partitions=max(8, num_buckets // 32))


def _prefix_pipeline(documents: rd.Dataset, gram: int, t_num: int,
                     t_den: int, num_buckets: int, op_name: str):
    """Shared prefix-filter front half (SSJoin family): returns
    (grams_ds, with_df, prefixes) —
    grams_ds: materialized (doc_id, grams list<string>);
    with_df: exploded (gram, doc_id, n, df) with the EXACT global document
    frequency attached inside one gram-keyed exchange (every occurrence of
    a gram hashes to the same bucket, so the within-bucket count IS the
    global count);
    prefixes: (gram, doc_id, n) rows for each doc's rarity-ordered prefix
    of Fraction-exact length |x| - ceil(t*|x|) + 1 (df ascending, gram
    text as tiebreak), selected in one doc-keyed exchange."""
    from raykg.functions.shuffle import bucketed_group_agg

    def add_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        if any(d < 0 for d in ids):
            raise ValueError(
                f"{op_name}: negative doc_id collides with the "
                "sentinel convention (functions/shuffle.py docstring)")
        gl = [_grams(s, gram) for s in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "grams": pa.array(gl, pa.list_(pa.string()))})

    grams_ds = documents.select_columns(["doc_id", "text"]) \
        .map_batches(add_grams, batch_format="pyarrow").materialize()

    def explode(t: pa.Table) -> pa.Table:
        docs: list[int] = []
        gs: list[str] = []
        ns: list[int] = []
        for d, lst in zip(t.column("doc_id").to_pylist(),
                          t.column("grams").to_pylist()):
            for g in lst:
                docs.append(d)
                gs.append(g)
                ns.append(len(lst))
        # sentinel: a batch of only empty-gram docs would emit zero rows;
        # "" cannot be a real gram (grams join non-empty tokens)
        docs.append(-1)
        gs.append("")
        ns.append(0)
        return pa.table({"gram": pa.array(gs, pa.string()),
                         "doc_id": pa.array(docs, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    def attach_df(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        counts = t.group_by("gram").aggregate([("doc_id", "count")])
        pos = pc.index_in(t.column("gram"), counts.column("gram"))
        df = pc.take(counts.column("doc_id_count"), pos)
        out = pa.table({"gram": t.column("gram"),
                        "doc_id": t.column("doc_id"),
                        "n": t.column("n"),
                        "df": pc.cast(df, pa.int64())})
        sent = pa.table({"gram": pa.array([""], pa.string()),
                         "doc_id": pa.array([-1], pa.int64()),
                         "n": pa.array([0], pa.int64()),
                         "df": pa.array([0], pa.int64())})
        return pa.concat_tables([out, sent])

    with_df = bucketed_group_agg(grams_ds, explode, "gram", attach_df,
                                 num_buckets=num_buckets)

    def select_prefix(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        if t.num_rows:
            order = pc.sort_indices(t, sort_keys=[
                ("doc_id", "ascending"), ("df", "ascending"),
                ("gram", "ascending")])
            t = t.take(order)
            docs = t.column("doc_id").to_numpy(zero_copy_only=False)
            ns = t.column("n").to_numpy(zero_copy_only=False)
            change = np.empty(len(docs), np.bool_)
            change[0] = True
            np.not_equal(docs[1:], docs[:-1], out=change[1:])
            seg_start = np.maximum.accumulate(
                np.where(change, np.arange(len(docs)), 0))
            rank = np.arange(len(docs)) - seg_start
            # prefix length p = n - ceil(t*n) + 1, ceil in exact integers
            ceil_tn = -((-t_num * ns) // t_den)
            keep = rank < (ns - ceil_tn + 1)
            t = t.filter(pa.array(keep))
        out = pa.table({"gram": t.column("gram"),
                        "doc_id": t.column("doc_id"),
                        "n": t.column("n")})
        sent = pa.table({"gram": pa.array([""], pa.string()),
                         "doc_id": pa.array([-1], pa.int64()),
                         "n": pa.array([0], pa.int64())})
        return pa.concat_tables([out, sent])

    prefixes = bucketed_group_agg(with_df, lambda t: t, "doc_id",
                                  select_prefix, num_buckets=num_buckets)
    return grams_ds, with_df, prefixes


def containment_join(documents: rd.Dataset, gram: int = 3,
                     threshold: float = 0.8,
                     num_buckets: int = 256,
                     max_posting: int = 10_000) -> rd.Dataset:
    """GLOBAL exact containment join — ordered pairs (doc_sub, doc_super)
    with Broder containment |G(sub) ∩ G(super)| / |G(sub)| >= t and NO
    partition blocking: the scale-exact complement to
    :func:`containment_pairs` the way :func:`set_similarity_join` is to
    :func:`ngram_jaccard_pairs`. The asymmetric prefix filter (the
    containment case of Chaudhuri et al. 2006): |sub ∩ super| >=
    ceil(t*|sub|) forces the RAREST shared gram into sub's prefix
    (same Fraction-exact length as the Jaccard join), but the super side
    has no prefix bound — a quote can sit anywhere — so candidates come
    from sub-prefix grams probed against the FULL posting list of each
    gram. Posting lists of grams that enter someone's prefix are rare by
    construction (a prefix holds a doc's rarest grams); a degenerate hot
    posting is capped at ``max_posting`` WITH a logged warning. Size
    filter: |super| >= ceil(t*|sub|) (the intersection cannot exceed
    |super|). Verification is the shared exact tail with
    ``metric="containment"`` — grams cross the wire twice total.

    Output: (doc_sub, doc_super, containment) >= t, 4 dp, both
    directions tested independently."""
    frac = Fraction(str(threshold))
    t_num, t_den = frac.numerator, frac.denominator
    grams_ds, with_df, prefixes = _prefix_pipeline(
        documents, gram, t_num, t_den, num_buckets, "containment_join")
    from raykg.functions.shuffle import bucketed_group_agg

    def prefix_tag(t: pa.Table) -> pa.Table:
        return pa.table({"gram": t.column("gram"),
                         "doc_id": t.column("doc_id"),
                         "n": t.column("n"),
                         "side": pa.array([0] * t.num_rows, pa.int8())})

    def posting_tag(t: pa.Table) -> pa.Table:
        return pa.table({"gram": t.column("gram"),
                         "doc_id": t.column("doc_id"),
                         "n": t.column("n"),
                         "side": pa.array([1] * t.num_rows, pa.int8())})

    tagged = prefixes.map_batches(prefix_tag, batch_format="pyarrow") \
        .union(with_df.map_batches(
            lambda t: posting_tag(t.select(["gram", "doc_id", "n"])),
            batch_format="pyarrow"))

    def gen_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        a_col: list[int] = []
        b_col: list[int] = []
        if t.num_rows:
            order = pc.sort_indices(t, sort_keys=[
                ("gram", "ascending"), ("side", "ascending"),
                ("doc_id", "ascending")])
            t = t.take(order)
            grams_np = t.column("gram").to_pylist()
            docs = t.column("doc_id").to_pylist()
            ns = t.column("n").to_pylist()
            sides = t.column("side").to_pylist()
            start = 0
            for i in range(1, len(grams_np) + 1):
                if i == len(grams_np) or grams_np[i] != grams_np[start]:
                    subs = [(docs[k], ns[k]) for k in range(start, i)
                            if sides[k] == 0]
                    sups = [(docs[k], ns[k]) for k in range(start, i)
                            if sides[k] == 1]
                    sup_ids = [d for d, _ in sups]
                    capped = _cap_block(sup_ids, grams_np[start],
                                        max_posting, "containment_join")
                    if capped is not None:
                        keep = set(capped)
                        sups = [(d, n) for d, n in sups if d in keep]
                    for sd, sn in subs:
                        need = -((-t_num * sn) // t_den)   # ceil(t*|sub|)
                        for pd, pn in sups:
                            if pd != sd and pn >= need:
                                a_col.append(sd)
                                b_col.append(pd)
                    start = i
        a_col.append(-1)    # sentinel, dropped by the verify tail
        b_col.append(-1)
        return pa.table({"doc_a": pa.array(a_col, pa.int64()),
                         "doc_b": pa.array(b_col, pa.int64())})

    cands = bucketed_group_agg(tagged, lambda t: t, "gram", gen_pairs,
                               num_buckets=num_buckets)

    out = _exact_jaccard_verify(cands, grams_ds, threshold,
                                num_partitions=max(8, num_buckets // 32),
                                metric="containment")
    return out.map_batches(
        lambda t: t.rename_columns(["doc_sub", "doc_super", "containment"]),
        batch_format="pyarrow")
