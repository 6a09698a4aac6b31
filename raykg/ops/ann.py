"""Similarity search over an embedding column (list<float>).

- ``ann_bruteforce``: exact cosine top-k — numpy matmul per batch against a
  query matrix broadcast ONCE via ``ray.put`` (read per actor/task from the
  object store, never re-shipped per batch), then a per-batch partial top-k
  and a tiny final merge. This is the correctness baseline.
- ``ann_lsh``: the scale path — sha-derived ±1 hyperplane (sign) LSH
  buckets; queries only scan their own bucket, trading recall for a ~2^bits
  reduction in scanned rows. Bucket ids are SQL-replicable (exact DuckDB
  oracle), recall additionally measured against brute force in tests.

All three share a distributed final merge (``_merge_topk``): partial top-k
per block, then a ``groupby(query_id)`` reduction on the cluster — the
driver only ever receives k rows per query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from raykg.functions.hashing import round_half_away, sha_hex


def _rows_for_ids(embeddings: rd.Dataset, ids: list[int],
                  require_all_for: str | None = None) -> list[dict]:
    """Fetch specific vec_id rows via a vectorized batch filter (portable —
    no dependence on Dataset.filter expression support).

    ``require_all_for=<op name>``: raise a clear ValueError naming any id
    absent from the corpus — the contract for QUERY fetches, which would
    otherwise silently drop missing queries from the output (or die in an
    opaque np.stack when none are found). Centroid/sample fetches
    (``list(range(n))`` prefixes) stay lenient by design."""
    id_set = pa.array(ids, pa.int64())
    rows = embeddings.map_batches(
        lambda t: t.filter(pc.is_in(t.column("vec_id"), value_set=id_set)),
        batch_format="pyarrow").take_all()
    if require_all_for is not None:
        found = {r["vec_id"] for r in rows}
        missing = [i for i in ids if i not in found]
        if missing:
            raise ValueError(
                f"{require_all_for}: query vec_id(s) "
                f"{missing[:5]}{'...' if len(missing) > 5 else ''} "
                "not found in the corpus")
    return rows


def _unit(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


# typed empty partial for the scan closures' zero-row-batch guards
_EMPTY_PARTIAL = pa.table({
    "query_id": pa.array([], pa.int64()),
    "neighbor_id": pa.array([], pa.int64()),
    "cos_sim": pa.array([], pa.float64())})


def _merge_topk(partial: rd.Dataset, k: int) -> pa.Table:
    """Distributed final top-k merge: the per-block partials (at most k rows
    per query per block) are merged ON THE CLUSTER with a ``groupby(query_id)``
    — each group reduces its q*k*n_blocks candidate rows to k — so the driver
    receives exactly k rows per query, never the full partial set. Ties break
    by ascending neighbor_id (deterministic, matches the SQL oracles)."""

    def topk(t: pa.Table) -> pa.Table:
        sims = t.column("cos_sim").to_numpy(zero_copy_only=False)
        nids = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        sel = np.lexsort((nids, -sims))
        # a neighbor can reach the merge through several partials/probes —
        # keep the first (max-sim) row per neighbor before the cut
        _, first = np.unique(nids[sel], return_index=True)
        sel = sel[np.sort(first)][:k]
        return pa.table({
            "query_id": t.column("query_id").take(pa.array(sel)),
            "neighbor_id": pa.array(nids[sel]),
            "cos_sim": pa.array(round_half_away(sims[sel], 3), pa.float64()),
        })

    merged = partial.groupby("query_id").map_groups(topk,
                                                    batch_format="pyarrow")
    out = pa.Table.from_pylist(merged.take_all(), schema=pa.schema([
        ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
        ("cos_sim", pa.float64())]))
    return out.sort_by([("query_id", "ascending"),
                        ("cos_sim", "descending"),
                        ("neighbor_id", "ascending")])


def ann_bruteforce(embeddings: rd.Dataset, query_ids: list[int],
                   k: int = 5) -> pa.Table:
    """Exact top-k cosine neighbors for each query id (excluding self).
    Output: (query_id, neighbor_id, cos_sim rounded to 3).
    Ties broken by ascending neighbor_id (deterministic)."""
    q_rows = _rows_for_ids(embeddings, query_ids,
                           require_all_for="ann_bruteforce")
    q_by_id = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
               for r in q_rows}
    q_ids = sorted(q_by_id)
    q_mat = _unit(np.stack([q_by_id[i] for i in q_ids]))
    q_ref = ray.put((q_ids, q_mat))

    class PartialTopK:
        def __init__(self):
            self.q_ids, self.q_mat = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:      # empty block: 1-D np.array([])
                return _EMPTY_PARTIAL    # would AxisError inside _unit
            ids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
            mat = _unit(np.array(batch.column("embedding").to_pylist(),
                                 dtype=np.float64))
            sims = self.q_mat @ mat.T          # (n_q, n_batch)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids):
                row = sims[qi]
                mask = ids != qid
                cand_ids, cand_sims = ids[mask], row[mask]
                top = min(len(cand_ids), k)
                if top == 0:
                    continue
                # partial top-k within the batch (sim desc, id asc)
                sel = np.lexsort((cand_ids, -cand_sims))[:top]
                out_q.extend([qid] * top)
                out_n.extend(cand_ids[sel].tolist())
                out_s.extend(cand_sims[sel].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos_sim": pa.array(out_s, pa.float64()),
            })

    partial = embeddings.map_batches(PartialTopK, batch_format="pyarrow",
                                     concurrency=(1, 8), batch_size=4096)
    return _merge_topk(partial, k)


def kmeans_centroids(embeddings: rd.Dataset, k: int = 16, iters: int = 5
                     ) -> np.ndarray:
    """Distributed Lloyd's k-means over the (unit-normalized) embedding
    column: initialization from the first k vec_ids (deterministic), then
    per-iteration map_batches computing per-cluster partial sums/counts —
    only (n_blocks x k x dim) partials ever reach the driver, never rows.
    Empty clusters keep their previous centroid. Returns the (k, dim)
    unit-normalized centroid matrix."""
    embeddings = embeddings.materialize()   # consumed once per iteration
    init_rows = _rows_for_ids(embeddings, list(range(k)))
    by_id = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
             for r in init_rows}
    cent = _unit(np.stack([by_id[i] for i in sorted(by_id)]))

    def assign_sum(batch: pa.Table, cent_ref) -> pa.Table:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) \
            else cent_ref
        if batch.num_rows == 0:    # 1-D np.array([]) would AxisError
            return pa.table({
                "cid": pa.array(np.arange(len(c)), pa.int32()),
                "vsum": pa.array(np.zeros_like(c).tolist(),
                                 pa.list_(pa.float64())),
                "n": pa.array(np.zeros(len(c), np.int64), pa.int64())})
        mat = _unit(np.array(batch.column("embedding").to_pylist(),
                             dtype=np.float64))
        assign = np.argmax(mat @ c.T, axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, assign, mat)
        counts = np.bincount(assign, minlength=len(c))
        return pa.table({
            "cid": pa.array(np.arange(len(c)), pa.int32()),
            "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
            "n": pa.array(counts, pa.int64()),
        })

    for _ in range(iters):
        # stateless task-pool map (no per-iteration actor-pool spin-up);
        # centroids broadcast once per iteration via the object store
        parts = embeddings.map_batches(
            assign_sum, fn_kwargs={"cent_ref": ray.put(cent)},
            batch_format="pyarrow", batch_size=4096).take_all()
        sums = np.zeros_like(cent)
        counts = np.zeros(len(cent), dtype=np.int64)
        for r in parts:
            sums[r["cid"]] += np.asarray(r["vsum"])
            counts[r["cid"]] += r["n"]
        nonempty = counts > 0
        new = cent.copy()
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cent = _unit(new)
    return cent


def _ivf_scan(embeddings: rd.Dataset, query_ids: list[int],
              cent: np.ndarray, k: int, nprobe: int) -> pa.Table:
    """Shared IVF probe-scan: assignment by nearest centroid, per-query
    probing of the nprobe nearest lists, distributed top-k merge."""
    cent_ids = list(range(len(cent)))

    q_rows = _rows_for_ids(embeddings, query_ids,
                           require_all_for="ann_ivf")
    q_by_id = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
               for r in q_rows}
    q_ids = sorted(q_by_id)
    q_mat = _unit(np.stack([q_by_id[i] for i in q_ids]))
    # per-query probe lists: nprobe nearest centroids (ties -> smaller id)
    q_cent_sims = q_mat @ cent.T
    probes = {}
    for qi, qid in enumerate(q_ids):
        order = np.lexsort((np.array(cent_ids), -q_cent_sims[qi]))[:nprobe]
        probes[qid] = {cent_ids[j] for j in order}
    ref = ray.put((q_ids, q_mat, cent, np.array(cent_ids), probes))

    class ProbeScan:
        def __init__(self):
            (self.q_ids, self.q_mat, self.cent, self.cent_ids,
             self.probes) = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _EMPTY_PARTIAL
            ids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
            mat = _unit(np.array(batch.column("embedding").to_pylist(),
                                 dtype=np.float64))
            sims_c = mat @ self.cent.T
            # assignment: max centroid sim, ties -> smaller centroid id.
            # cent_ids is ascending (built from sorted dict keys), so
            # argmax's first-occurrence tie rule IS the smaller id —
            # no n x nlist lexsort needed (kmeans_centroids precedent)
            assigned = self.cent_ids[np.argmax(sims_c, axis=1)]
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids):
                mask = np.isin(assigned, list(self.probes[qid])) & (ids != qid)
                if not mask.any():
                    continue
                sims = mat[mask] @ self.q_mat[qi]
                cand = ids[mask]
                sel = np.lexsort((cand, -sims))[:k]
                out_q.extend([qid] * len(sel))
                out_n.extend(cand[sel].tolist())
                out_s.extend(sims[sel].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_n, pa.int64()),
                             "cos_sim": pa.array(out_s, pa.float64())})

    partial = embeddings.map_batches(ProbeScan, batch_format="pyarrow",
                                     concurrency=(1, 8), batch_size=4096)
    return _merge_topk(partial, k)


def ann_ivf(embeddings: rd.Dataset, query_ids: list[int], k: int = 5,
            nlist: int = 16, nprobe: int = 4) -> pa.Table:
    """IVF-style ANN: a deterministic coarse quantizer (centroids = the
    embeddings of vec_id < nlist — a seeded-"training" stand-in that keeps
    the DuckDB oracle exact), inverted-list assignment by nearest centroid,
    and per-query probing of the ``nprobe`` nearest lists. Scan volume drops
    to ~nprobe/nlist of brute force; recall measured against ann_bruteforce
    in tests. Output schema matches ann_bruteforce. For trained centroids
    see ``ann_ivf_kmeans``."""
    cent_rows = _rows_for_ids(embeddings, list(range(nlist)))
    cent_by_id = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
                  for r in cent_rows}
    cent = _unit(np.stack([cent_by_id[i] for i in sorted(cent_by_id)]))
    return _ivf_scan(embeddings, query_ids, cent, k, nprobe)


def ann_ivf_kmeans(embeddings: rd.Dataset, query_ids: list[int], k: int = 5,
                   nlist: int = 16, nprobe: int = 4,
                   iters: int = 5) -> pa.Table:
    """IVF with REAL trained centroids: distributed Lloyd's k-means
    (kmeans_centroids) instead of the seeded stand-in. Balanced lists mean
    better recall at the same nprobe; no SQL oracle (iterative float means),
    so correctness is recall-tested against ann_bruteforce. The embeddings
    are pinned once — the k-means iterations, init fetch and probe scan
    must not re-execute a lazy upstream pipeline per pass."""
    embeddings = embeddings.materialize()
    cent = kmeans_centroids(embeddings, k=nlist, iters=iters)
    return _ivf_scan(embeddings, query_ids, cent, k, nprobe)


from functools import lru_cache


@lru_cache(maxsize=64)   # constant per run; recomputing per batch would do
def sha_planes(dim: int, bits: int, seed: int) -> np.ndarray:   # dim*bits shas
    """±1 hyperplanes derived from sha256 — the deterministic, SQL-replicable
    hash family used across the engine (DuckDB twin: sign(b,d) = +1 iff
    substr(sha256('plane|b|d|seed'),1,1) >= '8'). Rademacher entries are a
    standard random-projection choice (Achlioptas 2003), so bucket quality
    matches Gaussian planes while every bucket id has an exact SQL oracle."""
    flat = np.array([1.0 if int(sha_hex(f"plane|{b}|{d}|{seed}")[0], 16) >= 8
                     else -1.0
                     for d in range(dim) for b in range(bits)], np.float64)
    return flat.reshape(dim, bits)


def lsh_bucket_ids(mat: np.ndarray, dim: int, bits: int, seed: int) -> np.ndarray:
    signs = (mat @ sha_planes(dim, bits, seed)) >= 0
    return (signs * (1 << np.arange(bits))).sum(axis=1).astype(np.int64)


def ann_lsh(embeddings: rd.Dataset, query_ids: list[int], k: int = 5,
            bits: int = 8, seed: int = 42) -> pa.Table:
    """Approximate top-k: sha-derived hyperplane buckets; each query scans
    only its own bucket. Output schema matches ann_bruteforce. Recall < 1 by
    design (scale path; measured against the brute-force baseline in tests);
    bucket assignment is deterministic and SQL-exact (see sha_planes)."""
    q_rows = _rows_for_ids(embeddings, query_ids,
                           require_all_for="ann_lsh")
    dim = len(q_rows[0]["embedding"])
    q_ids = sorted(r["vec_id"] for r in q_rows)
    q_by_id = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
               for r in q_rows}
    q_mat = np.stack([q_by_id[i] for i in q_ids])
    q_buckets = lsh_bucket_ids(q_mat, dim, bits, seed)
    wanted = set(q_buckets.tolist())
    q_ref = ray.put((q_ids, _unit(q_mat), q_buckets))

    class BucketScan:
        def __init__(self):
            self.q_ids, self.q_unit, self.q_buckets = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:   # mat.shape[1] would IndexError
                return _EMPTY_PARTIAL
            ids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
            mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
            buckets = lsh_bucket_ids(mat, mat.shape[1], bits, seed)
            keep = np.isin(buckets, list(wanted))
            ids, mat, buckets = ids[keep], mat[keep], buckets[keep]
            if len(ids) == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cos_sim": pa.array([], pa.float64())})
            unit = _unit(mat)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.q_ids):
                mask = (buckets == self.q_buckets[qi]) & (ids != qid)
                if not mask.any():
                    continue
                sims = unit[mask] @ self.q_unit[qi]
                cand = ids[mask]
                sel = np.lexsort((cand, -sims))[:k]
                out_q.extend([qid] * len(sel))
                out_n.extend(cand[sel].tolist())
                out_s.extend(sims[sel].tolist())
            return pa.table({"query_id": pa.array(out_q, pa.int64()),
                             "neighbor_id": pa.array(out_n, pa.int64()),
                             "cos_sim": pa.array(out_s, pa.float64())})

    partial = embeddings.map_batches(BucketScan, batch_format="pyarrow",
                                     concurrency=(1, 8), batch_size=4096)
    return _merge_topk(partial, k)


def _rows_topk(ids: np.ndarray, r: np.ndarray, query_ids: np.ndarray,
               k: int) -> pa.Table:
    """Exact per-row top-k over a rounded similarity matrix ``r``
    (rows = queries, columns = candidates in ASCENDING-id order; self /
    invalid cells pre-set to -inf). Stable argsort over ascending-id
    columns implements the shared ranking contract: cos_sim (rounded 3)
    DESC, then neighbor_id ASC."""
    top = min(k, r.shape[1])
    order = np.argsort(-r, axis=1, kind="stable")[:, :top]
    sims = np.take_along_axis(r, order, axis=1)
    keep = np.isfinite(sims)
    n_per_row = keep.sum(axis=1)
    return pa.table({
        "query_id": pa.array(np.repeat(query_ids, n_per_row), pa.int64()),
        "neighbor_id": pa.array(ids[order[keep]], pa.int64()),
        "cos_sim": pa.array(sims[keep], pa.float64()),
    })


_KNN_SCHEMA = pa.schema([("query_id", pa.int64()),
                         ("neighbor_id", pa.int64()),
                         ("cos_sim", pa.float64())])


def knn_graph_exact(embeddings: rd.Dataset, k: int = 5) -> rd.Dataset:
    """Exact corpus-wide kNN graph: top-k cosine neighbors per vector,
    self excluded — the similarity-graph build that feeds SemDeDup /
    graph analytics, and the recall reference for ``knn_graph``.

    Shape: the unit-normalized corpus matrix is broadcast ONCE via
    ``ray.put`` and each batch computes its own rows' similarity slice
    and exact top-k locally — no shuffle, no merge stage. Envelope: the
    corpus embedding matrix must fit a worker heap (same envelope as
    ``ann_bruteforce``'s query side, inverted); beyond that, use
    ``knn_graph``, the bucketed scale path.

    Ranking contract (shared with the SQL twin): cos_sim rounded to 3
    DESC, then neighbor_id ASC."""
    # pinned: the corpus take_all AND the per-batch scan both consume the
    # stream — a lazy upstream would otherwise execute twice
    embeddings = embeddings.materialize()
    rows = embeddings.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = _unit(np.array([r["embedding"] for r in rows],
                         dtype=np.float64)[order])
    corpus_ref = ray.put((ids, mat))

    # task map, not an actor pool: the corpus ref is plasma-resident, so
    # the per-batch ray.get is a zero-copy mmap — no actor startup to
    # amortize, and no fixed pool to contend with other stages' pools
    def row_topk(batch: pa.Table, corpus_ref=corpus_ref) -> pa.Table:
        if batch.num_rows == 0:
            return _KNN_SCHEMA.empty_table()
        c_ids, c_mat = ray.get(corpus_ref)
        q_ids = np.array(batch.column("vec_id").to_pylist(),
                         dtype=np.int64)
        q = _unit(np.array(batch.column("embedding").to_pylist(),
                           dtype=np.float64))
        r = round_half_away(q @ c_mat.T, 3)
        self_col = np.searchsorted(c_ids, q_ids)
        r[np.arange(len(q_ids)), self_col] = -np.inf
        return _rows_topk(c_ids, r, q_ids, k)

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        row_topk, batch_format="pyarrow", batch_size=4096)


def knn_graph(embeddings: rd.Dataset, k: int = 5, bits: int = 6,
              seed: int = 42, max_bucket: int = 200_000) -> rd.Dataset:
    """LSH-bucketed kNN graph — the scale path: ONE exchange on the
    sha-derived sign-LSH bucket id (same hash family as ``ann_lsh``, so
    bucket assignment is SQL-exact), then exact all-pairs top-k WITHIN
    each bucket. Neighbors outside the vector's bucket are missed by
    design (recall measured against ``knn_graph_exact`` in tests).

    Scale shape: expected bucket size is N / 2**bits — size ``bits`` so
    a bucket's matrix fits a worker (at 10**9 vectors, bits=14 gives
    ~60k-row buckets); per-bucket work is quadratic in bucket size, so
    a degenerate hot bucket is capped at ``max_bucket`` (smallest
    vec_ids kept, logged) instead of silently going quadratic on the
    whole corpus. The output is bucket-local, so no merge stage."""
    import logging

    def with_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("bucket", pa.array([], pa.int64()))
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        return t.append_column(
            "bucket", pa.array(lsh_bucket_ids(mat, mat.shape[1], bits, seed),
                               pa.int64()))

    def per_bucket(t: pa.Table) -> pa.Table:
        ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        if len(ids) > max_bucket:
            logging.getLogger("raykg").warning(
                "knn_graph: hot bucket of %d rows capped to %d "
                "(bits=%d too small for this corpus?)",
                len(ids), max_bucket, bits)
            ids, mat = ids[:max_bucket], mat[:max_bucket]
        if len(ids) < 2:
            return _KNN_SCHEMA.empty_table()
        u = _unit(mat)
        r = round_half_away(u @ u.T, 3)
        np.fill_diagonal(r, -np.inf)
        return _rows_topk(ids, r, ids, k)

    return (embeddings.select_columns(["vec_id", "embedding"])
            .map_batches(with_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(per_bucket, batch_format="pyarrow"))


def quantize_embeddings(embeddings: rd.Dataset) -> rd.Dataset:
    """Per-vector int8 scalar quantization (the storage-compression step of
    an embedding pipeline): code_i = round((v_i - min) * 255 / (max - min))
    half-away-from-zero; constant vectors (max == min) code to all zeros.
    Output: (vec_id, vmin, vmax, codes) with codes '_'-joined so the DuckDB
    oracle can hash it as a plain string column. Stateless map_batches; all
    arithmetic in float64 (bit-identical to the SQL oracle's DOUBLE)."""

    def batch(t: pa.Table) -> pa.Table:
        # fully vectorized over the flattened list column: per-row min/max
        # via reduceat on segment starts, elementwise quantization (same
        # IEEE op sequence as the scalar path / SQL twin), and the string
        # join done by Arrow's binary_join over a rebuilt list array
        ids = pc.cast(t.column("vec_id"), pa.int64())
        emb = t.column("embedding").combine_chunks()
        n = len(emb)
        lens = pc.list_value_length(emb).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(emb.flatten().to_numpy(zero_copy_only=False),
                          np.float64)
        starts = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        nonempty = lens > 0
        vmin = np.zeros(n, np.float64)
        vmax = np.zeros(n, np.float64)
        if nonempty.any():
            ne_starts = starts[:-1][nonempty]
            vmin[nonempty] = np.minimum.reduceat(flat, ne_starts)
            vmax[nonempty] = np.maximum.reduceat(flat, ne_starts)
        rng = vmax - vmin
        with np.errstate(divide="ignore", invalid="ignore"):
            scaled = (flat - np.repeat(vmin, lens)) * 255.0 \
                / np.repeat(rng, lens)
        scaled[np.repeat(rng == 0.0, lens)] = 0.0   # constant vectors -> 0
        code_str = pc.cast(
            pa.array(round_half_away(scaled, 0).astype(np.int64)),
            pa.string())
        codes_list = pa.ListArray.from_arrays(
            pa.array(starts, pa.int32()), code_str)
        return pa.table({
            "vec_id": ids,
            "vmin": pa.array(vmin, mask=~nonempty),   # empty rows -> NULL
            "vmax": pa.array(vmax, mask=~nonempty),
            "codes": pc.binary_join(codes_list, "_"),
        })

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        batch, batch_format="pyarrow")


def label_centroids(embeddings: rd.Dataset, dim: int = 64) -> pa.Table:
    """(label, dim, c): per-label mean embedding, one row per vector
    component, each mean rounded to 6 decimals — the class-centroid
    summary a curation pipeline scores prototypicality against. The
    exchange is register-sized: every batch contributes at most
    labels x dim partial-sum rows regardless of row count, merged by
    SUM, finalized on the driver (a labels x dim table)."""
    from raykg.ops.relational import small_key_agg

    def partial(t: pa.Table) -> pa.Table:
        out_l, out_d, out_s, out_n = [], [], [], []
        if t.num_rows:
            labs = np.asarray(t.column("label").to_pylist(), np.int64)
            mat = np.array(t.column("embedding").to_pylist(), np.float64)
            # the REAL width, not the dim parameter: a mismatched default
            # previously died in an opaque Arrow column-length error
            d = mat.shape[1] if mat.ndim == 2 else dim
            for lab in np.unique(labs):
                sel = mat[labs == lab]
                s = sel.sum(axis=0)
                out_l.extend([int(lab)] * d)
                out_d.extend(range(1, d + 1))
                out_s.extend(s.tolist())
                out_n.extend([sel.shape[0]] * d)
        return pa.table({"label": pa.array(out_l, pa.int64()),
                         "dim": pa.array(out_d, pa.int64()),
                         "s": pa.array(out_s, pa.float64()),
                         "n": pa.array(out_n, pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["label", "dim"]).aggregate([("s", "sum"),
                                                    ("n", "sum")])
        return pa.table({"label": g.column("label"), "dim": g.column("dim"),
                         "s": g.column("s_sum"), "n": g.column("n_sum")})

    tot = combine(small_key_agg(
        embeddings.select_columns(["label", "embedding"]).map_batches(
            partial, batch_format="pyarrow"), combine))
    tot = tot.sort_by([("label", "ascending"), ("dim", "ascending")])
    c = [round_half_away(s / n, 6) for s, n in
         zip(tot.column("s").to_pylist(), tot.column("n").to_pylist())]
    return pa.table({"label": tot.column("label"),
                     "dim": tot.column("dim"),
                     "c": pa.array(c, pa.float64())})


def prototypicality(embeddings: rd.Dataset, dim: int = 64) -> rd.Dataset:
    """(vec_id, proto): cosine similarity of each vector to its label's
    centroid (rounded per-dim means from :func:`label_centroids`) — the
    outlier/prototype signal used to rank examples within a class
    (SemDeDup/DataComp-style curation). The centroid matrix
    (labels x dim floats) is broadcast once via ``ray.put``; scoring is
    a stateless vectorized map, so the op is one streamed pass."""
    # pinned: label_centroids and the scoring pass both consume the
    # stream — a lazy upstream would otherwise execute twice
    embeddings = embeddings.materialize()
    cent = label_centroids(embeddings, dim=dim)
    labs = sorted(set(cent.column("label").to_pylist()))
    lab_ix = {lab: i for i, lab in enumerate(labs)}
    dim_c = max(cent.column("dim").to_pylist(), default=dim)
    C = np.zeros((len(labs), dim_c), np.float64)
    for lab, d, c in zip(cent.column("label").to_pylist(),
                         cent.column("dim").to_pylist(),
                         cent.column("c").to_pylist()):
        C[lab_ix[lab], d - 1] = c
    ref = ray.put((lab_ix, C))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "proto": pa.array([], pa.float64())})
        lmap, cm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        mat = np.array(t.column("embedding").to_pylist(), np.float64)
        rows = np.array([lmap[v] for v in t.column("label").to_pylist()],
                        np.int64)
        cvec = cm[rows]
        dot = (mat * cvec).sum(axis=1)
        denom = np.sqrt((mat * mat).sum(axis=1)) \
            * np.sqrt((cvec * cvec).sum(axis=1))
        # zero vector / zero-norm centroid -> proto 0.0, the _unit
        # zero-norm convention (a raw divide propagated NaN rows into
        # downstream curation ranking)
        denom[denom == 0] = 1.0
        proto = [round_half_away(float(x), 4) for x in dot / denom]
        return pa.table({"vec_id": t.column("vec_id"),
                         "proto": pa.array(proto, pa.float64())})

    return embeddings.select_columns(
        ["vec_id", "label", "embedding"]).map_batches(
        score, batch_format="pyarrow")


def random_projection(embeddings: rd.Dataset, k: int = 8,
                      seed: int = 42) -> rd.Dataset:
    """(vec_id, j, p): Johnson-Lindenstrauss random projection of each
    embedding onto ``k`` sha-derived sign vectors — the dimensionality
    reduction in front of LSH bucketing / cheap prefilters. Component j of
    the projection is Σ_i v_i * s(i, j) with s(i, j) = +1 when
    sha('proj|seed|i|j') is even else -1, so the projection matrix is a
    pure hash function — never stored, never shipped, identical on every
    worker and in the DuckDB twin. Stateless map_batches; the sign matrix
    is rebuilt once per actor from each observed dimensionality
    (register-sized: dim x k).

    Determinism contract (scaled-int64, same as
    graph.neighbor_embedding_mean): each component scales to an exact
    ``floor(v * 1e6)`` int64, the signed terms sum as a vectorized
    (n x dim) @ (dim x k) INTEGER matmul — order-free, so BLAS/FMA blocked
    accumulation can never drift from the SQL twin's unordered ``sum`` —
    and one float division + round(.., 4) finalizes ``p``."""
    from raykg.functions.hashing import sha_int

    signs: dict[int, np.ndarray] = {}

    def sign_matrix(dim: int) -> np.ndarray:
        if dim not in signs:
            m = np.empty((dim, k), np.int64)
            for i in range(dim):
                for j in range(k):
                    m[i, j] = 1 if sha_int(f"proj|{seed}|{i}|{j}") % 2 \
                        == 0 else -1
            signs[dim] = m
        return signs[dim]

    def batch(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("vec_id"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        emb = t.column("embedding").combine_chunks()
        lens = pc.list_value_length(emb).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(emb.flatten().to_numpy(zero_copy_only=False),
                          np.float64)
        q = np.floor(flat * 1e6).astype(np.int64)
        starts = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=starts[1:])
        out_id, out_j, out_p = [], [], []
        for dim in np.unique(lens):
            if dim == 0:          # empty vectors emit nothing (oracle twin)
                continue
            rows = np.nonzero(lens == dim)[0]
            idxm = starts[rows][:, None] + np.arange(int(dim))[None, :]
            proj = q[idxm] @ sign_matrix(int(dim))        # (m, k) int64
            out_id.append(np.repeat(ids[rows], k))
            out_j.append(np.tile(np.arange(k, dtype=np.int64), len(rows)))
            out_p.append(round_half_away(
                proj.astype(np.float64).ravel() / 1e6, 4))
        if not out_id:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "p": pa.array([], pa.float64())})
        return pa.table({"vec_id": pa.array(np.concatenate(out_id)),
                         "j": pa.array(np.concatenate(out_j)),
                         "p": pa.array(np.concatenate(out_p))})

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# maximal marginal relevance (diversified top-k selection)
# ---------------------------------------------------------------------------

def mmr_select(embeddings: rd.Dataset, query_id: int = 0, k: int = 8,
               lam_num: int = 7, lam_den: int = 10) -> pa.Table:
    """(rank, vec_id, score): Maximal Marginal Relevance selection
    (Carbonell & Goldstein 1998) — k vectors chosen one at a time by
    argmax of λ·rel(x) − (1−λ)·max_{s∈selected} sim(x, s), the standard
    diversified-sampling / dedup-aware retrieval step of a training-data
    curation pipeline (pick relevant-but-mutually-different documents).

    Integer contract, bit-exact against the DuckDB twin: components
    quantize to floor(v·10^6) int64 (the repo's EMB_SCALE contract);
    rel and sim are raw int64 dot products; λ = lam_num/lam_den enters as
    score = lam_num·rel − (lam_den − lam_num)·maxsim (pure int64, no
    float anywhere); ties break to the smallest vec_id. The query vector
    is the embedding of ``query_id`` (itself excluded from candidates).

    Scale shape: one distributed scan per step — each batch reduces to a
    single (score, vec_id) best row against the broadcast query + ≤ k
    selected vectors (a k×dim closure, register-sized), and the driver
    folds #blocks candidate rows per step. k scans total; the selection
    loop is inherently sequential (each pick changes the next step's
    scores), which is the exact MMR semantics — approximate batched
    variants trade that away."""
    if not (0 < lam_num <= lam_den):
        raise ValueError("need 0 < lam_num <= lam_den")
    # pinned: the query fetch plus k per-step scans — a lazy upstream
    # would otherwise re-execute its whole pipeline k+1 times
    embeddings = embeddings.materialize()

    def quant_rows(ids: list[int]) -> dict[int, np.ndarray]:
        rows = _rows_for_ids(embeddings, ids)
        return {int(r["vec_id"]):
                np.floor(np.asarray(r["embedding"], np.float64)
                         * 1e6).astype(np.int64) for r in rows}

    q = quant_rows([query_id]).get(int(query_id))
    if q is None:
        raise ValueError(f"query vec_id {query_id} not found")

    selected: list[tuple[int, int]] = []     # (vec_id, score)
    sel_vecs: list[np.ndarray] = []
    for _ in range(k):
        sel_ids = np.asarray([i for i, _ in selected] + [int(query_id)],
                             np.int64)
        smat = np.stack(sel_vecs) if sel_vecs else None
        a, b = int(lam_num), int(lam_den - lam_num)

        def best(t: pa.Table, q=q, sel_ids=sel_ids, smat=smat,
                 a=a, b=b) -> pa.Table:
            if t.num_rows == 0:   # reshape(0, -1) cannot infer a width
                return pa.table({"vec_id": pa.array([-1], pa.int64()),
                                 "score": pa.array([0], pa.int64()),
                                 "vec": pa.array([[]],
                                                 pa.list_(pa.int64()))})
            ids = pc.cast(t.column("vec_id"), pa.int64()).to_numpy(
                zero_copy_only=False)
            emb = t.column("embedding").combine_chunks()
            flat = np.floor(np.asarray(
                emb.flatten().to_numpy(zero_copy_only=False),
                np.float64) * 1e6).astype(np.int64)
            X = flat.reshape(len(ids), -1)
            keep = ~np.isin(ids, sel_ids)
            ids, X = ids[keep], X[keep]
            if not len(ids):
                return pa.table({"vec_id": pa.array([-1], pa.int64()),
                                 "score": pa.array([0], pa.int64()),
                                 "vec": pa.array([[]],
                                                 pa.list_(pa.int64()))})
            rel = X @ q
            maxsim = (X @ smat.T).max(axis=1) if smat is not None \
                else np.zeros(len(ids), np.int64)
            score = a * rel - b * maxsim
            top = score.max()
            pos = int(np.flatnonzero(
                (score == top) & (ids == ids[score == top].min()))[0])
            # the winner carries its own quantized vector so the driver
            # never re-scans the corpus to fetch it
            return pa.table({
                "vec_id": pa.array([int(ids[pos])], pa.int64()),
                "score": pa.array([int(top)], pa.int64()),
                "vec": pa.array([X[pos].tolist()],
                                pa.list_(pa.int64()))})

        rows = embeddings.select_columns(["vec_id", "embedding"]) \
            .map_batches(best, batch_format="pyarrow").take_all()
        rows = [r for r in rows if r["vec_id"] >= 0]
        if not rows:
            break
        win = max(rows, key=lambda r: (r["score"], -r["vec_id"]))
        selected.append((int(win["vec_id"]), int(win["score"])))
        sel_vecs.append(np.asarray(win["vec"], np.int64))

    return pa.table({
        "rank": pa.array(range(1, len(selected) + 1), pa.int64()),
        "vec_id": pa.array([i for i, _ in selected], pa.int64()),
        "score": pa.array([s for _, s in selected], pa.int64())})


@lru_cache(maxsize=16)
def sha_pq_codebook(m_sub: int, k_cent: int, sub_dim: int,
                    seed: int) -> np.ndarray:
    """(m_sub, k_cent, sub_dim) int64 centroid tensor derived from sha256 —
    the deterministic, SQL-replicable codebook family (same contract as
    :func:`sha_planes`): entry = sha_u32('pqc|m|k|j|seed') % 1000001
    - 500000, i.e. integers in [-5e5, 5e5] on the engine's micro-unit
    scale. A trained codebook drops in unchanged (it is just data); the
    sha family exists so the assignment step has a bit-exact DuckDB twin."""
    from raykg.functions.hashing import sha_hex

    flat = np.array([
        int(sha_hex(f"pqc|{m}|{k}|{j}|{seed}")[:8], 16) % 1000001 - 500000
        for m in range(m_sub) for k in range(k_cent)
        for j in range(sub_dim)], np.int64)
    return flat.reshape(m_sub, k_cent, sub_dim)


def pq_codes(embeddings: rd.Dataset, m_sub: int = 8, k_cent: int = 16,
             seed: int = 42, codebook: np.ndarray | None = None
             ) -> rd.Dataset:
    """(vec_id, pq_code): product-quantization assignment (Jégou et al.
    2011) — the vector split into ``m_sub`` contiguous subspaces, each
    assigned to its nearest of ``k_cent`` codebook centroids, codes
    '_'-joined. The compression step of an IVF-PQ ANN index: 64 floats
    become 8 nibbles, and asymmetric-distance search scans codes instead
    of vectors. All arithmetic is exact int64 (vectors quantized once to
    micro-units, centroids integer by construction, squared L2 summed in
    int64, ties to the smallest centroid id), so the DuckDB twin matches
    bit-for-bit.

    Scale shape: stateless vectorized map_batches — the codebook is
    module-cached per process (lru_cache, same pattern as sha_planes),
    the per-batch cost is one (n × m × k × d) int64 einsum-style
    broadcast, and nothing leaves the batch but (vec_id, code)."""

    def batch(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("vec_id"), pa.int64())
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        if mat.size == 0:
            # n rows of zero-size embeddings still need n code rows, or
            # Arrow rejects the column-length mismatch
            return pa.table({"vec_id": ids,
                             "pq_code": pa.array([""] * len(ids),
                                                 pa.string())})
        dim = mat.shape[1]
        if dim % m_sub:
            raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
        sub = dim // m_sub
        cb = codebook if codebook is not None \
            else sha_pq_codebook(m_sub, k_cent, sub, seed)  # (m, k, d)
        q = np.floor(mat * 1_000_000.0).astype(np.int64) \
            .reshape(len(mat), m_sub, 1, sub)               # (n, m, 1, d)
        diff = q - cb[None, :, :, :]                        # (n, m, k, d)
        dist = np.einsum("nmkd,nmkd->nmk", diff, diff)
        codes = dist.argmin(axis=2)     # first occurrence = smallest k
        joined = ["_".join(str(c) for c in row) for row in codes]
        return pa.table({"vec_id": ids,
                         "pq_code": pa.array(joined, pa.string())})

    return embeddings.select_columns(["vec_id", "embedding"]) \
        .map_batches(batch, batch_format="pyarrow")


def ann_pq(embeddings: rd.Dataset, query_ids: list[int], k: int = 5,
           m_sub: int = 8, k_cent: int = 16, seed: int = 42,
           codebook: np.ndarray | None = None) -> pa.Table:
    """(query_id, neighbor_id, adc): top-k by asymmetric distance
    computation over PQ codes (Jégou et al. 2011) — each query
    precomputes an exact int64 (m × k) lookup table of squared L2 to
    every centroid, and a database vector's distance is the sum of m
    table lookups on its :func:`pq_codes` code, never a full-dimension
    scan. The scan path of an IVF-PQ index; recall is bounded by the
    quantizer (tested against :func:`ann_bruteforce`), while cost per
    candidate drops from dim multiplies to m_sub adds.

    All-integer contract: vectors and centroids quantize exactly as in
    :func:`pq_codes`, so adc is an exact int64 and the DuckDB twin —
    which reuses the pq assignment CTE and reads the query LUT from the
    same per-(vec, m, k) distance relation — is bit-exact, ties to the
    smallest neighbor_id. Scale shape: broadcast-once (q_ids, LUT)
    via ray.put (LUT is nq × m × k int64 — register-sized), per-batch
    local top-k, then the groupby(query_id) merge so the driver sees
    k rows per query."""
    q_rows = _rows_for_ids(embeddings, query_ids,
                           require_all_for="ann_pq")
    dim = len(q_rows[0]["embedding"])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub
    cb = codebook if codebook is not None \
        else sha_pq_codebook(m_sub, k_cent, sub, seed)      # (m, k, d)
    q_ids = sorted(r["vec_id"] for r in q_rows)
    q_by = {r["vec_id"]: np.asarray(r["embedding"], np.float64)
            for r in q_rows}
    qq = np.floor(np.stack([q_by[i] for i in q_ids]) * 1_000_000.0) \
        .astype(np.int64).reshape(len(q_ids), m_sub, 1, sub)
    lut = np.einsum("qmkd,qmkd->qmk", qq - cb[None], qq - cb[None])
    q_ref = ray.put((q_ids, lut))
    marange = np.arange(m_sub)

    class PartialADC:
        def __init__(self):
            self.q_ids, self.lut = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.array(batch.column("vec_id").to_pylist(),
                           dtype=np.int64)
            mat = np.array(batch.column("embedding").to_pylist(),
                           dtype=np.float64)
            out_q, out_n, out_d = [], [], []
            if len(ids):
                q = np.floor(mat * 1_000_000.0).astype(np.int64) \
                    .reshape(len(mat), m_sub, 1, sub)
                diff = q - cb[None]
                codes = np.einsum("nmkd,nmkd->nmk", diff, diff) \
                    .argmin(axis=2)                         # (n, m)
                for qi, qid in enumerate(self.q_ids):
                    dist = self.lut[qi][marange[None, :], codes].sum(1)
                    mask = ids != qid
                    cand, cd = ids[mask], dist[mask]
                    top = min(len(cand), k)
                    if not top:
                        continue
                    sel = np.lexsort((cand, cd))[:top]
                    out_q.extend([qid] * top)
                    out_n.extend(cand[sel].tolist())
                    out_d.extend(cd[sel].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "adc": pa.array(out_d, pa.int64())})

    partial = embeddings.select_columns(["vec_id", "embedding"]) \
        .map_batches(PartialADC, batch_format="pyarrow",
                     concurrency=(1, 8), batch_size=4096)

    def topk(t: pa.Table) -> pa.Table:
        d = t.column("adc").to_numpy(zero_copy_only=False)
        nids = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        sel = np.lexsort((nids, d))
        _, first = np.unique(nids[sel], return_index=True)
        sel = sel[np.sort(first)][:k]
        return pa.table({
            "query_id": t.column("query_id").take(pa.array(sel)),
            "neighbor_id": pa.array(nids[sel]),
            "adc": pa.array(d[sel], pa.int64())})

    merged = partial.groupby("query_id").map_groups(topk,
                                                    batch_format="pyarrow")
    out = pa.Table.from_pylist(merged.take_all(), schema=pa.schema([
        ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
        ("adc", pa.int64())]))
    return out.sort_by([("query_id", "ascending"), ("adc", "ascending"),
                        ("neighbor_id", "ascending")])


def pq_train_codebook(embeddings: rd.Dataset, m_sub: int = 8,
                      k_cent: int = 16, sample: int = 512,
                      iters: int = 10) -> np.ndarray:
    """(m_sub, k_cent, sub_dim) int64 TRAINED codebook: per-subspace
    Lloyd's k-means on the first ``sample`` vec_ids (PQ codebooks are
    universally trained on a sample — Jégou et al. use 10^5 of 10^9; the
    deterministic prefix keeps it reshard/resume-stable), run in float64
    on the driver (sample × dim is register-sized by construction) and
    quantized ONCE to the engine's micro-unit int64 scale at the end.
    Init = first k distinct subvectors; empty clusters keep their
    centroid. Drop-in for the ``codebook=`` parameter of
    :func:`pq_codes` / :func:`ann_pq` — the trained mode has no SQL twin
    (iterative float means, same status as ann_ivf_kmeans) and is
    recall-tested against :func:`ann_bruteforce` instead."""
    rows = _rows_for_ids(embeddings, list(range(sample)))
    if len(rows) < k_cent:
        # cent = x[:k_cent] below needs k_cent rows; fewer would die in
        # an opaque broadcast error at out[m] = cent
        raise ValueError(
            f"pq_train_codebook: corpus has only {len(rows)} of the "
            f"first {sample} vec_ids, fewer than k_cent={k_cent} — "
            "shrink k_cent or grow the corpus")
    mat = np.stack([np.asarray(r["embedding"], np.float64)
                    for r in sorted(rows, key=lambda r: r["vec_id"])])
    dim = mat.shape[1]
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub
    out = np.zeros((m_sub, k_cent, sub), np.float64)
    for m in range(m_sub):
        x = mat[:, m * sub:(m + 1) * sub]
        cent = x[:k_cent].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(k_cent):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(0)
        out[m] = cent
    return np.floor(out * 1_000_000.0).astype(np.int64)


def ann_ivfpq(embeddings: rd.Dataset, query_ids: list[int], k: int = 5,
              nlist: int = 16, nprobe: int = 4, m_sub: int = 8,
              k_cent: int = 16, seed: int = 42,
              codebook: np.ndarray | None = None) -> pa.Table:
    """(query_id, neighbor_id, adc): the full IVF-PQ scan path (Jégou et
    al. 2011, §IV) — coarse inverted-list pruning AND per-candidate code
    lookups in one pass. Each database vector is assigned to its nearest
    coarse centroid (the deterministic quantizer of :func:`ann_ivf`:
    centroids = embeddings of vec_id < nlist, cosine, ties to the smaller
    centroid id) and PQ-encoded under the exact int64 contract of
    :func:`pq_codes`; a query probes only its ``nprobe`` nearest lists and
    pays m_sub ADD-lookups per surviving candidate instead of a
    full-dimension scan. This is the composition FAISS ships as IndexIVFPQ
    (flat encoding — no residual, which would break the integer-exact
    oracle), and it cuts BOTH terms of scan cost: candidates by
    ~nprobe/nlist, per-candidate work by dim/m_sub.

    Scale shape: the (q_ids, probe sets, LUT) tuple is broadcast once via
    ray.put (register-sized: nq × m × k int64), assignment + encoding +
    scan are one stateless vectorized pass per batch, and the distributed
    top-k merge ships k rows per query to the driver. Recall bounded by
    quantizer × probe coverage (tested against :func:`ann_bruteforce`);
    the DuckDB twin composes the ann_ivf assignment CTEs with the ann_pq
    ADC relation and is bit-exact on adc (ties to smaller neighbor_id)."""
    cent_rows = _rows_for_ids(embeddings, list(range(nlist)))
    cent_by = {r["vec_id"]: np.asarray(r["embedding"], np.float64)
               for r in cent_rows}
    coarse = _unit(np.stack([cent_by[i] for i in sorted(cent_by)]))
    cent_ids = np.arange(len(coarse))

    q_rows = _rows_for_ids(embeddings, query_ids,
                           require_all_for="ann_ivfpq")
    dim = len(q_rows[0]["embedding"])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    sub = dim // m_sub
    cb = codebook if codebook is not None \
        else sha_pq_codebook(m_sub, k_cent, sub, seed)      # (m, k, d)
    q_ids = sorted(r["vec_id"] for r in q_rows)
    q_by = {r["vec_id"]: np.asarray(r["embedding"], np.float64)
            for r in q_rows}
    q_mat = _unit(np.stack([q_by[i] for i in q_ids]))
    q_cent_sims = q_mat @ coarse.T
    probes = {}
    for qi, qid in enumerate(q_ids):
        order = np.lexsort((cent_ids, -q_cent_sims[qi]))[:nprobe]
        probes[qid] = cent_ids[order]
    qq = np.floor(np.stack([q_by[i] for i in q_ids]) * 1_000_000.0) \
        .astype(np.int64).reshape(len(q_ids), m_sub, 1, sub)
    lut = np.einsum("qmkd,qmkd->qmk", qq - cb[None], qq - cb[None])
    ref = ray.put((q_ids, probes, lut, coarse, cent_ids))
    marange = np.arange(m_sub)

    class IVFPQScan:
        def __init__(self):
            (self.q_ids, self.probes, self.lut, self.coarse,
             self.cent_ids) = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.array(batch.column("vec_id").to_pylist(), np.int64)
            out_q, out_n, out_d = [], [], []
            if len(ids):
                raw = np.array(batch.column("embedding").to_pylist(),
                               np.float64)
                sims_c = _unit(raw) @ self.coarse.T
                # cent_ids ascending -> argmax first-occurrence tie rule
                # IS the smaller centroid id (see _ivf_scan)
                assigned = self.cent_ids[np.argmax(sims_c, axis=1)]
                q = np.floor(raw * 1_000_000.0).astype(np.int64) \
                    .reshape(len(raw), m_sub, 1, sub)
                diff = q - cb[None]
                codes = np.einsum("nmkd,nmkd->nmk", diff, diff) \
                    .argmin(axis=2)                         # (n, m)
                for qi, qid in enumerate(self.q_ids):
                    mask = np.isin(assigned, self.probes[qid]) & (ids != qid)
                    if not mask.any():
                        continue
                    dist = self.lut[qi][marange[None, :],
                                        codes[mask]].sum(1)
                    cand = ids[mask]
                    sel = np.lexsort((cand, dist))[:min(len(cand), k)]
                    out_q.extend([qid] * len(sel))
                    out_n.extend(cand[sel].tolist())
                    out_d.extend(dist[sel].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "adc": pa.array(out_d, pa.int64())})

    partial = embeddings.select_columns(["vec_id", "embedding"]) \
        .map_batches(IVFPQScan, batch_format="pyarrow",
                     concurrency=(1, 8), batch_size=4096)

    def topk(t: pa.Table) -> pa.Table:
        d = t.column("adc").to_numpy(zero_copy_only=False)
        nids = t.column("neighbor_id").to_numpy(zero_copy_only=False)
        sel = np.lexsort((nids, d))
        _, first = np.unique(nids[sel], return_index=True)
        sel = sel[np.sort(first)][:k]
        return pa.table({
            "query_id": t.column("query_id").take(pa.array(sel)),
            "neighbor_id": pa.array(nids[sel]),
            "adc": pa.array(d[sel], pa.int64())})

    merged = partial.groupby("query_id").map_groups(topk,
                                                    batch_format="pyarrow")
    out = pa.Table.from_pylist(merged.take_all(), schema=pa.schema([
        ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
        ("adc", pa.int64())]))
    return out.sort_by([("query_id", "ascending"), ("adc", "ascending"),
                        ("neighbor_id", "ascending")])


def embedding_dim_stats(embeddings: rd.Dataset) -> pa.Table:
    """(dim, n, mean, var, min_q, max_q): exact per-dimension moment
    profile of the embedding column — the anisotropy / dimension-collapse
    diagnostic (a dim whose variance ~ 0 carries no information; a mean
    far from 0 signals an uncentered model). Values quantize once to
    int64 micro-units (the pq_codes contract) and the four moment
    registers per dimension are EXACT integers — per-batch int64 partials
    widened to Python ints for the cross-batch merge (the
    numeric_correlation_matrix HUGEINT analog) — so mean and population
    variance are each ONE float expression over merged registers and the
    DuckDB twin is bit-exact; min/max stay in raw micro-units.

    Scale shape: a per-batch combiner reduces each batch to dim register
    rows; the driver pull is register-sized (dim x n_batches) regardless
    of corpus size."""
    def partial(t: pa.Table) -> pa.Table:
        mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        if mat.size == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.string()),
                             "s2": pa.array([], pa.string()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        q = np.floor(mat * 1_000_000.0).astype(np.int64)
        dims = np.arange(q.shape[1], dtype=np.int64)
        return pa.table({
            "dim": pa.array(dims, pa.int64()),
            "n": pa.array(np.full(q.shape[1], q.shape[0], np.int64)),
            "s": pa.array([str(int(x)) for x in q.sum(axis=0)],
                          pa.string()),
            "s2": pa.array([str(sum((q[:, d] * q[:, d]).tolist()))
                            for d in range(q.shape[1])], pa.string()),
            "mn": pa.array(q.min(axis=0), pa.int64()),
            "mx": pa.array(q.max(axis=0), pa.int64())})

    parts = pa.concat_tables(
        embeddings.select_columns(["embedding"])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow", batch_size=None))

    acc: dict[int, list] = {}
    for row in parts.to_pylist():
        d = row["dim"]
        cur = acc.get(d)
        if cur is None:
            acc[d] = [row["n"], int(row["s"]), int(row["s2"]),
                      row["mn"], row["mx"]]
        else:
            cur[0] += row["n"]
            cur[1] += int(row["s"])
            cur[2] += int(row["s2"])
            cur[3] = min(cur[3], row["mn"])
            cur[4] = max(cur[4], row["mx"])
    from raykg.functions.hashing import round_half_away

    dims = sorted(acc)
    out_mean, out_var = [], []
    for d in dims:
        n, s, s2, _, _ = acc[d]
        out_mean.append(round_half_away((float(s) / n) / 1_000_000.0, 6))
        out_var.append(round_half_away(
            (float(s2 * n - s * s) / (float(n) * n))
            / 1_000_000_000_000.0, 6))
    return pa.table({
        "dim": pa.array(dims, pa.int64()),
        "n": pa.array([acc[d][0] for d in dims], pa.int64()),
        "mean": pa.array(out_mean, pa.float64()),
        "var": pa.array(out_var, pa.float64()),
        "min_q": pa.array([acc[d][3] for d in dims], pa.int64()),
        "max_q": pa.array([acc[d][4] for d in dims], pa.int64())})
