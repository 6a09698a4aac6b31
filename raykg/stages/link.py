"""Stateful entity linking: an actor-pool `map_batches` stage.

Reference analogs: the broadcast nodeId->label lookup
(src/main/scala/Clustering.scala:152-163) and the
BucketedRandomProjectionLSH blocking model (src2/main/scala/LSH.scala:10-18).

Design (north-star): each actor builds, ONCE in ``__init__``, (a) an exact
alias dictionary and (b) a MinHash-LSH blocking index over character-shingled
aliases for fuzzy resolution of corrupted surfaces. The alias universe here is
derived deterministically from the config's closed entity vocabulary; at
production scale the constructor instead receives a ``ray.put`` object ref of a
sharded alias table (pass ``alias_ref=`` via ``fn_constructor_kwargs``) — built
once on the driver, fetched zero-copy once per actor, never re-shipped per
batch. Resolution results are memoized per actor (Zipfian mention skew makes
the cache hit rate very high).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from raykg import synth
from raykg.config import MEDIA_PREDICATE, KGConfig
from raykg.functions.hashing import (
    char_shingles,
    crc_hash_array,
    mint_uri,
    minhash_matrix,
)

LINKED_TRIPLES = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("doc_id", pa.string()),
    ("span_offset", pa.int32()),
    ("subj_ent", pa.string()),   # entity id ("" when subj is a document URI)
    ("obj_ent", pa.string()),
])


def build_alias_items(cfg: KGConfig) -> list[tuple[str, int]]:
    """(surface, entity_index) pairs for the closed entity vocabulary."""
    items: list[tuple[str, int]] = []
    for i in range(cfg.num_entities):
        for a in synth.entity_aliases(i, cfg):
            items.append((a, i))
    return items


class AliasIndex:
    """Exact dict + MinHash-LSH blocked fuzzy lookup. Deterministic."""

    def __init__(self, cfg: KGConfig, alias_items: list[tuple[str, int]] | None = None):
        self.cfg = cfg
        items = alias_items if alias_items is not None else build_alias_items(cfg)
        self.exact: dict[str, int] = {}
        for surface, ent in items:
            # first writer wins -> deterministic for a deterministic item order
            self.exact.setdefault(surface, ent)
        self._aliases = [s for s, _ in items]
        self._ents = np.array([e for _, e in items], dtype=np.int64)
        self._shingle_sets = [frozenset(char_shingles(s, cfg.link_shingle_k))
                              for s in self._aliases]
        flat: list[str] = []
        offsets = [0]
        for ss in self._shingle_sets:
            flat.extend(ss)
            offsets.append(len(flat))
        sig = minhash_matrix(crc_hash_array(flat), np.array(offsets),
                             cfg.link_num_hashes, cfg.seed)
        rows_per_band = cfg.link_num_hashes // cfg.link_num_bands
        self._rows_per_band = rows_per_band
        self.bands: list[dict[bytes, list[int]]] = []
        for b in range(cfg.link_num_bands):
            d: dict[bytes, list[int]] = {}
            keys = sig[:, b * rows_per_band:(b + 1) * rows_per_band]
            for idx in range(len(self._aliases)):
                d.setdefault(keys[idx].tobytes(), []).append(idx)
            self.bands.append(d)

    def resolve(self, surface: str) -> int | None:
        ent = self.exact.get(surface)
        if ent is not None:
            return ent
        cfg = self.cfg
        shingles = frozenset(char_shingles(surface, cfg.link_shingle_k))
        flat = list(shingles)
        sig = minhash_matrix(crc_hash_array(flat),
                             np.array([0, len(flat)]),
                             cfg.link_num_hashes, cfg.seed)[0]
        cand: set[int] = set()
        r = self._rows_per_band
        for b, d in enumerate(self.bands):
            cand.update(d.get(sig[b * r:(b + 1) * r].tobytes(), ()))
        best: tuple[float, str, int] | None = None
        for idx in cand:
            ss = self._shingle_sets[idx]
            j = len(shingles & ss) / len(shingles | ss)
            if j < cfg.link_jaccard_threshold:
                continue
            key = (-j, self._aliases[idx])
            if best is None or key < (best[0], best[1]):
                best = (-j, self._aliases[idx], int(self._ents[idx]))
        return None if best is None else best[2]


class LinkBatches:
    """Actor-pool stage: EXTRACTIONS batches -> LINKED_TRIPLES batches.

    Emits, per event:
      relation  -> (subj_uri, pred, obj_uri)  [if both surfaces resolve;
                   mention triples for the sides come from their own
                   "mention" events emitted by the extractor]
      mention   -> (doc_uri, "mentions", uri)
      caption   -> (doc_uri, "depicts", uri)
    """

    def __init__(self, cfg: KGConfig, alias_ref=None):
        items = ray.get(alias_ref) if alias_ref is not None else None
        self.cfg = cfg
        self.index = AliasIndex(cfg, items)
        self._cache: dict[str, tuple[str, str] | None] = {}

    def _uri(self, surface: str) -> tuple[str, str] | None:
        """surface -> (uri, entity_id) or None."""
        hit = self._cache.get(surface, False)
        if hit is not False:
            return hit
        ent = self.index.resolve(surface)
        if ent is None:
            out = None
        else:
            eid = synth.entity_id(ent)
            out = (mint_uri(synth.entity_label(ent, self.cfg), eid), eid)
        self._cache[surface] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        out: list[tuple] = []
        doc_ids = batch.column("doc_id").to_pylist()
        offsets = batch.column("span_offset").to_pylist()
        etypes = batch.column("etype").to_pylist()
        preds = batch.column("pred").to_pylist()
        s1 = batch.column("surface").to_pylist()
        s2 = batch.column("surface2").to_pylist()
        for doc_id, off, etype, pred, a, b in zip(doc_ids, offsets, etypes,
                                                  preds, s1, s2):
            ra = self._uri(a)
            if etype == "relation":
                rb = self._uri(b)
                if ra is not None and rb is not None:
                    out.append((ra[0], pred, rb[0], doc_id, off, ra[1], rb[1]))
            elif ra is not None:
                doc_uri = mint_uri("Document", doc_id)
                p = MEDIA_PREDICATE if etype == "caption" else "mentions"
                out.append((doc_uri, p, ra[0], doc_id, off, "", ra[1]))
        if not out:
            return LINKED_TRIPLES.empty_table()
        cols = list(zip(*out))
        return pa.Table.from_arrays(
            [pa.array(cols[0], pa.string()), pa.array(cols[1], pa.string()),
             pa.array(cols[2], pa.string()), pa.array(cols[3], pa.string()),
             pa.array(cols[4], pa.int32()), pa.array(cols[5], pa.string()),
             pa.array(cols[6], pa.string())],
            schema=LINKED_TRIPLES)
