"""Single-process reference oracle (SURVEY §5 (b)).

Computes the expected (subj, pred, obj, doc_id, span_offset) triple set for a
documents table with plain Python loops — no Ray, no partitioning — using the
same pure per-span/per-surface semantics as the distributed stages. The
distributed pipeline must match this at triple-set P/R >= 0.95 (north rule);
because both sides are deterministic the expected match is exact, so any
partitioning-dependent bug (lost spans, double-counted batches, unstable
hashing) shows up as a hard mismatch.
"""

from __future__ import annotations

import pyarrow as pa

from raykg import synth
from raykg.config import MEDIA_PREDICATE, KGConfig
from raykg.functions.hashing import mint_uri
from raykg.stages.extract import extract_span_events
from raykg.stages.link import AliasIndex


def oracle_triples(documents: pa.Table, cfg: KGConfig) -> list[tuple]:
    index = AliasIndex(cfg)
    cache: dict[str, tuple[str, str] | None] = {}

    def resolve(surface: str):
        if surface in cache:
            return cache[surface]
        ent = index.resolve(surface)
        out = None if ent is None else (
            mint_uri(synth.entity_label(ent, cfg), synth.entity_id(ent)),
            synth.entity_id(ent))
        cache[surface] = out
        return out

    linked: list[tuple] = []   # (subj, pred, obj, doc_id, offset, subj_ent, obj_ent)
    for doc_id, spans in zip(documents.column("doc_id").to_pylist(),
                             documents.column("spans").to_pylist()):
        for si, span in enumerate(spans):
            for ev in extract_span_events(doc_id, si, span["kind"],
                                          span["text"], span["offset"],
                                          cfg.mention_detector):
                _, _, off, etype, pred, a, b = ev
                ra = resolve(a)
                if etype == "relation":
                    rb = resolve(b)
                    if ra is not None and rb is not None:
                        linked.append((ra[0], pred, rb[0], doc_id, off,
                                       ra[1], rb[1]))
                elif ra is not None:
                    doc_uri = mint_uri("Document", doc_id)
                    p = MEDIA_PREDICATE if etype == "caption" else "mentions"
                    linked.append((doc_uri, p, ra[0], doc_id, off, "", ra[1]))

    # canonicalization over observed entities (same semantics as
    # stages/canonicalize.py: group by normalized name, canon = min uri)
    observed = {e for t in linked for e in (t[5], t[6]) if e}
    groups: dict[str, list[tuple[str, str]]] = {}
    for eid in observed:
        i = int(eid[1:])
        uri = mint_uri(synth.entity_label(i, cfg), eid)
        groups.setdefault(synth.entity_norm_name(i, cfg), []).append((uri, eid))
    canon: dict[str, str] = {}
    for members in groups.values():
        canon_uri = min(u for u, _ in members)
        for u, _ in members:
            if u != canon_uri:
                canon[u] = canon_uri

    return [(canon.get(s, s), p, canon.get(o, o), d, off)
            for s, p, o, d, off, _, _ in linked]


def oracle_triple_set(documents: pa.Table, cfg: KGConfig) -> set[tuple]:
    return {(s, p, o) for s, p, o, _, _ in oracle_triples(documents, cfg)}
