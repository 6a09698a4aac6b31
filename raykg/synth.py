"""Deterministic synthetic corpora (FIXTURES.md F1-F4). No external data.

Every row is a pure function of ``(cfg.seed, row_index)`` — generation via
``ray.data.range(n).map_batches`` therefore yields the identical corpus at any
parallelism level or block layout, which is what lets the single-process oracle
and the distributed pipeline be compared exactly.

Reference protocol being mirrored: noise-corrupted property-graph dumps scored
against ground-truth labels carried in the data (SURVEY §5;
/root/reference/run_tale_ldbc.sh:18 selects corrupted variants).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pyarrow as pa

from raykg import schema
from raykg.config import (
    FILLER_WORDS,
    KG_LABEL_PROPS,
    LABEL_SIGNATURES,
    NODE_LABELS,
    PREDICATES,
    REL_TYPES,
    KGConfig,
    NodeSynthConfig,
)
from raykg.functions.hashing import hex_threshold, sha_hex, stable_frac_hex

# ---------------------------------------------------------------------------
# Entity universe (closed vocabulary, deterministic from cfg)
# ---------------------------------------------------------------------------


def entity_id(i: int) -> str:
    return f"E{i:06d}"


def is_dup_entity(i: int, cfg: KGConfig) -> bool:
    return i % cfg.dup_entity_mod == cfg.dup_entity_rem and i > 0


@lru_cache(maxsize=262_144)   # pure in (i, cfg); cfg is frozen+hashable
def entity_label(i: int, cfg: KGConfig) -> str:
    if is_dup_entity(i, cfg):   # a coreferent duplicate shares its base label
        return entity_label(i - 1, cfg)
    return NODE_LABELS[i % len(NODE_LABELS)]


@lru_cache(maxsize=262_144)
def entity_name(i: int, cfg: KGConfig) -> str:
    if is_dup_entity(i, cfg):
        return entity_name(i - 1, cfg) + "-dup"
    return f"{entity_label(i, cfg).lower()}-{i:06d}"


def entity_norm_name(i: int, cfg: KGConfig) -> str:
    """Canonicalization key: duplicates share the base entity's name."""
    name = entity_name(i, cfg)
    return name[:-4] if name.endswith("-dup") else name


@lru_cache(maxsize=262_144)   # rebuilt once per MENTION without the cache
def entity_aliases(i: int, cfg: KGConfig) -> tuple[str, ...]:
    """~30% of corpus generation pre-cache. BOUNDED cache: per-entity
    strings are tiny but a 10^8-entity vocabulary in every worker would not
    be — LRU keeps the hot (Zipf-head) entities resident."""
    name = entity_name(i, cfg)
    label = entity_label(i, cfg)
    return (name, name.replace("-", "_"), f"{label[:3].lower()}{i:06d}")


def entity_properties(i: int, cfg: KGConfig) -> dict[str, str]:
    """Deterministic per-entity property map following KG_LABEL_PROPS; with
    cfg.prop_noise > 0, non-name properties are absent when the stable hash
    fraction falls below the noise level (F4 protocol, never nulls 'name')."""
    label = entity_label(i, cfg)
    eid = entity_id(i)
    props: dict[str, str] = {}
    for p in KG_LABEL_PROPS[label]:
        if p != "name" and cfg.prop_noise > 0 and \
                stable_frac_hex(f"noise|{eid}|{p}|{cfg.seed}") < cfg.prop_noise:
            continue
        props[p] = entity_name(i, cfg) if p == "name" \
            else sha_hex(f"prop|{eid}|{p}")[:12]
    return props


def entity_metadata_rows(indices: np.ndarray, cfg: KGConfig) -> pa.Table:
    """Entity-metadata table rows for the given entity indices (pure;
    batch-callable). This is the synthetic instance of the engine's
    ENTITY_METADATA contract (raykg/catalog.py): downstream stages
    (canonicalization, node minting, URI assembly) consume label / norm_name
    / properties from THIS table riding the dataflow, never by calling the
    per-index synth functions — so a real corpus swaps in its own table."""
    from raykg.catalog import ENTITY_METADATA

    ents, eids, labels, norms, props = [], [], [], [], []
    for i in indices:
        i = int(i)
        ents.append(i)
        eids.append(entity_id(i))
        labels.append(entity_label(i, cfg))
        norms.append(entity_norm_name(i, cfg))
        props.append(entity_properties(i, cfg))
    return pa.Table.from_pydict(
        {"ent": ents, "entity_id": eids, "label": labels,
         "norm_name": norms, "properties": props},
        schema=ENTITY_METADATA)


def entity_metadata_dataset(cfg: KGConfig):
    """Distributed generation of the full-vocabulary entity-metadata table."""
    import ray.data as rd

    n = cfg.num_entities
    ds = rd.range(n, override_num_blocks=max(1, n // 8192))
    return ds.map_batches(lambda b: entity_metadata_rows(b["id"], cfg),
                          batch_format="numpy", batch_size=8192)


def alias_rows(indices: np.ndarray, cfg: KGConfig) -> pa.Table:
    """Alias-dictionary rows (alias, ent) for the given entity indices."""
    from raykg.catalog import ALIASES

    al, en = [], []
    for i in indices:
        i = int(i)
        for a in entity_aliases(i, cfg):
            al.append(a)
            en.append(i)
    return pa.Table.from_pydict({"alias": al, "ent": en}, schema=ALIASES)


def apply_typo(surface: str, pos: int) -> str:
    """Drop one character at a deterministic position (mention corruption)."""
    if len(surface) < 4:
        return surface
    k = pos % (len(surface) - 2) + 1   # never first/last char
    return surface[:k] + surface[k + 1:]


# ---------------------------------------------------------------------------
# Interleaved text+media documents (F1)
# ---------------------------------------------------------------------------

_PRED_IDS = tuple(PREDICATES.keys())


class _Tape:
    """Pre-drawn random tape: one bulk draw per pool instead of ~100 rng
    calls per document (each Generator call costs ~2-3 us of dispatch; the
    tape is ~4 bulk draws). Still a pure function of (seed, doc index)."""

    __slots__ = ("u", "z", "i", "ui", "zi", "ii")

    def __init__(self, rng: np.random.Generator, cfg: KGConfig):
        m = cfg.max_spans_per_doc
        # worst-case draws per span: 6 uniforms, 2 zipf, 12 ints
        self.u = rng.random(6 * m + 6)
        self.z = rng.zipf(cfg.zipf_alpha, 2 * m + 2)
        self.i = rng.integers(0, 1 << 30, size=12 * m + 8)
        self.ui = self.zi = self.ii = 0

    def random(self) -> float:
        v = self.u[self.ui]
        self.ui += 1
        return float(v)

    def zipf(self) -> int:
        v = self.z[self.zi]
        self.zi += 1
        return int(v)

    def integers(self, n: int) -> int:
        v = self.i[self.ii]
        self.ii += 1
        return int(v) % n


def _pick_entity(rng: _Tape, cfg: KGConfig) -> int:
    return (rng.zipf() - 1) % cfg.num_entities


def _surface(rng: _Tape, ent: int, cfg: KGConfig) -> str:
    aliases = entity_aliases(ent, cfg)
    s = aliases[rng.integers(len(aliases))]
    if rng.random() < cfg.typo_rate:
        s = apply_typo(s, rng.integers(1 << 30))
    return s


def gen_doc_rows(doc_indices: np.ndarray, cfg: KGConfig) -> pa.Table:
    """Generate documents for the given indices (pure; batch-callable)."""
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    for di in doc_indices:
        di = int(di)
        base = np.random.default_rng([cfg.seed, di])
        doc_id = f"doc-{di:08d}"
        n_spans = 1 + int(base.integers(0, cfg.max_spans_per_doc))
        rng = _Tape(base, cfg)
        spans: list[dict] = []
        offset = 0
        for si in range(n_spans):
            if rng.random() < cfg.media_span_rate:
                kind = "image" if rng.random() < 0.6 else "audio"
                ref = "media://" + sha_hex(f"{doc_id}:{si}")[:16]
                if rng.random() < 0.6:
                    ent = _pick_entity(rng, cfg)
                    caption = f"{kind} of {_surface(rng, ent, cfg)}"
                else:
                    caption = ""
                spans.append({"kind": kind, "text": caption,
                              "media_ref": ref, "offset": offset})
                offset += len(caption) + 1
            else:
                tokens: list[str] = []
                n_fill = rng.integers(3)
                tokens += [FILLER_WORDS[rng.integers(len(FILLER_WORDS))]
                           for _ in range(n_fill)]
                if rng.random() < 0.7:   # relation sentence
                    subj = _pick_entity(rng, cfg)
                    obj = _pick_entity(rng, cfg)
                    if obj == subj:
                        obj = (subj + 1) % cfg.num_entities
                    pred = _PRED_IDS[rng.integers(len(_PRED_IDS))]
                    tokens.append(_surface(rng, subj, cfg))
                    tokens += list(PREDICATES[pred])
                    tokens.append(_surface(rng, obj, cfg))
                else:                    # bare-mention sentence
                    ent = _pick_entity(rng, cfg)
                    tokens.append(_surface(rng, ent, cfg))
                tokens += [FILLER_WORDS[rng.integers(len(FILLER_WORDS))]
                           for _ in range(rng.integers(2))]
                text = " ".join(tokens)
                spans.append({"kind": "text", "text": text,
                              "media_ref": "", "offset": offset})
                offset += len(text) + 1
        doc_ids.append(doc_id)
        spans_col.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=schema.DOCUMENTS)


def documents_table(cfg: KGConfig) -> pa.Table:
    """Driver-side generation (tests / oracle)."""
    return gen_doc_rows(np.arange(cfg.n_docs), cfg)


def documents_dataset(cfg: KGConfig, override_num_blocks: int | None = None):
    """Distributed generation: range -> map_batches (scales to any n_docs)."""
    import ray.data as rd

    n_blocks = override_num_blocks or max(1, cfg.n_docs // 2000)
    ds = rd.range(cfg.n_docs, override_num_blocks=n_blocks)
    return ds.map_batches(
        lambda b: gen_doc_rows(b["id"], cfg),
        batch_format="numpy", batch_size=cfg.batch_size)


def documents_dataset_range(lo: int, hi: int, cfg: KGConfig,
                            override_num_blocks: int | None = None):
    """Documents for doc indices [lo, hi) — one resumable input shard.
    Identical rows to the corresponding slice of ``documents_dataset`` (every
    row is a pure function of (seed, index))."""
    import ray.data as rd

    n = hi - lo
    n_blocks = override_num_blocks or max(1, n // 2000)
    ds = rd.range(n, override_num_blocks=n_blocks)
    return ds.map_batches(
        lambda b: gen_doc_rows(b["id"] + lo, cfg),
        batch_format="numpy", batch_size=cfg.batch_size)


# ---------------------------------------------------------------------------
# SQL-exact corpus (flagship driver oracle): every decision is a sha256 draw
# ---------------------------------------------------------------------------
#
# The tape corpus above uses numpy Generator draws (zipf, uniform) that no
# SQL engine can replicate, so the flagship pipeline over it can only be
# rows-only checked by the driver. This variant derives EVERY decision from
# ``sha256('<tag>|<seed>|<doc>|<span>')`` — the same hash family the DuckDB
# oracles already replicate — so extraction -> exact linking ->
# canonicalization -> edge dedup over it has a bit-exact single-statement
# SQL oracle (__ray_entry__.flagship_exact_sql). Structure mirrors the tape
# corpus (relation / bare-mention / media-caption spans, filler words,
# closed alias vocabulary); differences: no typos (exact linking), span
# ``offset`` = span index (char offsets would drag filler lengths into SQL),
# and entity picks are uniform rather than Zipfian (skew is exercised by the
# tape corpus; correctness here).

from raykg.functions.hashing import hex_threshold8, sha_int  # noqa: E402

_SHA_DOC_REL_P = 0.7       # P(text span carries a relation sentence)
_SHA_DOC_CAP_P = 0.6       # P(media span has an entity caption)
_SHA_DOC_IMG_P = 0.6       # P(media span is an image vs audio)


def _sha_lt(key: str, p: float) -> bool:
    return sha_hex(key)[:8] < hex_threshold8(p)


def sha_doc_rows(doc_indices: np.ndarray, cfg: KGConfig) -> pa.Table:
    """Generate SQL-exact documents for the given indices (pure)."""
    E = cfg.num_entities
    seed = cfg.seed
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    for di in doc_indices:
        di = int(di)
        doc_id = f"sdoc-{di:08d}"
        n_spans = 1 + sha_int(f"ns|{seed}|{di}") % cfg.max_spans_per_doc
        spans: list[dict] = []
        for si in range(n_spans):
            def k(tag: str) -> str:
                return f"{tag}|{seed}|{di}|{si}"

            def fill(tag: str, n_mod: int) -> list[str]:
                n = sha_int(k(tag)) % n_mod
                return [FILLER_WORDS[sha_int(f"{tag}{j}|{seed}|{di}|{si}")
                                     % len(FILLER_WORDS)]
                        for j in range(n)]

            def typo(alias: str, tag: str) -> str:
                # sha-drawn single-char deletion (fuzzy-linking twin of the
                # tape corpus's typo_rate) — never drawn at typo_rate == 0,
                # so the exact corpus is bit-identical to before
                if cfg.typo_rate <= 0 or not _sha_lt(k("y" + tag),
                                                     cfg.typo_rate):
                    return alias
                return apply_typo(alias, sha_int(k("z" + tag)))

            if _sha_lt(k("md"), cfg.media_span_rate):
                kind = "image" if _sha_lt(k("mk"), _SHA_DOC_IMG_P) else "audio"
                ref = "media://" + sha_hex(f"{doc_id}:{si}")[:16]
                if _sha_lt(k("mc"), _SHA_DOC_CAP_P):
                    ent = sha_int(k("me")) % E
                    alias = typo(
                        entity_aliases(ent, cfg)[sha_int(k("ma")) % 3], "ma")
                    caption = f"{kind} of {alias}"
                else:
                    caption = ""
                spans.append({"kind": kind, "text": caption,
                              "media_ref": ref, "offset": si})
            else:
                tokens = fill("tf", 3)
                if _sha_lt(k("tr"), _SHA_DOC_REL_P):
                    subj = sha_int(k("ts")) % E
                    obj = sha_int(k("to")) % E
                    if obj == subj:
                        obj = (subj + 1) % E
                    pred = _PRED_IDS[sha_int(k("tp")) % len(_PRED_IDS)]
                    tokens.append(typo(
                        entity_aliases(subj, cfg)[sha_int(k("ta")) % 3], "ta"))
                    tokens += list(PREDICATES[pred])
                    tokens.append(typo(
                        entity_aliases(obj, cfg)[sha_int(k("tb")) % 3], "tb"))
                else:
                    ent = sha_int(k("tm")) % E
                    tokens.append(typo(
                        entity_aliases(ent, cfg)[sha_int(k("tc")) % 3], "tc"))
                tokens += fill("tg", 2)
                spans.append({"kind": "text", "text": " ".join(tokens),
                              "media_ref": "", "offset": si})
        doc_ids.append(doc_id)
        spans_col.append(spans)
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=schema.DOCUMENTS)


def sha_documents_table(cfg: KGConfig) -> pa.Table:
    return sha_doc_rows(np.arange(cfg.n_docs), cfg)


def sha_documents_dataset(cfg: KGConfig,
                          override_num_blocks: int | None = None):
    """Distributed generation of the SQL-exact corpus."""
    import ray.data as rd

    n_blocks = override_num_blocks or max(1, cfg.n_docs // 2000)
    ds = rd.range(cfg.n_docs, override_num_blocks=n_blocks)
    return ds.map_batches(
        lambda b: sha_doc_rows(b["id"], cfg),
        batch_format="numpy", batch_size=cfg.batch_size)


def sha_documents_dataset_range(lo: int, hi: int, cfg: KGConfig,
                                override_num_blocks: int | None = None):
    """SQL-exact corpus slice for doc indices [lo, hi) — one resumable
    ingest shard (row-identical to the corresponding slice of
    ``sha_documents_dataset``; every row is a pure function of
    (seed, index))."""
    import ray.data as rd

    n = hi - lo
    n_blocks = override_num_blocks or max(1, n // 2000)
    ds = rd.range(n, override_num_blocks=n_blocks)
    return ds.map_batches(
        lambda b: sha_doc_rows(b["id"] + lo, cfg),
        batch_format="numpy", batch_size=cfg.batch_size)


# ---------------------------------------------------------------------------
# Property-graph node / relationship tables (F2/F3) with F4 noise
# ---------------------------------------------------------------------------


def _pg_label(i: int, weights: tuple | None = None) -> str:
    """Round-robin by default (uniform 1/7 per label — every existing
    fixture/oracle pins this). ``weights`` (same order as
    LABEL_SIGNATURES, summing to ~1) switches to a deterministic
    sha-derived weighted draw — used by tools/noise_sweep.py --ldbc-mix
    to mirror the reference benchmark's skewed LDBC label distribution
    (Comments/Posts dominate; the Place/Organisation identical-signature
    collision is then population-weighted the way the reference's
    purity numbers are)."""
    labels = tuple(LABEL_SIGNATURES.keys())
    if weights is None:
        return labels[i % len(labels)]
    u = int(sha_hex(f"pglabel|{i}")[:8], 16) / 16 ** 8
    acc = 0.0
    for lab, w in zip(labels, weights):
        acc += w
        if u < acc:
            return lab
    return labels[-1]


def gen_pg_node_rows(indices: np.ndarray, cfg: NodeSynthConfig) -> pa.Table:
    """Nodes with per-label property signatures; cells nulled at probability
    cfg.noise via the stable hash (columns containing 'id' never nulled —
    reference rule src2/main/scala/Noise.scala:15-17)."""
    thr = hex_threshold(cfg.noise)
    node_ids, labels, props_col = [], [], []
    for i in indices:
        i = int(i)
        nid = f"n{i:08d}"
        label = _pg_label(i, cfg.label_weights)
        props: dict[str, str] = {}
        for p in LABEL_SIGNATURES[label]:
            if "id" not in p.lower() and cfg.noise > 0 and \
                    sha_hex(f"pgnoise|{nid}|{p}|{cfg.seed}")[:4] < thr:
                continue
            props[p] = nid if p == "id" else sha_hex(f"pgval|{nid}|{p}")[:10]
        node_ids.append(nid)
        labels.append(label)
        props_col.append(props)
    return pa.Table.from_pydict(
        {"node_id": node_ids, "labels": labels, "properties": props_col},
        schema=schema.PG_NODES)


def gen_pg_rel_rows(indices: np.ndarray, cfg: NodeSynthConfig) -> pa.Table:
    """Edges between deterministic endpoints, including same-label edges
    (Person-KNOWS-Person) to exercise the reference's self-cluster-edge-drop
    quirk (src/main/scala/Clustering.scala:169)."""
    if cfg.label_weights is not None:
        # the KNOWS same-label trick below assumes the round-robin label
        # layout; under a weighted draw (a + len(LABEL_SIGNATURES)) % n
        # usually lands on a DIFFERENT label, silently corrupting the
        # fixture's same-label-edge semantics — enforce the restriction
        # the config comment documents
        raise ValueError(
            "gen_pg_rel_rows requires the round-robin label layout "
            "(label_weights=None); weighted mixes are node-clustering "
            "fixtures only")
    src, dst, rel, props = [], [], [], []
    n = cfg.n_nodes
    for i in indices:
        i = int(i)
        rng = np.random.default_rng([cfg.seed + 1, i])
        a = int(rng.integers(0, n))
        r = REL_TYPES[i % len(REL_TYPES)]
        if r == "KNOWS":  # same-label edge: next node with identical label
            b = (a + len(LABEL_SIGNATURES)) % n
        else:
            b = int(rng.integers(0, n))
        src.append(f"n{a:08d}")
        dst.append(f"n{b:08d}")
        rel.append(r)
        props.append({"creationDate": sha_hex(f"rel|{i}")[:8]})
    return pa.Table.from_pydict(
        {"src_id": src, "dst_id": dst, "rel_type": rel, "properties": props},
        schema=schema.PG_RELATIONSHIPS)


def pg_nodes_table(cfg: NodeSynthConfig) -> pa.Table:
    return gen_pg_node_rows(np.arange(cfg.n_nodes), cfg)


def pg_relationships_table(cfg: NodeSynthConfig) -> pa.Table:
    return gen_pg_rel_rows(np.arange(cfg.n_edges), cfg)


def pg_nodes_dataset(cfg: NodeSynthConfig):
    import ray.data as rd

    ds = rd.range(cfg.n_nodes, override_num_blocks=max(1, cfg.n_nodes // 4000))
    return ds.map_batches(lambda b: gen_pg_node_rows(b["id"], cfg),
                          batch_format="numpy", batch_size=4096)


def pg_relationships_dataset(cfg: NodeSynthConfig):
    import ray.data as rd

    ds = rd.range(cfg.n_edges, override_num_blocks=max(1, cfg.n_edges // 4000))
    return ds.map_batches(lambda b: gen_pg_rel_rows(b["id"], cfg),
                          batch_format="numpy", batch_size=4096)
