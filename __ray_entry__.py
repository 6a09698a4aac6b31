"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship KG-construction pipeline over sf0.001 documents
  (wrapped into the interleaved-span shape) unioned with the deterministic
  synthetic span corpus; returns the canonical triples Dataset.
- ``queries()``: one entry per implemented operator/pipeline (SURVEY.md §2 +
  the training-data ops); each callable takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible query;
  the sha256-based hash family used by the engine is reproducible in DuckDB,
  so even URI minting, hash-noise signatures, MinHash keys, LSH bands,
  SimHash, cosine ANN (brute force, IVF and hyperplane-LSH) and the FULL
  flagship KG pipeline over the SQL-exact corpus (kg_flagship_exact*,
  corpus generation -> extraction -> linking -> canonicalization -> graph
  materialization in one DuckDB statement) have exact SQL oracles. Only the
  tape-corpus flagship (numpy zipf draws) and media decoding are rows-only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# Ray workers import UDF modules by reference; if the driver's session was
# started without /root/repo on the workers' sys.path, force by-value
# serialization of the raykg package so UDFs travel self-contained.
try:  # pragma: no cover
    import raykg  # noqa: F401
    from ray import cloudpickle as _cp

    def _register_by_value():
        import importlib

        for m in ["raykg", "raykg.config", "raykg.schema", "raykg.synth",
                  "raykg.oracle", "raykg.functions", "raykg.functions.hashing",
                  "raykg.functions.shuffle",
                  "raykg.sources", "raykg.sources.io",
                  "raykg.stages", "raykg.stages.extract", "raykg.stages.link",
                  "raykg.stages.link_distributed",
                  "raykg.stages.canonicalize",
                  "raykg.pipelines", "raykg.pipelines.kg",
                  "raykg.pipelines.discover", "raykg.pipelines.evaluate",
                  "raykg.pipelines.incremental",
                  "raykg.ops", "raykg.ops.text", "raykg.ops.dedup",
                  "raykg.ops.ann", "raykg.ops.relational",
                  "raykg.ops.corpus",
                  "raykg.ops.multimodal", "raykg.state",
                  "raykg.state.checkpoint"]:
            try:
                _cp.register_pickle_by_value(importlib.import_module(m))
            except Exception:
                pass

    _register_by_value()
except Exception:
    pass


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def _documents_as_spans(sf_dir: str):
    """Wrap the flat testdata documents table into the interleaved-span
    document shape (one text span per doc)."""
    import pyarrow as pa
    import ray.data as rd

    from raykg import schema

    def wrap(t: pa.Table) -> pa.Table:
        ids = [f"tpc-{d}" for d in t.column("doc_id").to_pylist()]
        spans = [[{"kind": "text", "text": s, "media_ref": "", "offset": 0}]
                 for s in t.column("text").to_pylist()]
        return pa.Table.from_pydict({"doc_id": ids, "spans": spans},
                                    schema=schema.DOCUMENTS)

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .map_batches(wrap, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 + synthetic span corpus."""
    from raykg import synth
    from raykg.config import KGConfig
    from raykg.pipelines.kg import build_kg

    cfg = KGConfig(n_docs=300, batch_size=512, link_concurrency=2)
    docs = _documents_as_spans("/root/testdata/sf0.001") \
        .union(synth.documents_dataset(cfg))
    return build_kg(docs, cfg).triples


# ---------------------------------------------------------------------------
# flagship exact oracle (SQL-exact corpus; see raykg/synth.py sha_doc_rows)
# ---------------------------------------------------------------------------


def _flagship_exact_cfg():
    from raykg.config import KGConfig

    return KGConfig(n_docs=400, typo_rate=0.0, batch_size=512,
                    link_concurrency=2)


_flagship_memo: dict = {}


def _pin_result(r):
    """Materialize a fixture-sized KGResult once at memo time. build_kg
    deliberately leaves ``triples`` lazy (a rewrite map stage) — right for
    one consumer at scale, but here ELEVEN kg_* consumption queries share
    the memo, and each re-execution of the lazy stage re-spins its actor
    pool (the r4 clean sweep measured that tax at +2-5 s per query on the
    kg_* family). 400-doc fixture output pins in a few object-store blocks."""
    import dataclasses

    return dataclasses.replace(
        r, triples=r.triples.materialize(), edges=r.edges.materialize(),
        nodes=r.nodes.materialize())


def _flagship_exact_result():
    """One build_kg run shared by the kg_flagship_exact_* queries AND the
    kg_* consumption family (co-mentions/pagerank/salience/...)."""
    if "r" not in _flagship_memo:
        from raykg import synth
        from raykg.pipelines.kg import build_kg

        cfg = _flagship_exact_cfg()
        _flagship_memo["r"] = _pin_result(
            build_kg(synth.sha_documents_dataset(cfg), cfg))
    return _flagship_memo["r"]


def flagship_exact_sql(cfg=None, what: str = "triples") -> str:
    """Single-statement DuckDB oracle for the flagship KG pipeline over the
    SQL-exact corpus (synth.sha_doc_rows): corpus generation, extraction,
    exact alias linking, canonicalization (min-uri per norm-name group over
    OBSERVED entities) and graph materialization, all from ``range()`` — no
    input views needed. ``what``: 'triples' | 'edges' | 'nodes'.

    Reference semantics being checked end-to-end:
    src2/main/scala/DataToPattern.scala:11-79 (instance extraction + sha256
    URI minting) composed with the engine's linking/canonicalization."""
    from raykg import synth as _synth
    from raykg.config import NODE_LABELS, PREDICATES
    from raykg.functions.hashing import hex_threshold8

    if cfg is None:
        cfg = _flagship_exact_cfg()
    E, N, seed = cfg.num_entities, cfg.n_docs, cfg.seed
    mod, rem = cfg.dup_entity_mod, cfg.dup_entity_rem
    labels = "[" + ", ".join(f"'{x}'" for x in NODE_LABELS) + "]"
    preds = "[" + ", ".join(f"'{p}'" for p in PREDICATES) + "]"

    def H(key: str) -> str:
        return f"(('0x' || substr(sha256({key}), 1, 8))::UBIGINT)"

    def K(tag: str) -> str:
        return f"'{tag}|{seed}|' || di::VARCHAR || '|' || si::VARCHAR"

    def LT(tag: str, p: float) -> str:
        return f"substr(sha256({K(tag)}), 1, 8) < '{hex_threshold8(p)}'"

    body = f"""
    WITH ent AS (
      SELECT i, (i % {mod} = {rem} AND i > 0) AS dup,
             CASE WHEN i % {mod} = {rem} AND i > 0 THEN i - 1 ELSE i END AS base
      FROM range({E}) t(i)),
    ent2 AS (
      SELECT i, {labels}[(base % {len(NODE_LABELS)}) + 1] AS label, base
      FROM ent),
    ent3 AS (
      SELECT i, label,
             lower(label) || '-' || lpad(base::VARCHAR, 6, '0') AS norm_name,
             'sdpg.gr/' || label || '/'
               || sha256('E' || lpad(i::VARCHAR, 6, '0')) AS uri
      FROM ent2),
    docs AS (
      SELECT di, 'sdoc-' || lpad(di::VARCHAR, 8, '0') AS doc_id,
             1 + ({H(f"'ns|{seed}|' || di::VARCHAR")}
                  % {cfg.max_spans_per_doc})::BIGINT AS n_spans
      FROM range({N}) t(di)),
    spans AS (SELECT di, doc_id, unnest(range(0, n_spans)) AS si FROM docs),
    sp AS (
      SELECT di, doc_id, si,
             {LT("md", cfg.media_span_rate)} AS is_media,
             {LT("mk", _synth._SHA_DOC_IMG_P)} AS is_image,
             {LT("mc", _synth._SHA_DOC_CAP_P)} AS has_cap,
             ({H(K("me"))} % {E})::BIGINT AS cap_ent,
             {LT("tr", _synth._SHA_DOC_REL_P)} AS is_rel,
             ({H(K("ts"))} % {E})::BIGINT AS subj0,
             ({H(K("to"))} % {E})::BIGINT AS obj0,
             ({H(K("tp"))} % {len(PREDICATES)})::BIGINT AS pred_i,
             ({H(K("tm"))} % {E})::BIGINT AS ment
      FROM spans),
    rel AS (
      SELECT doc_id, si, subj0 AS se,
             CASE WHEN obj0 = subj0 THEN (subj0 + 1) % {E} ELSE obj0 END AS oe,
             {preds}[pred_i + 1] AS pred
      FROM sp WHERE NOT is_media AND is_rel),
    men AS (
      SELECT doc_id, si, se AS ent FROM rel
      UNION ALL SELECT doc_id, si, oe FROM rel
      UNION ALL SELECT doc_id, si, ment FROM sp
                WHERE NOT is_media AND NOT is_rel),
    ev AS (
      SELECT doc_id, si, 'mentions' AS pred, NULL::BIGINT AS se, ent AS oe
      FROM men
      UNION ALL SELECT doc_id, si, 'depicts', NULL::BIGINT, cap_ent
                FROM sp WHERE is_media AND has_cap
      UNION ALL SELECT doc_id, si, pred, se, oe FROM rel),
    obs AS (SELECT oe AS i FROM ev
            UNION SELECT se FROM ev WHERE se IS NOT NULL),
    canon AS (
      SELECT e.i, e.label, e.uri,
             min(e.uri) OVER (PARTITION BY e.norm_name) AS canon_uri
      FROM ent3 e JOIN obs ON obs.i = e.i),
    triples AS (
      SELECT CASE WHEN ev.se IS NULL
                  THEN 'sdpg.gr/Document/' || sha256(ev.doc_id)
                  ELSE cs.canon_uri END AS subj,
             ev.pred AS pred, co.canon_uri AS obj, ev.doc_id AS doc_id,
             ev.si::INT AS span_offset
      FROM ev
      LEFT JOIN canon cs ON cs.i = ev.se
      JOIN canon co ON co.i = ev.oe)
    """
    from raykg.config import KG_LABEL_PROPS

    prop_vals = ",\n               ".join(
        f"('{lab}', [{', '.join(repr(p) for p in sorted(props))}])"
        for lab, props in KG_LABEL_PROPS.items())
    finals = {
        "triples": "SELECT * FROM triples",
        "edges": """
            SELECT subj, pred, obj, count(*)::BIGINT AS count
            FROM triples GROUP BY 1, 2, 3""",
        "nodes": """
            SELECT DISTINCT c.canon_uri AS uri, e.label AS label
            FROM canon c JOIN ent3 e ON e.uri = c.canon_uri
            UNION ALL
            SELECT 'sdpg.gr/Document/' || sha256(doc_id), 'Document'
            FROM docs""",
        # fake-decoder metadata is sha-derived (ops/multimodal.py) -> exact
        "media": """
            , media AS (
              SELECT doc_id, si,
                     'media://' || substr(sha256(doc_id || ':'
                         || si::VARCHAR), 1, 16) AS media_ref,
                     CASE WHEN is_image THEN 'image' ELSE 'audio' END AS kind
              FROM sp WHERE is_media)
            SELECT doc_id, si::INT AS span_idx, media_ref, kind,
                   (64 + ('0x' || substr(sha256(media_ref), 1, 4))::UBIGINT
                    % 1024)::INT AS width,
                   (64 + ('0x' || substr(sha256(media_ref), 5, 4))::UBIGINT
                    % 1024)::INT AS height
            FROM media""",
        # schema discovery over the materialized nodes: deterministic
        # MinHash cluster keys with the reference's numHashTables sizing
        # rule (config.py derived_minhash_tables) computed IN SQL
        "node_types": f"""
            , canon_nodes AS (
              SELECT DISTINCT c.canon_uri AS uri, e.label
              FROM canon c JOIN ent3 e ON e.uri = c.canon_uri),
            lab_counts AS (
              SELECT label, count(*) AS n FROM canon_nodes GROUP BY 1
              UNION ALL SELECT 'Document', {N}),
            nc AS (SELECT (SELECT count(*) FROM canon_nodes) + {N} AS n),
            ntc AS (SELECT greatest(2, ceil(2 * log10(greatest(10, n)))
                    )::BIGINT AS nt FROM nc),
            props_of AS (SELECT * FROM (VALUES
               {prop_vals},
               ('Document', ['n_spans'])) AS t(label, props))
            SELECT array_to_string(list_transform(
                       range(0, (SELECT nt FROM ntc)),
                       h -> coalesce(list_min(list_transform(p.props,
                            x -> substr(sha256(x || '#' || h::VARCHAR
                                        || '#{seed}'), 1, 8))),
                            'ffffffff')), '_') AS cluster_key,
                   l.label AS label,
                   array_to_string(p.props, ',') AS required,
                   '' AS optional,
                   l.n::BIGINT AS count
            FROM lab_counts l JOIN props_of p ON p.label = l.label""",
    }
    return body + finals[what]


# ---------------------------------------------------------------------------
# flagship FUZZY oracle: sha-drawn typos + deletion-variant resolution in SQL
# ---------------------------------------------------------------------------


def _flagship_fuzzy_cfg():
    from raykg.config import KGConfig

    return KGConfig(n_docs=400, typo_rate=0.3, batch_size=512,
                    link_concurrency=2)


def _flagship_fuzzy_result():
    if "f" not in _flagship_memo:
        from raykg import synth
        from raykg.pipelines.kg import build_kg

        cfg = _flagship_fuzzy_cfg()
        _flagship_memo["f"] = _pin_result(
            build_kg(synth.sha_documents_dataset(cfg), cfg))
    return _flagship_memo["f"]


def flagship_fuzzy_sql(cfg=None, what: str = "triples") -> str:
    """Single-statement DuckDB oracle for the flagship pipeline over the
    SQL-exact corpus WITH sha-drawn typos (cfg.typo_rate > 0): corpus
    generation (single-char deletions at deterministic sha positions),
    extraction, and the engine's FUZZY linking rule — exact alias hit
    first, else single-deletion-variant candidates scored by
    character-shingle Jaccard with argmax (ties -> smallest alias string,
    threshold cfg.link_jaccard_threshold) — then canonicalization and
    materialization. This is the DuckDB twin of AliasIndex's
    deletion-blocked resolution (stages/link.py:110-203; reference analog
    src2/main/scala/LSH.scala:10-18), closing the one self-certified piece
    of the flagship: the corrupted-surface path."""
    from raykg import synth as _synth
    from raykg.config import NODE_LABELS, PREDICATES
    from raykg.functions.hashing import hex_threshold8

    if cfg is None:
        cfg = _flagship_fuzzy_cfg()
    E, N, seed = cfg.num_entities, cfg.n_docs, cfg.seed
    mod, rem = cfg.dup_entity_mod, cfg.dup_entity_rem
    labels = "[" + ", ".join(f"'{x}'" for x in NODE_LABELS) + "]"
    preds = "[" + ", ".join(f"'{p}'" for p in PREDICATES) + "]"
    thr = cfg.link_jaccard_threshold
    k_sh = cfg.link_shingle_k

    def H(key: str) -> str:
        return f"(('0x' || substr(sha256({key}), 1, 8))::UBIGINT)"

    def K(tag: str) -> str:
        return f"'{tag}|{seed}|' || di::VARCHAR || '|' || si::VARCHAR"

    def LT(tag: str, p: float) -> str:
        return f"substr(sha256({K(tag)}), 1, 8) < '{hex_threshold8(p)}'"

    def TY(alias_expr: str, tag: str) -> str:
        """apply_typo(alias, sha_int) under a Bernoulli(typo_rate) draw:
        cut = pos % (len-2) + 1 (0-indexed char cut, never first/last),
        i.e. keep substr(1..cut) || substr(cut+2..). Aliases shorter than
        4 chars are a no-op, exactly like apply_typo's len<4 guard (also
        avoids a '% 0' for 2-char aliases)."""
        ythr = hex_threshold8(cfg.typo_rate)
        pos = f"(({H(K('z' + tag))} % (len({alias_expr}) - 2))::BIGINT + 1)"
        return (f"CASE WHEN len({alias_expr}) >= 4 "
                f"AND substr(sha256({K('y' + tag)}), 1, 8) < '{ythr}' "
                f"THEN substr({alias_expr}, 1, {pos}::INT) "
                f"|| substr({alias_expr}, {pos}::INT + 2) "
                f"ELSE {alias_expr} END")

    def SH(e: str) -> str:
        """char_shingles(s, k): distinct k-grams of '^' || s || '$'."""
        p = f"('^' || {e} || '$')"
        return (f"CASE WHEN len({p}) <= {k_sh} THEN [{p}] "
                f"ELSE list_distinct(list_transform("
                f"range(1, len({p}) - {k_sh - 2}), "
                f"x -> substr({p}, x::INT, {k_sh}))) END")

    body = f"""
    WITH ent AS (
      SELECT i, (i % {mod} = {rem} AND i > 0) AS dup,
             CASE WHEN i % {mod} = {rem} AND i > 0 THEN i - 1 ELSE i END AS base
      FROM range({E}) t(i)),
    ent2 AS (
      SELECT i, dup, {labels}[(base % {len(NODE_LABELS)}) + 1] AS label, base
      FROM ent),
    ent3 AS (
      SELECT i, label,
             lower(label) || '-' || lpad(base::VARCHAR, 6, '0') AS norm_name,
             'sdpg.gr/' || label || '/'
               || sha256('E' || lpad(i::VARCHAR, 6, '0')) AS uri
      FROM ent2),
    al3 AS (
      SELECT i, [name, replace(name, '-', '_'),
                 lower(substr(label, 1, 3)) || lpad(i::VARCHAR, 6, '0')] AS als
      FROM (SELECT i, label,
                   lower(label) || '-' || lpad(base::VARCHAR, 6, '0')
                     || CASE WHEN dup THEN '-dup' ELSE '' END AS name
            FROM ent2)),
    aliases AS (SELECT i AS ent, unnest(als) AS alias FROM al3),
    docs AS (
      SELECT di, 'sdoc-' || lpad(di::VARCHAR, 8, '0') AS doc_id,
             1 + ({H(f"'ns|{seed}|' || di::VARCHAR")}
                  % {cfg.max_spans_per_doc})::BIGINT AS n_spans
      FROM range({N}) t(di)),
    spans AS (SELECT di, doc_id, unnest(range(0, n_spans)) AS si FROM docs),
    sp AS (
      SELECT di, doc_id, si,
             {LT("md", cfg.media_span_rate)} AS is_media,
             {LT("mc", _synth._SHA_DOC_CAP_P)} AS has_cap,
             ({H(K("me"))} % {E})::BIGINT AS cap_ent,
             ({H(K("ma"))} % 3)::BIGINT AS cap_ai,
             {LT("tr", _synth._SHA_DOC_REL_P)} AS is_rel,
             ({H(K("ts"))} % {E})::BIGINT AS subj0,
             ({H(K("to"))} % {E})::BIGINT AS obj0,
             ({H(K("tp"))} % {len(PREDICATES)})::BIGINT AS pred_i,
             ({H(K("ta"))} % 3)::BIGINT AS subj_ai,
             ({H(K("tb"))} % 3)::BIGINT AS obj_ai,
             ({H(K("tm"))} % {E})::BIGINT AS ment,
             ({H(K("tc"))} % 3)::BIGINT AS ment_ai
      FROM spans),
    rels AS (
      SELECT r.di, r.doc_id, r.si, {preds}[r.pred_i + 1] AS pred,
             {TY("(sa.als)[r.subj_ai + 1]", "ta")} AS ssurf,
             {TY("(ob.als)[r.obj_ai + 1]", "tb")} AS osurf
      FROM (SELECT di, doc_id, si, pred_i, subj_ai, obj_ai,
                   subj0 AS se_raw,
                   CASE WHEN obj0 = subj0 THEN (subj0 + 1) % {E}
                        ELSE obj0 END AS oe_raw
            FROM sp WHERE NOT is_media AND is_rel) r
      JOIN al3 sa ON sa.i = r.se_raw
      JOIN al3 ob ON ob.i = r.oe_raw),
    ments AS (
      SELECT sp.di, sp.doc_id, sp.si,
             {TY("(m.als)[sp.ment_ai + 1]", "tc")} AS surf
      FROM sp JOIN al3 m ON m.i = sp.ment
      WHERE NOT is_media AND NOT is_rel),
    caps AS (
      SELECT sp.di, sp.doc_id, sp.si,
             {TY("(c.als)[sp.cap_ai + 1]", "ma")} AS surf
      FROM sp JOIN al3 c ON c.i = sp.cap_ent
      WHERE is_media AND has_cap),
    ev_s AS (
      SELECT doc_id, si, 'mentions' AS pred,
             NULL::VARCHAR AS ssurf, ssurf AS osurf FROM rels
      UNION ALL SELECT doc_id, si, 'mentions', NULL::VARCHAR, osurf FROM rels
      UNION ALL SELECT doc_id, si, 'mentions', NULL::VARCHAR, surf FROM ments
      UNION ALL SELECT doc_id, si, 'depicts', NULL::VARCHAR, surf FROM caps
      UNION ALL SELECT doc_id, si, pred, ssurf, osurf FROM rels),
    surfs AS (
      SELECT DISTINCT surf AS surface FROM (
        SELECT ssurf AS surf FROM ev_s WHERE ssurf IS NOT NULL
        UNION ALL SELECT osurf FROM ev_s)),
    ex AS (
      SELECT s.surface, min(a.ent) AS ent
      FROM surfs s JOIN aliases a ON a.alias = s.surface GROUP BY 1),
    miss AS (SELECT surface FROM surfs
             WHERE surface NOT IN (SELECT surface FROM ex)),
    vars AS (
      SELECT ent, alias,
             substr(alias, 1, q - 1) || substr(alias, q + 1) AS variant
      FROM (SELECT ent, alias, unnest(range(1, len(alias) + 1)) AS q
            FROM aliases)),
    cand AS (
      SELECT DISTINCT m.surface, v.alias, v.ent
      FROM miss m JOIN vars v ON v.variant = m.surface),
    scored AS (
      SELECT surface, alias, ent,
             len(list_intersect(ss, sa))::DOUBLE
               / len(list_distinct(list_concat(ss, sa))) AS jac
      FROM (SELECT surface, alias, ent, {SH("surface")} AS ss,
                   {SH("alias")} AS sa
            FROM cand)),
    fz AS (
      SELECT surface, ent FROM scored WHERE jac >= {thr}
      QUALIFY row_number() OVER (PARTITION BY surface
          ORDER BY jac DESC, alias) = 1),
    res AS (SELECT surface, ent FROM ex
            UNION ALL SELECT surface, ent FROM fz),
    ev AS (
      SELECT e.doc_id, e.si, e.pred, rs.ent AS se, ro.ent AS oe
      FROM ev_s e
      LEFT JOIN res rs ON rs.surface = e.ssurf
      JOIN res ro ON ro.surface = e.osurf
      WHERE e.ssurf IS NULL OR rs.ent IS NOT NULL),
    obs AS (SELECT oe AS i FROM ev
            UNION SELECT se FROM ev WHERE se IS NOT NULL),
    canon AS (
      SELECT e.i, e.label, e.uri,
             min(e.uri) OVER (PARTITION BY e.norm_name) AS canon_uri
      FROM ent3 e JOIN obs ON obs.i = e.i),
    triples AS (
      SELECT CASE WHEN ev.se IS NULL
                  THEN 'sdpg.gr/Document/' || sha256(ev.doc_id)
                  ELSE cs.canon_uri END AS subj,
             ev.pred AS pred, co.canon_uri AS obj, ev.doc_id AS doc_id,
             ev.si::INT AS span_offset
      FROM ev
      LEFT JOIN canon cs ON cs.i = ev.se
      JOIN canon co ON co.i = ev.oe)
    """
    finals = {
        "triples": "SELECT * FROM triples",
        "edges": """
            SELECT subj, pred, obj, count(*)::BIGINT AS count
            FROM triples GROUP BY 1, 2, 3""",
        "nodes": """
            SELECT DISTINCT c.canon_uri AS uri, e.label AS label
            FROM canon c JOIN ent3 e ON e.uri = c.canon_uri
            UNION ALL
            SELECT 'sdpg.gr/Document/' || sha256(doc_id), 'Document'
            FROM docs""",
    }
    return body + finals[what]


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[str], Any]]:
    import ray.data as rd

    from raykg import synth
    from raykg.config import KGConfig
    from raykg.ops import ann, corpus, dedup, graph, relational, text
    from raykg.ops.multimodal import media_features
    from raykg.pipelines.discover import discover_node_types
    from raykg.pipelines.kg import build_kg

    def _docs(sf_dir):
        return rd.read_parquet(f"{sf_dir}/documents.parquet")

    def _emb(sf_dir):
        return rd.read_parquet(f"{sf_dir}/embeddings.parquet")

    def _snapshot_b(docs):
        """Deterministic second corpus snapshot for corpus_diff: drop
        doc_id % 13 == 0, append ' v2' to % 7 == 0, re-add % 11 == 0
        under doc_id + 10_000_000 (same derivation as the SQL twin)."""
        import pyarrow as _pa

        def mutate(t):
            ids = t.column("doc_id").to_pylist()
            txts = t.column("text").to_pylist()
            out_i, out_t = [], []
            for d, s in zip(ids, txts):
                if d % 13 == 0:
                    continue
                out_i.append(d)
                out_t.append(s + " v2" if d % 7 == 0 else s)
            for d, s in zip(ids, txts):
                if d % 11 == 0:
                    out_i.append(d + 10_000_000)
                    out_t.append(s)
            return _pa.table({
                "doc_id": _pa.array(out_i, _pa.int64()),
                "text": _pa.array(out_t, _pa.string())})

        return docs.select_columns(["doc_id", "text"]).map_batches(
            mutate, batch_format="pyarrow")

    def _curate_corpus_query(sf_dir):
        from raykg.pipelines.curate import curate_corpus
        return curate_corpus(_docs(sf_dir), num_buckets=256)

    def kg_flagship_triples(sf_dir):
        cfg = KGConfig(n_docs=400, batch_size=512, link_concurrency=2)
        return build_kg(synth.documents_dataset(cfg), cfg).triples

    def kg_flagship_node_types(sf_dir):
        cfg = KGConfig(n_docs=400, batch_size=512, link_concurrency=2)
        result = build_kg(synth.documents_dataset(cfg), cfg)
        return discover_node_types(result.nodes, cfg).node_types

    def media_feats(sf_dir):
        cfg = KGConfig(n_docs=400)
        return media_features(synth.documents_dataset(cfg)) \
            .select_columns(["doc_id", "span_idx", "media_ref", "kind",
                             "width", "height"])

    from raykg.ops.multimodal import (
        decode_blob_meta,
        resize_images,
        sample_frames,
        synth_media_blobs,
    )

    def media_blob_meta(sf_dir):
        return decode_blob_meta(synth_media_blobs(2000))

    def media_resize(sf_dir):
        return resize_images(synth_media_blobs(2000))

    def media_frames(sf_dir):
        return sample_frames(synth_media_blobs(2000))

    def kg_flagship_exact(sf_dir):
        return _flagship_exact_result().triples

    def kg_flagship_exact_edges(sf_dir):
        return _flagship_exact_result().edges

    def kg_flagship_exact_nodes(sf_dir):
        return _flagship_exact_result().nodes.select_columns(["uri", "label"])

    def kg_flagship_exact_node_types(sf_dir):
        import pyarrow as pa

        cfg = _flagship_exact_cfg()
        nt = discover_node_types(_flagship_exact_result().nodes,
                                 cfg).node_types

        def proj(t: pa.Table) -> pa.Table:
            return pa.table({
                "cluster_key": t.column("cluster_key"),
                "label": t.column("label"),
                "required": pa.array(
                    [",".join(x)
                     for x in t.column("required_props").to_pylist()],
                    pa.string()),
                "optional": pa.array(
                    [",".join(x)
                     for x in t.column("optional_props").to_pylist()],
                    pa.string()),
                "count": t.column("count"),
            })

        return nt.map_batches(proj, batch_format="pyarrow")

    def media_features_exact(sf_dir):
        cfg = _flagship_exact_cfg()
        return media_features(synth.sha_documents_dataset(cfg)) \
            .select_columns(["doc_id", "span_idx", "media_ref", "kind",
                             "width", "height"])

    def kg_incremental_append(sf_dir):
        import dataclasses
        import shutil
        import tempfile

        from raykg.catalog import default_catalog
        from raykg.pipelines.kg import ingest_increment

        cfg_full = _flagship_exact_cfg()
        cfg_old = dataclasses.replace(cfg_full, n_docs=300)
        root = tempfile.mkdtemp(prefix="raykg_incr_")
        # one catalog for both ingest phases: the derived vocabulary is
        # identical at 300 and 400 docs (num_entities floor = 64), so the
        # metadata pin and alias index build are paid once, not per phase
        cat = default_catalog(cfg_full)

        def rng(c):
            return lambda lo, hi: synth.sha_documents_dataset_range(
                lo, hi, c)

        try:
            ingest_increment(cfg_old, root, docs_for_range=rng(cfg_old),
                             link_only=True, catalog=cat)
            # pin the (fixture-sized) result before deleting the checkpoint
            # it lazily reads from — gate runs used to leak one tempdir each
            return ingest_increment(
                cfg_full, root, docs_for_range=rng(cfg_full),
                catalog=cat).triples.materialize()
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def kg_flagship_fuzzy_exact(sf_dir):
        return _flagship_fuzzy_result().triples

    def kg_flagship_fuzzy_exact_edges(sf_dir):
        return _flagship_fuzzy_result().edges

    return {
        # relational operator surface (SURVEY §2)
        "pricing_summary": relational.pricing_summary,
        "revenue_by_nation": relational.revenue_by_nation,
        "revenue_by_priority": relational.revenue_by_priority,
        # TPC-H Q5 shape: broadcast dimension chain + fact-fact shuffle
        # join + post-join nation correlation
        "local_supplier_revenue": relational.local_supplier_revenue,
        "majority_nation_per_segment": relational.majority_nation_per_segment,
        "top_orders": relational.top_orders,
        "event_type_counts": relational.event_type_counts,
        "hourly_event_stats": relational.hourly_event_stats,
        "sliding_event_stats": relational.sliding_event_stats,
        "sessionize": relational.sessionize,
        # gaps-and-islands interval merge: per-user union coverage of
        # value-minute event intervals
        "interval_coverage": relational.interval_coverage,
        # exact order-statistic window: trailing-5 rolling median per user
        "rolling_median": relational.rolling_median,
        # first-touch funnel: strict-order earliest-after-bound chain
        "funnel_stages": relational.funnel_stages,
        "asof_last_click": relational.asof_last_click,
        "range_join_recent_clicks": relational.range_join_recent_clicks,
        "props_k_stats": relational.props_k_stats,
        "value_quantiles": relational.value_quantiles_by_type,
        # mergeable equi-width histogram sketch quantiles (the scale path
        # for per-key quantiles: register-sized partials, no per-key sort)
        "histogram_quantiles": relational.histogram_quantiles,
        # per-user sliding-window burst / rate-limit screen (bot traffic)
        "burst_stats": relational.burst_stats,
        # per-user streaming EWMA state (alpha=1/2: exact halving, pinned
        # op order -> bit-exact vs a recursive-CTE replay)
        "ewma_by_user": relational.ewma_by_user,
        # window-function analogs: LAG / ROW_NUMBER as bucketed
        # sorted-segment passes
        "event_lag_stats": relational.event_lag_stats,
        # first-order Markov transition matrix (LEAD window twin)
        "event_transitions": relational.event_transitions,
        # cohort retention: users by first-event week, counted in every
        # later active week (fixed epoch-anchored 7-day buckets)
        "retention_cohorts": relational.retention_cohorts,
        # periodicity diagnostic: exact lag-k Pearson on the hourly series
        "hourly_autocorrelation":
            lambda sf: relational.hourly_autocorrelation(sf),
        "top_orders_per_customer": relational.top_orders_per_customer,
        # anti-join (no broadcast side) + rollup multi-level aggregate
        "customers_without_orders": relational.customers_without_orders,
        "pricing_rollup": relational.pricing_rollup,
        "kg_nodes": relational.kg_nodes,
        "kg_edges": relational.kg_edges,
        "property_signatures": relational.property_signatures,
        "minhash_cluster_counts": relational.minhash_cluster_counts,
        "infer_column_types": relational.infer_column_types,
        # text analysis
        "token_stats": lambda sf: text.token_stats(_docs(sf)),
        "quality_score": lambda sf: text.quality_score(_docs(sf)),
        # Flesch-Kincaid grade (vowel-group syllables, [.!?]+ sentences)
        "readability": lambda sf: text.readability(_docs(sf)),
        "lang_id": lambda sf: text.lang_id(_docs(sf)),
        "fingerprint": lambda sf: text.fingerprint(_docs(sf)),
        "inverted_index": lambda sf: text.inverted_index(_docs(sf)),
        "gopher_rules": lambda sf: text.gopher_rules(_docs(sf)),
        "quality_funnel": lambda sf: text.quality_funnel(_docs(sf)),
        "cooccurrence_pmi": lambda sf: text.cooccurrence_pmi(_docs(sf)),
        "chunk_documents": lambda sf: text.chunk_documents(_docs(sf)),
        "repetition_ratio": lambda sf: text.repetition_ratio(_docs(sf)),
        "doc_length_histogram":
            lambda sf: text.doc_length_histogram(_docs(sf)),
        # per-doc fraction of n-grams first seen in this doc (crawl-
        # snapshot novelty ordering signal)
        "ngram_novelty": lambda sf: text.ngram_novelty(_docs(sf)),
        # skyline of distinct (size, price) part points, exact int cents
        "pareto_front": relational.pareto_front,
        # exact distributed percentile_disc via domain-bounded histograms
        "group_quantiles": relational.group_quantiles,
        # Hampel-rule robust stats: median, MAD, |x-med| > 3*MAD counts
        "robust_group_stats": relational.robust_group_stats,
        # product-quantization codes (IVF-PQ compression step), int-exact
        "pq_codes": lambda sf: ann.pq_codes(_emb(sf)),
        # asymmetric-distance top-k over the PQ codes (the IVF-PQ scan)
        "ann_pq": lambda sf: ann.ann_pq(_emb(sf), [0, 1, 2, 3, 4]),
        # the composed IVF-PQ scan path: coarse probe pruning + ADC codes
        "ann_ivfpq": lambda sf: ann.ann_ivfpq(_emb(sf), [0, 1, 2, 3, 4]),
        "unigram_logprob": lambda sf: text.unigram_logprob(_docs(sf)),
        # DSIR hashed-n-gram importance weights (Xie et al., NeurIPS'23):
        # target = lang-ID 'en' docs, features = sha-hashed unigram buckets
        "dsir_weights": lambda sf: text.dsir_weights(_docs(sf)),
        # Okapi BM25 against a fixed query-term set (retrieval-style
        # relevance filter; Lucene idf variant)
        "bm25_scores": lambda sf: text.bm25_scores(_docs(sf)),
        # bigram LM quality signal (CCNet-style); the join twin computes
        # the identical number with NOTHING broadcast or driver-resident
        "bigram_logprob": lambda sf: text.bigram_logprob(_docs(sf)),
        # percent_rank() semantics without a global sort: rounded scores
        # make the CDF table vocabulary-sized
        "score_percentiles": lambda sf: text.score_percentiles(_docs(sf)),
        "bigram_logprob_join": lambda sf: text.bigram_logprob(
            _docs(sf), mode="join"),
        # TF-IDF without a vocabulary broadcast: df falls out of the
        # term-bucketed exchange, argmax is a doc-bucketed segment pass
        "tfidf_top_terms": lambda sf: text.tfidf_top_terms(_docs(sf)),
        # PII-shaped redaction over a deterministic sha-derived corpus (the
        # testdata text is clean words; injected emails/digit runs make the
        # regexes real) — DuckDB regenerates the corpus and redacts with
        # identical RE2 patterns
        "redact_pii": lambda sf: text.redact_pii(text.synth_pii_docs(2000)),
        # corpus-level training-data ops
        "neardup_keep": lambda sf: corpus.neardup_keep(_docs(sf)),
        "neardup_components": lambda sf: corpus.neardup_components(_docs(sf)),
        # production dedup policy: keep the highest-quality member of
        # each near-dup component, not the smallest id
        "neardup_keep_best":
            lambda sf: corpus.neardup_keep_best(_docs(sf)),
        # same output via alternating star contraction (O(log^2 n) rounds,
        # diameter-independent — the long-chain-graph scale path)
        "neardup_components_star": lambda sf: corpus.neardup_components(
            _docs(sf), algorithm="star"),
        "hash_split": lambda sf: corpus.hash_split(_docs(sf)),
        # deterministic bottom-k sketch sample: k smallest sha ranks —
        # reservoir-equivalent but stable under resharding and resume
        "bottomk_sample": lambda sf: corpus.bottomk_sample(_docs(sf)),
        "pack_sequences": lambda sf: corpus.pack_sequences(_docs(sf)),
        "stratified_sample": lambda sf: corpus.stratified_sample(
            _docs(sf), {"src0": 0.2, "src1": 0.8}, default_rate=0.5),
        # mC4/XLM-R temperature mixing: data-dependent per-source rates
        # from a vocabulary-sized count aggregate
        "temperature_mix": lambda sf: corpus.temperature_mix(_docs(sf)),
        # Efraimidis-Spirakis weighted without-replacement sample per
        # source, weight = n_chars (quality-weighted subsampling)
        "weighted_sample": lambda sf: corpus.weighted_sample(_docs(sf)),
        # C4/RefinedWeb per-domain document cap: at most k docs per
        # source, k smallest sha ranks — deterministic and mergeable
        "source_cap": lambda sf: corpus.source_cap(_docs(sf)),
        "top_ngrams": lambda sf: corpus.top_ngrams(_docs(sf)),
        # BPE tokenizer training: the round-1 pair statistics AND the full
        # iterative merge table (unrolled-round SQL twin, hash-checked)
        "bpe_pair_counts":
            lambda sf: corpus.bpe_pair_counts(_docs(sf), k=30),
        "bpe_merges": lambda sf: corpus.bpe_train(_docs(sf), n_merges=6),
        # token frequency spectrum (count-of-counts / Zipf profile)
        "freq_spectrum": lambda sf: corpus.freq_spectrum(_docs(sf)),
        # per-source unigram KL from the corpus blend (mixture drift)
        "source_unigram_kl": lambda sf: corpus.source_unigram_kl(_docs(sf)),
        # incremental-crawl delta: added/removed/changed vs a derived
        # second snapshot (drop %13, append ' v2' to %7, add %11 as new)
        "corpus_diff": lambda sf: corpus.corpus_diff(
            _docs(sf), _snapshot_b(_docs(sf))),
        # bottom-k sketch source-similarity matrix (lexical Jaccard)
        "source_similarity": lambda sf: corpus.source_similarity_sketch(
            _docs(sf)),
        # dense vocabulary ids (distributed zipWithIndex, no global sort)
        "vocab_ids": lambda sf: corpus.vocab_ids(_docs(sf)),
        # corpus encoding: '_'-joined dense id sequence per doc
        "encode_documents": lambda sf: corpus.encode_documents(_docs(sf)),
        # HyperLogLog sketch: mergeable per-batch register partials,
        # integer-exact register table + corrected estimate
        "hll_registers": lambda sf: corpus.hll_token_registers(_docs(sf)),
        "hll_estimate": lambda sf: corpus.hll_estimate(_docs(sf)),
        # grouped HLL: one sketch per event_type (distinct users) — the
        # per-group cardinality shape for 100 TB (exchange = groups x 256)
        "hll_user_counts": lambda sf: corpus.hll_group_estimates(
            rd.read_parquet(f"{sf}/events.parquet",
                            columns=["event_type", "user_id"])),
        # count-min sketch: linear (SUM-mergeable) register partials;
        # point estimates = min over rows, bit-exact incl. collisions
        "cms_registers": lambda sf: corpus.cms_token_counts(_docs(sf)),
        "cms_estimates": lambda sf: corpus.cms_estimate_tokens(
            _docs(sf), ["table", "query", "spark", "value", "xyzzy"]),
        # Bloom-filter membership probe: mergeable set-bit partials ->
        # broadcast once -> vectorized probe; decisions (incl. false
        # positives) are a shared sha256 contract with the oracle
        "bloom_contamination":
            lambda sf: corpus.bloom_contamination(_docs(sf)),
        "cross_source_overlap":
            lambda sf: corpus.cross_source_overlap(_docs(sf)),
        # deduplication
        "exact_dedup": lambda sf: dedup.exact_dedup(_docs(sf)),
        "minhash_dedup": lambda sf: dedup.minhash_dedup(_docs(sf)),
        # hash_family="fast" production mode (rows-only: crc family has no
        # DuckDB twin BY DESIGN; minhash_dedup is its hash-green sha twin,
        # and tests/test_hash_family_fast.py pins decision agreement —
        # measured 3.2x end-to-end / 4.6x kernel vs sha, BASELINE.md r4)
        "minhash_dedup_fast":
            lambda sf: dedup.minhash_dedup(_docs(sf), hash_family="fast"),
        "lsh_candidate_pairs": lambda sf: dedup.lsh_candidate_pairs(_docs(sf)),
        "simhash": lambda sf: dedup.simhash(_docs(sf)),
        # fast-family SimHash (rows-only; "simhash" is the sha twin)
        "simhash_fast":
            lambda sf: dedup.simhash(_docs(sf), hash_family="fast"),
        "ngram_jaccard_pairs": lambda sf: dedup.ngram_jaccard_pairs(_docs(sf)),
        # GLOBAL exact Jaccard join (prefix filtering, no blocking key,
        # no false negatives) — the scale-exact twin of the blocked
        # all-pairs op above and the probabilistic LSH op
        "set_similarity_join":
            lambda sf: dedup.set_similarity_join(_docs(sf)),
        # asymmetric Broder containment: short doc quoted inside long one
        "containment_pairs": lambda sf: dedup.containment_pairs(_docs(sf)),
        # GLOBAL exact containment join (asymmetric prefix filter, no
        # blocking key) — the scale-exact twin of the blocked op above
        "containment_join":
            lambda sf: dedup.containment_join(_docs(sf)),
        # SymSpell deletion-blocked edit-distance-1 similarity join
        "fuzzy_name_pairs": lambda sf: dedup.fuzzy_name_pairs(
            rd.read_parquet(f"{sf}/part.parquet", columns=["p_name"]),
            col="p_name"),
        # exact integer-register Pearson over the lineitem measures
        "numeric_correlation_matrix": relational.numeric_correlation_matrix,
        "embedding_neardup_pairs":
            lambda sf: dedup.embedding_neardup_pairs(_emb(sf)),
        # ExactSubstr signal (Lee et al. 2022): per-doc duplicated
        # token-span statistics via distributed window hashing
        "dup_span_stats": lambda sf: dedup.dup_span_stats(_docs(sf)),
        # GPT-3/PaLM-style train/test decontamination: train docs sharing
        # an exact 8-token window with any test doc (hash_split rule)
        "decontaminate": lambda sf: dedup.decontaminate(_docs(sf)),
        # end-to-end curation flagship: quality -> dedup -> decontam ->
        # split, one streaming pipeline, one DuckDB statement
        "curate_corpus": _curate_corpus_query,
        "segment_dedup": lambda sf: dedup.segment_dedup(_docs(sf)),
        # SemDeDup: cluster the embedding space, drop within-cluster
        # semantic near-dups (lower-id representative survives)
        "semantic_dedup": lambda sf: dedup.semantic_dedup_keep(_emb(sf)),
        # trained-centroid configuration (the real SemDeDup); iterative
        # float k-means has no SQL oracle — semantic_dedup is its
        # hash-green fixed-centroid twin
        "semantic_dedup_kmeans": lambda sf: dedup.semantic_dedup_keep(
            _emb(sf), cent=ann.kmeans_centroids(_emb(sf), k=16, iters=3)),
        # similarity search
        "ann_bruteforce":
            lambda sf: ann.ann_bruteforce(_emb(sf), [0, 1, 2, 3, 4], k=5),
        "ann_lsh": lambda sf: ann.ann_lsh(_emb(sf), [0, 1, 2, 3, 4], k=5),
        "ann_ivf": lambda sf: ann.ann_ivf(_emb(sf), [0, 1, 2, 3, 4], k=5),
        # MMR diversified top-k (relevant-but-mutually-different picks;
        # greedy integer-exact selection, one distributed scan per step)
        "mmr_select": lambda sf: ann.mmr_select(_emb(sf), query_id=0, k=8),
        "ann_ivf_kmeans":
            lambda sf: ann.ann_ivf_kmeans(_emb(sf), [0, 1, 2, 3, 4], k=5),
        "quantize_embeddings": lambda sf: ann.quantize_embeddings(_emb(sf)),
        # per-dimension moment profile (collapse/anisotropy diagnostic)
        "embedding_dim_stats":
            lambda sf: ann.embedding_dim_stats(_emb(sf)),
        # Johnson-Lindenstrauss sha-sign random projection (dim reduction)
        "random_projection": lambda sf: ann.random_projection(_emb(sf)),
        # corpus-wide similarity graph: exact baseline + LSH-bucketed
        # scale path (bucket family shared with ann_lsh, SQL-exact)
        "knn_graph_exact": lambda sf: ann.knn_graph_exact(_emb(sf), k=5),
        "knn_graph": lambda sf: ann.knn_graph(_emb(sf), k=5, bits=6),
        # class centroids + within-class prototypicality (outlier signal)
        "label_centroids": lambda sf: ann.label_centroids(_emb(sf)),
        "prototypicality": lambda sf: ann.prototypicality(_emb(sf)),
        # flagship KG pipeline + multimodal (rows-only: tape span corpus)
        "kg_flagship_triples": kg_flagship_triples,
        "kg_flagship_node_types": kg_flagship_node_types,
        "media_features": media_feats,
        # flagship KG pipeline over the SQL-exact corpus: extraction ->
        # exact linking -> canonicalization -> materialization, hash-checked
        # end-to-end against a single DuckDB statement
        "kg_flagship_exact": kg_flagship_exact,
        "kg_flagship_exact_edges": kg_flagship_exact_edges,
        "kg_flagship_exact_nodes": kg_flagship_exact_nodes,
        "kg_flagship_exact_node_types": kg_flagship_exact_node_types,
        # same flagship over the typo'd sha corpus: the FUZZY linking path
        # (deletion-variant blocking + shingle-Jaccard argmax) hash-checked
        # end-to-end against a single DuckDB statement
        "kg_flagship_fuzzy_exact": kg_flagship_fuzzy_exact,
        "kg_flagship_fuzzy_exact_edges": kg_flagship_fuzzy_exact_edges,
        "media_features_exact": media_features_exact,
        # opaque-binary media columns: decode / resize / frame-sample over
        # real binary payloads (sha-derived bytes -> exact SQL oracles)
        "media_blob_meta": media_blob_meta,
        "media_resize": media_resize,
        "media_frames": media_frames,
        # distributed graph analytics over a deterministic sha-derived
        # graph (post-construction KG consumption; all-integer arithmetic,
        # so even the iterative PageRank is bit-exact vs DuckDB)
        "graph_edges": lambda sf: graph.synth_graph_edges(),
        "graph_degree_stats":
            lambda sf: graph.degree_stats(graph.synth_graph_edges()),
        "graph_triangles":
            lambda sf: graph.triangle_counts(graph.synth_graph_edges()),
        # directed-closure motif census: feed-forward vs cyclic triangles
        "graph_triad_motifs":
            lambda sf: graph.triad_motifs(graph.synth_graph_edges()),
        # Luby MIS under a fixed sha priority (deterministic greedy)
        "graph_mis":
            lambda sf: graph.maximal_independent_set(
                graph.synth_graph_edges()),
        # greedy maximal matching by sha edge priority (coarsening
        # primitive)
        "graph_matching":
            lambda sf: graph.maximal_matching(graph.synth_graph_edges()),
        # Jones-Plassmann greedy coloring in the same priority order
        "graph_coloring":
            lambda sf: graph.greedy_coloring(graph.synth_graph_edges()),
        "graph_pagerank":
            lambda sf: graph.pagerank(graph.synth_graph_edges(), iters=3),
        # weight-proportional integer PageRank (sha edge weights)
        "graph_pagerank_weighted":
            lambda sf: graph.pagerank_weighted(graph.synth_graph_edges(),
                                               iters=3),
        # unnormalized integer HITS (hubs/authorities) — bit-exact vs the
        # unrolled-round twin, like graph_pagerank
        "graph_hits":
            lambda sf: graph.hits(graph.synth_graph_edges(), iters=3),
        # personalized PageRank: restart mass pinned to node 0 (random
        # walk with restart; ranks measure proximity to the seed)
        "graph_ppr":
            lambda sf: graph.pagerank(graph.synth_graph_edges(), iters=3,
                                      teleport_to=0),
        # out-in degree assortativity: do hub-authored links point at
        # hubs? six exact int64 registers + one float expression
        "graph_assortativity":
            lambda sf: graph.degree_assortativity(graph.synth_graph_edges()),
        # link symmetry over the distinct directed edge set
        "graph_reciprocity":
            lambda sf: graph.reciprocity(graph.synth_graph_edges()),
        # cost-bounded weighted shortest paths (min-plus Bellman-Ford to
        # fixpoint; sha-derived integer weights; budget 48)
        "graph_sssp":
            lambda sf: graph.sssp_weighted(graph.synth_graph_edges(),
                                           source=0, max_dist=48),
        # Watts-Strogatz local clustering coefficient per node
        "graph_clustering":
            lambda sf: graph.clustering_coefficient(
                graph.synth_graph_edges()),
        # strongly connected component of node 0 (forward ∩ backward
        # reachability — the Fleischer et al. pivot step)
        "graph_scc":
            lambda sf: graph.scc_of(graph.synth_graph_edges(), source=0),
        "graph_kcore":
            lambda sf: graph.kcore(graph.synth_graph_edges(), k=4,
                                   max_rounds=8),
        "graph_communities":
            lambda sf: graph.label_propagation(graph.synth_graph_edges(),
                                               rounds=4),
        # deterministic negative edge sampling (link-prediction training)
        "graph_negatives":
            lambda sf: graph.negative_samples(graph.synth_graph_edges(),
                                              n_nodes=2000),
        # p_intra=1.0 keeps every edge inside its 40-node community, so the
        # graph has many components (0.8 would merge everything into one)
        "graph_components": lambda sf: graph.connected_components(
            graph.synth_graph_edges(p_intra=1.0)),
        "graph_bfs_depths":
            lambda sf: graph.bfs_depths(graph.synth_graph_edges(), source=0),
        # DeepWalk-style deterministic walk corpus (skip-gram node
        # embeddings input); every draw a pure sha function -> bit-exact
        "graph_walks":
            lambda sf: graph.random_walks(graph.synth_graph_edges(),
                                          walk_len=4, walks_per_node=2),
        # common-neighbor / Adamic-Adar link-prediction scores
        "graph_link_pred":
            lambda sf: graph.link_prediction_scores(graph.synth_graph_edges()),
        # Jaccard neighborhood coefficient (degree-normalized common
        # neighbors) — the hub-insensitive sibling of graph_link_pred
        "graph_jaccard":
            lambda sf: graph.jaccard_link_scores(graph.synth_graph_edges()),
        # sampled-source Brandes betweenness in exact integer micro-units
        # (fused one-exchange forward AND backward rounds)
        "graph_betweenness":
            lambda sf: graph.betweenness_sampled(graph.synth_graph_edges(),
                                                 sources=(0, 7, 13)),
        # sampled harmonic (inward reachability) centrality from the same
        # multi-source wavefront
        "graph_harmonic":
            lambda sf: graph.harmonic_sampled(graph.synth_graph_edges(),
                                              sources=(0, 7, 13)),
        # sampled-source eccentricity / pseudo-diameter probe off the
        # same multi-source BFS wavefront
        "graph_eccentricity":
            lambda sf: graph.eccentricity_sampled(graph.synth_graph_edges(),
                                                  sources=(0, 7, 13)),
        # k-truss community core: synchronous triangle-support peel
        "graph_ktruss":
            lambda sf: graph.ktruss_edges(graph.synth_graph_edges(), k=4),
        # GraphSAGE-style 1-hop neighbor feature aggregation: graph joined
        # to the embeddings table (scaled-int exact means, dim-exploded)
        "graph_neighbor_means":
            lambda sf: graph.neighbor_embedding_mean(
                graph.synth_graph_edges(), _emb(sf)),
        # entity co-mention edge weights from the flagship triple stream
        # (KG enrichment; exact twin derives pairs from the same one-
        # statement flagship SQL)
        "kg_co_mentions":
            lambda sf: graph.co_mention_edges(
                _flagship_exact_result().triples),
        # position-discounted entity prominence (integer lead-mention
        # weights), exact distinct-doc counts
        "kg_entity_salience":
            lambda sf: graph.entity_salience(
                _flagship_exact_result().triples),
        # per-predicate cardinality profile (KG QA readout)
        "kg_relation_stats":
            lambda sf: graph.relation_stats(
                _flagship_exact_result().triples),
        # incremental crawl append: 300 docs ingested + committed, then a
        # 100-doc delta linked WITHOUT re-linking the first 300; the result
        # must hash-match the same one-statement batch oracle
        "kg_incremental_append": kg_incremental_append,
        # caption<->text agreement per entity over the interleaved corpus
        "kg_cross_modal":
            lambda sf: graph.cross_modal_alignment(
                _flagship_exact_result().triples),
        # PMI significance weighting of the co-mention edges
        "kg_co_mention_pmi":
            lambda sf: graph.co_mention_pmi(
                _flagship_exact_result().triples),
        # entity importance over the constructed KG: co-mention graph ->
        # dense ids -> integer PageRank -> URIs, one exact composition
        "kg_entity_pagerank":
            lambda sf: graph.entity_pagerank(
                _flagship_exact_result().triples, iters=3),
        # same walk with rank split by pair doc-count (edge weights)
        "kg_entity_pagerank_weighted":
            lambda sf: graph.entity_pagerank(
                _flagship_exact_result().triples, iters=3, weighted=True),
        # typed 2-hop metapath census over the constructed KG's distinct
        # edge set (schema discovery / metapath2vec walk design input)
        "kg_metapath_counts":
            lambda sf: graph.metapath_counts(
                _flagship_exact_result().edges),
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

_TOKS = "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

_GRAMS = f"""
    CASE WHEN len({_TOKS}) = 0 THEN []::VARCHAR[]
         WHEN len({_TOKS}) < 3 THEN [array_to_string({_TOKS}, ' ')]
         ELSE list_sort(list_distinct(list_transform(
              range(1, len({_TOKS}) - 1),
              i -> array_to_string(list_slice({_TOKS}, i, i + 2), ' '))))
    END
"""

_BIGRAM_NLL_SQL = f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents),
    ix AS (SELECT doc_id, l, unnest(range(1, len(l))) AS i FROM t
           WHERE len(l) >= 2),
    bg AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2 FROM ix),
    cbg AS (SELECT w1, w2, count(*)::DOUBLE AS c FROM bg GROUP BY 1, 2),
    cw AS (SELECT w1, count(*)::DOUBLE AS c1 FROM bg GROUP BY 1)
    SELECT doc_id, round(sum(-log2(cbg.c / cw.c1)) / count(*), 4)
               AS mean_nll
    FROM bg JOIN cbg USING (w1, w2) JOIN cw USING (w1)
    GROUP BY 1"""

_MINHASH8 = """list_transform(range(0, 8), h -> coalesce(list_min(
    list_transform(grams, x -> substr(sha256(x || '#' || h::VARCHAR || '#42'), 1, 8))),
    'ffffffff'))"""


def _grams_sql(n: int) -> str:
    """Token n-gram list expr (mirrors ops/dedup._grams set semantics)."""
    return f"""
    CASE WHEN len({_TOKS}) = 0 THEN []::VARCHAR[]
         WHEN len({_TOKS}) < {n} THEN [array_to_string({_TOKS}, ' ')]
         ELSE list_sort(list_distinct(list_transform(
              range(1, len({_TOKS}) - {n - 2}),
              i -> array_to_string(list_slice({_TOKS}, i, i + {n - 1}), ' '))))
    END
"""


def _hex8(p: float) -> str:
    from raykg.functions.hashing import hex_threshold8

    return hex_threshold8(p)


# shared MinHash-LSH candidate-pair CTE chain (lsh_candidate_pairs,
# neardup_keep, neardup_components)
_LSH_CTES = f"""g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
            sigs AS (SELECT doc_id, grams, {_MINHASH8} AS mh FROM g),
            bands AS (SELECT doc_id, b, array_to_string(
                          list_slice(mh, b * 2 + 1, b * 2 + 2), '_') AS band_key
                      FROM sigs, (SELECT unnest(range(0, 4)) AS b)),
            pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                      FROM bands a JOIN bands b
                        ON a.b = b.b AND a.band_key = b.band_key
                       AND a.doc_id < b.doc_id),
            j AS (SELECT doc_a, doc_b,
                         len(list_intersect(ga.grams, gb.grams))::DOUBLE
                         / len(list_distinct(list_concat(ga.grams, gb.grams))) AS jac
                  FROM pairs
                  JOIN g ga ON ga.doc_id = doc_a
                  JOIN g gb ON gb.doc_id = doc_b)"""


def _sig_sql() -> str:
    """Per-row hash-noise property signatures (shared CTE body)."""
    from raykg.ops.relational import SIG_NOISE, SIG_SEED, SIG_SOURCES
    from raykg.functions.hashing import hex_threshold

    thr = hex_threshold(SIG_NOISE)
    selects = []
    for table, label, key, props in SIG_SOURCES:
        plist = "[" + ", ".join(f"'{p}'" for p in props) + "]"
        selects.append(f"""
        SELECT '{label}' AS label, coalesce(array_to_string(list_filter({plist},
            p -> substr(sha256('noise|{label}|' || {key}::VARCHAR || '|' || p
                        || '|{SIG_SEED}'), 1, 4) >= '{thr}'), ','), '') AS signature
        FROM {table}""")
    return " UNION ALL ".join(selects)


_BLOB_META = """
    WITH b AS (SELECT i, sha256('blob|42|' || i::VARCHAR) AS h
               FROM range(2000) t(i)),
    m AS (SELECT i AS media_id,
            (['image','audio','video'])[
                ((('0x' || substr(h, 5, 2))::UBIGINT % 3) + 1)::INT] AS kind,
            64 + ('0x' || substr(h, 1, 4))::UBIGINT % 1024 AS n_bytes,
            16 + (('0x' || substr(h, 1, 2))::UBIGINT
                  + 256 * ('0x' || substr(h, 3, 2))::UBIGINT) % 2048 AS width,
            16 + (('0x' || substr(h, 5, 2))::UBIGINT
                  + 256 * ('0x' || substr(h, 7, 2))::UBIGINT) % 2048 AS height,
            (('0x' || substr(h, 9, 2))::UBIGINT
             + 256 * ('0x' || substr(h, 11, 2))::UBIGINT) % 60000 AS duration_ms
          FROM b)
"""


def _graph_sql(p_intra: float | None = None) -> str:
    """Regenerate raykg.ops.graph.synth_graph_edges in DuckDB (shared CTE
    body named `g`): same sha256 slot draws, same intra-community
    threshold, same modulus arithmetic — bit-identical edge set."""
    from raykg.functions.hashing import hex_threshold8
    from raykg.ops.graph import (GRAPH_COMM, GRAPH_MAX_SLOTS, GRAPH_N,
                                 GRAPH_P_INTRA)

    thr = hex_threshold8(GRAPH_P_INTRA if p_intra is None else p_intra)
    return f"""
    WITH lim AS (
      SELECT i, j
      FROM (SELECT unnest(range(0, {GRAPH_N})) AS i)
      CROSS JOIN (SELECT unnest(range(0, {GRAPH_MAX_SLOTS})) AS j)
      WHERE j < 2 + (('0x' || substr(sha256('gdeg|42|' || i::VARCHAR),
                      1, 8))::UBIGINT % 4)
    ),
    raw AS (
      SELECT i AS src,
        (CASE WHEN substr(sha256('gin|42|' || i::VARCHAR || '|'
                          || j::VARCHAR), 1, 8) < '{thr}'
             THEN (i // {GRAPH_COMM}) * {GRAPH_COMM}
                  + (('0x' || substr(sha256('gdst|42|' || i::VARCHAR || '|'
                       || j::VARCHAR), 1, 8))::UBIGINT % {GRAPH_COMM})
             ELSE ('0x' || substr(sha256('gdst|42|' || i::VARCHAR || '|'
                       || j::VARCHAR), 1, 8))::UBIGINT % {GRAPH_N}
        END)::BIGINT AS dst
      FROM lim
    ),
    g AS (SELECT DISTINCT src::BIGINT AS src, dst FROM raw WHERE src <> dst)
    """


def _hits_sql(iters: int) -> str:
    """Unrolled integer HITS rounds (exact unnormalized semantics of
    raykg.ops.graph.hits: a = Σ h over in-edges, then h = Σ a over
    out-edges, all-nodes carrier keeps scoreless nodes at 0)."""
    sql = _graph_sql() + """,
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM g UNION ALL SELECT dst FROM g)),
    h0 AS (SELECT node, 1::BIGINT AS v FROM nodes)"""
    prev_h = "h0"
    for i in range(1, iters + 1):
        sql += f""",
    a{i} AS (SELECT n.node, COALESCE(sum(s.v), 0)::BIGINT AS v
             FROM nodes n LEFT JOIN g ON g.dst = n.node
             LEFT JOIN {prev_h} s ON s.node = g.src GROUP BY n.node),
    h{i} AS (SELECT n.node, COALESCE(sum(s.v), 0)::BIGINT AS v
             FROM nodes n LEFT JOIN g ON g.src = n.node
             LEFT JOIN a{i} s ON s.node = g.dst GROUP BY n.node)"""
        prev_h = f"h{i}"
    return sql + f"""
    SELECT h.node, h.v AS hub_int, a.v AS auth_int
    FROM h{iters} h JOIN a{iters} a USING (node)"""


def _pagerank_sql(iters: int, teleport_to: int | None = None) -> str:
    """Unrolled integer-PageRank CTE chain (exact floor-division
    semantics of raykg.ops.graph.pagerank). With ``teleport_to`` the
    restart mass lands only on that node (personalized PageRank)."""
    from raykg.ops.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE

    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    if teleport_to is None:
        start = f"{PR_SCALE}::BIGINT"
        restart = f"{base}"
    else:
        start = (f"(CASE WHEN node = {teleport_to} THEN {PR_SCALE} "
                 "ELSE 0 END)::BIGINT")
        restart = (f"(CASE WHEN n.node = {teleport_to} THEN {base} "
                   "ELSE 0 END)")
    return (_graph_sql()
            + _pagerank_rounds_sql(iters, start, restart)
            + f"\n    SELECT node, r AS rank_int FROM pr{iters}")


def _pagerank_weighted_sql(iters: int) -> str:
    """Unrolled weighted-PageRank twin (exact floor semantics of
    raykg.ops.graph.pagerank_weighted over the sha edge weights)."""
    from raykg.ops.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE

    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    sql = _graph_sql() + f""",
    gw AS (SELECT src, dst,
                  1 + (('0x' || substr(sha256('gw|42|' || src::VARCHAR
                         || '|' || dst::VARCHAR), 1, 8))::UBIGINT
                       % 9)::BIGINT AS wt
           FROM g),
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM g UNION ALL SELECT dst FROM g)),
    wdeg AS (SELECT src, sum(wt) AS W FROM gw GROUP BY src),
    pr0 AS (SELECT node, {PR_SCALE}::BIGINT AS r FROM nodes)"""
    for it in range(iters):
        sql += f""",
    pr{it + 1} AS (
      SELECT n.node, ({base} + coalesce(s.c, 0))::BIGINT AS r
      FROM nodes n LEFT JOIN
        (SELECT e.dst AS node,
                sum((((p.r * {PR_DAMP_NUM}) // {PR_DAMP_DEN}) * e.wt)
                    // d.W) AS c
         FROM gw e JOIN pr{it} p ON p.node = e.src
         JOIN wdeg d ON d.src = e.src
         GROUP BY e.dst) s USING (node))"""
    return sql + f"\n    SELECT node, r AS rank_int FROM pr{iters}"


def _entity_pagerank_sql(iters: int, weighted: bool = False) -> str:
    """Twin of graph.entity_pagerank: the flagship triple oracle -> the
    co-mention edge set -> dense ids via the (sha-bucket, uri) ordering
    contract of corpus.dense_string_ids -> the shared unrolled integer
    PageRank rounds (weight-proportional when ``weighted``, edge weight
    = pair doc count) -> ranks joined back to URIs."""
    from raykg.ops.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE

    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
    sql = "WITH t AS (" + flagship_exact_sql(what="triples") + f"""),
    ents AS (
      SELECT DISTINCT doc_id, obj AS uri FROM t
      UNION SELECT DISTINCT doc_id, subj FROM t
            WHERE subj NOT LIKE 'sdpg.gr/Document/%'),
    ids AS (SELECT uri,
                   row_number() OVER (ORDER BY
                     ('0x' || substr(sha256(uri), 1, 8))::UBIGINT % 256,
                     uri) - 1 AS id
            FROM (SELECT DISTINCT uri FROM ents)),
    p AS (SELECT a.doc_id, a.uri AS ent_a, b.uri AS ent_b
          FROM ents a JOIN ents b
            ON a.doc_id = b.doc_id AND a.uri < b.uri),
    pd AS (SELECT ent_a, ent_b, count(*)::BIGINT AS w FROM p GROUP BY 1, 2),
    g AS (SELECT ia.id AS src, ib.id AS dst, pd.w AS wt
          FROM pd JOIN ids ia ON ia.uri = pd.ent_a
                  JOIN ids ib ON ib.uri = pd.ent_b
          UNION ALL
          SELECT ib.id, ia.id, pd.w
          FROM pd JOIN ids ia ON ia.uri = pd.ent_a
                  JOIN ids ib ON ib.uri = pd.ent_b)"""
    if weighted:
        sql += f""",
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM g UNION ALL SELECT dst FROM g)),
    wdeg AS (SELECT src, sum(wt) AS W FROM g GROUP BY src),
    pr0 AS (SELECT node, {PR_SCALE}::BIGINT AS r FROM nodes)"""
        for it in range(iters):
            sql += f""",
    pr{it + 1} AS (
      SELECT n.node, ({base} + coalesce(s.c, 0))::BIGINT AS r
      FROM nodes n LEFT JOIN
        (SELECT e.dst AS node,
                sum((((p.r * {PR_DAMP_NUM}) // {PR_DAMP_DEN}) * e.wt)
                    // d.W) AS c
         FROM g e JOIN pr{it} p ON p.node = e.src
         JOIN wdeg d ON d.src = e.src
         GROUP BY e.dst) s USING (node))"""
    else:
        sql += _pagerank_rounds_sql(iters, f"{PR_SCALE}::BIGINT",
                                    f"{base}")
    return sql + f"""
    SELECT ids.uri, pr{iters}.r AS rank_int
    FROM pr{iters} JOIN ids ON ids.id = pr{iters}.node"""


def _pagerank_rounds_sql(iters: int, start: str, restart: str) -> str:
    """The unrolled-round CTE chain of the integer PageRank twin,
    parameterized over whatever edge CTE ``g`` the prefix defined (shared
    by graph_pagerank / graph_ppr / kg_entity_pagerank)."""
    from raykg.ops.graph import PR_DAMP_DEN, PR_DAMP_NUM

    sql = f""",
    nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM g UNION ALL SELECT dst FROM g)),
    deg AS (SELECT src, count(*) AS d FROM g GROUP BY src),
    pr0 AS (SELECT node, {start} AS r FROM nodes)"""
    for it in range(iters):
        sql += f""",
    pr{it + 1} AS (
      SELECT n.node, ({restart} + coalesce(s.c, 0))::BIGINT AS r
      FROM nodes n LEFT JOIN
        (SELECT e.dst AS node,
                sum(((p.r * {PR_DAMP_NUM}) // {PR_DAMP_DEN}) // d.d) AS c
         FROM g e JOIN pr{it} p ON p.node = e.src
         JOIN deg d ON d.src = e.src
         GROUP BY e.dst) s USING (node))"""
    return sql


def _lpa_sql(rounds: int) -> str:
    """Unrolled synchronous majority label propagation (exact round
    semantics of raykg.ops.graph.label_propagation: every node adopts
    the most frequent previous-round neighbor label, ties -> smallest
    label; exactly ``rounds`` rounds)."""
    sql = _graph_sql() + """,
    e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                           greatest(src, dst) AS b FROM g),
    nb AS MATERIALIZED (SELECT a AS node, b AS nbr FROM e0
                        UNION ALL SELECT b, a FROM e0),
    l0 AS MATERIALIZED (SELECT DISTINCT node, node AS lab FROM nb)"""
    for r in range(rounds):
        sql += f""",
    v{r} AS MATERIALIZED (
      SELECT nb.node, l.lab, count(*) AS c
      FROM nb JOIN l{r} l ON l.node = nb.nbr
      GROUP BY 1, 2),
    l{r + 1} AS MATERIALIZED (
      SELECT node, lab FROM v{r}
      QUALIFY row_number() OVER (PARTITION BY node
                                 ORDER BY c DESC, lab) = 1)"""
    return sql + f"\n    SELECT node, lab AS community FROM l{rounds}"


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled synchronous k-core peel (exact round semantics of
    raykg.ops.graph.kcore: a round recomputes degrees over the current
    edge set and drops every node below k simultaneously)."""
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
    # each round references the previous one three times -> 3^rounds
    # plan copies without it
    sql = _graph_sql() + """,
    e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                           greatest(src, dst) AS b FROM g)"""
    for r in range(rounds):
        sql += f""",
    d{r} AS MATERIALIZED (SELECT node, count(*) AS deg FROM
             (SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r})
             GROUP BY node),
    s{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k}),
    e{r + 1} AS MATERIALIZED (SELECT a, b FROM e{r}
                 WHERE a IN (SELECT node FROM s{r})
                   AND b IN (SELECT node FROM s{r}))"""
    return sql + f"""
    SELECT node, count(*)::BIGINT AS deg FROM
    (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
    GROUP BY node"""


def _walks_sql(walk_len: int, walks_per_node: int, seed: int = 42) -> str:
    """Unrolled deterministic random walks (exact step semantics of
    raykg.ops.graph.random_walks: step s of walk (start, r) moves to the
    rank-th smallest out-neighbor, rank = sha('walk|seed|start|r|s') %
    out_deg; dead ends stop the walk)."""
    sql = _graph_sql() + f""",
    adj AS MATERIALIZED (
      SELECT src, dst,
             row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS rnk,
             count(*) OVER (PARTITION BY src) AS deg
      FROM g),
    s0 AS MATERIALIZED (
      SELECT src AS start, r AS walk, src AS node
      FROM (SELECT DISTINCT src FROM g)
      CROSS JOIN (SELECT unnest(range(0, {walks_per_node})) AS r))"""
    union = "SELECT start, walk, 0 AS step, node FROM s0"
    for s in range(1, walk_len + 1):
        sql += f""",
    s{s} AS MATERIALIZED (
      SELECT w.start, w.walk, a.dst AS node
      FROM s{s - 1} w JOIN adj a ON a.src = w.node
       AND a.rnk = (('0x' || substr(sha256('walk|{seed}|'
               || w.start::VARCHAR || '|' || w.walk::VARCHAR || '|{s}'),
               1, 8))::UBIGINT % a.deg::UBIGINT)::BIGINT)"""
        union += f" UNION ALL SELECT start, walk, {s}, node FROM s{s}"
    return sql + f"\n    SELECT start, walk, step, node FROM ({union})"


def _link_pred_sql(min_cn: int, max_neighbors: int = 128) -> str:
    """Wedge-join twin of raykg.ops.graph.link_prediction_scores: distinct
    undirected neighbor sets, C(deg, 2) wedges per center, Adamic-Adar
    weights as scaled-int64 terms floor((1/ln(deg)) * 1e6) summed
    order-free with ONE float division at the end (the engine's exact
    contract). Centers with deg > max_neighbors are skipped — the SAME
    hub cap the engine applies, so both sides stay aligned on hubby
    data."""
    return _graph_sql() + f""",
    und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                         FROM g WHERE src <> dst),
    nbr AS MATERIALIZED (SELECT a AS w, b AS u FROM und
                         UNION ALL SELECT b, a FROM und),
    deg AS MATERIALIZED (SELECT w, count(*) AS deg FROM nbr GROUP BY w),
    sc AS (SELECT n1.u AS u, n2.u AS v, count(*)::BIGINT AS cn,
                  round(sum(floor((1.0 / ln(d.deg)) * 1e6)::BIGINT)
                        / 1000000.0, 4) AS aa
           FROM nbr n1 JOIN nbr n2 ON n2.w = n1.w AND n1.u < n2.u
           JOIN deg d ON d.w = n1.w AND d.deg <= {max_neighbors}
           GROUP BY 1, 2)
    SELECT sc.u, sc.v, sc.cn, sc.aa,
           (CASE WHEN e.a IS NULL THEN 0 ELSE 1 END)::BIGINT AS is_edge
    FROM sc LEFT JOIN und e ON e.a = sc.u AND e.b = sc.v
    WHERE sc.cn >= {min_cn}"""


def _jaccard_sql(min_cn: int, max_neighbors: int = 128) -> str:
    """Twin of raykg.ops.graph.jaccard_link_scores: same wedge join and
    hub-center cap as _link_pred_sql for the cn numerator, but the deg
    denominators are TRUE uncapped distinct undirected degrees —
    jac = cn / (deg(u) + deg(v) - cn), one DOUBLE division + round(.., 4)
    over exact integers (the engine's float contract)."""
    return _graph_sql() + f""",
    und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                         FROM g WHERE src <> dst),
    nbr AS MATERIALIZED (SELECT a AS w, b AS u FROM und
                         UNION ALL SELECT b, a FROM und),
    deg AS MATERIALIZED (SELECT w, count(*) AS deg FROM nbr GROUP BY w),
    sc AS (SELECT n1.u AS u, n2.u AS v, count(*)::BIGINT AS cn
           FROM nbr n1 JOIN nbr n2 ON n2.w = n1.w AND n1.u < n2.u
           JOIN deg d ON d.w = n1.w AND d.deg <= {max_neighbors}
           GROUP BY 1, 2)
    SELECT sc.u, sc.v, sc.cn,
           round(CAST(sc.cn AS DOUBLE) / (du.deg + dv.deg - sc.cn), 4)
               AS jac,
           (CASE WHEN e.a IS NULL THEN 0 ELSE 1 END)::BIGINT AS is_edge
    FROM sc JOIN deg du ON du.w = sc.u JOIN deg dv ON dv.w = sc.v
    LEFT JOIN und e ON e.a = sc.u AND e.b = sc.v
    WHERE sc.cn >= {min_cn}"""


def _bfs_sigma_sql(sources: tuple, rounds: int) -> str:
    """Shared forward pass for the sampled-centrality twins: multi-source
    BFS with path counting unrolled to ``rounds`` levels (levels past the
    graph's eccentricity settle nothing, so any rounds >= ecc gives the
    identical fixpoint — the engine ran to ecc 14 on this graph, 16 leaves
    margin). Ends with ``st`` = (s, node, d, sigma)."""
    srcs = ", ".join(str(int(s)) for s in sources)
    sql = _graph_sql() + f""",
    e AS MATERIALIZED (SELECT DISTINCT src, dst FROM g WHERE src <> dst),
    st0 AS (SELECT s, s AS node, 0 AS d, 1::BIGINT AS sigma
            FROM (SELECT unnest([{srcs}]) AS s)),
    cum0 AS (SELECT * FROM st0)"""
    for r in range(1, rounds + 1):
        sql += f""",
    st{r} AS MATERIALIZED (
      SELECT f.s, e.dst AS node, {r} AS d, sum(f.sigma)::BIGINT AS sigma
      FROM st{r - 1} f JOIN e ON e.src = f.node
      WHERE NOT EXISTS (SELECT 1 FROM cum{r - 1} c
                        WHERE c.s = f.s AND c.node = e.dst)
      GROUP BY 1, 2),
    cum{r} AS MATERIALIZED (SELECT * FROM cum{r - 1}
                            UNION ALL SELECT * FROM st{r})"""
    return sql + f""",
    st AS MATERIALIZED (SELECT * FROM cum{rounds})"""


def _harmonic_sql(sources: tuple, rounds: int = 16) -> str:
    """Twin of raykg.ops.graph.harmonic_sampled: one integer floor term
    per (source, reached node) pair, summed order-free."""
    return _bfs_sigma_sql(sources, rounds) + """
    SELECT node, sum(1000000 // d)::BIGINT AS harm_micro
    FROM st WHERE d > 0 GROUP BY node"""


def _mis_sql(rounds: int = 8, seed: int = 42) -> str:
    """Twin of raykg.ops.graph.maximal_independent_set: Luby rounds under
    the fixed sha priority (prio(v) = (sha8 % 2^31)*2^31 + v), unrolled
    with MATERIALIZED per-round CTEs (the graph_betweenness discipline —
    without it the round-over-round references inline exponentially).
    ``rounds`` must exceed the fixture graph's settle count (measured 4;
    8 gives deterministic headroom — extra rounds are empty sets)."""

    def prio(col: str) -> str:
        return (f"((('0x' || substr(sha256('mis|{seed}|' || {col}"
                f"::VARCHAR), 1, 8))::UBIGINT % 2147483648)::BIGINT"
                f" * 2147483648 + {col})")

    sql = _graph_sql() + """,
    und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                         FROM g WHERE src <> dst),
    e0 AS MATERIALIZED (SELECT a, b FROM und
                        UNION ALL SELECT b, a FROM und),
    n0 AS MATERIALIZED (SELECT DISTINCT a AS v FROM e0)"""
    for r in range(rounds):
        sql += f""",
    m{r} AS MATERIALIZED (SELECT a AS v, min({prio('b')}) AS mn
                          FROM e{r} GROUP BY 1),
    w{r} AS MATERIALIZED (
      SELECT n.v FROM n{r} n LEFT JOIN m{r} m ON m.v = n.v
      WHERE m.v IS NULL OR {prio('n.v')} < m.mn),
    d{r} AS MATERIALIZED (
      SELECT v FROM w{r}
      UNION SELECT e.b AS v FROM e{r} e JOIN w{r} w ON e.a = w.v),
    n{r + 1} AS MATERIALIZED (
      SELECT v FROM n{r} WHERE v NOT IN (SELECT v FROM d{r})),
    e{r + 1} AS MATERIALIZED (
      SELECT a, b FROM e{r}
      WHERE a NOT IN (SELECT v FROM d{r})
        AND b NOT IN (SELECT v FROM d{r}))"""
    union = " UNION ".join(
        [f"SELECT v FROM w{r}" for r in range(rounds)]
        + [f"SELECT v FROM n{rounds}"])
    return sql + f"""
    SELECT v::BIGINT AS node FROM ({union})"""


def _coloring_sql(rounds: int = 18, seed: int = 42) -> str:
    """Twin of raykg.ops.graph.greedy_coloring: Jones-Plassmann rounds
    under the shared sha priority, unrolled MATERIALIZED. ``rounds`` must
    exceed the fixture's longest decreasing-priority path (measured 16;
    18 gives headroom — extra rounds color nothing). Candidate colors
    range(0, 64) safely exceeds max degree + 1 on the fixture family."""

    def prio(col: str) -> str:
        return (f"((('0x' || substr(sha256('mis|{seed}|' || {col}"
                f"::VARCHAR), 1, 8))::UBIGINT % 2147483648)::BIGINT"
                f" * 2147483648 + {col})")

    sql = _graph_sql() + """,
    und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                         FROM g WHERE src <> dst),
    e AS MATERIALIZED (SELECT a, b FROM und
                       UNION ALL SELECT b, a FROM und),
    vs AS MATERIALIZED (SELECT DISTINCT a AS v FROM e),
    cand AS MATERIALIZED (SELECT unnest(range(0, 64)) AS c),
    col0 AS MATERIALIZED (SELECT v AS node, 0::BIGINT AS color
                          FROM vs WHERE 1 = 0)"""
    for r in range(1, rounds + 1):
        sql += f""",
    u{r} AS MATERIALIZED (
      SELECT v FROM vs WHERE v NOT IN (SELECT node FROM col{r - 1})),
    rd{r} AS MATERIALIZED (
      SELECT u.v FROM u{r} u
      WHERE NOT EXISTS (SELECT 1 FROM e JOIN u{r} u2 ON u2.v = e.b
                        WHERE e.a = u.v
                          AND {prio('e.b')} < {prio('u.v')})),
    used{r} AS MATERIALIZED (
      SELECT rr.v, cc.color FROM rd{r} rr
      JOIN e ON e.a = rr.v JOIN col{r - 1} cc ON cc.node = e.b),
    mex{r} AS MATERIALIZED (
      SELECT rr.v AS node, min(cand.c)::BIGINT AS color
      FROM rd{r} rr CROSS JOIN cand
      WHERE NOT EXISTS (SELECT 1 FROM used{r} us
                        WHERE us.v = rr.v AND us.color = cand.c)
      GROUP BY 1),
    col{r} AS MATERIALIZED (SELECT node, color FROM col{r - 1}
                            UNION ALL SELECT node, color FROM mex{r})"""
    return sql + f"""
    SELECT node::BIGINT AS node, color::BIGINT AS color FROM col{rounds}"""


def _matching_sql(rounds: int = 8, seed: int = 42) -> str:
    """Twin of raykg.ops.graph.maximal_matching: greedy matching by the
    fixed sha edge priority, rounds unrolled MATERIALIZED. An edge wins a
    round iff it is the (h, pk)-argmin at BOTH endpoints."""
    sql = _graph_sql() + f""",
    und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                                greatest(src, dst) AS b
                         FROM g WHERE src <> dst),
    me0 AS MATERIALIZED (
      SELECT a, b, a * 2147483648 + b AS pk,
             ('0x' || substr(sha256('mm|{seed}|' ||
                 (a * 2147483648 + b)::VARCHAR), 1, 8))::UBIGINT::BIGINT
                 AS h
      FROM und)"""
    for r in range(rounds):
        sql += f""",
    nom{r} AS MATERIALIZED (
      SELECT pk FROM (SELECT a AS v, pk, h FROM me{r}
                      UNION ALL SELECT b, pk, h FROM me{r})
      QUALIFY row_number() OVER (PARTITION BY v ORDER BY h, pk) = 1),
    w{r} AS MATERIALIZED (
      SELECT pk FROM nom{r} GROUP BY pk HAVING count(*) = 2),
    d{r} AS MATERIALIZED (
      SELECT pk // 2147483648 AS v FROM w{r}
      UNION SELECT pk % 2147483648 FROM w{r}),
    me{r + 1} AS MATERIALIZED (
      SELECT a, b, pk, h FROM me{r}
      WHERE a NOT IN (SELECT v FROM d{r})
        AND b NOT IN (SELECT v FROM d{r}))"""
    union = " UNION ALL ".join(f"SELECT pk FROM w{r}" for r in range(rounds))
    return sql + f"""
    SELECT (pk // 2147483648)::BIGINT AS node_a,
           (pk % 2147483648)::BIGINT AS node_b
    FROM ({union})"""


def _ecc_sql(sources: tuple, rounds: int = 16) -> str:
    """Twin of raykg.ops.graph.eccentricity_sampled: the shared unrolled
    forward pass, then one per-source max/count (the d=0 source row
    counts itself in n_reached, both sides)."""
    return _bfs_sigma_sql(sources, rounds) + """
    SELECT s::BIGINT AS source, max(d)::BIGINT AS ecc,
           count(*)::BIGINT AS n_reached
    FROM st GROUP BY s"""


def _betweenness_sql(sources: tuple, rounds: int = 16) -> str:
    """Twin of raykg.ops.graph.betweenness_sampled: the shared forward
    pass, then the integer-exact dependency recursion unrolled back DOWN
    the layers: delta(v) = sum((sigma_v * (1000000 + delta_w)) // sigma_w)
    over depth-(L+1) heads w — BIGINT floor division term for term, summed
    order-free, exactly the engine contract."""
    sql = _bfs_sigma_sql(sources, rounds) + f""",
    dl{rounds} AS (SELECT s, node, 0::BIGINT AS delta FROM st WHERE 1 = 0)"""
    for lvl in range(rounds - 1, -1, -1):
        sql += f""",
    dl{lvl} AS MATERIALIZED (
      SELECT sv.s, sv.node,
             sum((sv.sigma * (1000000 + coalesce(dw.delta, 0)))
                 // sw.sigma)::BIGINT AS delta
      FROM st sv JOIN e ON e.src = sv.node
      JOIN st sw ON sw.s = sv.s AND sw.node = e.dst AND sw.d = {lvl + 1}
      LEFT JOIN dl{lvl + 1} dw ON dw.s = sv.s AND dw.node = e.dst
      WHERE sv.d = {lvl}
      GROUP BY 1, 2)"""
    union = " UNION ALL ".join(
        f"SELECT * FROM dl{lvl}" for lvl in range(rounds))
    return sql + f"""
    SELECT node, sum(delta)::BIGINT AS bc_micro
    FROM ({union}) WHERE node <> s
    GROUP BY node HAVING sum(delta) > 0"""


def _ktruss_sql(k: int, rounds: int = 8) -> str:
    """Twin of raykg.ops.graph.ktruss_edges: the peel unrolled to exactly
    ``rounds`` filter applications (identity once the fixpoint is
    reached; the engine RAISES if it hasn't converged within the same
    bound, so the two sides can't silently diverge). support(a, b) =
    count of w adjacent to both endpoints within the current edge set."""
    sql = _graph_sql() + """,
    e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
                               greatest(src, dst) AS b
                        FROM g WHERE src <> dst)"""
    for r in range(1, rounds + 1):
        sql += f""",
    nbr{r} AS MATERIALIZED (SELECT a AS w, b AS u FROM e{r - 1}
                            UNION ALL SELECT b, a FROM e{r - 1}),
    e{r} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{r - 1} e
      JOIN nbr{r} n1 ON n1.u = e.a
      JOIN nbr{r} n2 ON n2.u = e.b AND n2.w = n1.w
      GROUP BY e.a, e.b HAVING count(*) >= {k - 2})"""
    return sql + f"""
    SELECT a, b FROM e{rounds}"""


def _mmr_sql(query_id: int = 0, k: int = 8, lam_num: int = 7,
             lam_den: int = 10) -> str:
    """Twin of raykg.ops.ann.mmr_select: the greedy selection unrolled to
    k steps, each an argmax of lam_num*rel - (lam_den-lam_num)*maxsim
    over pure BIGINT dot products of floor(v*1e6) components, ties to the
    smallest vec_id — the engine's exact integer contract."""
    a, b = lam_num, lam_den - lam_num
    sql = f"""
    WITH ev AS MATERIALIZED (
      SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0)
                  AS BIGINT) AS q
      FROM embeddings),
    qv AS MATERIALIZED (SELECT i, q FROM ev WHERE vec_id = {query_id}),
    rel AS MATERIALIZED (
      SELECT ev.vec_id, sum(ev.q * qv.q)::BIGINT AS rel
      FROM ev JOIN qv USING (i)
      WHERE ev.vec_id <> {query_id}
      GROUP BY 1),
    sel0("rank", vec_id, score) AS (
      SELECT 0::BIGINT, (-1)::BIGINT, 0::BIGINT WHERE 1 = 0)"""
    for r in range(1, k + 1):
        sql += f""",
    ms{r} AS MATERIALIZED (
      SELECT p.vec_id, max(p.d) AS maxsim FROM (
        SELECT e1.vec_id, s.vec_id AS sid, sum(e1.q * e2.q)::BIGINT AS d
        FROM ev e1 JOIN sel{r - 1} s ON TRUE
        JOIN ev e2 ON e2.vec_id = s.vec_id AND e2.i = e1.i
        GROUP BY 1, 2) p GROUP BY 1),
    s{r} AS MATERIALIZED (
      SELECT {r}::BIGINT AS "rank", r.vec_id,
             ({a} * r.rel - {b} * coalesce(m.maxsim, 0))::BIGINT AS score
      FROM rel r LEFT JOIN ms{r} m ON m.vec_id = r.vec_id
      WHERE r.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
      ORDER BY score DESC, r.vec_id LIMIT 1),
    sel{r} AS MATERIALIZED (SELECT * FROM sel{r - 1}
                            UNION ALL SELECT * FROM s{r})"""
    return sql + f"""
    SELECT "rank", vec_id, score FROM sel{k}"""


def _bpe_sql(n_merges: int) -> str:
    """Unrolled BPE training twin of raykg.ops.corpus.bpe_train: symbol
    sequences as double-separator strings (see _BPE_SEP there), merge
    application = one replace() per round (left-to-right non-overlapping,
    same kernel as the engine's pc.replace_substring), argmax ties ->
    smallest (l, r)."""
    S, D = "\x1f", "\x1f\x1f"
    sql = f"""
    WITH wc AS MATERIALIZED (
      SELECT tok AS w, count(*)::BIGINT AS c
      FROM (SELECT unnest({_TOKS}) AS tok FROM documents) GROUP BY 1),
    v0 AS MATERIALIZED (
      SELECT '{S}' || array_to_string(string_split(w, ''), '{D}') || '{S}'
               AS s, c
      FROM wc)"""
    for r in range(n_merges):
        sql += f""",
    p{r} AS MATERIALIZED (
      SELECT syms[i] AS l, syms[i + 1] AS r, sum(c)::BIGINT AS cnt
      FROM (SELECT string_split(trim(s, '{S}'), '{D}') AS syms, c
            FROM v{r}),
           LATERAL (SELECT unnest(range(1, len(syms))) AS i) t
      GROUP BY 1, 2),
    m{r} AS MATERIALIZED (
      SELECT l, r, cnt FROM p{r} ORDER BY cnt DESC, l, r LIMIT 1),
    v{r + 1} AS MATERIALIZED (
      SELECT replace(s,
          '{S}' || (SELECT l FROM m{r}) || '{D}'
                || (SELECT r FROM m{r}) || '{S}',
          '{S}' || (SELECT l FROM m{r})
                || (SELECT r FROM m{r}) || '{S}') AS s, c
      FROM v{r})"""
    union = " UNION ALL ".join(
        f'SELECT {r} AS "rank", l AS lft, r AS rgt, cnt FROM m{r}'
        for r in range(n_merges))
    return sql + f"\n    SELECT * FROM ({union})"


def oracle_sql() -> dict[str, str]:
    from raykg.ops import corpus as corpus_mod

    sig_body = _sig_sql()
    return {
        "graph_edges": _graph_sql() + "SELECT src, dst FROM g",
        "graph_degree_stats": _graph_sql() + """
            SELECT node, sum(o)::BIGINT AS out_deg, sum(ind)::BIGINT AS in_deg
            FROM (SELECT src AS node, 1 AS o, 0 AS ind FROM g
                  UNION ALL SELECT dst, 0, 1 FROM g)
            GROUP BY node""",
        "graph_triangles": _graph_sql() + """,
            und AS (SELECT DISTINCT least(src, dst) AS a,
                                    greatest(src, dst) AS b FROM g),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1
                    JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
            corners AS (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
                        UNION ALL SELECT z FROM tri)
            SELECT n AS node, count(*)::BIGINT AS n_triangles
            FROM corners GROUP BY n""",
        # transitive triples counted once per middle; 3-cycles once per
        # cycle (the three-way join sees all 3 rotations)
        "graph_mis": _mis_sql(),
        "graph_matching": _matching_sql(),
        "graph_coloring": _coloring_sql(),
        "graph_triad_motifs": _graph_sql() + """,
            tr AS (SELECT count(*) AS c FROM g e1
                   JOIN g e2 ON e2.src = e1.dst AND e2.dst <> e1.src
                   JOIN g e3 ON e3.src = e1.src AND e3.dst = e2.dst),
            cyc AS (SELECT count(*) AS c FROM g e1
                    JOIN g e2 ON e2.src = e1.dst AND e2.dst <> e1.src
                    JOIN g e3 ON e3.src = e2.dst AND e3.dst = e1.src)
            SELECT (SELECT c FROM tr)::BIGINT AS n_transitive,
                   ((SELECT c FROM cyc) // 3)::BIGINT AS n_cyclic""",
        "graph_clustering": _graph_sql() + """,
            und AS (SELECT DISTINCT least(src, dst) AS a,
                                    greatest(src, dst) AS b
                    FROM g WHERE src <> dst),
            deg AS (SELECT n AS node, count(*)::BIGINT AS deg FROM
                    (SELECT a AS n FROM und UNION ALL SELECT b FROM und)
                    GROUP BY 1),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM und e1
                    JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
            corners AS (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
                        UNION ALL SELECT z FROM tri),
            tcnt AS (SELECT n AS node, count(*)::BIGINT AS n_triangles
                     FROM corners GROUP BY n)
            SELECT d.node, d.deg,
                   COALESCE(t.n_triangles, 0)::BIGINT AS n_triangles,
                   CASE WHEN d.deg >= 2 THEN
                        round(2.0 * COALESCE(t.n_triangles, 0)
                              / (d.deg * (d.deg - 1)), 6)
                        ELSE 0.0 END AS coeff
            FROM deg d LEFT JOIN tcnt t USING (node)""",
        # both walks recurse on distinct node sets (UNION), so they
        # terminate without a depth bound
        "graph_scc": "WITH RECURSIVE " + _graph_sql()
        .replace("WITH lim", "lim", 1) + """,
            fwd(node) AS (SELECT 0::BIGINT UNION
                          SELECT g.dst FROM fwd f JOIN g ON g.src = f.node),
            bwd(node) AS (SELECT 0::BIGINT UNION
                          SELECT g.src FROM bwd b JOIN g ON g.dst = b.node)
            SELECT node FROM fwd INTERSECT SELECT node FROM bwd""",
        "graph_pagerank": _pagerank_sql(3),
        "graph_pagerank_weighted": _pagerank_weighted_sql(3),
        "graph_hits": _hits_sql(3),
        "graph_ppr": _pagerank_sql(3, teleport_to=0),
        # accumulated distance strictly increases per hop and is bounded
        # by the budget, so the recursive walk terminates; min(d) over it
        # equals the engine's budget-truncated fixpoint (every prefix of
        # an optimal path is <= its total)
        "graph_sssp": "WITH RECURSIVE " + _graph_sql()
        .replace("WITH lim", "lim", 1) + """,
            gw AS (SELECT src, dst,
                          1 + (('0x' || substr(sha256('gw|42|'
                               || src::VARCHAR || '|' || dst::VARCHAR),
                               1, 8))::UBIGINT % 9)::BIGINT AS wt
                   FROM g),
            walk(node, d) AS (
                SELECT 0::BIGINT, 0::BIGINT
                UNION
                SELECT gw.dst, w.d + gw.wt FROM walk w
                JOIN gw ON gw.src = w.node
                WHERE w.d + gw.wt <= 48)
            SELECT node, min(d)::BIGINT AS dist FROM walk GROUP BY node""",
        "graph_reciprocity": _graph_sql() + """,
            d AS (SELECT DISTINCT src, dst FROM g WHERE src <> dst),
            reg AS (SELECT count(*)::BIGINT AS n_edges,
                           sum(CASE WHEN EXISTS
                                 (SELECT 1 FROM d r
                                  WHERE r.src = d.dst AND r.dst = d.src)
                               THEN 1 ELSE 0 END)::BIGINT AS n_reciprocal
                    FROM d)
            SELECT n_edges, n_reciprocal,
                   round(CAST(n_reciprocal AS DOUBLE) / n_edges, 6)
                       AS reciprocity
            FROM reg""",
        "graph_assortativity": _graph_sql() + """,
            od AS (SELECT src AS node, count(*) AS d FROM g GROUP BY 1),
            idg AS (SELECT dst AS node, count(*) AS d FROM g GROUP BY 1),
            xy AS (SELECT od.d AS x, idg.d AS y
                   FROM g JOIN od ON od.node = g.src
                          JOIN idg ON idg.node = g.dst),
            reg AS (SELECT count(*)::BIGINT AS n_edges,
                           sum(x)::BIGINT AS sum_x, sum(y)::BIGINT AS sum_y,
                           sum(x*y)::BIGINT AS sum_xy,
                           sum(x*x)::BIGINT AS sum_x2,
                           sum(y*y)::BIGINT AS sum_y2
                    FROM xy)
            SELECT n_edges, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
                   round(CAST(n_edges * sum_xy - sum_x * sum_y AS DOUBLE)
                     / (sqrt(CAST(n_edges * sum_x2 - sum_x * sum_x
                                  AS DOUBLE))
                        * sqrt(CAST(n_edges * sum_y2 - sum_y * sum_y
                                    AS DOUBLE))), 6) AS r
            FROM reg""",
        "graph_kcore": _kcore_sql(4, 8),
        "graph_communities": _lpa_sql(4),
        "graph_walks": _walks_sql(4, 2),
        "graph_link_pred": _link_pred_sql(2),
        "graph_jaccard": _jaccard_sql(2),
        "graph_betweenness": _betweenness_sql((0, 7, 13)),
        "graph_harmonic": _harmonic_sql((0, 7, 13)),
        "graph_eccentricity": _ecc_sql((0, 7, 13)),
        "graph_ktruss": _ktruss_sql(4),
        # scaled-int exact neighbor means: float32 -> double is exact, and
        # floor(v * 1e6) / integer SUM / one final division are the same
        # IEEE ops the engine performs (ops/graph.py EMB_SCALE contract)
        "graph_neighbor_means": _graph_sql() + """,
            nv AS (SELECT count(*) AS n FROM embeddings),
            ev AS (SELECT vec_id,
                          generate_subscripts(embedding, 1) - 1 AS dim,
                          CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                               * 1000000.0) AS BIGINT) AS q
                   FROM embeddings),
            agg AS (SELECT g.src AS node, ev.dim,
                           sum(ev.q) AS s, count(*) AS c
                    FROM g, nv, ev WHERE ev.vec_id = g.dst % nv.n
                    GROUP BY 1, 2)
            SELECT node, dim::BIGINT AS dim,
                   round(CAST(s AS DOUBLE) / (c * 1000000.0), 6) AS nbr_mean
            FROM agg""",
        "kg_co_mentions": "WITH t AS ("
            + flagship_exact_sql(what="triples") + """),
            ents AS (
              SELECT DISTINCT doc_id, obj AS uri FROM t
              UNION SELECT DISTINCT doc_id, subj FROM t
                    WHERE subj NOT LIKE 'sdpg.gr/Document/%'),
            -- engine hub cap replicated: first 256 entities per doc in
            -- ascending uri order (co_mention_edges max_doc_entities)
            capped AS (
              SELECT doc_id, uri FROM (
                SELECT doc_id, uri, row_number() OVER (
                    PARTITION BY doc_id ORDER BY uri) AS rk FROM ents)
              WHERE rk <= 256),
            p AS (SELECT a.doc_id, a.uri AS ent_a, b.uri AS ent_b
                  FROM capped a JOIN capped b
                    ON a.doc_id = b.doc_id AND a.uri < b.uri)
            SELECT ent_a, ent_b, count(*)::BIGINT AS n_docs
            FROM p GROUP BY 1, 2""",
        "kg_relation_stats": "WITH t AS ("
            + flagship_exact_sql(what="triples") + """)
            SELECT pred, count(*)::BIGINT AS n_triples,
                   count(DISTINCT subj)::BIGINT AS n_subj,
                   count(DISTINCT obj)::BIGINT AS n_obj,
                   count(DISTINCT doc_id)::BIGINT AS n_docs
            FROM t GROUP BY pred""",
        "kg_entity_salience": "WITH t AS ("
            + flagship_exact_sql(what="triples") + """),
            occ AS (SELECT doc_id, obj AS uri, span_offset FROM t
                    UNION ALL
                    SELECT doc_id, subj, span_offset FROM t
                    WHERE subj NOT LIKE 'sdpg.gr/Document/%')
            SELECT uri, count(*)::BIGINT AS n_mentions,
                   count(DISTINCT doc_id)::BIGINT AS n_docs,
                   sum(1000000 // (1 + span_offset))::BIGINT AS salience
            FROM occ GROUP BY uri""",
        "kg_entity_pagerank": _entity_pagerank_sql(3),
        "kg_entity_pagerank_weighted": _entity_pagerank_sql(
            3, weighted=True),
        "kg_co_mention_pmi": "WITH t AS ("
            + flagship_exact_sql(what="triples") + """),
            ents AS (
              SELECT DISTINCT doc_id, obj AS uri FROM t
              UNION SELECT DISTINCT doc_id, subj FROM t
                    WHERE subj NOT LIKE 'sdpg.gr/Document/%'),
            nd AS (SELECT count(DISTINCT doc_id) AS n FROM ents),
            ec AS (SELECT uri, count(*)::BIGINT AS c FROM ents GROUP BY 1),
            -- pair counts reuse co_mention_edges, so its per-doc hub cap
            -- (first 256 uris ascending) applies to pairs only — per-
            -- entity counts and N stay uncapped, matching the engine
            capped AS (
              SELECT doc_id, uri FROM (
                SELECT doc_id, uri, row_number() OVER (
                    PARTITION BY doc_id ORDER BY uri) AS rk FROM ents)
              WHERE rk <= 256),
            p AS (SELECT a.doc_id, a.uri AS ent_a, b.uri AS ent_b
                  FROM capped a JOIN capped b
                    ON a.doc_id = b.doc_id AND a.uri < b.uri),
            pc2 AS (SELECT ent_a, ent_b, count(*)::BIGINT AS n_both
                    FROM p GROUP BY 1, 2)
            SELECT ent_a, ent_b, n_both,
                   round(log2((CAST(n_both AS DOUBLE) * nd.n)
                              / (ca.c * cb.c)), 6) AS pmi
            FROM pc2, nd
            JOIN ec ca ON ca.uri = pc2.ent_a
            JOIN ec cb ON cb.uri = pc2.ent_b""",
        "kg_metapath_counts": "WITH t AS ("
            + flagship_exact_sql(what="edges") + """),
            e AS (SELECT subj, pred, obj FROM t)
            SELECT split_part(e1.subj, '/', 2) AS label_a,
                   e1.pred AS pred_ab,
                   split_part(e1.obj, '/', 2) AS label_m,
                   e2.pred AS pred_mc,
                   split_part(e2.obj, '/', 2) AS label_c,
                   count(*)::BIGINT AS n_paths
            FROM e e1 JOIN e e2 ON e1.obj = e2.subj
            GROUP BY 1, 2, 3, 4, 5""",
        "kg_cross_modal": "WITH t AS ("
            + flagship_exact_sql(what="triples") + """),
            side AS (
              SELECT doc_id, uri,
                     max(CASE WHEN pred = 'depicts' THEN 1 ELSE 0 END)
                         AS dep,
                     max(CASE WHEN pred <> 'depicts' THEN 1 ELSE 0 END)
                         AS txt
              FROM (SELECT doc_id, pred, obj AS uri FROM t
                    UNION ALL SELECT doc_id, pred, subj FROM t
                              WHERE subj NOT LIKE 'sdpg.gr/Document/%')
              GROUP BY 1, 2)
            SELECT uri, sum(dep)::BIGINT AS n_depicted,
                   sum(txt)::BIGINT AS n_texted,
                   sum(dep * txt)::BIGINT AS n_both
            FROM side GROUP BY uri""",
        "graph_negatives": _graph_sql() + """,
            nodes AS (SELECT DISTINCT node FROM
              (SELECT src AS node FROM g UNION ALL SELECT dst FROM g)),
            cand AS (
              SELECT node AS src, j,
                     (('0x' || substr(sha256('neg|42|' || node::VARCHAR
                          || '|' || j::VARCHAR), 1, 8))::UBIGINT
                      % 2000)::BIGINT AS dst
              FROM nodes CROSS JOIN (SELECT unnest(range(0, 8)) AS j)),
            ok AS (SELECT c.* FROM cand c
                   WHERE c.dst <> c.src
                     AND NOT EXISTS (SELECT 1 FROM g
                                     WHERE g.src = c.src
                                       AND g.dst = c.dst)),
            ded AS (SELECT src, dst, min(j) AS j FROM ok GROUP BY 1, 2)
            SELECT src, dst AS neg_dst, j FROM ded
            QUALIFY row_number() OVER (PARTITION BY src
                                       ORDER BY j, dst) <= 3""",
        # single-source BFS as a depth-bounded recursive walk; the bound
        # (40) only needs to exceed the source's eccentricity — min(d)
        # per node is the true BFS depth
        "graph_bfs_depths": "WITH RECURSIVE " + _graph_sql()
        .replace("WITH lim", "lim", 1) + """,
            walk(node, d) AS (
                SELECT 0::BIGINT AS node, 0::BIGINT AS d
                UNION
                SELECT g.dst, w.d + 1 FROM walk w
                JOIN g ON g.src = w.node
                WHERE w.d < 40)
            SELECT node, min(d)::BIGINT AS depth FROM walk GROUP BY node""",
        # WCC via exhaustive reachable-label enumeration (the recursive
        # CTE's UNION-distinct bounds the walk at |component|^2 rows per
        # component — fine at oracle scale); the engine's iterative
        # min-label fixpoint must land on the same minimum
        "graph_components": "WITH RECURSIVE " + _graph_sql(p_intra=1.0)
        .replace("WITH lim", "lim", 1) + """,
            sym AS (SELECT src AS a, dst AS b FROM g
                    UNION SELECT dst, src FROM g),
            walk(node, lab) AS (
                SELECT a, a FROM sym
                UNION
                SELECT s.b, w.lab FROM walk w JOIN sym s ON s.a = w.node)
            SELECT node, min(lab)::BIGINT AS component
            FROM walk GROUP BY node""",
        "media_blob_meta": _BLOB_META + """
            SELECT media_id, kind, n_bytes::BIGINT AS n_bytes,
                   width::INT AS width, height::INT AS height,
                   duration_ms::INT AS duration_ms
            FROM m""",
        "media_resize": _BLOB_META + """
            SELECT media_id, (width // 2)::INT AS width,
                   (height // 2)::INT AS height,
                   (n_bytes // 4)::BIGINT AS new_bytes
            FROM m WHERE kind = 'image'""",
        "media_frames": _BLOB_META + """
            SELECT media_id, fi::INT AS frame_idx,
                   substr(sha256('frame|' || media_id::VARCHAR || '|'
                          || fi::VARCHAR), 1, 16) AS frame_ref
            FROM m, (SELECT unnest(range(0, 3)) AS fi)
            WHERE kind = 'video'""",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_quantity) / count(*), 4) AS avg_qty,
                   count(*) AS n
            FROM lineitem GROUP BY 1, 2""",
        "local_supplier_revenue": """
            SELECT n_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n_name""",
        "revenue_by_nation": """
            SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        "revenue_by_priority": """
            SELECT o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1""",
        "majority_nation_per_segment": """
            SELECT c_mktsegment, c_nationkey AS top_nationkey,
                   count(*) AS n_customers
            FROM customer GROUP BY 1, 2
            QUALIFY row_number() OVER (PARTITION BY c_mktsegment
                ORDER BY count(*) DESC, c_nationkey) = 1""",
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "event_type_counts": """
            SELECT event_type, count(*) AS n FROM events GROUP BY 1""",
        "hourly_event_stats": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   round(sum(value), 2) AS sum_value, count(*) AS n
            FROM events GROUP BY 1, 2""",
        "sliding_event_stats": """
            WITH h AS (SELECT date_trunc('hour', ts) AS hour, event_type,
                              sum(value) AS sv, count(*) AS n
                       FROM events GROUP BY 1, 2),
            w AS (SELECT hour + to_hours(o) AS window_end, event_type, sv, n
                  FROM h, (SELECT unnest(range(0, 3)) AS o))
            SELECT window_end, event_type, round(sum(sv), 2) AS sum_value,
                   sum(n)::BIGINT AS n
            FROM w GROUP BY 1, 2""",
        "asof_last_click": """
            WITH l AS (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'purchase'),
            r AS (SELECT event_id, ts, user_id FROM events
                  WHERE event_type = 'click'
                  QUALIFY row_number() OVER (PARTITION BY user_id, ts
                      ORDER BY event_id DESC) = 1)
            SELECT l.event_id AS purchase_id, l.user_id,
                   r.event_id AS click_id, r.ts AS click_ts
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "range_join_recent_clicks": """
            WITH l AS (SELECT event_id, ts, user_id FROM events
                       WHERE event_type = 'error'),
            r AS (SELECT event_id, ts, user_id FROM events
                  WHERE event_type = 'click')
            SELECT l.event_id AS error_id, l.user_id,
                   count(r.event_id)::BIGINT AS n_recent_clicks
            FROM l LEFT JOIN r
              ON r.user_id = l.user_id
             AND r.ts >= l.ts - INTERVAL 10 MINUTE AND r.ts <= l.ts
            GROUP BY 1, 2""",
        "interval_coverage": """
            WITH e AS (SELECT user_id, epoch_us(ts) AS s,
                              epoch_us(ts)
                              + greatest(0, CAST(floor(value*60 + 0.5)
                                                 AS BIGINT)) * 1000000 AS f
                       FROM events),
            w AS (SELECT user_id, s, f,
                         max(f) OVER (PARTITION BY user_id ORDER BY s, f
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS pmax
                  FROM e),
            isl AS (SELECT user_id, s, f,
                           CASE WHEN pmax IS NULL OR s > pmax
                                THEN 1 ELSE 0 END AS brk
                    FROM w),
            g AS (SELECT user_id, s, f,
                         sum(brk) OVER (PARTITION BY user_id
                                        ORDER BY s, f
                                        ROWS UNBOUNDED PRECEDING) AS island
                  FROM isl),
            per AS (SELECT user_id, island, max(f) - min(s) AS cov
                    FROM g GROUP BY 1, 2)
            SELECT user_id, count(*)::BIGINT AS n_islands,
                   sum(cov)::BIGINT AS covered_us
            FROM per GROUP BY 1""",
        "rolling_median": """
            WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS s,
                              CAST(floor(value*100 + 0.5) AS BIGINT) AS c
                       FROM events)
            SELECT event_id, user_id,
                   round(quantile_cont(c, 0.5) OVER (
                         PARTITION BY user_id ORDER BY s, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                         / 100.0, 4) AS roll_med
            FROM e""",
        "sessionize": """
            SELECT user_id, count(*) AS n_events,
                   (1 + sum(CASE WHEN prev_ts IS NOT NULL
                                 AND epoch(ts - prev_ts) > 1800
                            THEN 1 ELSE 0 END))::BIGINT AS n_sessions
            FROM (SELECT user_id, ts,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                  FROM events)
            GROUP BY user_id""",
        "funnel_stages": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
            s1 AS (SELECT user_id, min(ts) AS t FROM events
                   WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t
                   FROM events e JOIN s1 USING (user_id)
                   WHERE e.event_type = 'click' AND e.ts > s1.t
                   GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t
                   FROM events e JOIN s2 USING (user_id)
                   WHERE e.event_type = 'purchase' AND e.ts > s2.t
                   GROUP BY 1)
            SELECT u.user_id,
                   (CASE WHEN s1.user_id IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END
                    + CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0
                      END)::BIGINT AS stage
            FROM u LEFT JOIN s1 USING (user_id)
                   LEFT JOIN s2 USING (user_id)
                   LEFT JOIN s3 USING (user_id)""",
        "event_lag_stats": """
            WITH w AS (
              SELECT event_type,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS d_us
              FROM events)
            SELECT event_type, count(d_us) AS n_deltas,
                   round(sum(d_us)::DOUBLE / (count(d_us)::DOUBLE * 1e6),
                         4) AS avg_delta_s
            FROM w WHERE d_us IS NOT NULL GROUP BY 1""",
        "event_transitions": """
            WITH s AS (
              SELECT event_type,
                     lead(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id) AS nxt
              FROM events)
            SELECT event_type AS from_type, nxt AS to_type,
                   count(*)::BIGINT AS n,
                   round(count(*) / sum(count(*))
                             OVER (PARTITION BY event_type), 6) AS p
            FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2""",
        "hourly_autocorrelation": """
            WITH hc AS (SELECT epoch_us(date_trunc('hour', ts))
                               // 3600000000 AS h,
                               count(*)::BIGINT AS c
                        FROM events GROUP BY 1),
            bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM hc),
            spine AS (SELECT unnest(range((SELECT lo FROM bounds),
                                          (SELECT hi FROM bounds) + 1))
                          AS h),
            s AS (SELECT spine.h, coalesce(hc.c, 0)::BIGINT AS c
                  FROM spine LEFT JOIN hc USING (h)),
            lags AS (SELECT unnest([1, 2, 3, 24]) AS lag),
            p AS (SELECT lags.lag, a.c AS x, b.c AS y
                  FROM lags JOIN s a ON true
                  JOIN s b ON b.h = a.h + lags.lag),
            reg AS (SELECT lag, count(*)::BIGINT AS n,
                           sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
                           sum(x*x) AS sx2, sum(y*y) AS sy2
                    FROM p GROUP BY 1)
            SELECT lag, n AS n_pairs,
                   round(CASE WHEN (n*sx2 - sx*sx) = 0
                                OR (n*sy2 - sy*sy) = 0 THEN 0.0
                         ELSE (n*sxy - sx*sy)
                              / sqrt((n*sx2 - sx*sx)::DOUBLE
                                     * (n*sy2 - sy*sy)) END, 6) AS r
            FROM reg WHERE lag < (SELECT count(*) FROM s)""",
        "retention_cohorts": """
            WITH w AS (SELECT user_id,
                              epoch_us(ts) // 604800000000 AS wk
                       FROM events),
            u AS (SELECT DISTINCT user_id, wk FROM w),
            c AS (SELECT user_id, min(wk) AS cohort FROM u GROUP BY 1)
            SELECT c.cohort AS cohort_week,
                   (u.wk - c.cohort)::BIGINT AS week_offset,
                   count(*)::BIGINT AS n_users
            FROM u JOIN c USING (user_id) GROUP BY 1, 2""",
        "top_orders_per_customer": """
            SELECT o_custkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
                   o_orderkey, o_totalprice
            FROM orders QUALIFY rnk <= 2""",
        "customers_without_orders": """
            SELECT c_custkey FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey
                                AND o_orderdate >= DATE '2000-01-01')""",
        "pricing_rollup": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
        "props_k_stats": """
            SELECT event_type,
                   round(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT))
                         / count(*)::DOUBLE, 4) AS avg_k,
                   count(*) AS n
            FROM events GROUP BY 1""",
        "kg_nodes": """
            SELECT 'sdpg.gr/Customer/' || sha256(c_custkey::VARCHAR) AS uri,
                   'Customer' AS label, 4::BIGINT AS n_props FROM customer
            UNION ALL SELECT 'sdpg.gr/Supplier/' || sha256(s_suppkey::VARCHAR),
                   'Supplier', 3 FROM supplier
            UNION ALL SELECT 'sdpg.gr/Part/' || sha256(p_partkey::VARCHAR),
                   'Part', 5 FROM part
            UNION ALL SELECT 'sdpg.gr/Nation/' || sha256(n_nationkey::VARCHAR),
                   'Nation', 2 FROM nation
            UNION ALL SELECT 'sdpg.gr/Region/' || sha256(r_regionkey::VARCHAR),
                   'Region', 1 FROM region""",
        "kg_edges": """
            WITH e AS (
              SELECT 'sdpg.gr/Customer/' || sha256(c_custkey::VARCHAR) AS subj,
                     'IS_LOCATED_IN' AS pred,
                     'sdpg.gr/Nation/' || sha256(c_nationkey::VARCHAR) AS obj
              FROM customer
              UNION ALL
              SELECT 'sdpg.gr/Nation/' || sha256(n_nationkey::VARCHAR),
                     'IN_REGION',
                     'sdpg.gr/Region/' || sha256(n_regionkey::VARCHAR)
              FROM nation
              UNION ALL
              SELECT 'sdpg.gr/Order/' || sha256(o_orderkey::VARCHAR),
                     'PLACED_BY',
                     'sdpg.gr/Customer/' || sha256(o_custkey::VARCHAR)
              FROM orders
              UNION ALL
              SELECT 'sdpg.gr/Order/' || sha256(l_orderkey::VARCHAR),
                     'HAS_PART',
                     'sdpg.gr/Part/' || sha256(l_partkey::VARCHAR)
              FROM lineitem
              UNION ALL
              SELECT 'sdpg.gr/Order/' || sha256(l_orderkey::VARCHAR),
                     'SUPPLIED_BY',
                     'sdpg.gr/Supplier/' || sha256(l_suppkey::VARCHAR)
              FROM lineitem)
            SELECT subj, pred, obj, count(*) AS n FROM e GROUP BY 1, 2, 3""",
        "property_signatures": f"""
            WITH s AS ({sig_body})
            SELECT label, signature, count(*) AS n FROM s GROUP BY 1, 2""",
        "minhash_cluster_counts": f"""
            WITH s AS ({sig_body}),
            sig_counts AS (SELECT signature, count(*) AS n FROM s GROUP BY 1),
            keyed AS (SELECT array_to_string(list_transform(range(0, 4),
                h -> coalesce(list_min(list_transform(
                     list_filter(string_split(signature, ','), x -> x <> ''),
                     p -> substr(sha256(p || '#' || h::VARCHAR || '#42'), 1, 8))),
                     'ffffffff')), '_') AS cluster_key, n
              FROM sig_counts)
            SELECT cluster_key, sum(n)::BIGINT AS n FROM keyed GROUP BY 1""",
        "infer_column_types": """
            WITH s AS (SELECT event_type::VARCHAR AS c0, props::VARCHAR AS c1,
                              user_id::VARCHAR AS c2
                       FROM events LIMIT 1000),
            u AS (SELECT 'event_type' AS col, c0 AS v FROM s
                  UNION ALL SELECT 'props', c1 FROM s
                  UNION ALL SELECT 'user_id', c2 FROM s),
            cls AS (SELECT col,
                CASE WHEN regexp_full_match(v, '-?\\d+')
                          AND abs(TRY_CAST(v AS HUGEINT)) < 2147483648
                     THEN 'INT'
                     WHEN regexp_full_match(v, '-?\\d+') THEN 'LONG'
                     WHEN regexp_full_match(v, '-?\\d+\\.\\d+') THEN 'DOUBLE'
                     WHEN lower(v) IN ('true', 'false') THEN 'BOOLEAN'
                     ELSE 'STRING' END AS t
                FROM u),
            counts AS (SELECT col, t, count(*) AS n FROM cls GROUP BY 1, 2)
            SELECT col, t AS inferred_type FROM counts
            QUALIFY row_number() OVER (PARTITION BY col
                ORDER BY n DESC, t) = 1""",
        "token_stats": f"""
            SELECT doc_id, len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_uniq,
                   round(len(list_filter(toks, t -> t IN ('the', 'a')))
                         / len(toks)::DOUBLE, 4) AS stop_ratio,
                   round(len(list_distinct(toks)) / len(toks)::DOUBLE, 4) AS uniq_ratio
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)""",
        "quality_score": f"""
            SELECT doc_id,
                   round(0.4 * least(1.0, len(toks) / 60.0)
                         + 0.3 * (1.0 - len(list_filter(toks, t -> t IN ('the', 'a')))
                                        / len(toks)::DOUBLE)
                         + 0.3 * (len(list_distinct(toks)) / len(toks)::DOUBLE),
                         4) AS quality
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)""",
        "score_percentiles": f"""
            WITH q AS (SELECT doc_id,
                   round(0.4 * least(1.0, len(toks) / 60.0)
                         + 0.3 * (1.0 - len(list_filter(toks,
                                        t -> t IN ('the', 'a')))
                                        / len(toks)::DOUBLE)
                         + 0.3 * (len(list_distinct(toks))
                                  / len(toks)::DOUBLE),
                         4) AS quality
                   FROM (SELECT doc_id, {_TOKS} AS toks FROM documents))
            SELECT doc_id, quality,
                   round(percent_rank() OVER (ORDER BY quality), 4)
                       AS pct_rank
            FROM q""",
        "lang_id": f"""
            SELECT doc_id, CASE WHEN c >= 2 THEN 'en'
                                WHEN c = 1 THEN 'maybe_en'
                                ELSE 'und' END AS lang_pred
            FROM (SELECT doc_id,
                         len(list_filter({_TOKS}, t -> t IN ('the', 'a'))) AS c
                  FROM documents)""",
        "fingerprint": f"""
            SELECT doc_id,
                   CASE WHEN len(toks) < 3
                        THEN substr(sha256(array_to_string(toks, ' ')), 1, 12)
                        ELSE list_min(list_transform(range(1, len(toks) - 1),
                             i -> substr(sha256(array_to_string(
                                  list_slice(toks, i, i + 2), ' ')), 1, 12)))
                   END AS fingerprint
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)""",
        "inverted_index": f"""
            WITH tok AS (SELECT DISTINCT doc_id, term
                         FROM (SELECT doc_id, unnest({_TOKS}) AS term
                               FROM documents)),
            g AS (SELECT term, count(*) AS df,
                         list(doc_id ORDER BY doc_id) AS l
                  FROM tok GROUP BY term)
            SELECT term, df::BIGINT AS df,
                   array_to_string(list_slice(l, 1, 32), ',') AS postings
            FROM g""",
        "gopher_rules": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
            s AS (SELECT doc_id, len(toks) AS n_words,
                   CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                     list_sum(list_transform(toks, w -> len(w)))::DOUBLE
                     / len(toks) END AS mean_raw,
                   CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                     ((len(text) - len(replace(text, '#', '')))
                      + (len(text) - len(replace(text, '...', ''))) / 3
                     )::DOUBLE / len(toks) END AS sym_raw,
                   CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                     len(list_filter(toks,
                         w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                     / len(toks) END AS alpha_raw,
                   (list_contains(toks, 'the')::INT
                    + list_contains(toks, 'a')::INT
                    + list_contains(toks, 'be')::INT
                    + list_contains(toks, 'to')::INT
                    + list_contains(toks, 'of')::INT
                    + list_contains(toks, 'and')::INT
                    + list_contains(toks, 'that')::INT
                    + list_contains(toks, 'have')::INT
                    + list_contains(toks, 'with')::INT) AS stop_hits
                  FROM t)
            SELECT doc_id, n_words::BIGINT AS n_words,
                   round(mean_raw, 4) AS mean_word_len,
                   round(sym_raw, 4) AS symbol_ratio,
                   round(alpha_raw, 4) AS alpha_ratio,
                   stop_hits::BIGINT AS stop_hits,
                   (n_words BETWEEN 50 AND 100000)::BIGINT AS ok_words,
                   (mean_raw BETWEEN 3.0 AND 10.0)::BIGINT AS ok_mean_len,
                   (sym_raw <= 0.1)::BIGINT AS ok_symbols,
                   (alpha_raw >= 0.8)::BIGINT AS ok_alpha,
                   (stop_hits >= 2)::BIGINT AS ok_stops,
                   ((n_words BETWEEN 50 AND 100000)
                    AND (mean_raw BETWEEN 3.0 AND 10.0)
                    AND (sym_raw <= 0.1) AND (alpha_raw >= 0.8)
                    AND (stop_hits >= 2))::BIGINT AS keep
            FROM s""",
        "quality_funnel": f"""
            WITH t AS (SELECT source, text, {_TOKS} AS toks FROM documents),
            s AS (SELECT source,
                   (len(toks) BETWEEN 50 AND 100000) AS f1,
                   (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                      list_sum(list_transform(toks, w -> len(w)))::DOUBLE
                      / len(toks) END BETWEEN 3.0 AND 10.0) AS f2,
                   (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                      ((len(text) - len(replace(text, '#', '')))
                       + (len(text) - len(replace(text, '...', ''))) / 3
                      )::DOUBLE / len(toks) END <= 0.1) AS f3,
                   (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                      len(list_filter(toks,
                          w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                      / len(toks) END >= 0.8) AS f4,
                   ((list_contains(toks, 'the')::INT
                     + list_contains(toks, 'a')::INT
                     + list_contains(toks, 'be')::INT
                     + list_contains(toks, 'to')::INT
                     + list_contains(toks, 'of')::INT
                     + list_contains(toks, 'and')::INT
                     + list_contains(toks, 'that')::INT
                     + list_contains(toks, 'have')::INT
                     + list_contains(toks, 'with')::INT) >= 2) AS f5
                  FROM t)
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum((NOT f1)::INT)::BIGINT AS fail_words,
                   sum((NOT f2)::INT)::BIGINT AS fail_mean_len,
                   sum((NOT f3)::INT)::BIGINT AS fail_symbols,
                   sum((NOT f4)::INT)::BIGINT AS fail_alpha,
                   sum((NOT f5)::INT)::BIGINT AS fail_stops,
                   sum((f1 AND f2 AND f3 AND f4 AND f5)::INT)::BIGINT
                       AS kept
            FROM s GROUP BY source""",
        "cooccurrence_pmi": f"""
            WITH t AS (SELECT {_TOKS} AS toks FROM documents),
            ix AS (SELECT toks, unnest(range(1, len(toks) + 1)) AS i
                   FROM t),
            pairs AS MATERIALIZED (
                SELECT least(toks[i], toks[i + d]) AS w1,
                       greatest(toks[i], toks[i + d]) AS w2
                FROM ix, (SELECT unnest(range(1, 5)) AS d)
                WHERE i + d <= len(toks)),
            c12 AS (SELECT w1, w2, count(*) AS c FROM pairs
                    GROUP BY 1, 2 HAVING count(*) >= 5),
            uni AS MATERIALIZED (
                SELECT w, count(*) AS c FROM
                (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
            tot AS (SELECT (SELECT sum(c) FROM uni)::DOUBLE AS n,
                           (SELECT count(*) FROM pairs)::DOUBLE AS p)
            SELECT w1, w2, c12.c::BIGINT AS c12,
                   round(log2((c12.c / tot.p)
                              / ((u1.c / tot.n) * (u2.c / tot.n))), 4)
                       AS pmi
            FROM c12 JOIN uni u1 ON u1.w = c12.w1
                     JOIN uni u2 ON u2.w = c12.w2
                     CROSS JOIN tot
            QUALIFY row_number() OVER (
                ORDER BY pmi DESC, w1, w2) <= 50""",
        "value_quantiles": """
            SELECT event_type, 0.25 AS q,
                   round(quantile_cont(value, 0.25), 4) AS value
            FROM events GROUP BY 1
            UNION ALL SELECT event_type, 0.5,
                   round(quantile_cont(value, 0.5), 4) FROM events GROUP BY 1
            UNION ALL SELECT event_type, 0.75,
                   round(quantile_cont(value, 0.75), 4) FROM events GROUP BY 1
            UNION ALL SELECT event_type, 0.95,
                   round(quantile_cont(value, 0.95), 4) FROM events
            GROUP BY 1""",
        "burst_stats": """
            WITH w AS (
                SELECT user_id,
                       count(*) OVER (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING
                                 AND CURRENT ROW) AS burst
                FROM events)
            SELECT user_id, count(*)::BIGINT AS n_events,
                   max(burst)::BIGINT AS max_burst,
                   (max(burst) >= 3)::BIGINT AS is_burst
            FROM w GROUP BY user_id""",
        "ewma_by_user": """
            WITH RECURSIVE ev AS (
                SELECT user_id, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn,
                       count(*) OVER (PARTITION BY user_id) AS n
                FROM events),
            rec(user_id, rn, s, n) AS (
                SELECT user_id, rn, value, n FROM ev WHERE rn = 1
                UNION ALL
                SELECT e.user_id, e.rn, (e.value + r.s) / 2.0, e.n
                FROM rec r JOIN ev e
                  ON e.user_id = r.user_id AND e.rn = r.rn + 1)
            SELECT user_id, n::BIGINT AS n_events, round(s, 6) AS ewma
            FROM rec WHERE rn = n""",
        "histogram_quantiles": """
            WITH b AS (
                SELECT event_type, CAST(floor(value / 8.0) AS BIGINT) AS bin,
                       count(*) AS c
                FROM events GROUP BY 1, 2
            ), cum AS (
                SELECT event_type, bin, c,
                       sum(c) OVER (PARTITION BY event_type
                                    ORDER BY bin) AS cum,
                       sum(c) OVER (PARTITION BY event_type) AS n
                FROM b
            ), qs AS (SELECT unnest([0.25, 0.5, 0.75, 0.95]) AS q),
            hit AS (
                SELECT event_type, q, bin, c, cum - c AS cum_before,
                       n * q AS target,
                       row_number() OVER (PARTITION BY event_type, q
                                          ORDER BY bin) AS rn
                FROM cum CROSS JOIN qs
                WHERE CAST(cum AS DOUBLE) >= n * q
            )
            SELECT event_type, q,
                   round(bin * 8.0 + 8.0 * (target - cum_before) / c,
                         4) AS value_est
            FROM hit WHERE rn = 1""",
        "doc_length_histogram": f"""
            SELECT (len({_TOKS}) // 16)::BIGINT AS bin,
                   count(*)::BIGINT AS n_docs
            FROM documents GROUP BY 1""",
        # corpus-wide first occurrence per gram, joined back per doc;
        # docs with no grams (empty text) are absent on both sides
        "ngram_novelty": f"""
            WITH g AS (SELECT doc_id, unnest({_GRAMS}) AS gram
                       FROM documents),
            f AS (SELECT gram, min(doc_id) AS first_doc FROM g
                  GROUP BY gram)
            SELECT g.doc_id, count(*)::BIGINT AS n_grams,
                   sum(CASE WHEN f.first_doc = g.doc_id
                            THEN 1 ELSE 0 END)::BIGINT AS novel_grams,
                   round(sum(CASE WHEN f.first_doc = g.doc_id
                                  THEN 1 ELSE 0 END)::DOUBLE
                         / count(*), 4) AS novelty
            FROM g JOIN f USING (gram)
            GROUP BY g.doc_id""",
        # quadratic dominance anti-join — the engine's local-front merge
        # must reproduce the exact skyline
        "pareto_front": """
            WITH d AS (SELECT DISTINCT p_size::BIGINT AS p_size,
                              floor(p_retailprice*100 + 0.5)::BIGINT
                                  AS price_cents
                       FROM part)
            SELECT p_size, price_cents FROM d a
            WHERE NOT EXISTS (SELECT 1 FROM d b
                WHERE b.p_size >= a.p_size
                  AND b.price_cents <= a.price_cents
                  AND (b.p_size > a.p_size
                       OR b.price_cents < a.price_cents))""",
        # integer-exact percentile_disc: least cents with cum*4 >= k*n —
        # the engine's searchsorted pick written as a window scan (no
        # reliance on quantile_disc's index convention)
        "robust_group_stats": """
            WITH h AS (SELECT o_orderpriority AS group_key,
                              floor(o_totalprice*100 + 0.5)::BIGINT AS cents,
                              count(*)::BIGINT AS c
                       FROM orders GROUP BY 1, 2),
            cum AS (SELECT group_key, cents, c,
                           sum(c) OVER (PARTITION BY group_key
                                        ORDER BY cents) AS cum,
                           sum(c) OVER (PARTITION BY group_key) AS n
                    FROM h),
            med AS (SELECT group_key, cents AS m, n FROM cum
                    WHERE cum * 2 >= n
                    QUALIFY row_number() OVER (PARTITION BY group_key
                                               ORDER BY cents) = 1),
            devh AS (SELECT h.group_key, abs(h.cents - med.m) AS d,
                            sum(h.c)::BIGINT AS c
                     FROM h JOIN med USING (group_key) GROUP BY 1, 2),
            dcum AS (SELECT group_key, d, c,
                            sum(c) OVER (PARTITION BY group_key
                                         ORDER BY d) AS cum,
                            sum(c) OVER (PARTITION BY group_key) AS n
                     FROM devh),
            mad AS (SELECT group_key, d AS md FROM dcum
                    WHERE cum * 2 >= n
                    QUALIFY row_number() OVER (PARTITION BY group_key
                                               ORDER BY d) = 1),
            outc AS (SELECT devh.group_key,
                            coalesce(sum(devh.c) FILTER (
                                WHERE devh.d > 3 * mad.md), 0)::BIGINT
                                AS n_outliers
                     FROM devh JOIN mad USING (group_key) GROUP BY 1)
            SELECT med.group_key, med.n::BIGINT AS n,
                   round(med.m / 100.0, 4) AS median,
                   round(mad.md / 100.0, 4) AS mad,
                   outc.n_outliers
            FROM med JOIN mad USING (group_key)
                 JOIN outc USING (group_key)""",
        "group_quantiles": """
            WITH h AS (SELECT l_returnflag AS group_key,
                              floor(l_extendedprice*100 + 0.5)::BIGINT
                                  AS cents,
                              count(*)::BIGINT AS c
                       FROM lineitem GROUP BY 1, 2),
            cum AS (SELECT group_key, cents,
                           sum(c) OVER (PARTITION BY group_key
                                        ORDER BY cents) AS cum,
                           sum(c) OVER (PARTITION BY group_key) AS n
                    FROM h),
            qs AS (SELECT unnest([1, 2, 3]) AS k),
            hit AS (SELECT group_key, k, cents,
                           row_number() OVER (PARTITION BY group_key, k
                                              ORDER BY cents) AS rn
                    FROM cum CROSS JOIN qs
                    WHERE cum * 4 >= k * n)
            SELECT group_key, k / 4.0 AS q,
                   round(cents / 100.0, 2) AS value
            FROM hit WHERE rn = 1""",
        # sha-derived integer codebook + exact int64 squared-L2 argmin,
        # ties to the smallest centroid id (engine: argmin first index)
        "embedding_dim_stats": """
            WITH ev AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                               CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                    * 1000000.0) AS BIGINT) AS q
                        FROM embeddings)
            SELECT dim::BIGINT AS dim, count(*)::BIGINT AS n,
                   round((sum(q)::DOUBLE / count(*)) / 1000000.0, 6)
                       AS mean,
                   round(((sum(q*q) * count(*) - sum(q) * sum(q))::DOUBLE
                          / (count(*)::DOUBLE * count(*)))
                         / 1000000000000.0, 6) AS var,
                   min(q)::BIGINT AS min_q, max(q)::BIGINT AS max_q
            FROM ev GROUP BY 1""",
        "pq_codes": """
            WITH cent AS (
              SELECT m, k, j,
                     (('0x' || substr(sha256('pqc|' || m || '|' || k || '|'
                                             || j || '|42'), 1, 8))::UBIGINT
                      % 1000001)::BIGINT - 500000 AS c
              FROM range(8) t1(m), range(16) t2(k), range(8) t3(j)),
            ev AS (SELECT vec_id,
                          generate_subscripts(embedding, 1) - 1 AS dim,
                          CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                               * 1000000.0) AS BIGINT) AS q
                   FROM embeddings),
            d AS (SELECT ev.vec_id, cent.m, cent.k,
                         sum((ev.q - cent.c) * (ev.q - cent.c)) AS dist
                  FROM ev JOIN cent ON cent.m = ev.dim // 8
                                   AND cent.j = ev.dim % 8
                  GROUP BY 1, 2, 3),
            best AS (SELECT vec_id, m, k,
                            row_number() OVER (PARTITION BY vec_id, m
                                               ORDER BY dist, k) AS rn
                     FROM d)
            SELECT vec_id, string_agg(k::VARCHAR, '_' ORDER BY m) AS pq_code
            FROM best WHERE rn = 1 GROUP BY vec_id""",
        # ADC reuses the pq relation twice: `code` is each vector's
        # assignment, and the same d rows ARE the query lookup tables
        "ann_pq": """
            WITH cent AS (
              SELECT m, k, j,
                     (('0x' || substr(sha256('pqc|' || m || '|' || k || '|'
                                             || j || '|42'), 1, 8))::UBIGINT
                      % 1000001)::BIGINT - 500000 AS c
              FROM range(8) t1(m), range(16) t2(k), range(8) t3(j)),
            ev AS (SELECT vec_id,
                          generate_subscripts(embedding, 1) - 1 AS dim,
                          CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                               * 1000000.0) AS BIGINT) AS q
                   FROM embeddings),
            d AS MATERIALIZED (SELECT ev.vec_id, cent.m, cent.k,
                         sum((ev.q - cent.c) * (ev.q - cent.c)) AS dist
                  FROM ev JOIN cent ON cent.m = ev.dim // 8
                                   AND cent.j = ev.dim % 8
                  GROUP BY 1, 2, 3),
            code AS (SELECT vec_id, m, k FROM d
                     QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                                ORDER BY dist, k) = 1),
            adc AS (SELECT qd.vec_id AS query_id, c.vec_id AS neighbor_id,
                           sum(qd.dist)::BIGINT AS adc
                    FROM code c JOIN d qd ON qd.m = c.m AND qd.k = c.k
                    WHERE qd.vec_id IN (0, 1, 2, 3, 4)
                      AND c.vec_id <> qd.vec_id
                    GROUP BY 1, 2)
            SELECT query_id, neighbor_id, adc FROM adc
            QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY adc, neighbor_id) <= 5""",
        # IVF-PQ: the ann_ivf coarse assignment/probe CTEs restrict which
        # candidates enter the ann_pq ADC relation
        "ann_ivfpq": """
            WITH cent AS (
              SELECT m, k, j,
                     (('0x' || substr(sha256('pqc|' || m || '|' || k || '|'
                                             || j || '|42'), 1, 8))::UBIGINT
                      % 1000001)::BIGINT - 500000 AS c
              FROM range(8) t1(m), range(16) t2(k), range(8) t3(j)),
            ev AS (SELECT vec_id,
                          generate_subscripts(embedding, 1) - 1 AS dim,
                          CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                               * 1000000.0) AS BIGINT) AS q
                   FROM embeddings),
            d AS MATERIALIZED (SELECT ev.vec_id, cent.m, cent.k,
                         sum((ev.q - cent.c) * (ev.q - cent.c)) AS dist
                  FROM ev JOIN cent ON cent.m = ev.dim // 8
                                   AND cent.j = ev.dim % 8
                  GROUP BY 1, 2, 3),
            code AS (SELECT vec_id, m, k FROM d
                     QUALIFY row_number() OVER (PARTITION BY vec_id, m
                                                ORDER BY dist, k) = 1),
            cc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
                   FROM embeddings WHERE vec_id < 16),
            sims AS (SELECT e.vec_id, cc.cid,
                            list_cosine_similarity(e.embedding::DOUBLE[],
                                                   cc.ce) AS s
                     FROM embeddings e, cc),
            assign AS (SELECT vec_id, cid FROM sims
                       QUALIFY row_number() OVER (PARTITION BY vec_id
                           ORDER BY s DESC, cid) = 1),
            qprobe AS (SELECT vec_id AS query_id, cid FROM sims
                       WHERE vec_id IN (0, 1, 2, 3, 4)
                       QUALIFY row_number() OVER (PARTITION BY vec_id
                           ORDER BY s DESC, cid) <= 4),
            adc AS (SELECT qd.vec_id AS query_id, c.vec_id AS neighbor_id,
                           sum(qd.dist)::BIGINT AS adc
                    FROM code c
                    JOIN d qd ON qd.m = c.m AND qd.k = c.k
                    JOIN assign a ON a.vec_id = c.vec_id
                    JOIN qprobe qp ON qp.cid = a.cid
                                  AND qp.query_id = qd.vec_id
                    WHERE qd.vec_id IN (0, 1, 2, 3, 4)
                      AND c.vec_id <> qd.vec_id
                    GROUP BY 1, 2)
            SELECT query_id, neighbor_id, adc FROM adc
            QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY adc, neighbor_id) <= 5""",
        "readability": f"""
            WITH w AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
            syl AS (SELECT doc_id,
                           count(*)::BIGINT AS words,
                           sum(greatest(1, len(regexp_extract_all(
                               lower(w), '[aeiouy]+'))))::BIGINT AS syls
                    FROM w GROUP BY 1),
            s AS (SELECT doc_id,
                         greatest(1, len(regexp_extract_all(
                             text, '[.!?]+')))::BIGINT AS sents
                  FROM documents)
            SELECT syl.doc_id,
                   round(0.39 * (words::DOUBLE / sents)
                         + 11.8 * (syls::DOUBLE / words) - 15.59, 4)
                       AS fk_grade
            FROM syl JOIN s USING (doc_id)""",
        "unigram_logprob": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
            c AS (SELECT t, count(*) AS n FROM tok GROUP BY 1),
            tot AS (SELECT sum(n)::DOUBLE AS s FROM c)
            SELECT doc_id, round(avg(-log2(c.n / tot.s)), 4) AS mean_nll
            FROM tok JOIN c ON c.t = tok.t, tot
            GROUP BY doc_id""",
        "bm25_scores": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
            dl AS (SELECT doc_id, count(*)::DOUBLE AS d FROM tok GROUP BY 1),
            stats AS (SELECT count(*)::DOUBLE AS n, avg(d) AS avgdl FROM dl),
            df AS (SELECT t, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
                   WHERE t IN ('data', 'query', 'spark') GROUP BY 1),
            tf AS (SELECT doc_id, t, count(*)::DOUBLE AS f FROM tok
                   WHERE t IN ('data', 'query', 'spark') GROUP BY 1, 2)
            SELECT tf.doc_id,
                   round(sum(ln((n - df.df + 0.5) / (df.df + 0.5) + 1.0)
                             * f * 2.2
                             / (f + 1.2 * (0.25 + 0.75 * dl.d / avgdl))),
                         4) AS bm25
            FROM tf JOIN df ON tf.t = df.t
                    JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN stats
            GROUP BY tf.doc_id""",
        "dsir_weights": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
            tgt AS (SELECT doc_id FROM tok WHERE t IN ('the', 'a')
                    GROUP BY doc_id HAVING count(*) >= 2),
            feat AS (SELECT doc_id,
                            (('0x' || substr(sha256(t), 1, 8))::UBIGINT
                             % 1024)::BIGINT AS b
                     FROM tok),
            braw AS (SELECT b, count(*)::DOUBLE AS n_r FROM feat GROUP BY 1),
            btgt AS (SELECT b, count(*)::DOUBLE AS n_t FROM feat
                     WHERE doc_id IN (SELECT doc_id FROM tgt) GROUP BY 1),
            tot AS (SELECT (SELECT count(*) FROM feat
                            WHERE doc_id IN (SELECT doc_id FROM tgt))::DOUBLE
                               AS tt,
                           (SELECT count(*) FROM feat)::DOUBLE AS rr),
            lr AS (SELECT braw.b,
                          log2((coalesce(n_t, 0) + 1.0) / (tt + 1024.0))
                        - log2((n_r + 1.0) / (rr + 1024.0)) AS w
                   FROM braw LEFT JOIN btgt ON braw.b = btgt.b
                   CROSS JOIN tot)
            SELECT feat.doc_id, round(avg(w), 4) AS dsir_logratio
            FROM feat JOIN lr ON feat.b = lr.b
            GROUP BY feat.doc_id""",
        "bigram_logprob": _BIGRAM_NLL_SQL,
        # the join-mode twin computes the identical number, so it shares
        # the oracle — both rows must hash-match the same SQL
        "bigram_logprob_join": _BIGRAM_NLL_SQL,
        "cms_registers": f"""
            WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
            cnt AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
            cells AS (SELECT r,
                        ('0x' || substr(sha256('cms|' || r::VARCHAR || '|'
                         || t), 1, 16))::UBIGINT % 1024 AS col, n
                      FROM cnt, (SELECT unnest(range(0, 4)) AS r))
            SELECT r::BIGINT AS "row", col::BIGINT AS col,
                   sum(n)::BIGINT AS n
            FROM cells GROUP BY 1, 2""",
        "cms_estimates": f"""
            WITH tok AS (SELECT unnest({_TOKS}) AS t FROM documents),
            cnt AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
            cells AS (SELECT r,
                        ('0x' || substr(sha256('cms|' || r::VARCHAR || '|'
                         || t), 1, 16))::UBIGINT % 1024 AS col, n
                      FROM cnt, (SELECT unnest(range(0, 4)) AS r)),
            regs AS (SELECT r, col, sum(n) AS n FROM cells GROUP BY 1, 2),
            probes(token) AS (VALUES ('table'), ('query'), ('spark'),
                              ('value'), ('xyzzy')),
            pcell AS (SELECT token, r,
                        ('0x' || substr(sha256('cms|' || r::VARCHAR || '|'
                         || token), 1, 16))::UBIGINT % 1024 AS col
                      FROM probes, (SELECT unnest(range(0, 4)) AS r))
            SELECT token, min(coalesce(regs.n, 0))::BIGINT AS est
            FROM pcell LEFT JOIN regs
              ON regs.r = pcell.r AND regs.col = pcell.col
            GROUP BY token""",
        "bloom_contamination": """
            WITH probe AS (SELECT doc_id, text FROM documents
                           WHERE doc_id % 3 = 0),
            train AS (SELECT DISTINCT text FROM documents
                      WHERE doc_id % 3 <> 0),
            tpos AS (SELECT DISTINCT
                       ('0x' || substr(sha256('bloom|' || i::VARCHAR || '|'
                        || text), 1, 16))::UBIGINT % 16384 AS p
                     FROM train, (SELECT unnest(range(0, 4)) AS i)),
            ppos AS (SELECT doc_id,
                       ('0x' || substr(sha256('bloom|' || i::VARCHAR || '|'
                        || text), 1, 16))::UBIGINT % 16384 AS p
                     FROM probe, (SELECT unnest(range(0, 4)) AS i))
            SELECT doc_id,
                   min(CASE WHEN t.p IS NULL THEN 0 ELSE 1 END)::BIGINT
                       AS bloom_hit
            FROM ppos LEFT JOIN tpos t USING (p)
            GROUP BY doc_id""",
        "hll_registers": f"""
            WITH tok AS (SELECT DISTINCT unnest({_TOKS}) AS t
                         FROM documents),
            h AS (SELECT ('0x' || substr(sha256(t), 1, 16))::UBIGINT AS h
                  FROM tok),
            r AS (SELECT (h >> 56)::BIGINT AS register,
                         (h % 72057594037927936)::UBIGINT AS w FROM h)
            SELECT register,
                   max(CASE WHEN w = 0 THEN 57
                            ELSE 57 - length(bin(w)) END)::BIGINT AS max_rank
            FROM r GROUP BY register""",
        "hll_estimate": f"""
            WITH tok AS (SELECT DISTINCT unnest({_TOKS}) AS t
                         FROM documents),
            h AS (SELECT ('0x' || substr(sha256(t), 1, 16))::UBIGINT AS h
                  FROM tok),
            r AS (SELECT (h >> 56)::BIGINT AS register,
                         (h % 72057594037927936)::UBIGINT AS w FROM h),
            regs AS (SELECT register,
                            max(CASE WHEN w = 0 THEN 57
                                ELSE 57 - length(bin(w)) END) AS m
                     FROM r GROUP BY register),
            s AS (SELECT sum(power(2.0, -m)) AS sp, count(*) AS np
                  FROM regs),
            e AS (SELECT ({corpus_mod.HLL_ALPHA!r}::DOUBLE * 65536.0)
                             / (sp + (256 - np)) AS raw,
                         256 - np AS zeros, np FROM s)
            SELECT round(CASE WHEN raw <= 2.5 * 256 AND zeros > 0
                              THEN 256 * ln(256.0 / zeros)
                              ELSE raw END, 4) AS estimate,
                   np::BIGINT AS n_registers_hit
            FROM e""",
        "hll_user_counts": f"""
            WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
            h AS (SELECT event_type,
                         ('0x' || substr(sha256(user_id::VARCHAR), 1, 16))
                             ::UBIGINT AS h
                  FROM u),
            r AS (SELECT event_type, (h >> 56)::BIGINT AS register,
                         (h % 72057594037927936)::UBIGINT AS w FROM h),
            regs AS (SELECT event_type, register,
                            max(CASE WHEN w = 0 THEN 57
                                ELSE 57 - length(bin(w)) END) AS m
                     FROM r GROUP BY event_type, register),
            s AS (SELECT event_type, sum(power(2.0, -m)) AS sp,
                         count(*) AS np
                  FROM regs GROUP BY event_type),
            e AS (SELECT event_type,
                         ({corpus_mod.HLL_ALPHA!r}::DOUBLE * 65536.0)
                             / (sp + (256 - np)) AS raw,
                         256 - np AS zeros, np FROM s)
            SELECT event_type,
                   round(CASE WHEN raw <= 2.5 * 256 AND zeros > 0
                              THEN 256 * ln(256.0 / zeros)
                              ELSE raw END, 4) AS estimate,
                   np::BIGINT AS n_registers_hit
            FROM e""",
        "tfidf_top_terms": f"""
            WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
            tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
            dlen AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
            df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
            nd AS (SELECT count(*) AS n FROM documents),
            s AS (SELECT tf.doc_id, tf.t,
                         (tf.tf::DOUBLE / dlen.n) * ln(nd.n::DOUBLE / df.df)
                             AS raw
                  FROM tf JOIN dlen USING (doc_id) JOIN df USING (t), nd)
            SELECT doc_id, t AS term, round(raw, 4) AS score
            FROM s QUALIFY ROW_NUMBER() OVER
                (PARTITION BY doc_id ORDER BY raw DESC, t) = 1""",
        "chunk_documents": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            c AS (SELECT doc_id, toks,
                         unnest(range(0, greatest(1, len(toks) - 16), 48)) AS s
                  FROM t WHERE len(toks) > 0)
            SELECT doc_id, (s // 48)::INT AS chunk_idx,
                   array_to_string(list_slice(toks, s + 1, s + 64), ' ') AS text,
                   least(64, len(toks) - s)::BIGINT AS n_tokens
            FROM c""",
        "repetition_ratio": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            g AS (SELECT doc_id, len(toks) - 1 AS total,
                         unnest(list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i + 1])) AS gram
                  FROM t WHERE len(toks) >= 2),
            c AS (SELECT doc_id, max(total) AS total, gram, count(*) AS n
                  FROM g GROUP BY doc_id, gram),
            m AS (SELECT doc_id,
                         round(max(n) / max(total)::DOUBLE, 4) AS rep_ratio
                  FROM c GROUP BY 1)
            SELECT t.doc_id, coalesce(m.rep_ratio, 0.0) AS rep_ratio
            FROM t LEFT JOIN m ON m.doc_id = t.doc_id""",
        "redact_pii": """
            WITH b AS (SELECT i,
              (['alpha', 'beta', 'gamma', 'delta'])[
                  (('0x' || substr(sha256('pii_w|42|' || i::VARCHAR), 1, 8)
                   )::UBIGINT % 4 + 1)::INT] AS w,
              substr(sha256('pii_e|42|' || i::VARCHAR), 1, 8)
                  < '4ccccccc' AS he,
              substr(sha256('pii_n|42|' || i::VARCHAR), 1, 8)
                  < '80000000' AS hn,
              ('0x' || substr(sha256('pii_u|42|' || i::VARCHAR), 1, 8)
               )::UBIGINT % 100000 AS u,
              ('0x' || substr(sha256('pii_m|42|' || i::VARCHAR), 1, 8)
               )::UBIGINT % 10 AS m,
              lpad((('0x' || substr(sha256('pii_d|42|' || i::VARCHAR), 1, 8)
                    )::UBIGINT % 1000000000)::VARCHAR, 9, '0') AS d
              FROM range(2000) t(i)),
            docs AS (SELECT i AS doc_id,
              w || CASE WHEN he THEN ' contact user' || u::VARCHAR
                        || '@mail' || m::VARCHAR || '.com' ELSE '' END
                || CASE WHEN hn THEN ' ref ' || d ELSE '' END
                || ' end' AS text
              FROM b),
            r AS (SELECT doc_id,
              len(regexp_extract_all(text, '<EPAT>')) AS n_emails,
              regexp_replace(text, '<EPAT>', '[EMAIL]', 'g') AS t1
              FROM docs)
            SELECT doc_id,
                   regexp_replace(t1, '<NPAT>', '[NUM]', 'g') AS clean_text,
                   n_emails::BIGINT AS n_emails,
                   len(regexp_extract_all(t1, '<NPAT>'))::BIGINT AS n_numbers
            FROM r""".replace(
                "<EPAT>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
            ).replace("<NPAT>", r"\d{7,}"),
        "exact_dedup": """
            SELECT sha256(text) AS text_hash, min(doc_id) AS doc_id
            FROM documents GROUP BY 1""",
        "minhash_dedup": f"""
            WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
            sigs AS (SELECT doc_id,
                            array_to_string({_MINHASH8}, '_') AS sig FROM g)
            SELECT sig, min(doc_id) AS doc_id FROM sigs GROUP BY 1""",
        "lsh_candidate_pairs": f"""
            WITH {_LSH_CTES}
            SELECT doc_a, doc_b, round(jac, 4) AS jaccard
            FROM j WHERE jac >= 0.6""",
        "neardup_keep": f"""
            WITH {_LSH_CTES}
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT doc_b FROM j WHERE jac >= 0.6)""",
        "neardup_components": f"""
            WITH RECURSIVE {_LSH_CTES},
            vp AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.6),
            e AS (SELECT doc_a AS a, doc_b AS b FROM vp
                  UNION ALL SELECT doc_b, doc_a FROM vp),
            nodes AS (SELECT DISTINCT a AS node FROM e),
            reach(node, label) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.node)
            SELECT node AS doc_id, min(label) AS component
            FROM reach GROUP BY 1""",
        # star contraction computes the same min-id components
        "neardup_components_star": f"""
            WITH RECURSIVE {_LSH_CTES},
            vp AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.6),
            e AS (SELECT doc_a AS a, doc_b AS b FROM vp
                  UNION ALL SELECT doc_b, doc_a FROM vp),
            nodes AS (SELECT DISTINCT a AS node FROM e),
            reach(node, label) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.node)
            SELECT node AS doc_id, min(label) AS component
            FROM reach GROUP BY 1""",
        "neardup_keep_best": f"""
            WITH RECURSIVE {_LSH_CTES},
            vp AS (SELECT doc_a, doc_b FROM j WHERE jac >= 0.6),
            e AS (SELECT doc_a AS a, doc_b AS b FROM vp
                  UNION ALL SELECT doc_b, doc_a FROM vp),
            nodes AS (SELECT DISTINCT a AS node FROM e),
            reach(node, label) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT e.b, r.label FROM reach r JOIN e ON e.a = r.node),
            comp AS (SELECT node AS doc_id, min(label) AS component
                     FROM reach GROUP BY 1),
            q AS (SELECT doc_id,
                         round(0.4 * least(1.0, len(toks) / 60.0)
                               + 0.3 * (1.0 - len(list_filter(toks,
                                     t -> t IN ('the', 'a')))
                                     / len(toks)::DOUBLE)
                               + 0.3 * (len(list_distinct(toks))
                                     / len(toks)::DOUBLE), 4) AS quality
                  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
                  WHERE len(toks) > 0),
            best AS (SELECT comp.doc_id
                     FROM comp JOIN q USING (doc_id)
                     QUALIFY row_number() OVER (PARTITION BY component
                             ORDER BY quality DESC, comp.doc_id) = 1)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM comp)
            UNION ALL SELECT doc_id FROM best""",
        "bottomk_sample": """
            SELECT doc_id,
                   substr(sha256('sample|42|' || doc_id::VARCHAR), 1, 16)
                       AS sample_rank
            FROM documents ORDER BY sample_rank LIMIT 50""",
        "hash_split": """
            SELECT doc_id,
                   CASE WHEN substr(sha256('split|42|' || doc_id::VARCHAR),
                             1, 8) < '<THRV>' THEN 'val'
                        WHEN substr(sha256('split|42|' || doc_id::VARCHAR),
                             1, 8) < '<THRT>' THEN 'test'
                        ELSE 'train' END AS split
            FROM documents""".replace("<THRV>", _hex8(0.1))
                            .replace("<THRT>", _hex8(0.2)),
        "pack_sequences": f"""
            WITH t AS (SELECT doc_id, len({_TOKS})::BIGINT AS n_tokens
                       FROM documents)
            SELECT doc_id, n_tokens,
                   ((sum(n_tokens) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) // 256)::BIGINT AS bin
            FROM t""",
        # temperature mixing: thresholds derived from the data (per-source
        # counts), identical pow/floor/to_hex arithmetic to the engine
        "temperature_mix": """
            WITH c AS (SELECT source, count(*)::DOUBLE AS n
                       FROM documents GROUP BY 1),
            t AS (SELECT sum(n) AS tot, sum(pow(n, 0.5)) AS ws FROM c),
            thr AS (SELECT source,
                           lower(lpad(to_hex(least(4294967295,
                                floor(least(1.0, 0.5 * tot * (pow(n, 0.5)
                                      / ws) / n) * 4294967296))::BIGINT),
                                8, '0')) AS h
                    FROM c, t)
            SELECT d.doc_id, d.source
            FROM documents d JOIN thr ON thr.source = d.source
            WHERE substr(sha256('mix|42|' || d.doc_id::VARCHAR), 1, 8)
                  < thr.h""",
        "weighted_sample": """
            WITH t AS (
                SELECT source, doc_id,
                       round(ln((('0x' || substr(sha256(
                                     'ws|42|' || doc_id::VARCHAR), 1, 8)
                                 )::UBIGINT + 1) / 4294967296.0)
                             / n_chars, 6) AS es_key
                FROM documents WHERE n_chars > 0)
            SELECT source, doc_id, es_key,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY es_key DESC, doc_id) AS rk
            FROM t QUALIFY rk <= 20""",
        "source_cap": """
            SELECT source, doc_id, cap_rank,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY cap_rank, doc_id) AS rn
            FROM (SELECT source, doc_id,
                         substr(sha256('cap|42|' || doc_id::VARCHAR),
                                1, 16) AS cap_rank
                  FROM documents)
            QUALIFY rn <= 10""",
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE substr(sha256('ssamp|42|' || doc_id::VARCHAR), 1, 8) <
                  CASE source WHEN 'src0' THEN '<T02>'
                              WHEN 'src1' THEN '<T08>'
                              ELSE '<T05>' END""".replace(
                "<T02>", _hex8(0.2)).replace(
                "<T08>", _hex8(0.8)).replace("<T05>", _hex8(0.5)),
        "label_centroids": """
            WITH e AS (SELECT label::BIGINT AS label,
                              embedding::DOUBLE[] AS v FROM embeddings),
            d AS (SELECT label, unnest(v) AS x,
                         unnest(range(1, 65)) AS dim FROM e)
            SELECT label, dim::BIGINT AS dim, round(avg(x), 6) AS c
            FROM d GROUP BY 1, 2""",
        "prototypicality": """
            WITH e AS (SELECT vec_id, label::BIGINT AS label,
                              embedding::DOUBLE[] AS v FROM embeddings),
            d AS (SELECT label, unnest(v) AS x,
                         unnest(range(1, 65)) AS dim FROM e),
            cent AS (SELECT label, dim, round(avg(x), 6) AS c
                     FROM d GROUP BY 1, 2),
            vd AS (SELECT vec_id, label, unnest(v) AS x,
                          unnest(range(1, 65)) AS dim FROM e),
            j AS (SELECT vec_id, sum(x * c) AS dot, sum(x * x) AS nv,
                         sum(c * c) AS nc
                  FROM vd JOIN cent ON vd.label = cent.label
                                   AND vd.dim = cent.dim
                  GROUP BY 1)
            SELECT vec_id, round(dot / (sqrt(nv) * sqrt(nc)), 4) AS proto
            FROM j""",
        "quantize_embeddings": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
                       FROM embeddings),
            m AS (SELECT vec_id, v, list_aggregate(v, 'min') AS mn,
                         list_aggregate(v, 'max') AS mx FROM e)
            SELECT vec_id, mn AS vmin, mx AS vmax,
                   CASE WHEN mx = mn
                        THEN array_to_string(list_transform(v, x -> 0), '_')
                        ELSE array_to_string(list_transform(v,
                             x -> round((x - mn) * 255.0
                                        / (mx - mn))::BIGINT), '_')
                   END AS codes
            FROM m""",
        "random_projection": """
            WITH comp AS (
              SELECT vec_id, i, embedding[i + 1]::DOUBLE AS x
              FROM embeddings,
                   LATERAL (SELECT unnest(range(0, len(embedding)))
                            AS i) t),
            terms AS (
              -- scaled-int64 contract: floor(x*1e6) BIGINT terms sum
              -- order-free; one float division + round finalizes (matches
              -- the engine's integer matmul bit-for-bit)
              SELECT vec_id, j,
                     floor(x * 1e6)::BIGINT
                     * (CASE WHEN ('0x' || substr(sha256('proj|42|'
                              || i::VARCHAR || '|' || j::VARCHAR), 1, 8))
                              ::UBIGINT % 2 = 0
                          THEN 1 ELSE -1 END) AS term
              FROM comp, (SELECT unnest(range(0, 8)) AS j))
            SELECT vec_id, j, round(sum(term) / 1000000.0, 4) AS p
            FROM terms GROUP BY 1, 2""",
        "top_ngrams": f"""
            SELECT gram, count(*)::BIGINT AS n
            FROM (SELECT unnest({_grams_sql(2)}) AS gram FROM documents)
            GROUP BY 1 ORDER BY n DESC, gram LIMIT 20""",
        "bpe_pair_counts": f"""
            WITH wc AS (SELECT tok AS w, count(*)::BIGINT AS c
                        FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
                        GROUP BY 1),
            p AS (SELECT substr(w, i::INT, 1) AS l,
                         substr(w, i::INT + 1, 1) AS r,
                         sum(c)::BIGINT AS cnt
                  FROM wc,
                       LATERAL (SELECT unnest(range(1, length(w))) AS i) t
                  GROUP BY 1, 2)
            SELECT l, r, cnt FROM p ORDER BY cnt DESC, l, r LIMIT 30""",
        "bpe_merges": _bpe_sql(6),
        "freq_spectrum": f"""
            WITH c AS (SELECT tok, count(*) AS f
                       FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
                       GROUP BY 1)
            SELECT f::BIGINT AS freq, count(*)::BIGINT AS n_tokens
            FROM c GROUP BY 1""",
        "vocab_ids": f"""
            WITH toks AS (SELECT DISTINCT tok
                          FROM (SELECT unnest({_TOKS}) AS tok
                                FROM documents)),
            b AS (SELECT tok,
                         ('0x' || substr(sha256(tok), 1, 8))::UBIGINT % 256
                             AS bucket
                  FROM toks)
            SELECT tok, (row_number() OVER (ORDER BY bucket, tok)
                         - 1)::BIGINT AS id
            FROM b""",
        "encode_documents": f"""
            WITH toks AS (SELECT DISTINCT tok
                          FROM (SELECT unnest({_TOKS}) AS tok
                                FROM documents)),
            b AS (SELECT tok,
                         ('0x' || substr(sha256(tok), 1, 8))::UBIGINT % 256
                             AS bucket
                  FROM toks),
            v AS (SELECT tok, (row_number() OVER (ORDER BY bucket, tok)
                               - 1)::BIGINT AS id
                  FROM b),
            t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
            ix AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i
                   FROM t),
            occ AS (SELECT doc_id, tk[i] AS tok, i FROM ix)
            SELECT occ.doc_id,
                   string_agg(v.id::VARCHAR, '_' ORDER BY occ.i) AS ids,
                   count(*)::BIGINT AS n_tokens
            FROM occ JOIN v USING (tok)
            GROUP BY 1""",
        "source_similarity": f"""
            WITH ranks AS (
              SELECT DISTINCT source, substr(sha256(tok), 1, 16) AS r
              FROM (SELECT source, unnest({_TOKS}) AS tok FROM documents)),
            sk AS (SELECT source, r FROM ranks
                   QUALIFY row_number() OVER (PARTITION BY source
                                              ORDER BY r) <= 256),
            srcs AS (SELECT DISTINCT source FROM sk),
            prs AS (SELECT a.source AS sa, b.source AS sb
                    FROM srcs a JOIN srcs b ON a.source < b.source),
            mer AS (SELECT p.sa, p.sb, s.r,
                           max(CASE WHEN s.source = p.sa
                                    THEN 1 ELSE 0 END) AS in_a,
                           max(CASE WHEN s.source = p.sb
                                    THEN 1 ELSE 0 END) AS in_b
                    FROM prs p JOIN sk s ON s.source IN (p.sa, p.sb)
                    GROUP BY 1, 2, 3),
            top AS (SELECT *, row_number() OVER (PARTITION BY sa, sb
                                                 ORDER BY r) AS rn
                    FROM mer)
            SELECT sa AS source_a, sb AS source_b,
                   round(sum(in_a * in_b)::DOUBLE / count(*), 6)
                       AS est_jaccard,
                   count(*)::BIGINT AS k_used
            FROM top WHERE rn <= 256 GROUP BY 1, 2""",
        "corpus_diff": """
            WITH a AS (SELECT doc_id, sha256(text) AS h FROM documents),
            b0 AS (SELECT doc_id,
                          text || CASE WHEN doc_id % 7 = 0
                                       THEN ' v2' ELSE '' END AS text
                   FROM documents WHERE doc_id % 13 <> 0
                   UNION ALL
                   SELECT doc_id + 10000000, text FROM documents
                   WHERE doc_id % 11 = 0),
            b AS (SELECT doc_id, sha256(text) AS h FROM b0)
            SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM a FULL JOIN b ON a.doc_id = b.doc_id
            WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.h <> b.h""",
        "source_unigram_kl": f"""
            WITH c AS (SELECT source, tok, count(*) AS cst
                       FROM (SELECT source, unnest({_TOKS}) AS tok
                             FROM documents)
                       GROUP BY 1, 2),
            ts AS (SELECT source, sum(cst) AS t_s FROM c GROUP BY 1),
            ct AS (SELECT tok, sum(cst) AS ctot FROM c GROUP BY 1),
            tot AS (SELECT sum(cst)::DOUBLE AS t FROM c)
            SELECT c.source,
                   round(sum((cst / t_s)
                             * log2((cst / t_s) / (ctot / t))), 6)
                       AS kl_bits,
                   t_s::BIGINT AS n_tokens
            FROM c JOIN ts USING (source) JOIN ct USING (tok)
                 CROSS JOIN tot
            GROUP BY c.source, t_s""",
        "cross_source_overlap": """
            WITH hs AS (SELECT DISTINCT sha256(text) AS h, source
                        FROM documents)
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*)::BIGINT AS n_hashes
            FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2""",
        "simhash": """
            WITH t AS (SELECT doc_id,
                         unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS tok FROM documents),
            h AS (SELECT doc_id,
                         ('0x' || substr(sha256(tok || '#42'), 1, 16))::UBIGINT AS hv
                  FROM t),
            bits AS (SELECT doc_id, b,
                            sum(CASE WHEN ((hv >> b) & 1) = 1 THEN 1 ELSE -1 END) AS vote
                     FROM h, (SELECT unnest(range(0, 64)) AS b) GROUP BY 1, 2),
            v AS (SELECT doc_id,
                         sum(CASE WHEN vote > 0 THEN (1::UBIGINT << b)::HUGEINT
                                  ELSE 0 END) AS sh
                  FROM bits GROUP BY 1)
            SELECT doc_id,
                   lpad(lower(to_hex(sh::UBIGINT)), 16, '0') AS simhash_hex
            FROM v""",
        # the engine side is prefix-filtered (SSJoin); the oracle is the
        # brute-force global quadratic the filter must reproduce exactly
        "set_similarity_join": f"""
            WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         len(list_intersect(a.grams, b.grams))::DOUBLE
                         / len(list_distinct(list_concat(a.grams, b.grams))) AS jac
                  FROM g a JOIN g b ON a.doc_id < b.doc_id
                  WHERE len(a.grams) > 0 AND len(b.grams) > 0)
            SELECT doc_a, doc_b, round(jac, 4) AS jaccard
            FROM p WHERE jac >= 0.6""",
        "ngram_jaccard_pairs": f"""
            WITH g AS (SELECT doc_id, source, {_GRAMS} AS grams FROM documents),
            p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                         len(list_intersect(a.grams, b.grams))::DOUBLE
                         / len(list_distinct(list_concat(a.grams, b.grams))) AS jac
                  FROM g a JOIN g b
                    ON a.source = b.source AND a.doc_id < b.doc_id)
            SELECT doc_a, doc_b, round(jac, 4) AS jaccard
            FROM p WHERE jac >= 0.5""",
        # ordered-pair containment |A∩B|/|A| within a source block
        "containment_pairs": f"""
            WITH g AS (SELECT doc_id, source, {_GRAMS} AS grams
                       FROM documents),
            p AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
                         len(list_intersect(a.grams, b.grams))::DOUBLE
                         / len(a.grams) AS cont
                  FROM g a JOIN g b
                    ON a.source = b.source AND a.doc_id <> b.doc_id
                  WHERE len(a.grams) > 0)
            SELECT doc_sub, doc_super, round(cont, 4) AS containment
            FROM p WHERE cont >= 0.8""",
        "containment_join": f"""
            WITH g AS (SELECT doc_id, {_GRAMS} AS grams FROM documents),
            p AS (SELECT a.doc_id AS doc_sub, b.doc_id AS doc_super,
                         len(list_intersect(a.grams, b.grams))::DOUBLE
                         / len(a.grams) AS cont
                  FROM g a JOIN g b ON a.doc_id <> b.doc_id
                  WHERE len(a.grams) > 0)
            SELECT doc_sub, doc_super, round(cont, 4) AS containment
            FROM p WHERE cont >= 0.8""",
        # quadratic levenshtein self-join — the engine's deletion-
        # neighborhood blocking must reproduce it exactly
        "fuzzy_name_pairs": """
            WITH w AS (SELECT DISTINCT p_name AS name FROM part)
            SELECT a.name AS name_a, b.name AS name_b
            FROM w a JOIN w b
              ON a.name < b.name AND levenshtein(a.name, b.name) <= 1""",
        # exact integer moment registers (BIGINT->HUGEINT widening mirrors
        # the engine's Python-int partials); r is one double expression
        "numeric_correlation_matrix": """
            WITH q AS (SELECT floor(l_quantity*100 + 0.5)::HUGEINT AS c0,
                              floor(l_extendedprice*100 + 0.5)::HUGEINT AS c1,
                              floor(l_discount*100 + 0.5)::HUGEINT AS c2,
                              floor(l_tax*100 + 0.5)::HUGEINT AS c3
                       FROM lineitem),
            s AS (
              SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
                     count(*)::HUGEINT AS n, sum(c0) AS sx, sum(c1) AS sy,
                     sum(c0*c1) AS sxy, sum(c0*c0) AS sx2, sum(c1*c1) AS sy2
              FROM q
              UNION ALL
              SELECT 'l_quantity', 'l_discount', count(*)::HUGEINT,
                     sum(c0), sum(c2), sum(c0*c2), sum(c0*c0), sum(c2*c2)
              FROM q
              UNION ALL
              SELECT 'l_quantity', 'l_tax', count(*)::HUGEINT,
                     sum(c0), sum(c3), sum(c0*c3), sum(c0*c0), sum(c3*c3)
              FROM q
              UNION ALL
              SELECT 'l_extendedprice', 'l_discount', count(*)::HUGEINT,
                     sum(c1), sum(c2), sum(c1*c2), sum(c1*c1), sum(c2*c2)
              FROM q
              UNION ALL
              SELECT 'l_extendedprice', 'l_tax', count(*)::HUGEINT,
                     sum(c1), sum(c3), sum(c1*c3), sum(c1*c1), sum(c3*c3)
              FROM q
              UNION ALL
              SELECT 'l_discount', 'l_tax', count(*)::HUGEINT,
                     sum(c2), sum(c3), sum(c2*c3), sum(c2*c2), sum(c3*c3)
              FROM q)
            SELECT col_x, col_y, n::BIGINT AS n_rows,
                   round((n*sxy - sx*sy)::DOUBLE
                         / (sqrt((n*sx2 - sx*sx)::DOUBLE)
                            * sqrt((n*sy2 - sy*sy)::DOUBLE)), 4) AS r
            FROM s""",
        "embedding_neardup_pairs": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                                                b.embedding::DOUBLE[]), 3) AS cos_sim
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.35""",
        # the SQL twin compares the 8-token spans directly (the engine's
        # 64-bit sha window key is collision-free at any realistic scale)
        "dup_span_stats": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents),
            ix AS (SELECT doc_id, l, unnest(range(1, len(l) - 6)) AS i
                   FROM t WHERE len(l) >= 8),
            w AS (SELECT doc_id,
                         array_to_string(list_slice(l, i, i + 7), ' ') AS s
                  FROM ix),
            dup AS (SELECT s FROM w GROUP BY s
                    HAVING count(DISTINCT doc_id) >= 2)
            SELECT doc_id, count(*)::BIGINT AS n_windows,
                   sum(CASE WHEN s IN (SELECT s FROM dup)
                       THEN 1 ELSE 0 END)::BIGINT AS dup_windows,
                   round(sum(CASE WHEN s IN (SELECT s FROM dup)
                         THEN 1 ELSE 0 END)::DOUBLE / count(*), 4)
                       AS dup_fraction
            FROM w GROUP BY 1""",
        "curate_corpus": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
            q AS (SELECT doc_id, text, toks FROM t
                  WHERE len(toks) BETWEEN 50 AND 100000
                    AND (list_sum(list_transform(toks, w -> len(w)))::DOUBLE
                         / len(toks)) BETWEEN 3.0 AND 10.0
                    AND ((len(text) - len(replace(text, '#', '')))
                         + (len(text) - len(replace(text, '...', ''))) / 3
                        )::DOUBLE / len(toks) <= 0.1
                    AND len(list_filter(toks,
                            w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                        / len(toks) >= 0.8
                    AND (list_contains(toks, 'the')::INT
                         + list_contains(toks, 'a')::INT
                         + list_contains(toks, 'be')::INT
                         + list_contains(toks, 'to')::INT
                         + list_contains(toks, 'of')::INT
                         + list_contains(toks, 'and')::INT
                         + list_contains(toks, 'that')::INT
                         + list_contains(toks, 'have')::INT
                         + list_contains(toks, 'with')::INT) >= 2),
            d AS (SELECT doc_id, toks FROM q
                  QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)),
            sp AS (SELECT doc_id, toks,
                   CASE WHEN substr(sha256('split|42|' || doc_id::VARCHAR),
                             1, 8) < '<THRV>' THEN 'val'
                        WHEN substr(sha256('split|42|' || doc_id::VARCHAR),
                             1, 8) < '<THRT>' THEN 'test'
                        ELSE 'train' END AS split
                   FROM d),
            w AS (SELECT doc_id, split,
                         array_to_string(list_slice(l, i, i + 7), ' ') AS s
                  FROM (SELECT doc_id, split, toks AS l,
                               unnest(range(1, len(toks) - 6)) AS i
                        FROM sp WHERE len(toks) >= 8 AND split <> 'val')),
            leak AS (SELECT DISTINCT s FROM w WHERE split = 'test'),
            bad AS (SELECT DISTINCT doc_id FROM w
                    WHERE split = 'train'
                      AND s IN (SELECT s FROM leak))
            SELECT doc_id, split FROM sp
            WHERE doc_id NOT IN (SELECT doc_id FROM bad)"""
            .replace("<THRV>", _hex8(0.1)).replace("<THRT>", _hex8(0.2)),
        "decontaminate": f"""
            WITH sp AS (SELECT doc_id, {_TOKS} AS l,
                   CASE WHEN substr(sha256('split|42|' || doc_id::VARCHAR),
                             1, 8) < '<THRV>' THEN 'val'
                        WHEN substr(sha256('split|42|' || doc_id::VARCHAR),
                             1, 8) < '<THRT>' THEN 'test'
                        ELSE 'train' END AS split
                   FROM documents),
            ix AS (SELECT doc_id, split, l, unnest(range(1, len(l) - 6)) AS i
                   FROM sp WHERE len(l) >= 8 AND split <> 'val'),
            w AS (SELECT doc_id, split,
                         array_to_string(list_slice(l, i, i + 7), ' ') AS s
                  FROM ix),
            leak AS (SELECT DISTINCT s FROM w WHERE split = 'test')
            SELECT doc_id, count(*)::BIGINT AS n_windows,
                   sum(CASE WHEN s IN (SELECT s FROM leak)
                       THEN 1 ELSE 0 END)::BIGINT AS contam_windows,
                   max(CASE WHEN s IN (SELECT s FROM leak)
                       THEN 1 ELSE 0 END)::BIGINT AS contaminated
            FROM w WHERE split = 'train'
            GROUP BY doc_id""".replace("<THRV>", _hex8(0.1))
                             .replace("<THRT>", _hex8(0.2)),
        # removal half of ExactSubstr: non-overlapping 8-token segments,
        # first corpus-wide occurrence (by doc_id, then position) survives
        "segment_dedup": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS l FROM documents),
            sg AS (SELECT doc_id, (s // 8)::BIGINT AS idx,
                          array_to_string(list_slice(l, s + 1, s + 8), ' ')
                              AS seg
                   FROM (SELECT doc_id, l, unnest(range(0, len(l), 8)) AS s
                         FROM t WHERE len(l) > 0)),
            m AS (SELECT seg, min(doc_id * 1048576 + idx) AS mp
                  FROM sg GROUP BY seg)
            SELECT doc_id,
                   coalesce(string_agg(CASE WHEN doc_id * 1048576 + idx = mp
                                       THEN sg.seg END, ' ' ORDER BY idx),
                            '') AS text_clean,
                   count(*)::BIGINT AS n_segs,
                   sum(CASE WHEN doc_id * 1048576 + idx = mp
                       THEN 1 ELSE 0 END)::BIGINT AS kept_segs
            FROM sg JOIN m ON sg.seg = m.seg
            GROUP BY doc_id""",
        "semantic_dedup": """
            WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
                       FROM embeddings WHERE vec_id < 16),
            sims AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS ve, c.cid,
                            list_cosine_similarity(e.embedding::DOUBLE[],
                                                   c.ce) AS s
                     FROM embeddings e, c),
            assign AS (SELECT vec_id, ve, cid FROM sims
                       QUALIFY row_number() OVER (PARTITION BY vec_id
                           ORDER BY s DESC, cid) = 1),
            dropped AS (SELECT b.vec_id FROM assign a JOIN assign b
                        ON a.cid = b.cid AND a.vec_id < b.vec_id
                        WHERE list_cosine_similarity(a.ve, b.ve) >= 0.35)
            SELECT vec_id FROM embeddings
            WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""",
        "ann_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
            s AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                         list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) AS sim
                  FROM q JOIN embeddings e ON e.vec_id != q.query_id)
            SELECT query_id, neighbor_id, round(sim, 3) AS cos_sim FROM s
            QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) <= 5""",
        "kg_flagship_exact": flagship_exact_sql(what="triples"),
        # the incremental append must land on EXACTLY the batch result —
        # same oracle statement, different (delta-linked) execution
        "kg_incremental_append": flagship_exact_sql(what="triples"),
        "kg_flagship_exact_edges": flagship_exact_sql(what="edges"),
        "kg_flagship_exact_nodes": flagship_exact_sql(what="nodes"),
        "kg_flagship_exact_node_types": flagship_exact_sql(what="node_types"),
        "kg_flagship_fuzzy_exact": flagship_fuzzy_sql(what="triples"),
        "kg_flagship_fuzzy_exact_edges": flagship_fuzzy_sql(what="edges"),
        "media_features_exact": flagship_exact_sql(what="media"),
        "ann_lsh": """
            WITH dots AS (
              SELECT vec_id, b,
                     list_sum(list_transform(range(1, len(embedding) + 1),
                       d -> embedding[d] * (CASE WHEN substr(sha256(
                                 'plane|' || b::VARCHAR || '|'
                                 || (d - 1)::VARCHAR || '|42'), 1, 1) >= '8'
                            THEN 1.0 ELSE -1.0 END))) AS dot
              FROM embeddings, (SELECT unnest(range(0, 8)) AS b)),
            buckets AS (SELECT vec_id,
                               sum(CASE WHEN dot >= 0
                                   THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
                               AS bucket
                        FROM dots GROUP BY 1),
            q AS (SELECT e.vec_id AS query_id, e.embedding::DOUBLE[] AS qe,
                         bk.bucket
                  FROM embeddings e JOIN buckets bk ON bk.vec_id = e.vec_id
                  WHERE e.vec_id IN (0, 1, 2, 3, 4)),
            cand AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                            list_cosine_similarity(q.qe,
                                e.embedding::DOUBLE[]) AS sim
                     FROM q
                     JOIN buckets be ON be.bucket = q.bucket
                     JOIN embeddings e ON e.vec_id = be.vec_id
                                      AND e.vec_id != q.query_id)
            SELECT query_id, neighbor_id, round(sim, 3) AS cos_sim FROM cand
            QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) <= 5""",
        "knn_graph_exact": """
            WITH s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                              round(list_cosine_similarity(
                                  a.embedding::DOUBLE[],
                                  b.embedding::DOUBLE[]), 3) AS cos_sim
                       FROM embeddings a
                       JOIN embeddings b ON b.vec_id != a.vec_id)
            SELECT query_id, neighbor_id, cos_sim FROM s
            QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) <= 5""",
        "knn_graph": """
            WITH dots AS (
              SELECT vec_id, b,
                     list_sum(list_transform(range(1, len(embedding) + 1),
                       d -> embedding[d] * (CASE WHEN substr(sha256(
                                 'plane|' || b::VARCHAR || '|'
                                 || (d - 1)::VARCHAR || '|42'), 1, 1) >= '8'
                            THEN 1.0 ELSE -1.0 END))) AS dot
              FROM embeddings, (SELECT unnest(range(0, 6)) AS b)),
            buckets AS (SELECT vec_id,
                               sum(CASE WHEN dot >= 0
                                   THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
                               AS bucket
                        FROM dots GROUP BY 1),
            s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                         round(list_cosine_similarity(
                             ea.embedding::DOUBLE[],
                             eb.embedding::DOUBLE[]), 3) AS cos_sim
                  FROM buckets a
                  JOIN buckets b ON b.bucket = a.bucket
                                AND b.vec_id != a.vec_id
                  JOIN embeddings ea ON ea.vec_id = a.vec_id
                  JOIN embeddings eb ON eb.vec_id = b.vec_id)
            SELECT query_id, neighbor_id, cos_sim FROM s
            QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, neighbor_id) <= 5""",
        "mmr_select": _mmr_sql(0, 8),
        "ann_ivf": """
            WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
                       FROM embeddings WHERE vec_id < 16),
            sims AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS ve, c.cid,
                            list_cosine_similarity(e.embedding::DOUBLE[],
                                                   c.ce) AS s
                     FROM embeddings e, c),
            assign AS (SELECT vec_id, ve, cid FROM sims
                       QUALIFY row_number() OVER (PARTITION BY vec_id
                           ORDER BY s DESC, cid) = 1),
            qprobe AS (SELECT vec_id AS query_id, cid FROM sims
                       WHERE vec_id IN (0, 1, 2, 3, 4)
                       QUALIFY row_number() OVER (PARTITION BY vec_id
                           ORDER BY s DESC, cid) <= 4),
            qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)),
            cand AS (SELECT qp.query_id, a.vec_id AS neighbor_id,
                            list_cosine_similarity(qv.qe, a.ve) AS sim
                     FROM qprobe qp
                     JOIN assign a ON a.cid = qp.cid
                     JOIN qv ON qv.query_id = qp.query_id
                     WHERE a.vec_id != qp.query_id)
            SELECT query_id, neighbor_id, round(sim, 3) AS cos_sim FROM cand
            QUALIFY row_number() OVER (PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id) <= 5""",
    }
