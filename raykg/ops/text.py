"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All vectorized per batch; all deterministic; the arithmetic
is deliberately expressible in ANSI SQL so DuckDB can act as an oracle.

Tokenization contract (shared with every oracle): whitespace split
(``\\s+``), empty tokens dropped.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data as rd

from raykg.functions.hashing import round_half_away, sha_hex

_WS = re.compile(r"\s+")

# language marker tokens (n-gram heuristic stand-in; the container has no
# langid model — SURVEY §2.9 extension surface)
EN_MARKERS = ("the", "a")


def _tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text) if t]


def token_stats(documents: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, n_uniq, stop_ratio, uniq_ratio) per document."""

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        n_tokens, n_uniq, stop_ratio, uniq_ratio = [], [], [], []
        for s in texts:
            toks = _tokens(s)
            n = len(toks)
            u = len(set(toks))
            stops = sum(1 for w in toks if w in EN_MARKERS)
            n_tokens.append(n)
            n_uniq.append(u)
            stop_ratio.append(round_half_away(stops / n, 4) if n else 0.0)
            uniq_ratio.append(round_half_away(u / n, 4) if n else 0.0)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_uniq": pa.array(n_uniq, pa.int64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "uniq_ratio": pa.array(uniq_ratio, pa.float64()),
        })

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")


def quality_score(documents: rd.Dataset) -> rd.Dataset:
    """Composite quality score in [0,1]:
    0.4*min(1, n_tokens/60) + 0.3*(1 - stop_ratio) + 0.3*uniq_ratio."""

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        scores = []
        for s in t.column("text").to_pylist():
            toks = _tokens(s)
            n = len(toks)
            if n == 0:
                scores.append(0.0)
                continue
            stops = sum(1 for w in toks if w in EN_MARKERS)
            uniq = len(set(toks))
            score = (0.4 * min(1.0, n / 60.0)
                     + 0.3 * (1.0 - stops / n)
                     + 0.3 * (uniq / n))
            scores.append(round_half_away(score, 4))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "quality": pa.array(scores, pa.float64())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")


def lang_id(documents: rd.Dataset) -> rd.Dataset:
    """Marker-token language heuristic: >=2 English markers -> 'en',
    exactly 1 -> 'maybe_en', else 'und'. (A real model would be an
    actor-pool stage; the container ships no langid model, so the heuristic
    is the deterministic stand-in — the Ray-side plumbing is identical.)"""

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        preds = []
        for s in t.column("text").to_pylist():
            c = sum(1 for w in _tokens(s) if w in EN_MARKERS)
            preds.append("en" if c >= 2 else ("maybe_en" if c == 1 else "und"))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "lang_pred": pa.array(preds, pa.string())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")


def fingerprint(documents: rd.Dataset, gram: int = 3) -> rd.Dataset:
    """Document fingerprint: minimum sha256[:12] over token `gram`-grams
    (a 1-hash MinHash / winnowing-style content fingerprint). Documents
    shorter than `gram` tokens fingerprint their full text."""

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        fps = []
        for s in t.column("text").to_pylist():
            toks = _tokens(s)
            if len(toks) < gram:
                fps.append(sha_hex(" ".join(toks))[:12])
                continue
            grams = (" ".join(toks[i:i + gram])
                     for i in range(len(toks) - gram + 1))
            fps.append(min(sha_hex(g)[:12] for g in grams))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "fingerprint": pa.array(fps, pa.string())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")
