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
import pyarrow.compute as pc

import ray.data as rd

from raykg.functions.hashing import round_half_away, sha_hex

_WS = re.compile(r"\s+")

# language marker tokens (n-gram heuristic stand-in; the container has no
# langid model — SURVEY §2.9 extension surface)
EN_MARKERS = ("the", "a")


def _tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text) if t]


# Arrow/RE2 equivalent of Python re's Unicode \s (verified to split
# identically on every codepoint Python classifies as whitespace) — for
# vectorized split_pattern_regex paths that must honor the module's
# _tokens contract. RE2's bare \s is ASCII-only and would silently
# tokenize NBSP/\v/U+2028 text differently from every other op.
_WS_RE2 = (r"[\t-\r\x{001c}-\x{001f} \x{0085}\x{00a0}\x{1680}"
           r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+")


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


def chunk_documents(documents: rd.Dataset, chunk_tokens: int = 64,
                    overlap: int = 16) -> rd.Dataset:
    """Fixed-size token-window chunking with overlap — the passage-splitting
    step of a training-data pipeline (documents -> model-context-sized
    chunks). One row per chunk: (doc_id, chunk_idx, text, n_tokens).

    Window rule (shared with the SQL oracle): starts at multiples of
    ``chunk_tokens - overlap``; a new window opens only while it adds tokens
    beyond the previous window's overlap (``start < n_tokens - overlap``),
    so a short tail is absorbed into the last chunk instead of emitting a
    fully-contained duplicate. Empty documents emit no chunks. Stateless
    map_batches — scales by adding blocks, no shuffle."""
    if overlap < 0:
        # step > chunk_tokens would skip tokens between windows silently
        raise ValueError("overlap must be >= 0")
    step = chunk_tokens - overlap
    if step <= 0:
        raise ValueError("chunk_tokens must exceed overlap")

    def batch(t: pa.Table) -> pa.Table:
        doc_ids, idxs, texts, ntoks = [], [], [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            toks = _tokens(s)
            n = len(toks)
            if n == 0:
                continue
            for ci, start in enumerate(range(0, max(1, n - overlap), step)):
                window = toks[start:start + chunk_tokens]
                doc_ids.append(d)
                idxs.append(ci)
                texts.append(" ".join(window))
                ntoks.append(len(window))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chunk_idx": pa.array(idxs, pa.int32()),
            "text": pa.array(texts, pa.string()),
            "n_tokens": pa.array(ntoks, pa.int64()),
        })

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")


def repetition_ratio(documents: rd.Dataset) -> rd.Dataset:
    """(doc_id, rep_ratio): frequency of the most repeated sequential token
    bigram over the total bigram count (boilerplate / low-entropy detector;
    rounds to 4). Documents with fewer than 2 tokens score 0.0."""
    from collections import Counter

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        out = []
        for s in t.column("text").to_pylist():
            toks = _tokens(s)
            if len(toks) < 2:
                out.append(0.0)
                continue
            c = Counter(zip(toks, toks[1:]))
            out.append(round_half_away(max(c.values()) / (len(toks) - 1), 4))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "rep_ratio": pa.array(out, pa.float64())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")


def doc_length_histogram(documents: rd.Dataset, bin_width: int = 16) -> pa.Table:
    """(bin, n_docs): corpus length distribution in fixed-width token bins
    (bin = n_tokens // bin_width) — the at-a-glance shape check before
    chunking/packing decisions. Map-side binned counts -> one re-combine ->
    a vocabulary-sized driver table (bins are few by construction)."""
    from raykg.ops.relational import _sum_combine, small_key_agg

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter(len(_tokens(s)) // bin_width
                             for s in t.column("text").to_pylist())
        return pa.table({"bin": pa.array(list(c.keys()), pa.int64()),
                         "n_docs": pa.array(list(c.values()), pa.int64())})

    return small_key_agg(
        documents.select_columns(["text"]).map_batches(
            partial, batch_format="pyarrow"),
        _sum_combine(["bin"], ["n_docs"]))


def _token_count_ds(documents: rd.Dataset, num_buckets: int) -> rd.Dataset:
    """(tok, n) corpus token counts — per-batch Counter partials into one
    bucketed exchange. Shared by unigram_logprob (the model itself) and
    bigram_logprob's max_vocab selection so the two tokenize-and-count
    implementations can never drift apart."""
    from collections import Counter

    from raykg.functions.shuffle import bucketed_group_agg

    def count_batch(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update(_tokens(s))
        # sentinel "" keeps zero-row blocks typed (a batch of all-empty
        # texts yields no tokens); real tokens are never "" and the one
        # ""->0 row is inert in every consumer (zero mass, never queried)
        return pa.table({
            "tok": pa.array(list(c.keys()) + [""], pa.string()),
            "n": pa.array(list(c.values()) + [0], pa.int64())})

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by("tok").aggregate([("n", "sum")])
        return pa.table({"tok": g.column("tok"), "n": g.column("n_sum")})

    return bucketed_group_agg(
        documents.select_columns(["text"]).map_batches(
            count_batch, batch_format="pyarrow"),
        lambda t: t, "tok", fin, num_buckets=num_buckets)


def unigram_logprob(documents: rd.Dataset,
                    num_buckets: int = 256,
                    max_vocab: int | None = None) -> rd.Dataset:
    """(doc_id, mean_nll): mean -log2(p(token)) per document under the
    corpus's own unigram MLE — the model-free perplexity proxy used to
    rank/filter training text. Two passes: distributed token counts
    (bucketed aggregate) -> count table broadcast once via ray.put ->
    stateless scoring map. Empty documents are omitted (no tokens to
    score), matching the SQL oracle's join semantics.

    Scale envelope: the broadcast vocabulary table must fit a worker
    heap. ``max_vocab=K`` bounds it — tokens outside the top-K by corpus
    count (ties broken by token, deterministic) are rewritten to a single
    OOV symbol whose count is the truncated tail's total mass, i.e. the
    MLE over the OOV-rewritten token stream. The top-K selection itself
    is distributed (sort + limit on the count dataset) so neither the
    driver nor any worker ever holds more than K+1 vocabulary rows.
    With ``max_vocab >= |V|`` (or None) results are byte-identical to
    the untruncated model."""
    import ray

    counts_ds = _token_count_ds(documents, num_buckets)
    counts: dict[str, int] = {}
    if max_vocab is not None:
        # materialize: the truncation branch consumes counts_ds TWICE
        # (total mass, then top-K) and the dataset is lazy — without this
        # the whole distributed tokenize+aggregate pass runs twice. The
        # materialized table is vocabulary-sized, inside the envelope.
        # sum() returns None on an empty counts table (zero-token corpus).
        counts_ds = counts_ds.materialize()
        total = float(counts_ds.sum("n") or 0)
        top = counts_ds.sort(["n", "tok"],
                             descending=[True, False]).limit(max_vocab)
        for row in top.take_all():
            if row["tok"]:      # drop the "" exchange sentinel
                counts[row["tok"]] = counts.get(row["tok"], 0) + row["n"]
        oov_n = int(total) - sum(counts.values())
    else:
        for row in counts_ds.take_all():
            if row["tok"]:      # drop the "" exchange sentinel
                counts[row["tok"]] = counts.get(row["tok"], 0) + row["n"]
        total = float(sum(counts.values()))
        oov_n = 0
    ref = ray.put((counts, total, oov_n))

    import math

    def score(t: pa.Table) -> pa.Table:
        cmap, tot, oov = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
            else ref
        ids, out = [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            toks = _tokens(s)
            if not toks:
                continue
            nll = sum(-math.log2(cmap.get(w, oov) / tot)
                      for w in toks) / len(toks)
            ids.append(d)
            out.append(round_half_away(nll, 4))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "mean_nll": pa.array(out, pa.float64())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


# --- PII-style redaction ----------------------------------------------------
# RE2-compatible patterns (identical semantics in Python re and DuckDB
# regexp_replace/regexp_extract_all): email-shaped tokens and long digit
# runs. Order matters and is part of the contract: emails are redacted
# FIRST (their digits must not double-count as number runs).

PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_NUMBER = r"\d{7,}"
_EMAIL_RE = re.compile(PII_EMAIL)
_NUMBER_RE = re.compile(PII_NUMBER)


def synth_pii_docs(n: int = 2000, seed: int = 42) -> rd.Dataset:
    """Deterministic sha-derived corpus with injected PII-shaped strings
    (the testdata documents are clean word text, which would make redaction
    a no-op): ~30% of docs carry an email, ~50% a long digit run. Every
    byte is a pure function of (seed, i) — DuckDB regenerates it exactly."""
    _VOCAB = ("alpha", "beta", "gamma", "delta")

    def gen(b) -> pa.Table:
        ids, texts = [], []
        for i in b["id"].tolist():
            parts = [_VOCAB[int(sha_hex(f"pii_w|{seed}|{i}")[:8], 16)
                            % len(_VOCAB)]]
            if sha_hex(f"pii_e|{seed}|{i}")[:8] < "4ccccccc":   # p=0.3
                u = int(sha_hex(f"pii_u|{seed}|{i}")[:8], 16) % 100000
                m = int(sha_hex(f"pii_m|{seed}|{i}")[:8], 16) % 10
                parts += ["contact", f"user{u}@mail{m}.com"]
            if sha_hex(f"pii_n|{seed}|{i}")[:8] < "80000000":   # p=0.5
                d = int(sha_hex(f"pii_d|{seed}|{i}")[:8], 16) % 10**9
                parts += ["ref", f"{d:09d}"]
            parts.append("end")
            ids.append(int(i))
            texts.append(" ".join(parts))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return rd.range(n, override_num_blocks=max(1, n // 500)).map_batches(
        gen, batch_format="numpy")


def redact_pii(documents: rd.Dataset) -> rd.Dataset:
    """(doc_id, clean_text, n_emails, n_numbers): emails then long digit
    runs replaced by [EMAIL] / [NUM] placeholders, with per-doc match
    counts. Compiled-regex map_batches — stateless, no shuffle."""

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        clean, n_em, n_num = [], [], []
        for s in t.column("text").to_pylist():
            emails = _EMAIL_RE.findall(s)
            s1 = _EMAIL_RE.sub("[EMAIL]", s)
            nums = _NUMBER_RE.findall(s1)
            clean.append(_NUMBER_RE.sub("[NUM]", s1))
            n_em.append(len(emails))
            n_num.append(len(nums))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "clean_text": pa.array(clean, pa.string()),
            "n_emails": pa.array(n_em, pa.int64()),
            "n_numbers": pa.array(n_num, pa.int64()),
        })

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")


GOPHER_STOPS = ("the", "a", "be", "to", "of", "and", "that", "have", "with")
_ALPHA_RE = re.compile(r"[A-Za-z]")


def gopher_doc_stats(s: str) -> tuple[int, float, float, float, int]:
    """Raw per-doc statistics behind the Gopher rules (shared by
    :func:`gopher_rules` and the curation pipeline): (n_words,
    mean_word_len, symbol_ratio, alpha_ratio, stop_hits), all on raw
    float64 so threshold comparisons are bit-identical to the SQL
    twins' DOUBLE arithmetic."""
    toks = _tokens(s)
    n = len(toks)
    mean = (sum(len(w) for w in toks) / n) if n else 0.0
    sym = ((s.count("#") + s.count("...")) / n) if n else 0.0
    alpha = (sum(1 for w in toks if _ALPHA_RE.search(w)) / n) if n else 0.0
    stops = sum(1 for w in GOPHER_STOPS if w in toks)
    return n, mean, sym, alpha, stops


def gopher_flags(n: int, mean: float, sym: float, alpha: float, stops: int,
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_len: float = 3.0, max_mean_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_alpha_ratio: float = 0.8,
                 min_stop_hits: int = 2) -> dict[str, bool]:
    """Threshold the raw stats into the five rule flags + ``keep``."""
    ok = {
        "ok_words": min_words <= n <= max_words,
        "ok_mean_len": min_mean_len <= mean <= max_mean_len,
        "ok_symbols": sym <= max_symbol_ratio,
        "ok_alpha": alpha >= min_alpha_ratio,
        "ok_stops": stops >= min_stop_hits,
    }
    ok["keep"] = all(ok.values())
    return ok


def gopher_rules(documents: rd.Dataset, min_words: int = 50,
                 max_words: int = 100_000, min_mean_len: float = 3.0,
                 max_mean_len: float = 10.0, max_symbol_ratio: float = 0.1,
                 min_alpha_ratio: float = 0.8,
                 min_stop_hits: int = 2) -> rd.Dataset:
    """Gopher-style document quality rules (Rae et al. 2021, App. A1.1),
    adapted to the engine's whitespace-token contract: per-doc boolean
    flags (as 0/1 ints for a stable hash wire format) plus the raw
    statistics, and ``keep`` = AND of all flags.

    - ``ok_words``: token count in [min_words, max_words]
    - ``ok_mean_len``: mean token length in [min_mean_len, max_mean_len]
    - ``ok_symbols``: ('#' chars + non-overlapping '...' runs) / words
      <= max_symbol_ratio
    - ``ok_alpha``: fraction of tokens containing [A-Za-z]
      >= min_alpha_ratio (ASCII class on both sides — Python's Unicode
      ``isalpha`` would diverge from the SQL twin on accented text)
    - ``ok_stops``: >= min_stop_hits DISTINCT stop words present

    Ratio flags compare RAW float64 ratios (identical IEEE division in
    numpy/Python and DuckDB DOUBLE); the reported ratio columns are
    rounded to 4 for the hash. Stateless map_batches — no shuffle."""

    def batch(t: pa.Table) -> pa.Table:
        doc_ids = t.column("doc_id").to_pylist()
        n_w, mean_l, sym_r, alpha_r, stop_h = [], [], [], [], []
        flags = {k: [] for k in ("ok_words", "ok_mean_len", "ok_symbols",
                                 "ok_alpha", "ok_stops", "keep")}
        for s in t.column("text").to_pylist():
            n, mean, sym, alpha, stops = gopher_doc_stats(s)
            ok = gopher_flags(n, mean, sym, alpha, stops, min_words,
                              max_words, min_mean_len, max_mean_len,
                              max_symbol_ratio, min_alpha_ratio,
                              min_stop_hits)
            n_w.append(n)
            mean_l.append(round_half_away(mean, 4))
            sym_r.append(round_half_away(sym, 4))
            alpha_r.append(round_half_away(alpha, 4))
            stop_h.append(stops)
            for k, v in ok.items():
                flags[k].append(int(v))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_words": pa.array(n_w, pa.int64()),
            "mean_word_len": pa.array(mean_l, pa.float64()),
            "symbol_ratio": pa.array(sym_r, pa.float64()),
            "alpha_ratio": pa.array(alpha_r, pa.float64()),
            "stop_hits": pa.array(stop_h, pa.int64()),
            **{k: pa.array(v, pa.int64()) for k, v in flags.items()},
        })

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")


def quality_funnel(documents: rd.Dataset, **gopher_params) -> pa.Table:
    """Per-source curation drop accounting: documents scanned, failures
    per Gopher rule (a doc can fail several), and survivors — the
    filter-funnel report every large curation run publishes alongside
    its output. Exchange volume is register-sized: one partial row per
    (source, batch), merged by ``small_key_agg`` — no keyed shuffle at
    any corpus size."""
    from raykg.ops.relational import _sum_combine, small_key_agg

    cnt_cols = ["n_docs", "fail_words", "fail_mean_len", "fail_symbols",
                "fail_alpha", "fail_stops", "kept"]

    def partial(t: pa.Table) -> pa.Table:
        acc: dict[str, list[int]] = {}
        for src, s in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            row = acc.setdefault(src, [0] * len(cnt_cols))
            ok = gopher_flags(*gopher_doc_stats(s), **gopher_params)
            row[0] += 1
            row[1] += not ok["ok_words"]
            row[2] += not ok["ok_mean_len"]
            row[3] += not ok["ok_symbols"]
            row[4] += not ok["ok_alpha"]
            row[5] += not ok["ok_stops"]
            row[6] += ok["keep"]
        return pa.table({
            "source": pa.array(list(acc.keys()), pa.string()),
            **{c: pa.array([v[i] for v in acc.values()], pa.int64())
               for i, c in enumerate(cnt_cols)},
        })

    return small_key_agg(
        documents.select_columns(["source", "text"]).map_batches(
            partial, batch_format="pyarrow"),
        _sum_combine(["source"], cnt_cols))


def inverted_index(documents: rd.Dataset, max_postings: int = 32,
                   num_buckets: int = 1024) -> rd.Dataset:
    """(term, df, postings): inverted-index build — document frequency
    plus the first ``max_postings`` doc ids (ascending) per term,
    serialized as a comma-joined string (a stable wire format the SQL
    twin reproduces exactly; full lists for stopword-grade terms would
    be corpus-sized, so the stored prefix is capped and ``df`` keeps the
    true total). Per-doc term multiplicity is collapsed at the source
    (df counts documents, not occurrences).

    Scale shape: per-batch distinct (term, doc) explode, then ONE
    bucketed exchange — the combiner pre-collapses duplicate pairs and
    carries partial postings already truncated to ``max_postings`` plus
    a partial df count, so a hot term contributes at most one
    register-sized row per batch to the shuffle, never its full postings
    stream."""
    from raykg.functions.shuffle import bucketed_group_agg

    def explode(t: pa.Table) -> pa.Table:
        terms, dfs, posts = [], [], []
        pairs: dict[str, set[int]] = {}
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            for w in set(_tokens(s)):
                pairs.setdefault(w, set()).add(d)
        for w in pairs:
            docs = sorted(pairs[w])
            terms.append(w)
            dfs.append(len(docs))
            posts.append(",".join(map(str, docs[:max_postings])))
        # sentinel "" keeps all-empty-text batches typed through the
        # exchange; terms are never "" and df 0 merges to df 0
        terms.append("")
        dfs.append(0)
        posts.append("")
        return pa.table({"term": pa.array(terms, pa.string()),
                         "df": pa.array(dfs, pa.int64()),
                         "postings": pa.array(posts, pa.string())})

    def merge(t: pa.Table) -> pa.Table:
        terms, dfs, posts = [], [], []
        acc: dict[str, tuple[int, list[int]]] = {}
        for w, n, p in zip(t.column("term").to_pylist(),
                           t.column("df").to_pylist(),
                           t.column("postings").to_pylist()):
            cur = acc.get(w)
            ids = [int(x) for x in p.split(",")] if p else []
            if cur is None:
                acc[w] = (n, ids)
            else:
                # merge two sorted prefixes; truncation is safe because
                # each side already holds its smallest ids
                acc[w] = (cur[0] + n,
                          sorted(set(cur[1]) | set(ids))[:max_postings])
        for w, (n, ids) in acc.items():
            terms.append(w)
            dfs.append(n)
            posts.append(",".join(map(str, ids[:max_postings])))
        return pa.table({"term": pa.array(terms, pa.string()),
                         "df": pa.array(dfs, pa.int64()),
                         "postings": pa.array(posts, pa.string())})

    out = bucketed_group_agg(documents.select_columns(["doc_id", "text"])
                             .map_batches(explode, batch_format="pyarrow"),
                             merge, "term", merge,
                             num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("term"), "")),
        batch_format="pyarrow")


def cooccurrence_pmi(documents: rd.Dataset, window: int = 4,
                     min_count: int = 5, top_k: int = 50,
                     num_buckets: int = 256) -> rd.Dataset:
    """Top-``top_k`` token pairs by pointwise mutual information within
    a ±``window`` skip-gram context — the collocation/phrase-mining
    statistic of word-embedding and tokenizer pipelines. A pair is the
    unordered (lexicographically canonicalized) token pair at positions
    (i, j), 0 < j - i <= window; PMI = log2((c12/P) / ((c1/N)(c2/N)))
    with c12 = pair occurrences, P = total pair slots, c = corpus token
    counts, N = total tokens; rounded to 4 (ranking on the rounded
    value, ties (w1, w2) ascending — the contract the SQL twin shares).

    Scale shape: ONE pair-keyed exchange (per-batch Counter combiner, so
    a hot collocation adds one partial row per batch), then the
    ``min_count`` filter prunes the long tail BEFORE two broadcast-free
    tag-join exchanges attach the unigram counts; N and P are scalar
    distributed sums. Only ``top_k`` rows reach the driver at the end;
    nothing vocabulary-sized is ever broadcast."""
    import math
    from collections import Counter

    import numpy as np
    import pyarrow.compute as pc

    from raykg.functions.shuffle import bucketed_group_agg

    SEP = "\x1f"

    # --- pair probe rows (per-batch Counter combiner) ---
    def pair_rows(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            toks = _tokens(s)
            for i in range(len(toks)):
                for j in range(i + 1, min(i + window, len(toks) - 1) + 1):
                    a, b = toks[i], toks[j]
                    c[(a, b) if a <= b else (b, a)] += 1
        keys = [w1 + SEP + w2 for w1, w2 in c]
        return pa.table({
            "pair": pa.array(keys + [""], pa.string()),
            "w1": pa.array([p[0] for p in c] + [""], pa.string()),
            "w2": pa.array([p[1] for p in c] + [""], pa.string()),
            "n": pa.array(list(c.values()) + [0], pa.int64())})

    # materialized once: the pair partials feed both the P scalar sum and
    # the pair exchange, and the unigram partials feed the N sum plus TWO
    # tag-joins — without the pin, the tokenize pass (the hot cost) would
    # re-execute for every consumer (same discipline as lsh_candidate_pairs'
    # sigs). Both tables are combiner output: batch-count x distinct-per-
    # batch rows, far smaller than the text.
    probes = documents.select_columns(["text"]).map_batches(
        pair_rows, batch_format="pyarrow").materialize()

    # --- unigram count partials ---
    def uni_rows(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in t.column("text").to_pylist():
            c.update(_tokens(s))
        return pa.table({"w": pa.array(list(c.keys()) + [""], pa.string()),
                         "n": pa.array(list(c.values()) + [0], pa.int64())})

    uni = documents.select_columns(["text"]).map_batches(
        uni_rows, batch_format="pyarrow").materialize()

    p_total = probes.sum("n")          # pair slots (sentinels add 0)
    n_total = uni.sum("n")             # corpus tokens
    if not p_total:
        return rd.from_arrow(pa.table({
            "w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
            "c12": pa.array([], pa.int64()), "pmi": pa.array([], pa.float64())
        }))

    def pair_fin(t: pa.Table) -> pa.Table:
        g = t.group_by("pair").aggregate([("n", "sum"), ("w1", "max"),
                                          ("w2", "max")])
        keep = pc.and_(pc.greater_equal(g.column("n_sum"), min_count),
                       pc.not_equal(g.column("pair"), ""))
        g = g.filter(keep)
        # re-emit a sentinel: a bucket whose every pair is sub-min_count
        # would otherwise finalize to zero rows (schema-less downstream);
        # w1 "" rows carry zero mass and attach_count's probe side is
        # filtered on real keys by the final top-k
        return pa.table({
            "w1": pa.concat_arrays(
                [g.column("w1_max").combine_chunks(),
                 pa.array([""], pa.string())]),
            "w2": pa.concat_arrays(
                [g.column("w2_max").combine_chunks(),
                 pa.array([""], pa.string())]),
            "c12": pa.concat_arrays(
                [g.column("n_sum").combine_chunks(),
                 pa.array([0], pa.int64())])})

    pairs = bucketed_group_agg(probes, lambda t: t, "pair", pair_fin,
                               num_buckets=num_buckets)

    # --- attach unigram counts: tag-join per endpoint column ---
    def attach_count(ds: rd.Dataset, carry: list[str], key_col: str,
                     out_col: str) -> rd.Dataset:
        order = ["key", *carry, "tag", "cnt"]

        def probe_side(t: pa.Table) -> pa.Table:
            cols = {c: t.column(c) for c in carry}
            cols["key"] = t.column(key_col)
            cols["tag"] = pa.array(np.zeros(t.num_rows, np.int8))
            cols["cnt"] = pa.array(np.zeros(t.num_rows, np.int64))
            return pa.table({c: cols[c] for c in order})

        def build_side(t: pa.Table) -> pa.Table:
            m = t.num_rows
            cols = {"key": t.column("w"), "cnt": t.column("n"),
                    "tag": pa.array(np.ones(m, np.int8))}
            for c in carry:
                typ = pa.int64() if c in ("c12", "c1") else pa.string()
                cols[c] = pa.nulls(m, typ)   # filler, never read
            return pa.table({c: cols[c] for c in order})

        def attach(t: pa.Table) -> pa.Table:
            tags = t.column("tag").combine_chunks()
            build = t.filter(pc.equal(tags, 1))
            probe = t.filter(pc.equal(tags, 0))
            probe = probe.filter(pc.not_equal(probe.column("key"), ""))
            bk = build.group_by("key").aggregate([("cnt", "sum")])
            idx = pc.index_in(probe.column("key"), bk.column("key"))
            out = {c: probe.column(c) for c in carry}
            out[key_col] = probe.column("key")
            out[out_col] = pc.take(bk.column("cnt_sum"), idx)
            return pa.table(out)

        unioned = ds.map_batches(probe_side, batch_format="pyarrow") \
            .union(uni.map_batches(build_side, batch_format="pyarrow"))
        return bucketed_group_agg(unioned, lambda t: t, "key", attach,
                                  num_buckets=num_buckets)

    with_c1 = attach_count(pairs, ["w2", "c12"], "w1", "c1")
    full = attach_count(with_c1, ["w1", "c12", "c1"], "w2", "c2")

    def score(t: pa.Table) -> pa.Table:
        c12 = t.column("c12").to_numpy(zero_copy_only=False)
        c1 = t.column("c1").to_numpy(zero_copy_only=False)
        c2 = t.column("c2").to_numpy(zero_copy_only=False)
        pmi = [round_half_away(
            math.log2((a / p_total) / ((b / n_total) * (c / n_total))), 4)
            for a, b, c in zip(c12.tolist(), c1.tolist(), c2.tolist())]
        return pa.table({"w1": t.column("w1"), "w2": t.column("w2"),
                         "c12": t.column("c12"),
                         "pmi": pa.array(pmi, pa.float64())})

    return full.map_batches(score, batch_format="pyarrow") \
        .sort(["pmi", "w1", "w2"], descending=[True, False, False]) \
        .limit(top_k)


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


def tfidf_top_terms(documents: rd.Dataset,
                    num_buckets: int = 256) -> rd.Dataset:
    """(doc_id, term, score): each document's highest-TF-IDF term, with
    score = (tf / doc_len) * ln(N / df) and ties broken by the
    lexicographically smallest term. Documents with no tokens are omitted.

    Fully distributed — the vocabulary is NEVER broadcast (contrast
    unigram_logprob's documented worker-heap envelope):

    1. map: Arrow-vectorized explode (split_pattern_regex -> flatten ->
       np.repeat parent ids) + per-batch hash-agg gives exact per-doc
       (term, tf, doc_len) rows — exact because a document is one row of
       the input, so its tokens never span batches;
    2. term-bucketed exchange: every row of a term lands in one bucket, so
       df is the term's segment length right there (sorted unique +
       repeat) — no separate df aggregate, no join; scores are emitted in
       the same pass;
    3. doc-bucketed exchange: per-doc argmax as a sorted-segment-boundary
       pass (sort by doc, score DESC, term ASC; take segment heads).

    N = total document count (including empty docs), matching the SQL
    oracle's count(*)."""
    import numpy as np
    import pyarrow.compute as pc

    from raykg.functions.hashing import round_half_away
    from raykg.functions.shuffle import bucketed_group_agg, crc_bucket_array

    n_docs = float(documents.count())
    TSENT = "\x00S"   # sentinel term (zero-row-block guard; \x00 < any text)

    def tf_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        lst = pc.split_pattern_regex(
            t.column("text").combine_chunks(), pattern=_WS_RE2)
        flat = lst.flatten()
        doc = np.repeat(ids, pc.list_value_length(lst)
                        .to_numpy(zero_copy_only=False))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        tt = pa.table({"doc_id": pa.array(doc[keep], pa.int64()),
                       "term": flat.filter(pa.array(keep))})
        g = tt.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        lens = tt.group_by("doc_id").aggregate([([], "count_all")])
        dlen = pc.cast(lens.column("count_all"), pa.int64()).combine_chunks() \
            .take(pc.index_in(g.column("doc_id").combine_chunks(),
                              lens.column("doc_id").combine_chunks()))
        return pa.table({
            "doc_id": pa.concat_arrays(
                [g.column("doc_id").combine_chunks(),
                 pa.array([-1], pa.int64())]),
            "term": pa.concat_arrays(
                [g.column("term").combine_chunks(),
                 pa.array([TSENT], pa.string())]),
            "tf": pa.concat_arrays(
                [pc.cast(g.column("count_all"), pa.int64())
                 .combine_chunks(), pa.array([0], pa.int64())]),
            "dlen": pa.concat_arrays([dlen, pa.array([1], pa.int64())]),
        })

    def score_bucket(t: pa.Table) -> pa.Table:
        term = t.column("term").combine_chunks()
        order = pc.array_sort_indices(term)
        t = t.take(order)
        term = t.column("term").combine_chunks().to_numpy(
            zero_copy_only=False)
        tf = t.column("tf").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        dlen = t.column("dlen").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        if not len(term):
            return pa.table({"doc_id": pa.array([-1], pa.int64()),
                             "term": pa.array([TSENT], pa.string()),
                             "score": pa.array([0.0], pa.float64())})
        bound = np.concatenate(([True], term[1:] != term[:-1]))
        _, counts = np.unique(np.cumsum(bound) - 1, return_counts=True)
        df = np.repeat(counts, counts).astype(np.float64)
        score = (tf / dlen) * np.log(n_docs / df)
        return pa.table({"doc_id": t.column("doc_id"),
                         "term": t.column("term"),
                         "score": pa.array(score, pa.float64())})

    def argmax_bucket(t: pa.Table) -> pa.Table:
        t = t.sort_by([("doc_id", "ascending"), ("score", "descending"),
                       ("term", "ascending")])
        doc = t.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        if not len(doc):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        head = np.concatenate(([True], doc[1:] != doc[:-1]))
        t = t.take(pa.array(np.flatnonzero(head)))
        t = t.filter(pc.greater_equal(t.column("doc_id"), 0))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "term": t.column("term"),
            "score": pa.array(round_half_away(
                t.column("score").combine_chunks()
                .to_numpy(zero_copy_only=False).astype(np.float64), 4),
                pa.float64())})

    scored = bucketed_group_agg(
        documents.select_columns(["doc_id", "text"]).map_batches(
            tf_batch, batch_format="pyarrow"),
        lambda t: t, "term", score_bucket, num_buckets=num_buckets)

    def doc_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("bucket", crc_bucket_array(
            t.column("doc_id"), num_buckets))

    return scored.map_batches(doc_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            lambda t: argmax_bucket(t.drop_columns(["bucket"])),
            batch_format="pyarrow")


def bigram_logprob(documents: rd.Dataset, mode: str = "broadcast",
                   num_buckets: int = 256,
                   max_vocab: int | None = None) -> rd.Dataset:
    """(doc_id, mean_nll): mean -log2(p(w2|w1)) per document under the
    corpus's own bigram MLE, p(w2|w1) = c(w1 w2) / c(w1 as bigram-first)
    — the CCNet-style LM quality signal, one order up from
    :func:`unigram_logprob`. Docs with fewer than 2 tokens are omitted.
    The mean is weighted by bigram multiplicity, so both modes compute
    the identical number (rounded to 4 decimals; float association noise
    is ~1e-12, far below the rounding grain).

    ``mode="broadcast"``: bigram + first-token count tables shipped once
    via ``ray.put``, stateless scoring map — right while the bigram
    vocabulary fits a worker heap. ``max_vocab=K`` bounds that envelope:
    tokens outside the top-K by corpus count (ties broken by token) are
    rewritten to a single OOV symbol BEFORE bigrams are formed, so the
    model is the exact bigram MLE over the OOV-rewritten token stream
    (≤ (K+1)^2 bigram rows, typically far fewer) and, with
    ``max_vocab >= |V|`` (or None), byte-identical to the untruncated
    model. The top-K selection is distributed (bucketed count -> sort ->
    limit); only K+1 vocabulary strings are broadcast.

    ``mode="join"``: NOTHING is broadcast or driver-resident — the count
    tables stay distributed and are attached to per-doc bigram rows by
    two bucketed tag-join shuffles (tag 0 = probe row, tag 1 = count
    partial, co-bucketed on the key; vectorized ``pc.index_in`` attach
    within the bucket), then a per-doc bucketed aggregate. The
    unbounded-vocabulary scale path (``max_vocab`` is meaningless there
    and rejected); tested equal to broadcast mode."""
    import math
    from collections import Counter

    import numpy as np
    import pyarrow.compute as pc
    import ray

    from raykg.functions.shuffle import bucketed_group_agg

    SEP = "\x1f"   # tokens are whitespace-split, so 0x1f never collides
    OOV = "\x00oov\x00"   # NUL-framed: cannot equal a real split token

    if max_vocab is not None and mode != "broadcast":
        raise ValueError("bigram_logprob: max_vocab only applies to "
                         "mode='broadcast' (the join mode is already "
                         "unbounded-vocabulary)")

    vocab_ref = None
    if max_vocab is not None:
        top = _token_count_ds(documents, num_buckets) \
            .sort(["n", "tok"], descending=[True, False]).limit(max_vocab)
        vocab_ref = ray.put(frozenset(
            r["tok"] for r in top.take_all() if r["tok"]))

    def doc_bigrams(t: pa.Table):
        vocab = (ray.get(vocab_ref)
                 if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref)
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            toks = _tokens(s)
            if len(toks) < 2:
                continue
            if vocab is not None:
                toks = [w if w in vocab else OOV for w in toks]
            yield d, Counter(zip(toks[:-1], toks[1:]))

    def probe_rows(t: pa.Table) -> pa.Table:
        ids, w1s, bgs, ns = [], [], [], []
        for d, c in doc_bigrams(t):
            for (w1, w2), n in c.items():
                ids.append(d)
                w1s.append(w1)
                bgs.append(w1 + SEP + w2)
                ns.append(n)
        # sentinel row keeps a batch of sub-2-token docs typed through
        # the keyed exchanges; doc_id -1 carries n=0 (zero mass in every
        # count) and is dropped with the per_doc_part sentinel group
        ids.append(-1)
        w1s.append("")
        bgs.append("")
        ns.append(0)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "w1": pa.array(w1s, pa.string()),
                         "bg": pa.array(bgs, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    probes = documents.select_columns(["doc_id", "text"]).map_batches(
        probe_rows, batch_format="pyarrow")

    def count_agg(key: str):
        """partial/finalize for summing ``n`` per distinct ``key``"""
        def part(t: pa.Table) -> pa.Table:
            g = t.group_by(key).aggregate([("n", "sum")])
            return pa.table({key: g.column(key), "n": g.column("n_sum")})
        return part

    if mode == "broadcast":
        cbg = {r["bg"]: r["n"] for r in bucketed_group_agg(
            probes, count_agg("bg"), "bg", count_agg("bg"),
            num_buckets=num_buckets).take_all()}
        # w1 totals derive EXACTLY from the bigram table: every probe row
        # carries the same n into both aggregations, so cw[w1] is the sum
        # of cbg over bigrams starting with w1. Summing the broadcast-
        # sized dict on the driver replaces a second corpus-wide exchange
        # — which, because ``probes`` is lazy, would also re-execute the
        # whole tokenize+bigram pass.
        cw: dict[str, int] = {}
        for bg, n in cbg.items():
            w1 = bg.split(SEP, 1)[0]
            cw[w1] = cw.get(w1, 0) + n
        ref = ray.put((cbg, cw))

        def score(t: pa.Table) -> pa.Table:
            bg_c, w_c = ray.get(ref) if isinstance(ref, ray.ObjectRef) \
                else ref
            ids, out = [], []
            for d, c in doc_bigrams(t):
                tot = sum(c.values())
                nll = sum(n * -math.log2(bg_c[w1 + SEP + w2] / w_c[w1])
                          for (w1, w2), n in c.items()) / tot
                ids.append(d)
                out.append(round_half_away(nll, 4))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "mean_nll": pa.array(out, pa.float64())})

        return documents.select_columns(["doc_id", "text"]).map_batches(
            score, batch_format="pyarrow")

    if mode != "join":
        raise ValueError(f"bigram_logprob: unknown mode {mode!r}")

    def tag_join(ds: rd.Dataset, key: str, carry: list[str],
                 out_col: str) -> rd.Dataset:
        """One bucketed shuffle that attaches the global sum of ``n`` per
        ``key`` (built from the probe rows themselves) onto every probe
        row, keeping ``carry`` columns. Probe rows travel tagged 0;
        per-batch count partials travel tagged 1 with the count in
        ``cnt``; the bucket finalize sums the partials per key and
        attaches via vectorized ``index_in``."""
        # pinned: the probe (tag0) and partial (tag1) branches both
        # consume ds — a lazy input would re-execute its whole upstream
        # (the corpus tokenize+bigram pass, or the previous tag_join's
        # exchange) once per branch
        ds = ds.materialize()
        carry_t = {c: ds.schema().base_schema.field(c).type
                   for c in carry}

        def tag0(t: pa.Table) -> pa.Table:
            return t.append_column(
                "tag", pa.array(np.zeros(t.num_rows, np.int8))) \
                .append_column("cnt", pa.array(
                    np.zeros(t.num_rows, np.int64)))

        def tag1(t: pa.Table) -> pa.Table:
            g = t.group_by(key).aggregate([("n", "sum")])
            m = g.num_rows
            cols = {key: g.column(key),
                    "tag": pa.array(np.ones(m, np.int8)),
                    "cnt": g.column("n_sum")}
            for c, typ in carry_t.items():   # null filler, never read
                cols[c] = pa.nulls(m, typ)
            cols["n"] = pa.nulls(m, pa.int64())
            order = [key, *carry, "n", "tag", "cnt"]
            return pa.table({c: cols[c] for c in order})

        def reorder(t: pa.Table) -> pa.Table:
            return t.select([key, *carry, "n", "tag", "cnt"])

        unioned = ds.map_batches(tag0, batch_format="pyarrow") \
            .map_batches(reorder, batch_format="pyarrow") \
            .union(ds.map_batches(tag1, batch_format="pyarrow"))

        def attach(t: pa.Table) -> pa.Table:
            tags = t.column("tag").combine_chunks()
            build = t.filter(pc.equal(tags, 1))
            probe = t.filter(pc.equal(tags, 0))
            bk = build.group_by(key).aggregate([("cnt", "sum")])
            idx = pc.index_in(probe.column(key), bk.column(key))
            cnt = pc.take(bk.column("cnt_sum"), idx)
            out = {c: probe.column(c) for c in (*carry, "n")}
            out[key] = probe.column(key)
            out[out_col] = cnt
            return pa.table(out)

        return bucketed_group_agg(unioned, lambda t: t, key, attach,
                                  num_buckets=num_buckets)

    with_cbg = tag_join(probes, "bg", ["doc_id", "w1"], "c_bg")
    # the w1 count partials are built from with_cbg's own rows — every
    # probe row (and its n) survives the first join, so the sums equal
    # the corpus bigram-first counts
    joined = tag_join(
        with_cbg.map_batches(
            lambda t: t.select(["w1", "doc_id", "c_bg", "n"]),
            batch_format="pyarrow"),
        "w1", ["doc_id", "c_bg"], "c_w1")

    def per_doc_part(t: pa.Table) -> pa.Table:
        d = np.asarray(t.column("doc_id").combine_chunks())
        # drop upstream probe sentinels (doc_id -1, counts 0) before the
        # log — 0/0 would manufacture a nan even in the discarded group
        keep0 = d >= 0
        d = d[keep0]
        n = np.asarray(t.column("n").combine_chunks(),
                       dtype=np.float64)[keep0]
        cb = np.asarray(t.column("c_bg").combine_chunks(),
                        dtype=np.float64)[keep0]
        cw = np.asarray(t.column("c_w1").combine_chunks(),
                        dtype=np.float64)[keep0]
        if not len(d):
            return pa.table({"doc_id": pa.array([-1], pa.int64()),
                             "s_nll": pa.array([0.0], pa.float64()),
                             "s_n": pa.array([0.0], pa.float64())})
        nll = n * -np.log2(cb / cw)
        order = np.argsort(d, kind="stable")
        d, nll, n = d[order], nll[order], n[order]
        start = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        return pa.table({
            "doc_id": pa.array(
                np.concatenate([d[start], [-1]]), pa.int64()),
            "s_nll": pa.array(
                np.concatenate([np.add.reduceat(nll, start), [0.0]]),
                pa.float64()),
            "s_n": pa.array(
                np.concatenate([np.add.reduceat(n, start), [0.0]]),
                pa.float64())})

    def per_doc_fin(t: pa.Table) -> pa.Table:
        d = np.asarray(t.column("doc_id").combine_chunks())
        keep = d >= 0
        d = d[keep]
        s_nll = np.asarray(t.column("s_nll").combine_chunks(),
                           dtype=np.float64)[keep]
        s_n = np.asarray(t.column("s_n").combine_chunks(),
                         dtype=np.float64)[keep]
        if not len(d):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "mean_nll": pa.array([], pa.float64())})
        order = np.argsort(d, kind="stable")
        d, s_nll, s_n = d[order], s_nll[order], s_n[order]
        start = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        mean = np.add.reduceat(s_nll, start) / np.add.reduceat(s_n, start)
        return pa.table({
            "doc_id": pa.array(d[start], pa.int64()),
            "mean_nll": pa.array([round_half_away(float(x), 4)
                                  for x in mean], pa.float64())})

    return bucketed_group_agg(joined, per_doc_part, "doc_id", per_doc_fin,
                              num_buckets=num_buckets)


def score_percentiles(documents: rd.Dataset) -> rd.Dataset:
    """(doc_id, quality, pct_rank): each document's global percentile rank
    of its :func:`quality_score` — pct_rank = (# strictly smaller) /
    (N - 1), the exact ``percent_rank() OVER (ORDER BY quality)``
    semantics — WITHOUT a global sort. Quality scores are rounded to 4
    decimals, so the distinct-value space is vocabulary-sized (<= ~10^4):
    a per-batch count-per-score partial collapses through
    ``small_key_agg`` to a tiny CDF table, which is broadcast once via
    ``ray.put`` for a stateless rank-attach map. The corpus is streamed
    twice and never sorted or collected."""
    import numpy as np
    import ray

    from raykg.ops.relational import small_key_agg

    scores = quality_score(documents)

    def count_part(t: pa.Table) -> pa.Table:
        g = t.group_by("quality").aggregate([("quality", "count")])
        return pa.table({"quality": g.column("quality"),
                         "n": g.column("quality_count")})

    def recombine(t: pa.Table) -> pa.Table:
        g = t.group_by("quality").aggregate([("n", "sum")])
        return pa.table({"quality": g.column("quality"),
                         "n": g.column("n_sum")})

    hist = small_key_agg(
        scores.map_batches(count_part, batch_format="pyarrow"), recombine)
    vals = np.asarray(hist.column("quality"), dtype=np.float64)
    cnts = np.asarray(hist.column("n"), dtype=np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    total = int(cnts.sum())
    smaller = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    denom = max(total - 1, 1)   # single-row corpus: rank 0.0
    pct = np.array([round_half_away(s / denom, 4) for s in smaller])
    ref = ray.put((vals, pct))

    def attach(t: pa.Table) -> pa.Table:
        v, p = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        q = np.asarray(t.column("quality"), dtype=np.float64)
        idx = np.searchsorted(v, q)
        return pa.table({"doc_id": t.column("doc_id"),
                         "quality": t.column("quality"),
                         "pct_rank": pa.array(p[idx], pa.float64())})

    return scores.map_batches(attach, batch_format="pyarrow")


def dsir_weights(documents: rd.Dataset, num_features: int = 1024,
                 num_buckets: int = 64,
                 hash_family: str = "sha") -> rd.Dataset:
    """(doc_id, dsir_logratio): DSIR-style importance weight per document
    — the hashed-n-gram importance-resampling signal of Xie et al.,
    "Data Selection for Language Models via Importance Resampling"
    (NeurIPS 2023). Tokens hash into ``num_features`` buckets
    (``sha_int(tok) % NF`` — the engine's shared sha256 contract, so the
    DuckDB twin is exact); the target distribution p is the bag of
    buckets over TARGET documents (here: docs the lang-ID heuristic
    calls 'en', i.e. >= 2 marker tokens — the "high-quality domain
    sample"), q is the bag over the whole corpus. Each doc scores the
    mean over its token instances of
    ``log2((t_b+1)/(T+NF)) - log2((r_b+1)/(R+NF))`` (add-one smoothing).
    Positive = looks more like the target than the raw corpus. Empty
    docs are omitted (nothing to score), matching the oracle's join.

    Shape at scale: one streamed counting pass whose exchange is
    register-sized (<= NF rows x 3 ints per batch partial, merged by
    SUM — linear/mergeable like the CMS), one ``ray.put`` of an
    NF-float array, one stateless scoring map. Nothing grows with the
    corpus; NF widens to 10^5-10^6 for real runs (DSIR uses 10^4).
    Unigrams only here so the oracle stays one SQL statement; adding
    hashed bigrams is the same partial with a second update line.

    ``hash_family="sha"`` is that oracle contract; ``"fast"`` (production)
    buckets by one vectorized crc32 pass per batch instead of a Python
    sha256 per token INSTANCE — the feature hash only needs uniformity,
    not SQL replicability, so the fast run has no DuckDB twin (decision
    agreement pinned in tests/test_hash_family_fast.py)."""
    import numpy as np
    import pyarrow.compute as pc

    from raykg.functions.hashing import crc_hash_array, sha_int
    from raykg.ops.relational import small_key_agg

    if hash_family not in ("sha", "fast"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    NF = num_features

    def _tok_buckets(toks: list[str]) -> np.ndarray:
        if hash_family == "fast":
            return (crc_hash_array(toks) % np.uint64(NF)).astype(np.int64)
        return np.array([sha_int(w) % NF for w in toks], np.int64)

    def _doc_buckets(s: str) -> np.ndarray:
        return _tok_buckets(_tokens(s))

    def partial(t: pa.Table) -> pa.Table:
        n_t = np.zeros(NF, np.int64)
        n_r = np.zeros(NF, np.int64)
        for s in t.column("text").to_pylist():
            toks = _tokens(s)
            if not toks:
                continue
            is_target = sum(1 for w in toks if w in EN_MARKERS) >= 2
            bks = _tok_buckets(toks)
            np.add.at(n_r, bks, 1)
            if is_target:
                np.add.at(n_t, bks, 1)
        nz = np.flatnonzero(n_r)
        if len(nz) == 0:   # typed sentinel row so zero-row blocks keep schema
            return pa.table({"b": pa.array([-1], pa.int64()),
                             "n_t": pa.array([0], pa.int64()),
                             "n_r": pa.array([0], pa.int64())})
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "n_t": pa.array(n_t[nz], pa.int64()),
                         "n_r": pa.array(n_r[nz], pa.int64())})

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("b").aggregate([("n_t", "sum"), ("n_r", "sum")])
        return pa.table({"b": g.column("b"), "n_t": g.column("n_t_sum"),
                         "n_r": g.column("n_r_sum")})

    counts = combine(small_key_agg(
        documents.select_columns(["text"]).map_batches(
            partial, batch_format="pyarrow"), combine))
    counts = counts.filter(pc.greater_equal(counts.column("b"), 0))
    bs = counts.column("b").to_numpy(zero_copy_only=False)
    t_arr = np.zeros(NF, np.float64)
    r_arr = np.zeros(NF, np.float64)
    t_arr[bs] = counts.column("n_t").to_numpy(zero_copy_only=False)
    r_arr[bs] = counts.column("n_r").to_numpy(zero_copy_only=False)
    T, R = float(t_arr.sum()), float(r_arr.sum())
    lr = (np.log2((t_arr + 1.0) / (T + NF))
          - np.log2((r_arr + 1.0) / (R + NF)))

    import ray
    ref = ray.put(lr)

    def score(t: pa.Table) -> pa.Table:
        w = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids, out = [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            bks = _doc_buckets(s)
            if len(bks) == 0:
                continue
            ids.append(d)
            out.append(round_half_away(float(np.mean(w[bks])), 4))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "dsir_logratio": pa.array(out, pa.float64())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


def bm25_scores(documents: rd.Dataset,
                terms: tuple = ("data", "query", "spark"),
                k1: float = 1.2, b: float = 0.75) -> rd.Dataset:
    """(doc_id, bm25): Okapi BM25 score of each document against a fixed
    query term set — the retrieval-style relevance filter of a
    training-data pipeline (keep docs that look like a target query /
    seed set). idf is the Lucene-style always-positive variant
    ``ln((N - df + 0.5)/(df + 0.5) + 1)``. Only documents containing at
    least one query term are emitted (retrieval semantics; also what
    the oracle's join produces).

    Two passes, both corpus-independent in exchange volume: pass 1
    emits one (|terms|+1)-row partial per batch (df per query term +
    the doc-count/total-length stats on a sentinel row) merged by SUM;
    pass 2 is a stateless scoring map over a broadcast of |terms|
    floats. Nothing scales with corpus size except the streamed read."""
    import math
    from collections import Counter

    import numpy as np

    from raykg.ops.relational import small_key_agg

    # dedup, order-preserving: a repeated query term would double-count
    # its df partials (deflating idf) while scoring counts it once
    tset = list(dict.fromkeys(terms))

    def partial(t: pa.Table) -> pa.Table:
        df: Counter = Counter()
        n_docs = 0
        sum_dl = 0
        for s in t.column("text").to_pylist():
            toks = _tokens(s)
            if not toks:
                continue
            n_docs += 1
            sum_dl += len(toks)
            seen = set(toks)
            for q in tset:
                if q in seen:
                    df[q] += 1
        return pa.table({
            "term": pa.array([""] + tset, pa.string()),
            "df": pa.array([0] + [df[q] for q in tset], pa.int64()),
            "n_docs": pa.array([n_docs] + [0] * len(tset), pa.int64()),
            "sum_dl": pa.array([sum_dl] + [0] * len(tset), pa.int64()),
        })

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("term").aggregate(
            [("df", "sum"), ("n_docs", "sum"), ("sum_dl", "sum")])
        return pa.table({"term": g.column("term"),
                         "df": g.column("df_sum"),
                         "n_docs": g.column("n_docs_sum"),
                         "sum_dl": g.column("sum_dl_sum")})

    stats = combine(small_key_agg(
        documents.select_columns(["text"]).map_batches(
            partial, batch_format="pyarrow"), combine))
    row = {r["term"]: r for r in stats.to_pylist()}
    N = float(row[""]["n_docs"])
    avgdl = row[""]["sum_dl"] / N if N else 1.0
    idf = {q: math.log((N - row[q]["df"] + 0.5)
                       / (row[q]["df"] + 0.5) + 1.0) for q in tset}

    import ray
    ref = ray.put((idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        idf_m, ad = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids, out = [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            toks = _tokens(s)
            if not toks:
                continue
            c = Counter(w for w in toks if w in idf_m)
            if not c:
                continue
            dl = len(toks)
            sc = sum(idf_m[q] * f * (k1 + 1.0)
                     / (f + k1 * (1.0 - b + b * dl / ad))
                     for q, f in c.items())
            ids.append(d)
            out.append(round_half_away(sc, 4))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "bm25": pa.array(out, pa.float64())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


def ngram_novelty(documents: rd.Dataset, gram: int = 3,
                  num_buckets: int = 256) -> rd.Dataset:
    """(doc_id, n_grams, novel_grams, novelty): per-document n-gram
    novelty — the fraction of a document's DISTINCT token ``gram``-grams
    whose corpus-wide first occurrence (minimum doc_id over every
    document containing the gram) is this document. The "how much new
    text does each shard contribute" signal data-curation pipelines use
    to order or down-weight crawl snapshots (novelty ~0 means the doc is
    assembled entirely from already-seen phrasing even when no single
    near-dup pair fires). Counts are exact int64; ``novelty`` is one
    rounded division, so the DuckDB twin (unnest grams -> min(doc_id)
    per gram -> join back) matches bit-for-bit.

    Scale shape: the (gram, doc_id) pair stream is exchanged ONCE keyed
    by gram (bucketed crc32, so a ubiquitous gram cannot overload a
    partition beyond its bucket's share); each bucket resolves its
    grams' global min locally and emits the pair stream back annotated
    with a 0/1 novelty flag, which a second doc-keyed exchange reduces
    to three registers per document. Nothing vocabulary-sized is ever
    broadcast or pulled to the driver."""
    import pyarrow.compute as pc

    from raykg.functions.shuffle import bucketed_group_agg
    from raykg.ops.dedup import _grams

    def pair_rows(t: pa.Table) -> pa.Table:
        # sentinel gram "" cannot occur: _grams only joins non-empty
        # token lists (empty text contributes no rows)
        gs, ds = [""], [-1]
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            for g in _grams(s, gram):
                gs.append(g)
                ds.append(d)
        return pa.table({"gram": pa.array(gs, pa.string()),
                         "doc_id": pa.array(ds, pa.int64())})

    def flag_fin(t: pa.Table) -> pa.Table:
        # per-gram global min is complete inside the bucket; re-emit
        # every (doc, flag) pair plus the per-bucket sentinel
        firsts = t.group_by("gram").aggregate([("doc_id", "min")])
        m = {g: d for g, d in zip(firsts.column("gram").to_pylist(),
                                  firsts.column("doc_id_min").to_pylist())}
        docs = t.column("doc_id").to_pylist()
        novel = [1 if m[g] == d else 0
                 for g, d in zip(t.column("gram").to_pylist(), docs)]
        return pa.table({"doc_id": pa.array(docs + [-1], pa.int64()),
                         "novel": pa.array(novel + [0], pa.int64()),
                         "n": pa.array([1] * len(docs) + [0], pa.int64())})

    flagged = bucketed_group_agg(
        documents.select_columns(["doc_id", "text"]).map_batches(
            pair_rows, batch_format="pyarrow"),
        lambda t: t, "gram", flag_fin, num_buckets=num_buckets)

    def doc_comb(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("novel", "sum"), ("n", "sum")])
        # unconditional sentinel: a zero-row combine batch must still emit
        # a schema-bearing block (functions/shuffle.py convention)
        return pa.table({
            "doc_id": pa.array(g.column("doc_id").to_pylist() + [-1],
                               pa.int64()),
            "novel": pa.array(g.column("novel_sum").to_pylist() + [0],
                              pa.int64()),
            "n": pa.array(g.column("n_sum").to_pylist() + [0], pa.int64())})

    def doc_fin(t: pa.Table) -> pa.Table:
        g = t.group_by("doc_id").aggregate([("novel", "sum"), ("n", "sum")])
        g = g.filter(pc.greater_equal(g.column("doc_id"), 0))
        ns = g.column("n_sum").to_pylist()
        nov = g.column("novel_sum").to_pylist()
        if not ns:   # sentinel-only bucket: re-emit one sentinel row
            return pa.table({"doc_id": pa.array([-1], pa.int64()),
                             "n_grams": pa.array([0], pa.int64()),
                             "novel_grams": pa.array([0], pa.int64()),
                             "novelty": pa.array([0.0], pa.float64())})
        rat = [round_half_away(a / b, 4) for a, b in zip(nov, ns)]
        return pa.table({"doc_id": g.column("doc_id"),
                         "n_grams": pa.array(ns, pa.int64()),
                         "novel_grams": pa.array(nov, pa.int64()),
                         "novelty": pa.array(rat, pa.float64())})

    out = bucketed_group_agg(flagged, doc_comb, "doc_id", doc_fin,
                             num_buckets=num_buckets)
    return out.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("doc_id"), 0)),
        batch_format="pyarrow")


_VOWEL_GROUPS = re.compile(r"[aeiouy]+")
_SENT_BREAKS = re.compile(r"[.!?]+")


def readability(documents: rd.Dataset) -> rd.Dataset:
    """(doc_id, fk_grade): Flesch-Kincaid grade level,
    0.39*(words/sentences) + 11.8*(syllables/words) - 15.59 — the
    classic corpus-filtering readability feature (syllables approximated
    as maximal vowel-group runs [aeiouy]+ per lowercased token, floored
    at 1 per word; sentences = [.!?]+ runs, floored at 1). Zero-token
    documents emit no row (grade undefined), matching the SQL twin's
    inner join. Stateless vectorizable map; the two regexes compile once
    at module import, not per batch."""

    def batch(t: pa.Table) -> pa.Table:
        doc_ids, grades = [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            toks = _tokens(s)
            words = len(toks)
            if words == 0:
                continue
            syls = sum(max(1, len(_VOWEL_GROUPS.findall(w.lower())))
                       for w in toks)
            sents = max(1, len(_SENT_BREAKS.findall(s)))
            doc_ids.append(d)
            grades.append(round_half_away(
                0.39 * (words / sents) + 11.8 * (syls / words) - 15.59, 4))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "fk_grade": pa.array(grades, pa.float64())})

    return documents.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow")
