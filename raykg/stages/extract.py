"""Stateless triple/mention extraction over interleaved documents.

Reference analog: the per-row pattern/instance extractor that runs in a
driver-side ``df.collect()`` loop (src2/main/scala/DataToPattern.scala:11-51)
and the label detector (DataToPattern.scala:53-73). Here it is a pure
``map_batches`` stage over Arrow batches: no driver funneling, no state, scales
by adding blocks. Mention *detection* nominates candidate tokens by a cheap
structural rule (``KGConfig.mention_detector``: "digit" for the synthetic
vocabulary — every synth surface carries a digit, no filler or predicate word
does — or "capitalized" for real text, i.e. proper nouns); *resolution* to
entity ids happens in the stateful linker stage (stages/link.py), so a false
candidate costs one dictionary miss, never a wrong triple.

The per-row span-sequence invariant (kind, text, media_ref, order) is
untouched: this stage only reads `spans` and emits new rows keyed by
``(doc_id, span_idx)`` provenance.
"""

from __future__ import annotations

import pyarrow as pa

from raykg import schema
from raykg.config import PREDICATES

_DIGITS = set("0123456789")

# predicate phrase (tuple of tokens) -> predicate id; longest phrases first
_PHRASE_TO_PRED = sorted(
    ((phrase, pid) for pid, phrase in PREDICATES.items()),
    key=lambda x: -len(x[0]),
)
_MAX_PHRASE = max(len(p) for p, _ in _PHRASE_TO_PRED)


def _is_candidate(token: str, detector: str = "digit") -> bool:
    if detector == "capitalized":
        return "A" <= token[:1] <= "Z"
    return not _DIGITS.isdisjoint(token)


def extract_span_events(doc_id: str, span_idx: int, kind: str, text: str,
                        offset: int, detector: str = "digit") -> list[tuple]:
    """Pure per-span extraction shared by the distributed stage and the
    single-process oracle. Returns EXTRACTIONS-shaped tuples."""
    if not text:
        return []
    tokens = text.split()
    events: list[tuple] = []
    if kind != "text":
        for t in tokens:
            if _is_candidate(t, detector):
                events.append((doc_id, span_idx, offset, "caption", "", t, ""))
        return events
    cand_pos = [i for i, t in enumerate(tokens) if _is_candidate(t, detector)]
    for p in cand_pos:
        events.append((doc_id, span_idx, offset, "mention", "", tokens[p], ""))
    for a, b in zip(cand_pos, cand_pos[1:]):
        gap = tuple(tokens[a + 1:b])
        if 0 < len(gap) <= _MAX_PHRASE:
            for phrase, pid in _PHRASE_TO_PRED:
                if gap == phrase:
                    events.append((doc_id, span_idx, offset, "relation", pid,
                                   tokens[a], tokens[b]))
                    break
    return events


def extract_batch(batch: pa.Table, detector: str = "digit") -> pa.Table:
    """map_batches body: documents batch -> EXTRACTIONS batch."""
    doc_ids = batch.column("doc_id").to_pylist()
    spans_col = batch.column("spans").to_pylist()
    rows: list[tuple] = []
    for doc_id, spans in zip(doc_ids, spans_col):
        for si, span in enumerate(spans):
            rows.extend(extract_span_events(
                doc_id, si, span["kind"], span["text"], span["offset"],
                detector))
    if not rows:
        return schema.EXTRACTIONS.empty_table()
    cols = list(zip(*rows))
    return pa.Table.from_arrays(
        [pa.array(cols[0], pa.string()), pa.array(cols[1], pa.int32()),
         pa.array(cols[2], pa.int32()), pa.array(cols[3], pa.string()),
         pa.array(cols[4], pa.string()), pa.array(cols[5], pa.string()),
         pa.array(cols[6], pa.string())],
        schema=schema.EXTRACTIONS)
