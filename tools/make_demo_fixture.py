"""Generate the checked-in real-text demo corpus (fixtures/demo).

A tiny NON-synthetic end-to-end input for ``python -m raykg.job``: original
public-domain-style sentences about historical figures, plus the two
catalog tables (catalog.py ALIASES / ENTITY_METADATA) that supply the
entity vocabulary as data. Nothing here goes through ``raykg.synth`` —
this is the corpus shape a real user brings: their documents, their alias
dictionary, their entity metadata.

The fixture deliberately exercises every linking path:
  - exact alias hits (``Curie``, ``Sorbonne``, ``Paris``, ...)
  - a typo'd mention (``Sklodowsk`` -> Sklodowska via single-deletion
    blocking + the exact-Jaccard gate)
  - a coreferent duplicate entity (``MadameCurie`` has the same norm_name
    as ``Curie`` -> canonicalization merges them)
  - media spans with caption mentions (-> ``depicts`` triples)
  - capitalized non-entities are impossible by construction (all filler is
    lowercase), so the ``capitalized`` detector nominates exactly the
    mention tokens.

Run from the repo root (rewrites fixtures/demo in place):
    python tools/make_demo_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from raykg import schema  # noqa: E402
from raykg.catalog import ALIASES, ENTITY_METADATA  # noqa: E402

OUT = os.path.join(_REPO, "fixtures", "demo")

# --- entity vocabulary -------------------------------------------------
# (ent, entity_id, label, norm_name, properties). ent order is the exact-hit
# tie-break priority. Entities 0 and 1 share a norm_name on purpose: the
# canonicalizer must merge them (canon = min uri of the group).
ENTITIES = [
    (0, "demo:P-curie", "Person", "marie curie",
     {"name": "Marie Curie", "firstName": "Marie", "lastName": "Curie"}),
    (1, "demo:P-curie-dup", "Person", "marie curie",
     {"name": "Madame Curie"}),
    (2, "demo:P-einstein", "Person", "albert einstein",
     {"name": "Albert Einstein", "firstName": "Albert",
      "lastName": "Einstein"}),
    (3, "demo:O-sorbonne", "Organisation", "sorbonne university",
     {"name": "Sorbonne University", "url": "https://example.org/sorbonne"}),
    (4, "demo:O-solvay", "Organisation", "solvay institute",
     {"name": "Solvay Institute", "url": "https://example.org/solvay"}),
    (5, "demo:L-paris", "Place", "paris",
     {"name": "Paris", "latitude": "48.85", "longitude": "2.35"}),
    (6, "demo:L-warsaw", "Place", "warsaw",
     {"name": "Warsaw", "latitude": "52.23", "longitude": "21.01"}),
    (7, "demo:PR-radium", "Product", "radium",
     {"name": "Radium", "category": "element"}),
]

ALIAS_ROWS = [
    ("Curie", 0), ("Sklodowska", 0),
    ("MadameCurie", 1),
    ("Einstein", 2),
    ("Sorbonne", 3),
    ("Solvay", 4),
    ("Paris", 5),
    ("Warsaw", 6),
    ("Radium", 7),
]

# --- documents ----------------------------------------------------------
# (doc_id, [(kind, text, media_ref)...]); offsets assigned positionally.
# All filler is lowercase so 'capitalized' nominates exactly the mentions.
DOCS = [
    ("demo-d01", [
        ("text", "the chemist Curie works at Sorbonne", ""),
        ("image", "portrait of Curie", "media://demo-d01-0"),
    ]),
    ("demo-d02", [("text", "meanwhile Sorbonne located in Paris", "")]),
    ("demo-d03", [("text", "sources say Sklodowska knows Einstein", "")]),
    ("demo-d04", [("text", "reportedly Einstein works at Solvay", "")]),
    # typo'd mention (one dropped char): single-deletion blocking must
    # resolve Sklodowsk -> Sklodowska (J = 7/8 over 3-shingles; a shorter
    # surface like Curei would fall below the 0.34 Jaccard gate)
    ("demo-d05", [("text", "later Sklodowsk works at Sorbonne", "")]),
    ("demo-d06", [("text", "earlier Solvay located in Paris", "")]),
    ("demo-d07", [("text", "officials say Curie acquired Radium", "")]),
    # coreferent duplicate surface: canonicalizes to the Curie group
    ("demo-d08", [("text", "again MadameCurie works at Sorbonne", "")]),
    ("demo-d09", [("image", "lecture at Sorbonne", "media://demo-d09-0")]),
    ("demo-d10", [
        ("text", "colleagues confirmed Einstein knows Curie", ""),
        ("text", "earlier Sklodowska located in Warsaw", ""),
    ]),
]


def documents_table() -> pa.Table:
    doc_ids, spans = [], []
    for doc_id, doc_spans in DOCS:
        doc_ids.append(doc_id)
        spans.append([
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(doc_spans)
        ])
    return pa.Table.from_arrays(
        [pa.array(doc_ids, pa.string()),
         pa.array(spans, pa.list_(schema.SPAN_STRUCT))],
        schema=schema.DOCUMENTS)


def aliases_table() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([a for a, _ in ALIAS_ROWS], pa.string()),
         pa.array([e for _, e in ALIAS_ROWS], pa.int64())],
        schema=ALIASES)


def metadata_table() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([e[0] for e in ENTITIES], pa.int64()),
         pa.array([e[1] for e in ENTITIES], pa.string()),
         pa.array([e[2] for e in ENTITIES], pa.string()),
         pa.array([e[3] for e in ENTITIES], pa.string()),
         pa.array([sorted(e[4].items()) for e in ENTITIES],
                  pa.map_(pa.string(), pa.string()))],
        schema=ENTITY_METADATA)


def main() -> None:
    for name, table in (("documents", documents_table()),
                        ("aliases", aliases_table()),
                        ("entity_metadata", metadata_table())):
        d = os.path.join(OUT, name)
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "part-0.parquet"))
        print(f"wrote {d} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
