"""Arrow schemas for every table flowing through the engine.

The reference's node table is a wide sparse all-string DataFrame whose schema
is the union of all observed property keys (src/main/scala/DataLoader.scala:36-42).
That shape is hostile at scale (unbounded width, schema drift per shard), so the
engine fixes the physical schema and moves sparsity into a
``map<string,string>`` column — equivalent content, bounded schema (SURVEY §1.3).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),        # "text" | "image" | "audio" | "table"
    ("text", pa.string()),        # mention-bearing text / caption ("" allowed)
    ("media_ref", pa.string()),   # "" for text spans; "media://<hash>" otherwise
    ("offset", pa.int32()),       # monotonically increasing within the row
])

# Primary input (BASELINE.json input_hint / FIXTURES.md F1).
DOCUMENTS = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

# Extraction events, before linking. (doc_id, span_idx) carries span-sequence
# provenance so list order can always be restored. A "relation" row carries
# BOTH surfaces, so triple assembly after linking needs no shuffle join.
EXTRACTIONS = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("span_offset", pa.int32()),
    ("etype", pa.string()),       # "relation" | "mention" | "caption"
    ("pred", pa.string()),        # predicate id for relation rows, else ""
    ("surface", pa.string()),     # subject surface (relation) / mention surface
    ("surface2", pa.string()),    # object surface for relation rows, else ""
])

TRIPLES = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("doc_id", pa.string()),
    ("span_offset", pa.int32()),
])

NODES = pa.schema([
    ("uri", pa.string()),
    ("label", pa.string()),
    ("properties", pa.map_(pa.string(), pa.string())),
])

EDGES = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
])

# Property-graph node table (FIXTURES.md F2) in bounded-schema form.
PG_NODES = pa.schema([
    ("node_id", pa.string()),
    ("labels", pa.string()),      # ground-truth label (colon-joined if multiple)
    ("properties", pa.map_(pa.string(), pa.string())),
])

PG_RELATIONSHIPS = pa.schema([
    ("src_id", pa.string()),
    ("dst_id", pa.string()),
    ("rel_type", pa.string()),
    ("properties", pa.map_(pa.string(), pa.string())),
])

# Discovered schema elements. The reference carries is_optional /
# min_cardinality / max_cardinality on its Node and Edge schema elements but
# only ever with their constant defaults (false, 1, 1 —
# src/main/scala/com/models/Pattern.scala:2-20); here they are COMPUTED:
# node is_optional from the optional-property set, edge cardinalities from
# observed per-source edge counts, edge is_optional from coverage of the
# source label's node population.
NODE_TYPES = pa.schema([
    ("cluster_key", pa.string()),
    ("label", pa.string()),
    ("required_props", pa.list_(pa.string())),
    ("optional_props", pa.list_(pa.string())),
    ("count", pa.int64()),
    ("is_optional", pa.bool_()),
    ("min_cardinality", pa.int64()),
    ("max_cardinality", pa.int64()),
])

EDGE_TYPES = pa.schema([
    ("rel_type", pa.string()),
    ("src_label", pa.string()),
    ("dst_label", pa.string()),
    ("count", pa.int64()),
    ("required_props", pa.list_(pa.string())),
    ("optional_props", pa.list_(pa.string())),
    ("is_optional", pa.bool_()),
    ("min_cardinality", pa.int64()),   # min edges of this type per observed
    ("max_cardinality", pa.int64()),   # source node / max respectively
])
