"""Typed configuration for the KG-construction engine.

The reference scatters its knobs across constants (label vocabulary at
src2/main/scala/Main.scala:17 and src2/main/scala/DataToPattern.scala:9,
LSH thresholds at src/main/scala/Clustering.scala:40-41 and
src2/main/scala/LSH.scala:12-13, optionality threshold at
src2/main/scala/Main.scala:268). Here they live in one seeded dataclass so
every run — and the single-process oracle — is reproducible bit-for-bit
regardless of partitioning or cluster size.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


# Closed label vocabulary (reference analog: predefined label list,
# src2/main/scala/DataToPattern.scala:9).
NODE_LABELS = ("Person", "Organisation", "Place", "Product")

# Closed predicate vocabulary: predicate id -> surface phrase tokens.
PREDICATES = {
    "works_at": ("works", "at"),
    "located_in": ("located", "in"),
    "part_of": ("part", "of"),
    "founded": ("founded",),
    "acquired": ("acquired",),
    "knows": ("knows",),
}

# Predicate used for media-span caption mentions (doc -> entity).
MEDIA_PREDICATE = "depicts"

# Filler vocabulary for text spans. Must not collide with predicate phrase
# tokens or entity surface forms.
FILLER_WORDS = (
    "the", "a", "reportedly", "yesterday", "meanwhile", "sources", "say",
    "today", "officials", "confirmed", "earlier", "later", "again",
)

URI_PREFIX = "sdpg.gr"  # reference: src2/main/scala/DataToPattern.scala:21


@dataclass(frozen=True)
class KGConfig:
    """All knobs for synthesis, extraction, linking, canonicalization and
    schema discovery. Frozen + hashable so it can ride inside actor
    constructor kwargs and be broadcast once per actor pool."""

    seed: int = 42

    # --- synthetic corpus (FIXTURES.md F1) ---
    n_docs: int = 1000
    n_entities: int = 0          # 0 -> derived: max(64, n_docs // 8)
    zipf_alpha: float = 1.15     # entity popularity skew (exercises hot keys)
    max_spans_per_doc: int = 16
    media_span_rate: float = 0.25
    typo_rate: float = 0.03      # fraction of mentions with one char dropped
    dup_entity_mod: int = 17     # entity i with i % mod == dup_entity_rem is a
    dup_entity_rem: int = 13     # coreferent duplicate of entity i-1
    prop_noise: float = 0.0      # probability a node property is absent

    # --- mention detection (stages/extract.py) ---
    # "digit":       candidate iff the token contains a digit — structural
    #                for the synthetic vocabulary (every synth surface does,
    #                no filler or predicate word does).
    # "capitalized": candidate iff the token starts with an ASCII uppercase
    #                letter — the real-text convention (proper nouns); used
    #                by the checked-in demo corpus (fixtures/demo).
    # Detection only nominates candidates; RESOLUTION is always the alias
    # dictionary + fuzzy scoring in the linker, so a false candidate costs
    # one dictionary miss, never a wrong triple.
    mention_detector: str = "digit"

    # --- entity linking (reference analog: LSH.scala:12-13) ---
    link_shingle_k: int = 3
    link_num_hashes: int = 16
    link_num_bands: int = 8      # 8 bands x 2 rows (high recall at J>=0.5)
    link_jaccard_threshold: float = 0.34

    # --- canonicalization ---
    salt_buckets: int = 16       # salted-key fan-out for hot entity keys

    # --- schema discovery (reference analog: Clustering.scala:39-54) ---
    minhash_similarity: float = 0.8     # s
    minhash_collision_p: float = 0.9    # P
    minhash_tables: int = 0             # 0 -> derived from dataset size below
    optional_threshold: float = 0.95    # src2/main/scala/Main.scala:268
    drop_self_cluster_edges: bool = False  # reference quirk M13 (flag)

    # --- execution ---
    batch_size: int = 4096
    link_concurrency: int = 4

    @property
    def num_entities(self) -> int:
        return self.n_entities if self.n_entities > 0 else max(64, self.n_docs // 8)

    def derived_minhash_tables(self, dataset_size: int) -> int:
        """Reference sizing rule (src/main/scala/Clustering.scala:13-28,39-54):
        b = ceil(log(1-P)/log(1-s)) scaled by log10(datasetSize), floored at b."""
        if self.minhash_tables > 0:
            return self.minhash_tables
        base = math.ceil(math.log(1.0 - self.minhash_collision_p)
                         / math.log(1.0 - self.minhash_similarity))
        if dataset_size <= 1:
            return base
        adjusted = math.ceil(base * math.log10(max(10, dataset_size)))
        return max(base, adjusted)


@dataclass(frozen=True)
class NodeSynthConfig:
    """Synthetic property-graph node/relationship tables (FIXTURES.md F2/F3),
    mirroring the reference's LDBC-like label signatures."""

    seed: int = 42
    n_nodes: int = 2000
    n_edges: int = 4000
    noise: float = 0.0           # per-cell null probability (F4 protocol)
    # Optional label mix (same order as LABEL_SIGNATURES, ~sums to 1).
    # None = round-robin uniform (the pinned fixture default). The
    # same-label KNOWS edge construction in gen_pg_rel_rows assumes the
    # round-robin layout, so weighted mixes are for node-only protocols
    # (the noise sweep).
    label_weights: tuple | None = None


# Per-label property signatures (FIXTURES.md F2; reference ground truth shape
# printed in /root/reference/output/output_ldbc_10.txt).
LABEL_SIGNATURES = {
    "Person": ("id", "firstName", "lastName", "gender", "birthday",
               "browserUsed", "locationIP", "creationDate"),
    "Comment": ("id", "content", "length", "browserUsed", "locationIP",
                "creationDate", "language"),
    "Post": ("id", "content", "length", "browserUsed", "locationIP",
             "creationDate"),
    "Forum": ("id", "title", "creationDate"),
    "Tag": ("id", "name", "url"),
    "Place": ("id", "name", "url", "type"),
    "Organisation": ("id", "name", "url", "type"),
}

REL_TYPES = ("KNOWS", "HAS_CREATOR", "REPLY_OF", "IS_LOCATED_IN", "CONTAINS")

# Property signatures for synthesized KG entities (attached at graph
# materialization; deterministic per entity id).
KG_LABEL_PROPS = {
    "Person": ("name", "firstName", "lastName", "birthday"),
    "Organisation": ("name", "url", "foundedYear"),
    "Place": ("name", "latitude", "longitude"),
    "Product": ("name", "category", "price"),
}
