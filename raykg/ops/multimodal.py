"""Multimodal column handling: image/audio media as opaque binary refs with
typed metadata, processed by actor-pool map_batches stages.

The container ships no image/audio codecs, so the DECODE step is a
clearly-marked deterministic fake (sha256-seeded feature vector) behind the
same actor signature a real decoder would use — the Ray-side plumbing
(schema, batch size, actor pool, output layout) is real and tested. Swap
``_FakeDecoder.decode`` for a PIL/torchaudio call when the libs exist; the
pipeline around it does not change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from raykg.functions.hashing import sha_hex

MEDIA_FEATURES = pa.schema([
    ("doc_id", pa.string()),
    ("span_idx", pa.int32()),
    ("media_ref", pa.string()),
    ("kind", pa.string()),
    ("width", pa.int32()),        # fake-decoded metadata
    ("height", pa.int32()),
    ("feature", pa.list_(pa.float32())),  # embedding-like feature vector
])


class _FakeDecoder:
    """Deterministic stand-in for an image/audio decoder + featurizer."""

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def decode(self, media_ref: str) -> tuple[int, int, np.ndarray]:
        # NotImplementedError would be raised here by a real decoder missing
        # its codec; the deterministic fake keeps the pipeline testable.
        h = sha_hex(media_ref)
        width = 64 + int(h[:4], 16) % 1024
        height = 64 + int(h[4:8], 16) % 1024
        rng = np.random.default_rng(int(h[8:16], 16))
        feat = rng.standard_normal(self.feature_dim).astype(np.float32)
        return width, height, feat


def extract_media_spans(documents: rd.Dataset) -> rd.Dataset:
    """Explode non-text spans to one row each, carrying (doc_id, span_idx)
    provenance so the span order can always be restored."""

    def explode(t: pa.Table) -> pa.Table:
        doc_ids, idxs, refs, kinds = [], [], [], []
        for d, spans in zip(t.column("doc_id").to_pylist(),
                            t.column("spans").to_pylist()):
            for si, s in enumerate(spans):
                if s["kind"] != "text":
                    doc_ids.append(d)
                    idxs.append(si)
                    refs.append(s["media_ref"])
                    kinds.append(s["kind"])
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "span_idx": pa.array(idxs, pa.int32()),
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
        })

    return documents.map_batches(explode, batch_format="pyarrow")


def media_features(documents: rd.Dataset, feature_dim: int = 16,
                   concurrency: tuple[int, int] = (1, 4),
                   batch_size: int = 1024) -> rd.Dataset:
    """Actor-pool decode/featurize stage. Small batch_size on purpose:
    real decoded media is large, so batch x concurrency must fit worker
    heaps (ray_guide 'Memory-aware')."""

    class Decode:
        def __init__(self):
            self.decoder = _FakeDecoder(feature_dim)   # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            widths, heights, feats = [], [], []
            for ref in t.column("media_ref").to_pylist():
                w, h, f = self.decoder.decode(ref)
                widths.append(w)
                heights.append(h)
                feats.append(f)
            return pa.Table.from_arrays([
                t.column("doc_id"), t.column("span_idx"),
                t.column("media_ref"), t.column("kind"),
                pa.array(widths, pa.int32()), pa.array(heights, pa.int32()),
                pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            ], schema=MEDIA_FEATURES)

    return extract_media_spans(documents).map_batches(
        Decode, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
