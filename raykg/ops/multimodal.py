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


# ---------------------------------------------------------------------------
# Opaque BINARY payload columns (task brief: "treat image/audio/video as
# opaque binary columns with typed metadata"). The container has no codecs,
# so payload bytes are sha256-derived (deterministic, SQL-reproducible from
# the generative formula) and the "decoder" parses REAL bytes out of the
# binary column — the Arrow plumbing (binary arrays, small actor-pool
# batches, metadata structs) is exactly what a PIL/ffmpeg stage would use.
# ---------------------------------------------------------------------------

MEDIA_BLOBS = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque bytes (sha-derived fake)
    ("n_bytes", pa.int64()),
])

_KINDS = ("image", "audio", "video")


def synth_media_blobs(n: int, seed: int = 42) -> rd.Dataset:
    """Deterministic blob table: payload = sha256 digest bytes of
    'blob|seed|id' repeated to length 64 + (first-4-hex-int % 1024)."""
    import hashlib

    import ray.data as rd

    def gen(b) -> pa.Table:
        ids = [int(x) for x in b["id"]]
        kinds, payloads, sizes = [], [], []
        for i in ids:
            digest = hashlib.sha256(f"blob|{seed}|{i}".encode()).digest()
            length = 64 + int(digest[:2].hex(), 16) % 1024
            payload = (digest * ((length // 32) + 1))[:length]
            kinds.append(_KINDS[digest[2] % 3])
            payloads.append(payload)
            sizes.append(length)
        return pa.Table.from_pydict(
            {"media_id": ids, "kind": kinds, "payload": payloads,
             "n_bytes": sizes}, schema=MEDIA_BLOBS)

    return rd.range(n, override_num_blocks=max(1, n // 1000)) \
        .map_batches(gen, batch_format="numpy", batch_size=1000)


def decode_blob_meta(blobs: rd.Dataset,
                     concurrency: tuple[int, int] = (1, 4),
                     batch_size: int = 256) -> rd.Dataset:
    """Actor-pool 'decode': parse width/height/duration out of the ACTUAL
    payload bytes (a real decoder would parse a real header here). Small
    batches on purpose — decoded media is large (ray_guide 'Memory-aware').
    Output: (media_id, kind, n_bytes, width, height, duration_ms)."""

    class Decode:
        def __init__(self):
            self.calls = 0        # stands in for per-actor codec state

        def __call__(self, t: pa.Table) -> pa.Table:
            self.calls += 1
            w_col, h_col, d_col = [], [], []
            for p in t.column("payload").to_pylist():
                w_col.append(16 + (p[0] | (p[1] << 8)) % 2048)
                h_col.append(16 + (p[2] | (p[3] << 8)) % 2048)
                d_col.append((p[4] | (p[5] << 8)) % 60000)
            return pa.table({
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "n_bytes": t.column("n_bytes"),
                "width": pa.array(w_col, pa.int32()),
                "height": pa.array(h_col, pa.int32()),
                "duration_ms": pa.array(d_col, pa.int32()),
            })

    return blobs.map_batches(Decode, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)


def resize_images(blobs: rd.Dataset, factor: int = 2,
                  concurrency: tuple[int, int] = (1, 4),
                  batch_size: int = 256) -> rd.Dataset:
    """Actor-pool 'resize' over image rows only: emits a new (smaller)
    binary payload plus the scaled dimensions. The fake keeps the first
    1/factor^2 of the bytes; a real stage would re-encode. Output:
    (media_id, width, height, new_bytes)."""
    import pyarrow.compute as pc

    class Resize:
        def __call__(self, t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("kind"), "image"))
            ids, w_col, h_col, out_bytes = [], [], [], []
            for mid, p in zip(t.column("media_id").to_pylist(),
                              t.column("payload").to_pylist()):
                w = 16 + (p[0] | (p[1] << 8)) % 2048
                h = 16 + (p[2] | (p[3] << 8)) % 2048
                ids.append(mid)
                w_col.append(w // factor)
                h_col.append(h // factor)
                out_bytes.append(len(p[:max(1, len(p) // (factor * factor))]))
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(w_col, pa.int32()),
                "height": pa.array(h_col, pa.int32()),
                "new_bytes": pa.array(out_bytes, pa.int64()),
            })

    return blobs.map_batches(Resize, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)


def sample_frames(blobs: rd.Dataset, frames: int = 3) -> rd.Dataset:
    """flat-map stage: video rows explode to ``frames`` frame references
    (frame_ref = sha256('frame|<media_id>|<idx>')[:16]), mirroring
    frame-sampling before per-frame featurization.
    Output: (media_id, frame_idx, frame_ref)."""
    import pyarrow.compute as pc

    def explode(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("kind"), "video"))
        ids, idxs, refs = [], [], []
        for mid in t.column("media_id").to_pylist():
            for fi in range(frames):
                ids.append(mid)
                idxs.append(fi)
                refs.append(sha_hex(f"frame|{mid}|{fi}")[:16])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame_ref": pa.array(refs, pa.string()),
        })

    return blobs.map_batches(explode, batch_format="pyarrow")


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
