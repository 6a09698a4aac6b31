"""Deterministic hashing primitives shared by the distributed pipeline, the
single-process oracle, and the DuckDB oracle SQL.

Two families:

- **SHA-256-based** (`sha_hex`, `mint_uri`, `stable_frac_hex`, `minhash_sig_sha`)
  — byte-for-byte reproducible in DuckDB (`sha256()`, `substr`, lexicographic
  hex compare), used wherever an ANSI-SQL oracle must replicate the value.
  Reference analogs: SHA-256 URI minting (src2/main/scala/DataToPattern.scala:75-79),
  MinHash cluster keys (src/main/scala/Clustering.scala:80-84).
- **numpy-vectorized** (`crc_hash_array`, `minhash_matrix`, `simhash64`) — fast
  64/32-bit hashing for hot paths (near-dup MinHash over millions of shingles)
  where no SQL parity is needed; stable across processes and partitionings
  (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

from raykg.config import URI_PREFIX

_MERSENNE = (1 << 61) - 1


def sha_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def mint_uri(label: str, entity_id: str) -> str:
    """`sdpg.gr/<label>/<sha256(id)>` — reference URI scheme
    (src2/main/scala/DataToPattern.scala:21,75-79)."""
    return f"{URI_PREFIX}/{label}/{sha_hex(entity_id)}"


def stable_frac_hex(key: str) -> float:
    """Deterministic uniform-ish fraction in [0, 1) from the first 4 hex chars
    of sha256(key). DuckDB replica: ``substr(sha256(key),1,4) < '<hex(p*65536)>'``
    (fixed-width lowercase hex compares lexicographically == numerically)."""
    return int(sha_hex(key)[:4], 16) / 65536.0


def hex_threshold(p: float) -> str:
    """The 4-hex-char threshold string for ``stable_frac_hex(k) < p``.
    p >= 1.0 returns 'g'*4 (> every hex digest) so probability 1.0 means
    ALL draws fire — clamping to 'ffff' left a 2^-16 tail of survivors."""
    if p >= 1.0:
        return "g" * 4
    return format(min(65535, int(p * 65536)), "04x")


def hex_threshold8(p: float) -> str:
    """8-hex-char threshold: ``sha_hex(k)[:8] < hex_threshold8(p)`` is a
    deterministic Bernoulli(p) draw, bit-identical to DuckDB's
    ``substr(sha256(k), 1, 8) < '<thr>'`` (lowercase fixed-width hex compares
    lexicographically == numerically). p >= 1.0 returns 'g'*8 — strictly
    above every hex digest in BOTH orderings, so rate 1.0 keeps ALL rows
    (clamping to 'ffffffff' would drop a digest equal to it, a real
    2^-32-per-row leak); the oracle twins embed this same literal, so
    engine and SQL stay in lock-step."""
    if p >= 1.0:
        return "g" * 8
    return format(min((1 << 32) - 1, int(p * (1 << 32))), "08x")


def sha_int(key: str) -> int:
    """First 8 hex chars of sha256(key) as an int — the engine's uniform
    integer draw; DuckDB twin: ``('0x' || substr(sha256(key),1,8))::UBIGINT``."""
    return int(sha_hex(key)[:8], 16)


def minhash_sig_sha(tokens, num_hashes: int, seed: int) -> list[str]:
    """SQL-replicable MinHash: for each hash index h, min over tokens of
    ``sha256(token + '#' + h + '#' + seed)[:8]``. Empty token set -> 'f'*8."""
    out = []
    for h in range(num_hashes):
        best = "f" * 8
        suffix = f"#{h}#{seed}"
        for t in tokens:
            v = sha_hex(t + suffix)[:8]
            if v < best:
                best = v
        out.append(best)
    return out


def crc_hash_array(strings: list[str], salt: int = 0) -> np.ndarray:
    """Stable 32-bit hashes of a list of strings (zlib.crc32 — C speed)."""
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8"), salt) for s in strings),
        dtype=np.uint64, count=len(strings),
    )


def _perm_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_matrix(token_hashes: np.ndarray, offsets: np.ndarray,
                   num_hashes: int, seed: int,
                   params: tuple[np.ndarray, np.ndarray] | None = None
                   ) -> np.ndarray:
    """Vectorized MinHash over a CSR-style layout.

    token_hashes: uint64 array of all rows' token hashes concatenated.
    offsets: int array len n_rows+1; row i owns token_hashes[offsets[i]:offsets[i+1]].
    Returns (n_rows, num_hashes) uint64 signature matrix; empty rows get max.
    """
    a, b = params if params is not None else _perm_params(num_hashes, seed)
    n_rows = len(offsets) - 1
    sig = np.full((n_rows, num_hashes), np.uint64(_MERSENNE), dtype=np.uint64)
    if len(token_hashes) == 0:
        return sig
    # (n_tokens, num_hashes) permuted values, reduced per row with minimum.reduceat
    permuted = (token_hashes[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)
    row_sizes = np.diff(offsets)
    nonempty = row_sizes > 0
    starts = offsets[:-1][nonempty]
    reduced = np.minimum.reduceat(permuted, starts, axis=0)
    # reduceat with strictly increasing starts gives one row per nonempty row
    sig[nonempty] = reduced
    return sig


def fast_minhash_sigs(gram_lists: list[list[str]], num_hashes: int,
                      seed: int) -> list[str]:
    """``hash_family="fast"`` MinHash signatures for a batch of gram lists:
    ONE crc32 per gram (C speed) spread through the vectorized
    multiply-mod-Mersenne permutation family (:func:`minhash_matrix`) —
    the whole batch is one (n_grams x num_hashes) numpy pass instead of
    num_hashes x n_grams Python sha256 calls. Output format matches the
    sha family ('_'-joined 8-hex parts; empty docs -> 'ffffffff' parts) so
    every downstream keep/drop/banding decision is format-compatible.
    Trade-off vs "sha": 32-bit crc base (birthday collisions become
    relevant past ~2^16 distinct grams per doc — far above real documents)
    and no DuckDB twin; the oracle gate always runs the sha family."""
    lens = np.fromiter((len(g) for g in gram_lists), np.int64,
                       count=len(gram_lists))
    offsets = np.zeros(len(gram_lists) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = [g for gs in gram_lists for g in gs]
    sig = minhash_matrix(crc_hash_array(flat), offsets, num_hashes, seed)
    parts = (sig & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return ["_".join(format(int(v), "08x") for v in row) for row in parts]


def fast_string_hashes(strings: list[str], num_hashes: int,
                       seed: int) -> np.ndarray:
    """(n, num_hashes) uint64 fast-family hashes: one crc32 per string,
    spread by the multiply-mod-Mersenne family. The vectorized stand-in
    for num_hashes sha256 calls per string (Bloom positions, CMS columns,
    SimHash token hashes)."""
    a, b = _perm_params(num_hashes, seed)
    base = crc_hash_array(strings)
    return (base[:, None] * a[None, :] + b[None, :]) % np.uint64(_MERSENNE)


def fast_hash64(strings: list[str], seed: int = 0) -> np.ndarray:
    """64-bit fast-family hashes of a list of strings: two independent
    crc32 passes (C speed) packed into hi/lo words — the vectorized
    stand-in for ``int(sha256(s)[:16], 16)`` per-token hashes (SimHash)."""
    lo = crc_hash_array(strings, salt=seed & 0xFFFFFFFF)
    hi = crc_hash_array(strings, salt=(seed ^ 0x9E3779B9) & 0xFFFFFFFF)
    return (hi << np.uint64(32)) | lo


def simhash_matrix(token_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit SimHash over a CSR layout (same layout contract as
    :func:`minhash_matrix`): one (n_tokens, 64) bit expansion + one
    ``add.reduceat`` per batch instead of a Python loop per document.
    Majority bit vote; ties (vote <= 0, incl. empty docs) set the bit to 0.
    Returns (n_rows,) uint64."""
    n_rows = len(offsets) - 1
    out = np.zeros(n_rows, dtype=np.uint64)
    if len(token_hashes) == 0:
        return out
    bit_idx = np.arange(64, dtype=np.uint64)
    signs = (((token_hashes[:, None] >> bit_idx[None, :]) & np.uint64(1))
             .astype(np.int64) * 2 - 1)
    row_sizes = np.diff(offsets)
    nonempty = row_sizes > 0
    starts = offsets[:-1][nonempty]
    votes = np.add.reduceat(signs, starts, axis=0)
    packed = ((votes > 0).astype(np.uint64) << bit_idx[None, :]).sum(
        axis=1, dtype=np.uint64)
    out[nonempty] = packed
    return out


def simhash64(token_hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash of one row's token hashes (uint64)."""
    if len(token_hashes) == 0:
        return np.uint64(0)
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return out


def round_half_away(x, digits: int):
    """Round half away from zero, computed as round(x * 10^d) / 10^d in
    float64 — bit-identical to DuckDB's ``round(DOUBLE, d)`` (and therefore
    to the SQL oracles), unlike Python's banker's rounding or Arrow's
    default half-to-even `pc.round`."""
    s = float(10 ** digits)
    if np.isscalar(x) or isinstance(x, float):
        xs = float(x) * s
        return np.copysign(np.floor(np.abs(xs) + 0.5), xs) / s
    arr = np.asarray(x, dtype=np.float64) * s
    return np.copysign(np.floor(np.abs(arr) + 0.5), arr) / s


def char_shingles(s: str, k: int) -> set[str]:
    s = f"^{s}$"
    if len(s) <= k:
        return {s}
    return {s[i:i + k] for i in range(len(s) - k + 1)}
