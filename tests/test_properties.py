"""Property-based tests (hypothesis) for the pure kernels the distributed
pipelines are built on — the invariants that make 'same result at any
partitioning / parallelism' true."""

import numpy as np
from hypothesis import example, given, settings
from hypothesis import strategies as st

from raykg.functions.hashing import (
    char_shingles,
    hex_threshold,
    hex_threshold8,
    minhash_matrix,
    round_half_away,
    sha_hex,
    stable_frac_hex,
)
from raykg.state.checkpoint import shard_bounds


@given(st.integers(0, 10_000), st.integers(1, 64))
def test_shard_bounds_partition_exactly(n_items, n_shards):
    b = shard_bounds(n_items, n_shards)
    if n_items == 0:
        assert b == []
        return
    # covers [0, n_items) exactly, in order, without overlap
    assert b[0][0] == 0 and b[-1][1] == n_items
    for (lo, hi), (lo2, hi2) in zip(b, b[1:]):
        assert hi == lo2 and lo < hi
    assert all(lo < hi for lo, hi in b)
    assert len(b) <= max(1, min(n_shards, n_items))


@given(st.floats(-1e9, 1e9, allow_nan=False), st.integers(0, 6))
@example(x=900719925.4981925, digits=6)   # exact .5 tie at the ulp edge
def test_round_half_away_matches_duckdb(x, digits):
    import duckdb

    got = round_half_away(x, digits)
    # bind x as a parameter: an interpolated repr parses as a DECIMAL
    # whose >2^53 mantissa can corrupt an exact .5 tie BEFORE the cast
    # to DOUBLE (hypothesis found 900719925.4981925 at digits=6); the
    # oracles always round values DuckDB computed as binary doubles,
    # which is what parameter binding transfers.
    want = duckdb.execute(
        f"SELECT round(?::DOUBLE, {digits})", [float(x)]).fetchone()[0]
    assert got == want or (np.isnan(got) and want is None)


@given(st.lists(st.text(min_size=1, max_size=12), min_size=0, max_size=30),
       st.integers(0, 2**31 - 1))
@settings(max_examples=50)
def test_minhash_order_and_duplicate_invariance(tokens, seed):
    """The MinHash signature must not depend on token order or multiplicity
    — the property that makes per-batch combining sound."""
    from raykg.functions.hashing import crc_hash_array

    uniq = sorted(set(tokens))
    perm = list(reversed(uniq))
    dup = uniq + uniq

    def sig(toks):
        h = crc_hash_array(toks)
        return minhash_matrix(h, np.array([0, len(toks)]), 8, seed)

    assert (sig(uniq) == sig(perm)).all()
    assert (sig(uniq) == sig(dup)).all()


@given(st.text(min_size=0, max_size=40), st.integers(2, 5))
def test_char_shingles_cover_string(s, k):
    sh = char_shingles(s, k)
    assert sh  # never empty (^$ padding)
    framed = f"^{s}$"
    if len(framed) > k:
        assert all(len(g) == k and g in framed for g in sh)
        # every position is covered
        assert len(sh) <= len(framed) - k + 1


@given(st.floats(0.0, 1.0, allow_nan=False))
def test_hex_thresholds_consistent(p):
    """sha_hex(k)[:4] < hex_threshold(p)  <=>  stable_frac_hex(k) < p' where
    p' is p quantized to 1/65536 — check the quantized equivalence on a
    fixed key population."""
    thr4, thr8 = hex_threshold(p), hex_threshold8(p)
    assert len(thr4) == 4 and len(thr8) == 8
    if p >= 1.0:
        # the keep-all contract: 'g'*n compares strictly above EVERY hex
        # digest (clamping to 'ff..f' used to drop digest == clamp rows)
        for i in range(50):
            k = f"key|{i}"
            assert sha_hex(k)[:4] < thr4 and sha_hex(k)[:8] < thr8
        return
    for i in range(50):
        k = f"key|{i}"
        assert (sha_hex(k)[:4] < thr4) == \
               (int(sha_hex(k)[:4], 16) < int(thr4, 16))
        assert (sha_hex(k)[:8] < thr8) == \
               (int(sha_hex(k)[:8], 16) < int(thr8, 16))


@given(st.text(min_size=0, max_size=30), st.integers(0, 2**30))
def test_apply_typo_drops_one_inner_char(surface, pos):
    from raykg.synth import apply_typo

    out = apply_typo(surface, pos)
    if len(surface) < 4:
        assert out == surface
    else:
        assert len(out) == len(surface) - 1
        assert out[0] == surface[0] and out[-1] == surface[-1]


@given(st.integers(65, 4096))
@settings(max_examples=10)
def test_entity_aliases_globally_unique(n):
    """Exact resolution is well-defined: no two (entity, alias-kind) pairs
    share a surface string."""
    from raykg.config import KGConfig
    from raykg.stages.link import build_alias_items

    cfg = KGConfig(n_docs=n * 8)
    items = build_alias_items(cfg)
    surfaces = [s for s, _ in items]
    assert len(surfaces) == len(set(surfaces))


@given(st.integers(0, 2000))
@settings(max_examples=20)
def test_sha_corpus_pure_and_offsets(di):
    """sha_doc_rows is a pure function of (seed, index) with span offsets
    equal to span indices — the property the SQL oracle relies on."""
    from raykg.config import KGConfig
    from raykg.synth import sha_doc_rows

    cfg = KGConfig(n_docs=2001, typo_rate=0.0)
    a = sha_doc_rows(np.array([di]), cfg)
    b = sha_doc_rows(np.array([di]), cfg)
    assert a.equals(b)
    spans = a.column("spans").to_pylist()[0]
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    assert 1 <= len(spans) <= cfg.max_spans_per_doc


# --- funnel kernel: strict-order first-touch chain vs brute force ---

def _funnel_brute(rows, stages):
    """O(users x events x stages) oracle: for each user, walk the stage
    list taking the earliest event of each stage strictly after the
    previous stage's chosen timestamp."""
    from collections import defaultdict
    by_user = defaultdict(list)
    for uid, ts, et in rows:
        by_user[uid].append((ts, et))
    out = {}
    for uid, evs in by_user.items():
        bound = -1
        count = 0
        for s in stages:
            cands = [ts for ts, et in evs if et == s and ts > bound]
            if not cands:
                break
            bound = min(cands)
            count += 1
        out[uid] = count
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 6),          # user_id (few users -> collisions)
              st.integers(0, 20),         # ts (small range -> ties)
              st.sampled_from(["view", "click", "purchase", "other"])),
    max_size=60))
def test_funnel_kernel_matches_bruteforce(rows):
    import pyarrow as pa

    from raykg.ops.relational import funnel_per_bucket

    stages = ("view", "click", "purchase")
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    got = {r["user_id"]: r["stage"]
           for r in funnel_per_bucket(t, stages).to_pylist()}
    assert got == _funnel_brute(rows, stages)
