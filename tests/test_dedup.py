"""Skew guards in the dedup operators: a degenerate (hot) blocking key must
cap with a logged warning — never hang quadratic or truncate silently."""

import logging

import pyarrow as pa

import ray.data as rd

from raykg.ops.dedup import _cap_block, lsh_candidate_pairs


def test_cap_block_warns_and_keeps_smallest(caplog):
    docs = list(range(100, 0, -1))
    with caplog.at_level(logging.WARNING, logger="raykg"):
        capped = _cap_block(docs, ("band", "key"), 10, "someop")
    assert capped == list(range(1, 11))          # smallest ids, sorted
    assert any("someop" in r.message and "cap 10" in r.message
               for r in caplog.records)
    # under the cap: no warning, None (caller keeps the full block)
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="raykg"):
        assert _cap_block(docs, "k", 1000, "someop") is None
    assert not caplog.records


def test_lsh_hot_band_is_capped_not_quadratic(ray_session):
    """Identical texts put every doc in the same band bucket (the
    boilerplate-heavy-corpus degenerate case): with max_bucket=10 only the
    10 smallest ids are compared — C(10,2)=45 pairs, not C(60,2)=1770 —
    and the job terminates promptly instead of going quadratic."""
    n = 60
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon"] * n, pa.string()),
    }))
    pairs = lsh_candidate_pairs(docs, max_bucket=10).take_all()
    assert len(pairs) == 45
    assert all(p["doc_a"] < 10 and p["doc_b"] < 10 for p in pairs)
    assert all(p["jaccard"] == 1.0 for p in pairs)
