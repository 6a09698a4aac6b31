"""curate_corpus (raykg/pipelines/curate.py): each stage falsifiable on a
crafted corpus — quality drop, exact-dup loser, train/test window leak —
plus block-layout invariance. DuckDB oracle equivalence runs through
tools/check_queries.py."""

import pyarrow as pa

import ray.data as rd

from raykg.functions.hashing import hex_threshold8, sha_hex
from raykg.pipelines.curate import curate_corpus


def _split(doc_id, seed=42, val=0.1, test=0.1):
    h = sha_hex(f"split|{seed}|{doc_id}")[:8]
    return ("val" if h < hex_threshold8(val) else
            "test" if h < hex_threshold8(val + test) else "train")


def _docs(rows, blocks=1):
    t = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": pa.array([r[1] for r in rows], pa.string())})
    ds = rd.from_arrow(t)
    return ds.repartition(blocks) if blocks > 1 else ds


def _clean(tag, n=60):
    # distinct gopher-passing text: >=50 words, stops present, all alpha
    return "the a " + " ".join(f"{tag}w{i}" for i in range(n - 2))


def test_curate_stages(ray_session):
    test_id = next(d for d in range(200) if _split(d) == "test")
    train_ids = [d for d in range(200) if _split(d) == "train"]
    t1, t2, t3, t4 = train_ids[:4]

    leak = " ".join(f"leak{i}" for i in range(8))   # shared 8-token window
    rows = [
        (t1, _clean("solo")),                        # clean unique -> kept
        (t2, _clean("dup")),                         # dup winner (t2 < t3)
        (t3, _clean("dup")),                         # dup loser -> dropped
        (t4, "the a " + leak + " "                   # train sharing window
             + " ".join(f"t4w{i}" for i in range(44))),      # -> dropped
        (test_id, "the a " + leak + " "              # the test doc itself
             + " ".join(f"tew{i}" for i in range(44))),      # -> kept
        (train_ids[4], "the a shortdoc"),            # quality fail -> dropped
    ]
    assert t2 < t3
    got = curate_corpus(_docs(rows, blocks=3), num_buckets=32).to_pandas()
    out = dict(zip(got["doc_id"], got["split"]))
    assert out == {t1: "train", t2: "train", test_id: "test"}

    a = got.sort_values("doc_id").reset_index(drop=True)
    b = curate_corpus(_docs(rows), num_buckets=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_curate_and_write_partitioned(ray_session, tmp_path):
    """The export contains exactly the curated survivors with their
    text, hive-partitioned by split."""
    import os

    from raykg.pipelines.curate import curate_and_write

    test_id = next(d for d in range(200) if _split(d) == "test")
    train_ids = [d for d in range(200) if _split(d) == "train"]
    rows = [(train_ids[0], _clean("one")), (train_ids[1], _clean("two")),
            (test_id, _clean("three")), (train_ids[2], "the a short")]
    out = str(tmp_path / "corpus")
    counts = curate_and_write(_docs(rows, blocks=2), out, num_buckets=16)
    assert counts == {"train": 2, "test": 1}
    assert sorted(os.listdir(out)) == ["split=test", "split=train"]
    back = rd.read_parquet(out).to_pandas().sort_values("doc_id")
    assert back["doc_id"].tolist() == sorted(
        [train_ids[0], train_ids[1], test_id])
    src = dict(rows)
    assert all(src[d] == t for d, t in zip(back["doc_id"], back["text"]))


def test_curate_and_write_zero_survivors(ray_session, tmp_path):
    """Every document failing curation yields an empty report, not a
    crash on the missing output directory."""
    from raykg.pipelines.curate import curate_and_write

    rows = [(i, "the a of") for i in range(20)]
    out = str(tmp_path / "corpus")
    assert curate_and_write(_docs(rows), out, num_buckets=16) == {}
