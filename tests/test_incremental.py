"""Incremental CSV-directory pattern discovery (reference src2 lifecycle
§3.2): label detection, pattern accumulation, cross-run resume."""

import csv
import os

from raykg.pipelines.incremental import (
    IncrementalPatternRun,
    detect_label,
    process_directory,
)


def _write_csv(path, header, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _make_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_csv(d / "a_person.csv",
               ["person_id", "firstName", "lastName"],
               [[1, "Ada", "L"], [2, "Alan", None], [3, None, "T"]])
    _write_csv(d / "b_places.csv",
               ["id", "name", "kind"],
               [[10, "Athens", "place of interest"], [11, "Berlin", None]])
    _write_csv(d / "c_other.csv",
               ["x", "y"],
               [[1, 2]])
    return str(d)


def test_detect_label_rules():
    vocab = ("Person", "Place")
    # column-name match wins
    assert detect_label(["person_id", "x"], {"x": "zzz"}, vocab) == "Person"
    # value match second
    assert detect_label(["a"], {"a": "a nice place"}, vocab) == "Place"
    # fallback
    assert detect_label(["a"], {"a": "zzz"}, vocab) == "UnknownNodeLabel"


def test_process_directory_and_resume(ray_session, tmp_path):
    d = _make_dir(tmp_path)
    state = str(tmp_path / "state")

    t = process_directory(d, state)
    got = {(r["label"], tuple(r["properties"])): r["n"] for r in t.to_pylist()}
    # person file: 3 rows, distinct presence sets
    assert got[("Person", ("firstName", "lastName", "person_id"))] == 1
    assert got[("Person", ("firstName", "person_id"))] == 1
    assert got[("Person", ("lastName", "person_id"))] == 1
    # places: value "place of interest" row matches Place by value; the other
    # row has no label evidence -> Unknown
    assert got[("Place", ("id", "kind", "name"))] == 1
    assert got[("UnknownNodeLabel", ("id", "name"))] == 1
    assert got[("UnknownNodeLabel", ("x", "y"))] == 1

    # resume: all files committed -> second pass skips all, counts unchanged
    run = IncrementalPatternRun(state)
    for name in sorted(os.listdir(d)):
        assert run.process_file(os.path.join(d, name)) == "skipped"
    t2 = process_directory(d, state)
    assert t2.equals(t)


def test_incremental_accumulates_new_files(ray_session, tmp_path):
    d = _make_dir(tmp_path)
    state = str(tmp_path / "state2")
    t1 = process_directory(d, state)
    n1 = sum(t1.column("n").to_pylist())
    _write_csv(os.path.join(d, "d_more_person.csv"),
               ["person_id", "firstName"], [[7, "Grace"]])
    t2 = process_directory(d, state)
    assert sum(t2.column("n").to_pylist()) == n1 + 1
    got = {(r["label"], tuple(r["properties"])): r["n"] for r in t2.to_pylist()}
    assert got[("Person", ("firstName", "person_id"))] == 2


def test_legacy_state_dir_migrates(ray_session, tmp_path):
    """State dirs written before per-file pattern tables existed (manifests
    with no sibling parquet) must keep their counts via the frozen snapshot
    instead of crashing or silently dropping them."""
    import os

    from raykg.pipelines.incremental import IncrementalPatternRun

    d = tmp_path / "in"
    d.mkdir()
    (d / "a.csv").write_text("person_name,x\nalice,1\nbob,2\n")
    (d / "b.csv").write_text("person_name,y\ncarol,3\n")
    state = str(tmp_path / "state")
    run = IncrementalPatternRun(state)
    assert run.process_file(str(d / "a.csv")) == "ran"
    before = {(r["label"], tuple(r["properties"])): r["n"]
              for r in run.patterns().to_pylist()}

    # simulate the pre-upgrade layout: manifest present, table missing
    os.remove(run._file_table(str(d / "a.csv")))
    run2 = IncrementalPatternRun(state)
    assert run2.is_committed(str(d / "a.csv"))
    migrated = {(r["label"], tuple(r["properties"])): r["n"]
                for r in run2.patterns().to_pylist()}
    assert migrated == before

    # new files keep accumulating on top of the migrated base
    assert run2.process_file(str(d / "b.csv")) == "ran"
    after = {(r["label"], tuple(r["properties"])): r["n"]
             for r in run2.patterns().to_pylist()}
    assert sum(after.values()) == sum(before.values()) + 1
