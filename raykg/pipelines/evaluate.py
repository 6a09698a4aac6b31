"""Evaluation: cluster-purity P/R/F1 and triple-set P/R.

Cluster metrics replicate the reference's majority-vote protocol exactly
(src/main/scala/ClusteringEvaluation.scala:13-64):
  - majority ground-truth label per cluster (window row_number analog: argmax)
  - TP = rows whose true label == their cluster's majority label
  - FP = rows whose true label != majority
  - FN = sum over labels of (totalActual - coalesce(totalPredictedMajority, 0))
    via a left outer join of two label-count aggregates
    (ClusteringEvaluation.scala:48-55 — including its possibly-negative terms)
Triple-set P/R implements the north-rule gate: P = |pred ∩ gold| / |pred|,
R = |pred ∩ gold| / |gold| over (subj, pred, obj) sets.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray
import ray.data as rd


def cluster_metrics(clustered: rd.Dataset) -> dict[str, float]:
    """clustered: rows (node_id, cluster_key, label=ground truth)."""
    # cluster -> majority label (small aggregate: clusters x labels)
    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(zip(batch.column("cluster_key").to_pylist(),
                        batch.column("label").to_pylist()))
        return pa.table({
            "cluster_key": pa.array([k[0] for k in c], pa.string()),
            "label": pa.array([k[1] for k in c], pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    counts = clustered.map_batches(partial, batch_format="pyarrow") \
        .groupby(["cluster_key", "label"]).sum("n").to_pandas()
    ncol = [c for c in counts.columns if c.startswith("sum")][0]
    majority = {}
    for key, grp in counts.groupby("cluster_key"):
        grp = grp.sort_values([ncol, "label"], ascending=[False, True])
        majority[key] = grp.iloc[0]["label"]

    maj_ref = ray.put(majority)

    class TpFp:
        def __init__(self):
            self.m = ray.get(maj_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = self.m
            tp = fp = 0
            for key, label in zip(batch.column("cluster_key").to_pylist(),
                                  batch.column("label").to_pylist()):
                if m[key] == label:
                    tp += 1
                else:
                    fp += 1
            return pa.table({"tp": pa.array([tp], pa.int64()),
                             "fp": pa.array([fp], pa.int64())})

    agg = clustered.map_batches(TpFp, batch_format="pyarrow",
                                concurrency=(1, 4)).to_pandas()
    tp, fp = int(agg["tp"].sum()), int(agg["fp"].sum())

    # FN per reference: left join actual-label totals with majority-predicted
    # totals; predicted(label) = size of clusters whose majority == label.
    actual = counts.groupby("label")[ncol].sum()
    predicted = Counter()
    for key, grp in counts.groupby("cluster_key"):
        predicted[majority[key]] += int(grp[ncol].sum())
    fn = int(sum(actual[label] - predicted.get(label, 0) for label in actual.index))

    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision,
            "recall": recall, "f1": f1,
            "num_clusters": len(majority)}


def pattern_set_metrics(detected: dict[str, frozenset],
                        truth: dict[str, frozenset]) -> dict:
    """Pattern-set P/R (reference analog: src2/main/scala/Metrics.scala:4-47).

    Per shared label: propertyPrecision = |t∩g|/|t|, propertyRecall =
    |t∩g|/|g|. Overall: exact-set-match TP over detected / ground-truth
    pattern lists, then P/R/F1. Driver-side over the (small) pattern sets."""
    per_label = {}
    for label in sorted(set(detected) & set(truth)):
        t, g = detected[label], truth[label]
        inter = len(t & g)
        per_label[label] = {
            "property_precision": inter / len(t) if t else 0.0,
            "property_recall": inter / len(g) if g else 0.0,
        }
    tp = sum(1 for label, t in detected.items()
             if label in truth and truth[label] == t)
    p = tp / len(detected) if detected else 0.0
    r = tp / len(truth) if truth else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"per_label": per_label, "precision": p, "recall": r, "f1": f1,
            "exact_matches": tp}


def triple_prf(pred: set[tuple], gold: set[tuple]) -> dict[str, float]:
    inter = len(pred & gold)
    p = inter / len(pred) if pred else 0.0
    r = inter / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1,
            "pred": len(pred), "gold": len(gold), "intersection": inter}


def dataset_triple_set(triples: rd.Dataset) -> set[tuple]:
    """(subj, pred, obj) set of a triples Dataset — via per-batch dedup then a
    driver-side union of the (small) distinct sets. Test-scale helper."""
    out: set[tuple] = set()
    for batch in triples.select_columns(["subj", "pred", "obj"]) \
            .iter_batches(batch_format="pyarrow", batch_size=65536):
        out.update(zip(batch.column("subj").to_pylist(),
                       batch.column("pred").to_pylist(),
                       batch.column("obj").to_pylist()))
    return out
