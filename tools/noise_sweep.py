"""Noise-robustness sweep — the reference's entire benchmark protocol
(run_tale_ldbc.sh / run_tale_mb6.sh / run_tale_fib25.sh: corrupt the graph
at 10%..100% noise, rediscover the schema, score cluster purity P/R/F1
against the ground-truth labels carried in the data; golden logs in
/root/reference/output/).

Usage: python tools/noise_sweep.py [--ldbc-mix] [n_nodes] [noise levels...]
Prints one table row per noise level (+ one JSON line at the end).

``--ldbc-mix`` switches the fixture's label distribution from uniform
round-robin to an LDBC-SNB-shaped skew (Comments/Posts dominate, Places/
Organisations are rare) — the reference's purity numbers are computed on
that skewed population, and the Place/Organisation identical-property-
signature collision (unresolvable from presence alone, by construction)
costs precision proportionally to those labels' population share.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")

import ray


# LDBC-SNB-shaped label mix, order = LABEL_SIGNATURES (Person, Comment,
# Post, Forum, Tag, Place, Organisation): comment/post-heavy, tiny
# place/organisation populations — the shape of the reference's LDBC run.
LDBC_MIX = (0.02, 0.60, 0.30, 0.06, 0.012, 0.004, 0.004)


def main() -> None:
    args = list(sys.argv[1:])
    ldbc_mix = "--ldbc-mix" in args
    if ldbc_mix:
        args.remove("--ldbc-mix")
    n_nodes = int(args[0]) if args else 20000
    levels = [float(x) for x in args[1:]] or \
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from raykg import synth
    from raykg.config import KGConfig, NodeSynthConfig
    from raykg.pipelines.discover import discover_node_types
    from raykg.pipelines.evaluate import cluster_metrics

    cfg = KGConfig()
    rows = []
    print(f"{'noise':>6} {'clusters':>8} {'precision':>10} {'recall':>8} "
          f"{'f1':>8}")
    for noise in levels:
        nodes = synth.pg_nodes_dataset(
            NodeSynthConfig(n_nodes=n_nodes, noise=noise,
                            label_weights=LDBC_MIX if ldbc_mix else None))
        result = discover_node_types(nodes, cfg, dataset_size=n_nodes,
                                     id_col="node_id", label_col="labels")
        m = cluster_metrics(result.clustered)
        print(f"{noise:>6.1f} {m['num_clusters']:>8} {m['precision']:>10.4f} "
              f"{m['recall']:>8.4f} {m['f1']:>8.4f}", flush=True)
        rows.append({"noise": noise, "clusters": m["num_clusters"],
                     "precision": m["precision"], "recall": m["recall"],
                     "f1": m["f1"]})
    print(json.dumps({"metric": "noise_sweep", "n_nodes": n_nodes,
                      "label_mix": "ldbc" if ldbc_mix else "uniform",
                      "levels": rows}))
    ray.shutdown()


if __name__ == "__main__":
    main()
