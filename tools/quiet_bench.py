"""Quiet-window bench runner — the round-3 measurement discipline as a tool.

The sandbox host is a shared, credit-throttled VM: loadavg-quiet is NOT
enough (round 3 measured 12.7% hypervisor `steal` during an "idle" window,
crushing the wide leg of the scaling pair). This watcher encodes the
discipline that produced the authoritative 0.8304 round-3 number:

1. every ``--interval`` seconds, run a short 32-process busy probe and
   measure the `steal` + `nice` share from /proc/stat DURING the burn
   (a throttled host only reveals itself under load);
2. when steal < ``--max-steal`` (default 4%) and nice < 2%, immediately
   run ``python bench.py --scaling`` (the north-rule criterion — most
   load-sensitive, goes first) and then the full ``python bench.py``
   sweep, tagging both with the probe result and loadavg;
3. write everything to ``--out`` (default /tmp/quiet_bench_r4.json) and a
   progress log beside it, then exit. ``--deadline-min`` bounds the wait;
   on expiry it runs anyway and tags the record ``window="dirty"`` so a
   polluted number can never masquerade as a clean one.

Run detached:  nohup python tools/quiet_bench.py > /tmp/quiet_bench.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn(stop_t: float) -> None:
    x = 0
    while time.time() < stop_t:
        x = (x * 1103515245 + 12345) % (2 ** 31)


def _stat() -> list[int]:
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def busy_probe(seconds: float = 10.0, procs: int = 32,
               samples: int = 1) -> dict:
    """CPU-time shares measured while the host is fully loaded by us.

    ``samples`` > 1 splits the burn into per-(seconds/samples) windows and
    reports the WORST steal across them: a credit bucket that is merely
    shallow (not empty) looks clean for the first seconds of a burn and
    throttles later, so a single average underestimates what a multi-minute
    bench leg will experience."""
    per = seconds / samples
    t_end = time.time() + seconds + 2
    ps = [mp.Process(target=_burn, args=(t_end,)) for _ in range(procs)]
    for p in ps:
        p.start()
    shares = []
    names = ["user", "nice", "system", "idle", "iowait", "irq", "softirq",
             "steal"]
    s0 = _stat()
    for _ in range(samples):
        time.sleep(per)
        s1 = _stat()
        d = [b - a for a, b in zip(s0, s1)]
        tot = max(1, sum(d))
        shares.append({n: round(100 * v / tot, 1)
                       for n, v in zip(names, d)})
        s0 = s1
    for p in ps:
        p.join()
    out = max(shares, key=lambda s: s["steal"])   # worst window governs
    out = dict(out)
    out["samples"] = shares
    out["loadavg"] = list(os.getloadavg())
    out["ts"] = round(time.time(), 1)
    return out


def _run(cmd: list[str], timeout: int) -> dict:
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout, cwd=_REPO)
    lines = [ln for ln in proc.stdout.strip().splitlines()
             if ln.lstrip().startswith("{")]
    parsed = None
    if lines:
        try:
            parsed = json.loads(lines[-1])
        except json.JSONDecodeError:
            pass
    return {"rc": proc.returncode, "wall_s": round(time.time() - t0, 1),
            "parsed": parsed,
            "stderr_tail": proc.stderr[-1500:] if proc.returncode else ""}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steal", type=float, default=4.0)
    ap.add_argument("--interval", type=float, default=180.0)
    ap.add_argument("--probe-seconds", type=float, default=10.0)
    ap.add_argument("--probe-samples", type=int, default=1,
                    help=">1 requires steal clean in EVERY sub-window "
                         "(detects shallow credit buckets)")
    ap.add_argument("--deadline-min", type=float, default=45.0)
    ap.add_argument("--out", default="/tmp/quiet_bench_r4.json")
    ap.add_argument("--skip-sweep", action="store_true",
                    help="run only the scaling pair")
    ap.add_argument("--skip-scaling", action="store_true",
                    help="run only the full sweep")
    args = ap.parse_args()

    def wait_clean(tag: str) -> tuple[str, list[dict]]:
        deadline = time.time() + args.deadline_min * 60
        probes = []
        while True:
            p = busy_probe(args.probe_seconds, samples=args.probe_samples)
            probes.append(p)
            print(f"[{tag}] probe: steal={p['steal']}% nice={p['nice']}% "
                  f"user={p['user']}% load={p['loadavg'][0]:.1f}",
                  flush=True)
            if p["steal"] < args.max_steal and p["nice"] < 2.0:
                return "clean", probes
            if time.time() > deadline:
                print(f"[{tag}] deadline reached — running DIRTY-tagged",
                      flush=True)
                return "dirty", probes

            time.sleep(args.interval)

    window, probes = wait_clean("pre")
    record = {"window": window, "probe": probes[-1],
              "probe_history": probes}
    # scaling first: the north-rule criterion is the most load-sensitive
    if not args.skip_scaling:
        print("running bench.py --scaling ...", flush=True)
        record["scaling"] = _run([sys.executable, "bench.py", "--scaling"],
                                 timeout=4800)
        record["post_scaling_loadavg"] = list(os.getloadavg())
    if not args.skip_sweep:
        if not args.skip_scaling:
            # r4 lesson: the sweep started seconds after the pair drained
            # the credit bucket and read +29% — refill before the sweep too
            record["sweep_window"], record["sweep_probe_history"] = \
                wait_clean("pre-sweep")
        print("running bench.py full sweep ...", flush=True)
        record["sweep"] = _run([sys.executable, "bench.py"], timeout=3600)
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(record, f, indent=1)
    os.replace(tmp, args.out)
    print(f"wrote {args.out} (window={window})", flush=True)


if __name__ == "__main__":
    main()
