"""Host-ceiling controls for the scaling study (BENCH.md).

The 2→8-pinned-core pair proxies the north rule's N→4N cluster
criterion, but a shared single-socket box imposes its own ceilings.
These controls measure them with NO Spark and NO shared state, so the
index build's efficiency can be read against what the host itself can
do:

- ``cpu``: pure-CPU python multiprocessing (tight numpy FLOP loop on
  small in-cache arrays) — the scheduling/turbo ceiling.
- ``bw``: memory-bandwidth streaming (copy+sum over 256 MB arrays,
  far beyond L3) — the single-socket bandwidth ceiling. Two pinned
  cores already pull over half the socket's streaming bandwidth, so
  4× cores cannot buy 4× bandwidth here; real clusters bring 4N
  buses with 4N executors.

    python host_controls.py [--kind bw|cpu] [--rounds 3] [--levels 2,8]

Per-level runs are re-exec'd under ``taskset -c 0-(N-1)`` and
interleaved across rounds; best-of per level (same de-noise protocol
as scaling_bench.py). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

import numpy as np

_STREAM_N = 32_000_000  # 256 MB of float64 per worker


def _bw_worker(q, dur: float) -> None:
    a = np.random.default_rng(os.getpid()).standard_normal(_STREAM_N)
    b = np.empty_like(a)
    t0 = time.time()
    done = 0
    while time.time() - t0 < dur:
        np.copyto(b, a)          # read + write 512 MB
        done += a.nbytes * 2
        a.sum()                  # read 256 MB
        done += a.nbytes
    q.put(done / (time.time() - t0))


def _cpu_worker(q, dur: float) -> None:
    x = np.random.default_rng(os.getpid()).standard_normal(4096)  # in-cache
    t0 = time.time()
    flops = 0
    while time.time() - t0 < dur:
        for _ in range(64):
            x = np.tanh(x * 1.0000001)
        flops += 64 * x.size * 2
    q.put(flops / (time.time() - t0))


def run_level(kind: str, n: int, dur: float) -> float:
    """Aggregate worker throughput at n processes (caller pins cores)."""
    target = _bw_worker if kind == "bw" else _cpu_worker
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=target, args=(q, dur)) for _ in range(n)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", choices=["bw", "cpu"], default="bw")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--_level", type=int, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._level:  # re-exec'd pinned child: one level, print and exit
        print(run_level(args.kind, args._level, args.duration))
        return

    levels = [int(x) for x in args.levels.split(",")]
    runs: dict[int, list[float]] = {lv: [] for lv in levels}
    for r in range(args.rounds):
        for lv in levels:
            cmd = ["taskset", "-c", f"0-{lv - 1}", sys.executable,
                   os.path.abspath(__file__), "--kind", args.kind,
                   "--duration", str(args.duration), "--_level", str(lv)]
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=600)
            val = float(out.stdout.strip())
            runs[lv].append(val)
            print(f"round {r} level {lv}: {val:.3e}", file=sys.stderr)

    best = {lv: max(v) for lv, v in runs.items()}
    effs = {
        f"{a}->{b}": round(best[b] / ((b / a) * best[a]), 3)
        for a, b in zip(levels, levels[1:])
    }
    unit = "bytes_per_sec" if args.kind == "bw" else "flops_per_sec"
    print(json.dumps({"kind": args.kind, "unit": unit,
                      "best": best, "efficiency": effs,
                      "raw": runs, "rounds": args.rounds}))


if __name__ == "__main__":
    main()
