#!/usr/bin/env python
"""Interleaved same-window A/B bench: r4 tree vs current HEAD.

Runs bench.py alternately from two checkouts in ABABAB order inside one
session so host weather hits both arms equally, then prints per-arm
medians and the per-query deltas.  Judge request (VERDICT r5 #6): decide
whether the BENCH_r04 -> BENCH_r05 +5% was code or weather.

Usage: python scripts/ab_bench.py [rounds] [repeats-per-run]
Writes JSON lines to BENCH/ab_r6.jsonl and a summary to stdout.
"""

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARMS = {"r4": os.path.join(ROOT, ".ab", "r4"), "head": ROOT}
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
REPEATS = sys.argv[2] if len(sys.argv) > 2 else "3"
OUT = os.path.join(ROOT, "BENCH", "ab_r6.jsonl")


def run(arm, tree):
    env = dict(os.environ, BENCH_REPEATS=REPEATS)
    t0 = time.time()
    p = subprocess.run([sys.executable, "bench.py"], cwd=tree, env=env,
                       capture_output=True, text=True, timeout=1800)
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["_arm"] = arm
    rec["_wall"] = round(time.time() - t0, 1)
    return rec


def main():
    results = []
    with open(OUT, "a") as fh:
        for rnd in range(ROUNDS):
            for arm in ("r4", "head"):
                rec = run(arm, ARMS[arm])
                rec["_round"] = rnd
                results.append(rec)
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
                print(f"[{rnd}] {arm}: total={rec['value']}s "
                      f"{ {k: v for k, v in rec['queries'].items()} }",
                      flush=True)

    print("\n== summary ==")
    for arm in ("r4", "head"):
        vals = [r["value"] for r in results if r["_arm"] == arm]
        print(f"{arm}: totals={vals} median={statistics.median(vals):.3f}")
    qnames = results[0]["queries"].keys()
    for q in qnames:
        a = statistics.median([r["queries"][q] for r in results if r["_arm"] == "r4"])
        b = statistics.median([r["queries"][q] for r in results if r["_arm"] == "head"])
        print(f"  {q}: r4={a:.3f} head={b:.3f} delta={100*(b-a)/a:+.1f}%")


if __name__ == "__main__":
    main()
