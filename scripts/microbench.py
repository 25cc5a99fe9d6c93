"""Pinned drift-control micro-bench (round-5 verdict item 6).

Problem it solves: round-over-round headline deltas (e.g. r4's
−17% index-build docs/s vs r3) could not be attributed to host
state vs code because no fixed-protocol control was run in the same
session.  This script IS that control: a fixed corpus (20k docs,
deterministic generator, seed fixed inside ``distributed_corpus``),
fixed knobs, fixed query batch (64 WAND queries), each repeat in a
FRESH subprocess (clean JVM + python workers), run at the START of a
round before any scale campaign churns the page cache.

Usage::

    python scripts/microbench.py [--repeats 3] [--tag round5-start]

Appends one JSON line per invocation to ``BENCH/microbench.jsonl``
(git rev + timestamp + median and per-repeat build docs/s, WAND
ms/q) so successive rounds can separate host drift from code change
in one leg: same rev twice = host drift; different rev, same host
window = code.

Reuses ``bench.py --one`` as the leg runner — the same build+query
job the headline bench times, at the same knobs, so the control is
comparable to the headline numbers.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PINNED_DOCS = 20000   # matches bench.py BENCH_DOCS default
PINNED_QUERIES = 64   # matches bench.py N_QUERIES default
PINNED_CORES = 32


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else 0.5 * (s[m - 1] + s[m])


def run_leg() -> dict:
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        SPARK_GRAFT_SCALING_DOCS=str(PINNED_DOCS),
        SPARK_GRAFT_BENCH_QUERIES=str(PINNED_QUERIES),
    )
    env.pop("SPARK_GRAFT_SKIP_BRUTE", None)  # brute leg = BM25 p50 control
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--one",
         str(PINNED_CORES)],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise RuntimeError("microbench leg failed")
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("ENGINE_RESULT ")][-1]
    return json.loads(line[len("ENGINE_RESULT "):])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    rev = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()

    legs = []
    for i in range(args.repeats):
        t0 = time.monotonic()
        r = run_leg()
        legs.append({
            "build_docs_per_sec": round(r["_index_docs_per_sec"], 1),
            "wand_ms_per_q": round(r["_wand_per_query_ms"], 2),
            "bm25_ms_per_q": round(r.get("_bm25_per_query_ms", float("nan")), 2),
            "leg_wall_sec": round(time.monotonic() - t0, 1),
        })
        print(f"leg {i + 1}/{args.repeats}: {legs[-1]}", file=sys.stderr)

    record = {
        "kind": "microbench",
        "tag": args.tag,
        "rev": rev,
        "utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
        "docs": PINNED_DOCS,
        "queries": PINNED_QUERIES,
        "cores": PINNED_CORES,
        "build_docs_per_sec": round(
            _median([l["build_docs_per_sec"] for l in legs]), 1),
        "wand_ms_per_q": round(
            _median([l["wand_ms_per_q"] for l in legs]), 2),
        "bm25_ms_per_q": round(
            _median([l["bm25_ms_per_q"] for l in legs]), 2),
        "legs": legs,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "microbench.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
