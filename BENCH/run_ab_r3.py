"""Interleaved A/B/N: the current tree vs pinned checkouts, same
default bench crawl (30k pages, fanout 64), same box, same window.

Rounds 4/5 measured the default crawl at 52.5-53.3s in near-idle
windows vs round 3's committed 42.41s, with every steady round ~+1.5s —
too consistent for window noise. Per the round-4 verdict (#8) this
harness runs the SAME bench crawl from detached worktrees at each given
commit and from the current tree, interleaved and idle-gated, LEGS
times each; each leg is a fresh JVM and each tree imports its own
sparkcrawler (script dir wins sys.path over the .pth install). Passing
several commits bisects in one window.

Usage:  python BENCH/run_ab_r3.py [commit ...]   (default: 5ead25e=r3)
Writes: BENCH/r5_crawl_ab3.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
COMMITS = sys.argv[1:] or ["5ead25e"]
LOAD_GATE = float(os.environ.get("SPARK_LOAD_GATE", "1.0"))
LEGS = 3
GATES: list[dict] = []


def wait_idle(tag: str) -> None:
    waited = 0
    while True:
        load1, load5, _ = os.getloadavg()
        if load1 < LOAD_GATE:
            break
        print(f"[gate] {tag}: load {load1:.2f}, waiting ({waited}s)",
              file=sys.stderr)
        time.sleep(30)
        waited += 30
    GATES.append({"tag": tag, "load1": round(load1, 2),
                  "load5": round(load5, 2), "waited_sec": waited})
    print(f"[gate] {tag}: load {load1:.2f} — go", file=sys.stderr)


def tree_of(commit: str) -> str:
    tree = f"/tmp/sc_ab_tree_{commit}"
    if not os.path.isdir(tree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", tree, commit],
            cwd=REPO, check=True,
        )
    return tree


def run_bench(tree: str) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": "32",
        "SPARK_BENCH_SKIP_QUERIES": "1",
        "SPARK_BENCH_SKIP_VARIANTS": "1",  # ignored by pre-r4 benches
        "SPARK_BENCH_AQE": "0",
    })
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        env=env, cwd=tree, capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"bench in {tree} failed:\n{out.stderr[-2000:]}")
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    d = json.loads(last)
    walls = [
        (s["wall"] if isinstance(s, dict) else s)
        for s in d.get("round_stats", [])
    ]
    return {"crawl_sec": d["crawl_sec"],
            "steady_urls_per_sec": d["steady_urls_per_sec"],
            "round_walls": walls}


def main() -> None:
    variants = [("current", REPO)] + [(c, tree_of(c)) for c in COMMITS]
    for _, tree in variants:  # untimed warm leg: corpus cache per tree
        run_bench(tree)
    legs: dict[str, list[dict]] = {name: [] for name, _ in variants}
    for i in range(LEGS):
        for name, tree in variants:
            wait_idle(f"leg{i + 1}-{name}")
            r = run_bench(tree)
            legs[name].append(r)
            print(f"leg {i + 1} {name}: {r['crawl_sec']}s "
                  f"(steady {r['steady_urls_per_sec']})", file=sys.stderr)
    best = {k: min(v, key=lambda r: r["crawl_sec"]) for k, v in legs.items()}
    summary = {
        "best_sec": {k: v["crawl_sec"] for k, v in best.items()},
        "best_steady": {k: v["steady_urls_per_sec"] for k, v in best.items()},
        "best_round_walls": {k: v["round_walls"] for k, v in best.items()},
        "legs": legs,
        "idle_gate": {"load_gate": LOAD_GATE, "trials": GATES},
    }
    with open(os.path.join(HERE, "r5_crawl_ab3.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary["best_sec"]))


if __name__ == "__main__":
    main()
