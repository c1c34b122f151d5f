"""Interleaved A/B: current tree vs the round-3-pinned checkout, same
default crawl config (30k pages, fanout 64), same box, same window.

Round 4/5 measured the default crawl at 52.5-53.3s in near-idle windows
vs round 3's committed 42.41s, with every steady round ~+1.5s — too
consistent for window noise. This harness answers it directly per the
round-4 verdict (#8): a detached worktree at the round-3 end commit and
the current tree run the SAME bench crawl back-to-back, interleaved,
idle-gated, three legs each. Each leg is a fresh JVM; each tree imports
its own sparkcrawler (script dir wins sys.path over the .pth install).

Usage:  python BENCH/run_ab_r3.py
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
# argv[1] overrides: any commit becomes the B leg, so the same harness
# bisects the regression once confirmed (tree + output file are keyed
# by the commit)
R3_COMMIT = sys.argv[1] if len(sys.argv) > 1 else "5ead25e"
R3_TREE = f"/tmp/sc_ab_tree_{R3_COMMIT}"
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


def ensure_r3_tree() -> None:
    if not os.path.isdir(R3_TREE):
        subprocess.run(
            ["git", "worktree", "add", "--detach", R3_TREE, R3_COMMIT],
            cwd=REPO, check=True,
        )


def run_bench(tree: str) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": "32",
        "SPARK_BENCH_SKIP_QUERIES": "1",
        "SPARK_BENCH_SKIP_VARIANTS": "1",  # ignored by the r3 bench
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
    ensure_r3_tree()
    # untimed warm leg per tree: builds/caches each tree's corpus so no
    # timed leg pays corpus synthesis
    for tree in (REPO, R3_TREE):
        run_bench(tree)
    legs: dict[str, list[dict]] = {"current": [], "r3": []}
    for i in range(LEGS):
        for name, tree in (("current", REPO), ("r3", R3_TREE)):
            wait_idle(f"leg{i + 1}-{name}")
            r = run_bench(tree)
            legs[name].append(r)
            print(f"leg {i + 1} {name}: {r['crawl_sec']}s "
                  f"(steady {r['steady_urls_per_sec']})", file=sys.stderr)
    best = {k: min(v, key=lambda r: r["crawl_sec"]) for k, v in legs.items()}
    summary = {
        "r3_commit": R3_COMMIT,
        "best_current_sec": best["current"]["crawl_sec"],
        "best_r3_sec": best["r3"]["crawl_sec"],
        "delta_pct": round(
            100 * (best["current"]["crawl_sec"] / best["r3"]["crawl_sec"] - 1),
            1,
        ),
        "best_current_round_walls": best["current"]["round_walls"],
        "best_r3_round_walls": best["r3"]["round_walls"],
        "legs": legs,
        "idle_gate": {"load_gate": LOAD_GATE, "trials": GATES},
    }
    with open(
        os.path.join(HERE, f"r5_crawl_ab3_{R3_COMMIT}.json"), "w"
    ) as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("best_current_sec", "best_r3_sec", "delta_pct")}))


if __name__ == "__main__":
    main()
