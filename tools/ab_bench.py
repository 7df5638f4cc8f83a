"""Same-session A/B bench: alternate bench.py passes from two source
trees (e.g. the r01 worktree vs the current repo) so ambient drift
hits both arms equally. VERDICT r02 next-1: attribute the 2x
BENCH_r02-vs-r01 slowdown to ambient load or to a named stage.

Usage:
    python tools/ab_bench.py LABEL_A:DIR_A LABEL_B:DIR_B [passes]

Writes one JSON line per pass to stdout and a summary at the end.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_pass(tree: str) -> dict | None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env["PYTHONPATH"] = tree
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree, env=env, capture_output=True, text=True, timeout=900,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    print("PASS FAILED", tree, out.stdout[-500:], out.stderr[-2000:])
    return None


def main() -> None:
    arms = [a.split(":", 1) for a in sys.argv[1:3]]
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    results: dict[str, list[dict]] = {label: [] for label, _ in arms}
    for i in range(passes):
        for label, tree in arms:
            r = run_pass(tree)
            if r:
                results[label].append(r)
                print(json.dumps({
                    "pass": i, "arm": label,
                    "crawl": r["queries"].get("crawl_wide_epochs"),
                    "value": r["value"],
                    "stages": (r.get("crawl") or {}).get("stages"),
                }), flush=True)
    summary = {}
    for label, rs in results.items():
        crawls = sorted(r["queries"]["crawl_wide_epochs"] for r in rs)
        qtot = sorted(
            sum(v for k, v in r["queries"].items() if k != "crawl_wide_epochs")
            for r in rs
        )
        summary[label] = {
            "crawl_best": crawls[0], "crawl_median": crawls[len(crawls) // 2],
            "crawl_all": crawls,
            "queries_best": round(qtot[0], 2),
            "queries_median": round(qtot[len(qtot) // 2], 2),
            "per_query_median": {
                k: sorted(r["queries"][k] for r in rs)[len(rs) // 2]
                for k in rs[0]["queries"]
            },
        }
    print("SUMMARY " + json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
