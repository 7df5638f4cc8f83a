"""Crawl-only attribution bench: run bench.run_crawl from several
source trees (worktrees of successive commits) in alternating order,
one subprocess per pass, to locate which commit(s) own the epoch-loop
slowdown the r03 A/B (tools/ab_bench.py) proved real.

Usage: python tools/crawl_ab.py LABEL:TREE [LABEL:TREE ...] [--passes N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, sys, time, tempfile
sys.path.insert(0, sys.argv[1])
import os
os.chdir(sys.argv[1])
import bench
from scrapetition_spark.session import get_spark
spark = get_spark(app_name="crawl-ab", master="local[32]",
                  shuffle_partitions=64)
out = bench.run_crawl(spark, 200000, n_hosts=2000, epochs=2)
if len(out) == 3:
    fetched, dt, stages = out
else:
    fetched, dt, stages = out[0], out[1], {}
print("RESULT " + json.dumps(
    {"fetched": fetched, "seconds": round(dt, 2), "stages": stages}))
"""


def run_pass(tree: str) -> dict | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    p = subprocess.run(
        [sys.executable, "-c", CHILD, tree],
        capture_output=True, text=True, timeout=900, env=env,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    print("FAILED", tree, p.stdout[-300:], p.stderr[-1500:])
    return None


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 2
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])
    arms = [a.split(":", 1) for a in args]
    results: dict[str, list[dict]] = {label: [] for label, _ in arms}
    for i in range(passes):
        for label, tree in arms:
            r = run_pass(tree)
            if r:
                results[label].append(r)
                print(json.dumps({"pass": i, "arm": label, **r}), flush=True)
    print("SUMMARY " + json.dumps(
        {
            label: {
                "seconds": sorted(r["seconds"] for r in rs),
                "stages_min": {
                    k: min(r["stages"].get(k, 0.0) for r in rs)
                    for k in (rs[0]["stages"] or {})
                } if rs else {},
            }
            for label, rs in results.items()
        },
        indent=1,
    ), flush=True)


if __name__ == "__main__":
    main()
