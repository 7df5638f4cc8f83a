"""One-level saturation probe for the 8→32 scaling pair (VERDICT r03
#4): runs scaling_bench's identical RUNNER once at a single
parallelism level, with env knobs, and prints EVERYTHING the run
emits — per-stage seconds plus the discovered-stage sub-attribution
(SPARK_GRAFT_DEBUG) — so each second of a flat stage can be pinned on
compute vs broadcast vs the shared device.

Knobs (set in the environment before invoking):
  SPARK_GRAFT_CAT_DIR=/dev/shm/...   sink writes on tmpfs
  SPARK_GRAFT_LOCAL_DIR=/dev/shm/... shuffle/spill on tmpfs
  SPARK_GRAFT_BCAST_MAX=0            no broadcast hints (shuffle joins)
  SPARK_GRAFT_DRIVER_MEM=64g         bigger heap (GC-pressure test)

Usage: python tools/stage_probe.py <cpus> [docs]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import GEN, RUNNER, WEB_DIR  # noqa: E402


def main() -> None:
    cpus = sys.argv[1]
    docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    path = f"{WEB_DIR}-{docs}"
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    env.setdefault("SPARK_GRAFT_DEBUG", "1")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        print(f"generating {docs}-doc web → {path}", flush=True)
        subprocess.run([sys.executable, "-c", GEN, str(docs), path],
                       cwd="/root/repo", check=True)
    knobs = {k: v for k, v in env.items()
             if k.startswith("SPARK_GRAFT_") and k != "SPARK_GRAFT_DEBUG"}
    print(f"probe local[{cpus}] docs={docs} knobs={knobs}", flush=True)
    out = subprocess.run([sys.executable, "-c", RUNNER, cpus, path],
                         cwd="/root/repo", env=env,
                         capture_output=True, text=True, timeout=3600)
    print(out.stdout)
    if out.returncode != 0:
        print("STDERR:", out.stderr[-3000:])


if __name__ == "__main__":
    main()
