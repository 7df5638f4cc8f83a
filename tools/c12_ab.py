"""Same-session A/B of C12 thread-propagation strategies (VERDICT r02
next-1 tail): recursive-CTE (`c12`) vs delta-frontier iterative
(`c12c`) over the sf0.1 comments table, alternating passes so ambient
drift hits both arms equally. Decides `propagate_threads`'s `auto`
default.

Usage: python tools/c12_ab.py [passes] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    from scrapetition_spark.session import get_spark

    spark = get_spark(app_name="c12-ab", master="local[32]",
                      shuffle_partitions=64)
    qs = E.queries()
    qs["a6_avg_items_per_order"](spark, sf_dir).count()  # warm-up

    results: dict[str, list[float]] = {"recursive": [], "iterative": []}
    arms = [("recursive", "c12_thread_propagation"),
            ("iterative", "c12c_threads_delta")]
    for p in range(passes):
        for label, key in (arms if p % 2 == 0 else arms[::-1]):
            t0 = time.time()
            n = qs[key](spark, sf_dir).count()
            dt = round(time.time() - t0, 3)
            results[label].append(dt)
            print(f"pass {p} {label}: {dt}s ({n} rows)", flush=True)

    med = {k: sorted(v)[len(v) // 2] for k, v in results.items()}
    print(json.dumps({"passes": results, "median": med,
                      "winner": min(med, key=med.get)}))


if __name__ == "__main__":
    main()
