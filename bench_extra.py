"""Headline-only bench harness for optimization iteration (bench.py is
FROZEN for driver measurement — this file exists so optimization work can
re-measure the headline lanes in ~3 min instead of ~15, select a subset of
queries, and capture plans; its numbers are cited in OPTIMIZATION_r06.md).

Usage:
    python bench_extra.py                 # all headline queries, cold+warm
    python bench_extra.py q1 q2 ...       # subset
    python bench_extra.py --repeats 3 q1  # extra warm repeats (min reported)
    python bench_extra.py --explain q1    # also dump explain("formatted")
                                          # to plans/r06/<q>_current.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import HEADLINE, _multi_file_dir  # noqa: E402


def weather_index() -> float:
    """CPU weather canary (VERDICT r5 "what's wrong" #1 intent, hosted here
    because bench.py is frozen): median per-task seconds of a fixed sha256
    burn on 8 threads. Clean windows on this VM measure ~0.45-0.6; a dirty
    (noisy-neighbor) window reads 0.75+ and its absolute timings should
    not be compared across runs."""
    import concurrent.futures as cf
    import hashlib

    def burn(_):
        h = b"x" * 64
        t0 = time.time()
        for _ in range(200_000):
            h = hashlib.sha256(h).digest()
        return time.time() - t0

    with cf.ThreadPoolExecutor(8) as ex:
        times = sorted(ex.map(burn, range(16)))
    return round(times[len(times) // 2], 3)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=[])
    ap.add_argument("--repeats", type=int, default=1,
                    help="extra warm runs; min over them is reported")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default="current",
                    help="suffix for plan dump files")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from open_thoughts_spark.session import get_spark

    names = args.names or HEADLINE
    w_before = weather_index()
    bench_dir = _multi_file_dir()
    spark = get_spark(app_name="ots-bench-extra")
    qs = entrymod.queries()
    spark.range(1000).count()
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"cold:{name}")
        t0 = time.time()
        qs[name](spark, bench_dir).count()
        cold[name] = round(time.time() - t0, 3)
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"warm{i}:{name}")
            t0 = time.time()
            qs[name](spark, bench_dir).count()
            samples.append(time.time() - t0)
        warm[name] = round(min(samples), 3)
    if args.explain:
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = qs[name](spark, bench_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r06/{name}_{args.tag}.txt", "w") as f:
                f.write(txt)
    spark.stop()
    out = {
        "cold": cold,
        "warm": warm,
        "cold_total": round(sum(cold.values()), 3),
        "warm_total": round(sum(warm.values()), 3),
        # clean ~0.45-0.6; dirty 0.75+ (see weather_index)
        "weather_before": w_before,
        "weather_after": weather_index(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
