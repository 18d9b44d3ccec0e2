"""One-pass timing sweep over every registered query (hot-spot finder).

Usage: python tools/sweep_times.py [out.json] [--repeat N]

Same session profile as bench.py (AQE off, local[$SPARK_GRAFT_CPUS], 32
shuffle partitions, staged layout). Each query is executed N times (default
1) with .count(); the min is recorded. Single-sample numbers are for
RANKING hot spots, not for before/after claims — use tools/time_query.py
paired runs for those.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import stage_bench_layout
from sparkksqldbbenchmark_spark.session import SessionConfig, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_path = "/tmp/sweep_r17.json"
    repeat = 1
    args = sys.argv[1:]
    if "--repeat" in args:
        i = args.index("--repeat")
        if i + 1 >= len(args):
            sys.exit("--repeat needs a value (ADVICE r17)")
        repeat = int(args[i + 1])
        del args[i : i + 2]
    if args:
        out_path = args[0]
    spark = get_spark(
        SessionConfig(
            app_name="sweep_times",
            aqe=False,
            extra={"spark.ui.showConsoleProgress": "false"},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).count()
    # Warm the parquet reader path against the CONFIGURED data dir
    # (ADVICE r17: was hardcoded to sf0.001 regardless of SF_DIR).
    warm = os.path.join(SF_DIR, "events.parquet")
    if os.path.exists(warm):
        spark.read.parquet(warm).count()
    queries = entrymod.queries()
    run_dir = stage_bench_layout(spark, SF_DIR)
    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    names = list(queries)
    for i, name in enumerate(names):
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            best = float("inf")
            for _ in range(repeat):
                t0 = time.time()
                fn(spark, run_dir).count()
                best = min(best, time.time() - t0)
            results[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001 - record and continue
            errors[name] = str(exc)[:200]
        if (i + 1) % 25 == 0:
            print(f"[{i + 1}/{len(names)}]", flush=True)
            with open(out_path, "w") as f:
                json.dump({"times": results, "errors": errors}, f, indent=1)
    with open(out_path, "w") as f:
        json.dump({"times": results, "errors": errors}, f, indent=1)
    top = sorted(results.items(), key=lambda kv: -kv[1])[:40]
    print(json.dumps({"total": round(sum(results.values()), 1), "errors": len(errors)}))
    for name, sec in top:
        print(f"{sec:8.3f}  {name}")


if __name__ == "__main__":
    main()
