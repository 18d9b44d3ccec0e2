"""Skew mitigation under MEASURED skew (VERDICT r04 item 7).

Generates a hot-key fact table — 30% of ALL rows on one key, the rest
uniform over K (the adversarial shape real pipelines hit when a null/
default/bot key concentrates traffic; a zipf tail at local scale lumps
too many keys per reducer to isolate the straggler) — and times the
three join strategies plus the aggregation twin. Shuffle partitions are
set to 256 so the average partition is cluster-sized relative to the
hot key (hot ≈ 100× average), not local[32]-sized:

  join_plain_no_aqe   — shuffle SMJ, AQE off: the hot key's probe rows
                        land on ONE reducer; the straggler IS the wall.
  join_aqe_skew       — same plan, AQE skew-join splitting on: Spark's
                        runtime answer, splits oversized partitions.
  join_salted         — operators/skew.replicated_skew_join: salt the
                        fact side, replicate the dim `buckets`×; the
                        pre-planned answer when AQE can't see the skew
                        (or for non-SMJ shapes).
  agg_plain/agg_salted — groupBy-sum twins: EXPECTED ≈ parity, because
                        map-side partial aggregation already compresses
                        a hot algebraic-agg key to one partial row per
                        map task. Salting aggs only pays when partials
                        can't compress (collect_list / exact distinct);
                        recorded to document when NOT to salt.

Run: python tools/skew_bench.py [rows_millions]      (default 50)
Results are committed to docs/DESIGN_100TB.md ("Measured skew" table).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.operators.skew import (
    replicated_skew_join,
    salted_sum_count,
)
from sparkksqldbbenchmark_spark.session import SessionConfig, get_spark

K = 100_000   # uniform key domain for the cold tail
HOT_FRAC = 3  # hot key holds 3/10 of all rows


def main() -> None:
    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 50.0
    n = int(millions * 1_000_000)
    spark = get_spark(
        SessionConfig(
            app_name="skew-bench",
            shuffle_partitions=256,
            extra={
                "spark.driver.memory": "24g",
                "spark.ui.showConsoleProgress": "false",
            },
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="skew_bench_")
    try:
        # mixture skew: HOT_FRAC/10 of rows on key 1, rest hash-uniform
        # over [2, K+1]; value payload keeps the join output non-trivial
        print(f"generating {n:,} hot-keyed rows...", file=sys.stderr)
        (
            spark.range(n)
            .select(
                F.col("id"),
                F.expr(
                    f"case when pmod(hash(id), 10) < {HOT_FRAC} then 1 "
                    f"else pmod(hash(id * 7 + 3), {K}) + 2 end"
                ).cast("long").alias("key"),
                (F.col("id") % 1000 / 10.0).alias("value"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(d)
        )
        fact = spark.read.parquet(d)
        hot = (
            fact.groupBy("key").count().orderBy(F.desc("count")).limit(1)
        ).collect()[0]
        print(
            f"hot key {hot['key']}: {hot['count']:,} rows "
            f"({100.0 * hot['count'] / n:.1f}% of {n:,})",
            file=sys.stderr,
        )
        dim = spark.range(1, K + 2).select(
            F.col("id").alias("key"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim.cache().count()

        results: dict[str, float] = {}

        def timed(name: str, fn) -> None:
            t0 = time.time()
            out = fn()
            results[name] = time.time() - t0
            print(f"  {name}: {results[name]:.1f}s ({out:,} rows)",
                  file=sys.stderr)

        def set_conf(aqe: bool) -> None:
            spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
            # force the shuffle-join path: the dim stands in for a table
            # too big to broadcast (broadcast IS the first choice when it
            # fits — this measures the case where it doesn't)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        set_conf(aqe=False)
        timed(
            "join_plain_no_aqe",
            lambda: fact.join(dim, "key").count(),
        )
        set_conf(aqe=True)
        timed(
            "join_aqe_skew",
            lambda: fact.join(dim, "key").count(),
        )
        set_conf(aqe=False)
        timed(
            "join_salted",
            lambda: replicated_skew_join(
                fact, dim, "key", salt_col="id", buckets=32
            ).count(),
        )

        timed(
            "agg_plain",
            lambda: fact.groupBy("key")
            .agg(F.round(F.sum(F.col("value").cast("decimal(38,6)")), 2)
                 .cast("double").alias("sum_value"),
                 F.count(F.lit(1)).alias("row_count"))
            .count(),
        )
        timed(
            "agg_salted",
            lambda: salted_sum_count(
                fact, ["key"], "value", salt_col="id", buckets=32
            ).count(),
        )

        # restore engine defaults for any shared session reuse
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

        print(
            f"rows={n:,} hot_key_share={100.0 * hot['count'] / n:.1f}% "
            + " ".join(f"{k}={v:.1f}s" for k, v in results.items())
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
