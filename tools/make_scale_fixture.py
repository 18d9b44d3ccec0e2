"""Build a larger derived fixture for SCALING measurements only.

/root/testdata is driver-generated and read-only (TESTDATA.md); sf0.1's
headline plans are stage-latency-bound at 32 cores, so the 8-vs-32-core
scaling block is uninformative there (VERDICT r17 "Next round" #6:
rerun the pair at a larger SF or at idle). This tool synthesizes an
N×-replicated copy of sf0.1 under /tmp — each replica's keys offset by
the table's key range so uniqueness and per-key cardinality SHAPE are
preserved (per-source/doc density grows N×, matching how the driver's
generator scales) — for one-off scaling experiments. It is NOT bench
input for the driver contract and never touches /root/testdata.

Run: python tools/make_scale_fixture.py [N] [out_dir]
     (default N=10, out_dir=/tmp/sfscale)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sparkksqldbbenchmark_spark.session import SessionConfig, get_spark

SRC = "/root/testdata/sf0.1"

# key columns to offset per replica so uniqueness holds
OFFSETS = {
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey"],
    "lineitem": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],
    "region": [],
}
# foreign keys that must shift by their PARENT's key span so the join
# fan-out shape is preserved (lineitem rows follow their replicated
# order, orders follow their replicated customer...)
FOREIGN = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders"},
}
# tables with no key column of their own that still replicate N×
REPLICATE_VIA_FK = {"lineitem"}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale"
    spark = get_spark(
        SessionConfig(
            app_name="make_scale_fixture",
            extra={"spark.ui.showConsoleProgress": "false"},
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name, keys in OFFSETS.items():
        src = f"{SRC}/{name}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        spans = {
            k: df.agg(F.max(k)).collect()[0][0] + 1 for k in keys
        }
        fk = FOREIGN.get(name, {})
        fkspans = {}
        for col, parent in fk.items():
            pkey = OFFSETS[parent][0]
            pdf = spark.read.parquet(f"{SRC}/{parent}.parquet")
            fkspans[col] = pdf.agg(F.max(pkey)).collect()[0][0] + 1
        n_reps = n if (keys or name in REPLICATE_VIA_FK) else 1
        parts = []
        for i in range(n_reps):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * spans[k]))
            for col, span in fkspans.items():
                rep = rep.withColumn(
                    col, F.col(col) + F.lit(i * span)
                )
            parts.append(rep)
        outdf = parts[0]
        for p in parts[1:]:
            outdf = outdf.unionByName(p)
        outdf.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: x{n_reps}", flush=True)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
