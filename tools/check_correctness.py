"""Local replica of the driver's t2 correctness gate.

Runs every queries() entry on Spark at sf0.01 and its oracle_sql() twin on
DuckDB over the same parquet, then compares row count, sorted column names,
and an order-insensitive value hash (rows canonicalized to strings, floats
via repr of round-trip float()).

Run: python tools/check_correctness.py [names...]
     python tools/check_correctness.py --staged [names...]   # plans/next_round.py
The --staged form runs the round-N+1 staging area (plans/next_round.py,
when one exists; the round-7 cohort graduated to plans/round7_queries.py)
through the identical comparison, so "verified at CHECK_SF_DIR" claims
use one harness everywhere (tests/test_next_round.py wraps the same
procedure in pytest).
"""

from __future__ import annotations

import hashlib
import math
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # normalize -0.0 and float noise at 1e-9
        if v == 0:
            v = 0.0
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


# Spark simpleString → normalized type; DuckDB DESCRIBE type → normalized.
_SPARK_TYPES = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts", "date": "date", "binary": "bin",
    "array<double>": "f64[]", "array<float>": "f32[]",
    "array<bigint>": "i64[]", "array<string>": "str[]",
    # Parametric/exotic classes (r07 verdict item 3: extend BEFORE the
    # decimal/variant/interval suites graduate). These must NEVER reach
    # the driver's value hasher raw — DECIMAL stringification depends on
    # (p,s) result-typing rules that differ per engine, VARIANT/JSON and
    # INTERVAL stringify in engine-specific syntax. The graded queries
    # cast each to a canonical STRING/DATE/INT; any raw escapee below
    # normalizes to a class that can only TYPE-FAIL cross-engine.
    "variant": "variant",
    "interval day to second": "interval-dt",
    "interval year to month": "interval-ym",
}
_DUCK_TYPES = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "HUGEINT": "i128", "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str",
    "BOOLEAN": "bool", "TIMESTAMP": "ts", "DATE": "date", "BLOB": "bin",
    "DOUBLE[]": "f64[]", "FLOAT[]": "f32[]", "BIGINT[]": "i64[]",
    "VARCHAR[]": "str[]",
    "JSON": "json",           # DuckDB's closest VARIANT analogue
    "INTERVAL": "interval",   # never equal to Spark's two interval classes
}

_DEC_RE_SPARK = re.compile(r"^decimal\((\d+),(\d+)\)$")
_DEC_RE_DUCK = re.compile(r"^DECIMAL\((\d+),(\d+)\)$")


def _norm_spark_type(t: str) -> str:
    m = _DEC_RE_SPARK.match(t)
    if m:
        return f"dec({m.group(1)},{m.group(2)})"
    if t.startswith("interval"):  # catch any other interval qualifier
        return _SPARK_TYPES.get(t, f"interval:{t}")
    return _SPARK_TYPES.get(t, t)


def _norm_duck_type(t: str) -> str:
    m = _DEC_RE_DUCK.match(t)
    if m:
        # Same (p,s) on both engines → same unscaled rendering → safe.
        # Different (p,s) normalizes differently and TYPE-FAILs: the
        # scale is visible in the string form ('1.50' vs '1.500000').
        return f"dec({m.group(1)},{m.group(2)})"
    return _DUCK_TYPES.get(t, t)


# Container result types the driver's comparator cannot grade: its
# canonicalizer sorts a pandas frame of the rows, and pandas hashing of
# list/dict cells raises `TypeError: unhashable type` (r04
# grouped_array_collect, re-learned r08 by map_function_suite /
# array_algebra_suite / regexp_suite2). Container payloads are an
# internal representation only — every graded query must serialize them
# (sorted + array_join / to_json) at the query boundary. This gate makes
# the local replica AT LEAST as strict as the driver: a head or staged
# query emitting a raw container column fails here before it can reach
# a grading round.
_CONTAINER_PREFIXES = ("array<", "map<", "struct<")


def container_columns(sdf) -> list[str]:
    """Columns of a Spark DataFrame whose type the driver's hash
    comparator cannot canonicalize (top-level array/map/struct)."""
    return [
        f"{col}:{dtype}"
        for col, dtype in sdf.dtypes
        if dtype.startswith(_CONTAINER_PREFIXES)
    ]


# Machine-width integer classes whose values stringify identically as
# Python ints — cross-engine drift WITHIN this set is driver-safe
# (evidence: rank_function_suite was driver-graded GREEN in r04 with
# spark=i32 vs duck=i64 on two columns). Everything OUTSIDE it fails:
# the r06 red row domain_mixture_resample was DuckDB HUGEINT (i128),
# which does NOT survive dataframe conversion losslessly (pandas maps
# HUGEINT to float64, so 666 hashes as "666.0").
_SAFE_INT_CLASSES = {"i8", "i16", "i32", "i64"}


def type_warnings(name, sdf, ocols, otypes) -> list[str]:
    """FAIL when a column's type class differs across engines in a way the
    driver's value hasher can see (r06 lesson: domain_mixture_resample
    went red on DuckDB HUGEINT vs Spark BIGINT with identical values).
    Drift within the machine-width integer family is allowed — see
    _SAFE_INT_CLASSES; anything else returned here is counted as a
    failure by main()."""
    warns = []
    sd = dict(sdf.dtypes)
    for col, duck_t in zip(ocols, otypes):
        st = _norm_spark_type(sd.get(col, "?"))
        dt = _norm_duck_type(duck_t)
        if col not in sd or st == dt:
            continue
        if st in _SAFE_INT_CLASSES and dt in _SAFE_INT_CLASSES:
            continue
        warns.append(f"  TYPE-FAIL {name}.{col}: spark={st} duck={dt}")
    return warns


def main() -> int:
    import os as _os, sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
    from _scratch import activate

    activate()
    import __spark_entry__ as mod

    args = sys.argv[1:]
    staged = "--staged" in args
    if staged:
        args = [a for a in args if a != "--staged"]

    if os.environ.get("CHECK_VANILLA"):
        # Replicate the driver's session: no engine confs at build time
        # (Spark 4 ANSI mode ON, 200 shuffle partitions). Queries must
        # self-adapt via catalog.ensure_session_confs.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-vanilla")
            .getOrCreate()
        )
    else:
        from sparkksqldbbenchmark_spark.session import get_spark, SessionConfig

        spark = get_spark(SessionConfig(shuffle_partitions=8))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    if staged:
        try:
            from sparkksqldbbenchmark_spark.plans.next_round import (
                STAGED,
                STAGED_ORACLE,
            )
        except ImportError:
            print("no staging area (plans/next_round.py) — nothing to check")
            return 0

        qs, oracles = dict(STAGED), dict(STAGED_ORACLE)
    else:
        qs = mod.queries()
        oracles = mod.oracle_sql()
    only = set(args)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        bad_cols = container_columns(sdf)
        if bad_cols:
            print(
                f"FAIL {name}: container-typed result column(s) the "
                f"driver's comparator cannot hash: {bad_cols} — serialize "
                f"at the query boundary (sorted + array_join / to_json)"
            )
            failures += 1
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            otypes = [str(d[1]) for d in res.description]
            orows = res.fetchall()
            desc = con.execute(
                f"DESCRIBE {oracles[name]}"
            ).fetchall()
            twarns = type_warnings(
                name, sdf, [r[0] for r in desc], [r[1] for r in desc]
            )
            for w in twarns:
                print(w)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        msgs = []
        if twarns:
            ok = False
            msgs.append(f"type-class drift ({len(twarns)} column(s), see above)")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if ok:
            sh, sl = canon_rows(scols, srows)
            oh, ol = canon_rows(ocols, orows)
            if sh != oh:
                ok = False
                diff = [(a, b) for a, b in zip(sl, ol) if a != b][:3]
                msgs.append(f"hash {sh} != {oh}; first diffs: {diff}")
        dt = time.time() - t0
        if ok:
            print(f"PASS {name}: rows={len(srows)} hash={sh} ({dt:.1f}s)")
        else:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
