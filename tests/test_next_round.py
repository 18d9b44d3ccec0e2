"""Oracle verification for the round-6 staging area (plans/next_round.py).

Runs every staged query on Spark and its DuckDB oracle twin over the same
sf0.001 parquet, comparing row count, sorted column names, and the
order-insensitive canonical value hash — the identical procedure
tools/check_correctness.py replicates from the driver. A staged query is
rotation-ready only when it passes here.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_correctness import TABLES, canon_rows  # noqa: E402

from sparkksqldbbenchmark_spark.plans.next_round import (  # noqa: E402
    STAGED,
    STAGED_ORACLE,
)

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def test_every_staged_query_has_oracle():
    assert set(STAGED) == set(STAGED_ORACLE)
    assert STAGED, "staging area unexpectedly empty"


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED[name](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(STAGED_ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), (
        f"{name}: rows {len(srows)} vs oracle {len(orows)}"
    )
    sh, slines = canon_rows(scols, srows)
    oh, olines = canon_rows(ocols, orows)
    if sh != oh:
        diff = [
            f"  spark: {a}\n  duck : {b}"
            for a, b in zip(slines, olines)
            if a != b
        ][:5]
        pytest.fail(f"{name}: value hash mismatch\n" + "\n".join(diff))
    assert len(srows) > 0, f"{name}: empty result"


def test_scd2_intervals_partition_each_keys_timeline(spark):
    """SCD-2 invariants: per key, versions are 1..n contiguous, exactly
    one open (is_current) interval, and each version's valid_to equals
    the next version's valid_from — the timeline partitions cleanly."""
    from collections import defaultdict

    rows = STAGED["scd2_dimension_build"](spark, SF_DIR).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r.user_id].append(r)
    assert by_key
    for key, vs in by_key.items():
        vs.sort(key=lambda r: r.version)
        assert [r.version for r in vs] == list(range(1, len(vs) + 1)), key
        assert sum(1 for r in vs if r.is_current) == 1, key
        assert vs[-1].is_current and vs[-1].valid_to is None, key
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, (key, a.version)
            assert a.event_type != b.event_type, (key, a.version)


def test_cdc_consumes_full_history_and_drops_deleted_keys(spark):
    """CDC invariants: n_changes over surviving + deleted keys accounts
    for every change row, and no surviving key's last op is a delete."""
    import duckdb
    import os

    res = STAGED["cdc_snapshot_apply"](spark, SF_DIR)
    surviving = res.collect()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(SF_DIR, 'events.parquet')}'"
    )
    total_rows, n_keys = con.execute(
        "SELECT count(*), count(DISTINCT user_id) FROM events"
    ).fetchone()
    deleted_changes = con.execute("""
        WITH latest AS (
            SELECT user_id,
                   max_by(CASE WHEN event_id % 10 = 0 THEN 'D'
                               WHEN event_id % 3 = 0 THEN 'U'
                               ELSE 'I' END, event_id) AS op,
                   count(*) AS n
            FROM events GROUP BY 1
        ) SELECT coalesce(sum(n), 0), count(*) FROM latest WHERE op = 'D'
    """).fetchone()
    con.close()
    assert sum(r.n_changes for r in surviving) + deleted_changes[0] == total_rows
    assert len(surviving) + deleted_changes[1] == n_keys
