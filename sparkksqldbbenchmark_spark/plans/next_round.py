"""Round-16 staging area: fully-built, oracle-verified queries that are
NOT yet registered with the driver-graded registry.

Why a separate module: the driver grades exactly the first 50 entries of
``__spark_entry__.queries()`` and the round-15 head is committed (8
flagships + the 36 round-14 graduates in plans/round14_queries.py + the
round-15 slot-fillers in plans/round15_queries.py). New work lands here
with a MODULE-LOCAL registry; tests/test_next_round.py runs the same
Spark-vs-DuckDB comparison the driver runs, so each staged query is
already verified green before it rotates into the graded head next
round (swap ``staged_query`` for ``plans.registry.query``, import the
module from ``__spark_entry__``, and move freshly-green head rows to
TAIL with pins -- mechanics as executed in rounds 6-15, see
plans/round6_queries.py .. round14_queries.py history).

Opening state: EMPTY -- the round-14 staging queue fully drained at the
round-15 rotation (all 36 rows graduated, docs/ROTATION_R14.md). The
round-16 refill lands during round 15, kept no larger than the free
slots remaining after the rotation (VERDICT r14 ask #8), every row with
a brute-force or property-based second witness in the same commit.

Design notes per query live in the docstrings; every one follows the
repo-wide cross-engine determinism rules (functions/stable.py,
llm/hashing.py): integer or exact-decimal arithmetic wherever a value is
compared, libm only where both engines are correctly-rounded (IEEE
division), md5-based hashing for anything pseudo-random.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from sparkksqldbbenchmark_spark.catalog import load_table  # noqa: F401

QueryFn = Callable[[SparkSession, str], DataFrame]

STAGED: dict[str, QueryFn] = {}
STAGED_ORACLE: dict[str, str] = {}


def staged_query(name: str, oracle: str) -> Callable[[QueryFn], QueryFn]:
    """Module-local twin of plans.registry.query -- keeps staged work out
    of the driver's grading window until deliberately rotated in."""

    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = fn
        STAGED_ORACLE[name] = oracle
        return fn

    return deco
