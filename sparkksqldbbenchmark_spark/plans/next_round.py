"""Round-17 staging area: fully-built, oracle-verified queries that are
NOT yet registered with the driver-graded registry.

Why a separate module: the driver grades exactly the first 50 entries of
``__spark_entry__.queries()`` and the round-16 head is committed (8
flagships + the 25 round-15 graduates in plans/round16_queries.py + the
round-16 slot-fillers + re-grades). New work lands here with a
MODULE-LOCAL registry; tests/test_next_round.py runs the same
Spark-vs-DuckDB comparison the driver runs, so each staged query is
already verified green before it rotates into the graded head next
round (swap ``staged_query`` for ``plans.registry.query``, import the
module from ``__spark_entry__``, and move freshly-green head rows to
TAIL with pins -- mechanics as executed in rounds 6-16, see
plans/round6_queries.py .. round16_queries.py history).

Opening state: EMPTY -- the round-15 staging queue fully drained at the
round-16 rotation (all 25 rows graduated, docs/ROTATION_R16.md). The
round-17 refill lands during round 16, kept no larger than the free
slots remaining after the round-17 rotation, every row with a
brute-force or property-based second witness in the same commit and a
measured scale point or written scale arithmetic for any novel
data-scaling shape (VERDICT r15 ask #9).

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
