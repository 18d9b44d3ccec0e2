"""Driver-contract invariants: the registry must stay well-formed —
every oracle key names a query, names are unique and stable, entry()
uses a registered query, and the cluster profile emits sane conf."""

from __future__ import annotations

import __spark_entry__ as entrymod
from sparkksqldbbenchmark_spark.session import cluster_profile


def test_registry_well_formed():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs), "oracle without a query"
    # rows-only queries are the deliberate exceptions
    rows_only = set(qs) - set(oracles)
    assert rows_only <= {
        "approx_count_distinct",
        "multimodal_frame_sample",
    }, f"unexpected rows-only queries: {rows_only}"
    for name, sql in oracles.items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name


def test_registry_order_fits_driver_window():
    """The driver grades only the first DRIVER_WINDOW registered queries.
    Every oracle-bearing query outside TAIL must land inside that window,
    and TAIL names must actually exist (a typo would silently ungrade a
    real query)."""
    qs = entrymod.queries()
    names = list(qs)
    assert set(entrymod.TAIL) <= set(names), "TAIL names a missing query"
    head = names[: entrymod.DRIVER_WINDOW]
    displaced = [n for n in names[entrymod.DRIVER_WINDOW:] if n not in entrymod.TAIL]
    assert not displaced, (
        f"queries displaced past the driver's {entrymod.DRIVER_WINDOW}-row "
        f"grading window: {displaced} — extend TAIL deliberately or trim"
    )
    assert all(n not in entrymod.TAIL for n in head[: len(names) - len(entrymod.TAIL)])


def test_entry_is_registered_flagship(spark):
    df = entrymod.entry(spark)
    assert set(df.columns) == {
        "window_start", "window_end", "event_type", "avg_value",
        "min_value", "max_value", "message_count", "min_producer_ts",
    }


def test_cluster_profile_conf():
    cfg = cluster_profile()
    conf = cfg.to_conf()
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf["spark.sql.shuffle.partitions"] == "2000"
    assert "RocksDBStateStoreProvider" in conf[
        "spark.sql.streaming.stateStore.providerClass"
    ]
    override = cluster_profile(shuffle_partitions=500)
    assert override.to_conf()["spark.sql.shuffle.partitions"] == "500"
