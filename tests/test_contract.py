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
    # every registered query is oracle-checked as of round 4 (the two
    # former rows-only rows gained deterministic oracles per VERDICT r03)
    rows_only = set(qs) - set(oracles)
    assert not rows_only, f"unexpected rows-only queries: {rows_only}"
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


# Pinned implementation fingerprints for every TAIL query (see
# tools/tail_hash.py). A TAIL query rides on a PRIOR round's green
# verdict; that evidence is void if its implementing source changed
# since. If this test fails after an intentional change: rotate the
# query back into the head (remove from TAIL) so the driver re-grades
# it, or — only for a deliberate TAIL re-pin of an UNCHANGED-semantics
# edit such as a comment fix — regenerate with `python tools/tail_hash.py`.
TAIL_SOURCE_SHA256 = {
    "session_window_agg": "d77b16407f066ec6",
    "latency_percentiles": "921d4bebb146be04",
    "dedup_clusters": "e7e68ce4cd15991b",
    "dedup_simhash": "f2eca011f5c48cb6",
    "value_counts": "00844505bf55dd97",
    "station_enrichment_join": "be845868ea1f69ec",
    "group_by_sum_consumption": "b69cb2f4192ed6bb",
    "validity_filter": "d883627afc06719d",
    "numeric_projection_summary": "e0adc5bc786eb52a",
    "count_distinct_stations": "ede28ac1c2bbf625",
    "latest_by_rownumber": "ca58fb12c489da04",
    "weather_window_agg_sql": "34f93a49a1e8e0fc",
    "weather_window_agg_by_station": "a9d103ad154796d5",
    "streaming_union_window_agg": "6a00b93b4b1e7758",
    "latest_by_offset": "93f6b5d747f9c052",
    "argmax_station": "57534924da9abd75",
    "streaming_window_agg": "1084464fda6034a4",
    "tpch_q6_selective_scan": "346edd0cb15fc76a",
    "tpch_q5_join_chain": "73e56a5b96c436ce",
    "text_fingerprint": "c17c61d1999b75a4",
    "dirty_data_parsing": "c1274951d6221b89",
    "time_rollup_hierarchy": "39dacc5c5040bb32",
    "streaming_update_mode_final": "dc7c477191421541",
    "region_zone_lookup": "d5c61e86e895d069",
    "dedup_exact": "6ebe967cf510b65f",
    "text_lang_id": "ee1612470f8d3e16",
    "top_k_values": "730d0ba016e9d1cf",
    "correlation_matrix": "9aa4fa882628a8db",
    "price_prediction_pipeline": "f3cca85f3f7eb856",
    "flag_derivation_dropna": "5959d7f50a2caf6b",
    "window_function_suite": "3330ec5d71abad10",
    "kmv_distinct_sketch": "111a71d3b5aea126",
    "embedding_quantization": "08198b98283f7b99",
    "skewed_agg_salted": "cd2f15fec708bdb3",
    "skewed_join_replicated": "de3407de79b063fe",
    "cube_rollup_report": "883406bb09d6150c",
    "vocab_top_tokens": "4f3fb82b30845a54",
    "datetime_parse_suite": "cd1f91e55c560a21",
    "text_token_counts": "ce001968315c7497",
    "stratified_sample": "829a56c9083a8cf5",
    "hash_split_assignment": "a0804351cc0b6b16",
    "text_repetition_ratio": "ea01a24b9132cfb8",
}


def test_tail_source_unchanged_since_green_verdict():
    """Rotation-policy enforcement (VERDICT r03 item 2): a query may sit
    in the ungraded TAIL only while the source that earned its recorded
    green verdict is unchanged."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from tail_hash import current_fingerprints

    got = current_fingerprints()
    assert set(got) == set(TAIL_SOURCE_SHA256), (
        "TAIL changed — regenerate pins with `python tools/tail_hash.py` "
        "after verifying every remaining TAIL entry has a green verdict"
    )
    stale = {
        n: (TAIL_SOURCE_SHA256[n], got[n])
        for n in got
        if got[n] != TAIL_SOURCE_SHA256[n]
    }
    assert not stale, (
        f"TAIL queries whose implementation changed since their green "
        f"verdict: {sorted(stale)} — rotate them into the head for "
        f"re-grading"
    )


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
