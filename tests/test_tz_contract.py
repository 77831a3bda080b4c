"""UTC-only contract marker (VERDICT r6 item 7).

20 registry keys are inherently session-timezone-sensitive (LTZ
wall-clock interpretation of event timestamps); they are pinned in
``session.TZ_SENSITIVE_KEYS``. The driver runs UTC, where all of them
are oracle-green. These tests exist so that if the execution
environment's timezone assumption ever changes, ONE test fails with a
named cause and the full affected-key list, instead of 20 unexplained
red CORRECTNESS hashes.

Re-derive the list (full-registry scan, ~25 min):
    hash every queries()[k] at sf0.01 under a UTC session and under
    spark.sql.session.timeZone=America/New_York; the divergent set IS
    the constant. (tools/driver_sim.py --env-parity --all prints the
    same set as its informational tz diff.)
"""

from __future__ import annotations

from hh_rumors_presto_spark.registry import QUERIES, load_all_queries
from hh_rumors_presto_spark.session import TZ_SENSITIVE_KEYS


def test_canonical_session_is_utc(spark):
    """The canonical session (and the driver) must run UTC: the keys in
    TZ_SENSITIVE_KEYS are oracle-verified under UTC only."""
    tz = spark.conf.get("spark.sql.session.timeZone")
    assert tz == "UTC", (
        f"session timezone is {tz!r}, not UTC — the following "
        f"{len(TZ_SENSITIVE_KEYS)} keys will hash-diverge from their "
        f"DuckDB oracles under this zone (inherent LTZ wall-clock "
        f"semantics, see session.TZ_SENSITIVE_KEYS): "
        f"{sorted(TZ_SENSITIVE_KEYS)}"
    )


def test_tz_sensitive_keys_exist_in_registry():
    """The pinned list must track the registry — a renamed/removed key
    in the list means the scan is stale and should be re-derived."""
    load_all_queries()
    missing = sorted(k for k in TZ_SENSITIVE_KEYS if k not in QUERIES)
    assert not missing, f"TZ_SENSITIVE_KEYS not in registry: {missing}"


def test_representative_key_shifts_under_non_utc(spark, sf_dir):
    """Canary: ts_sessionize (in the list) must actually produce
    different values under a shifted session tz, and project_rename
    (not in the list) must not — proving the marker tracks real
    behavior, not just documentation. The session conf is flipped and
    restored around the probe (runtime conf, same JVM)."""
    load_all_queries()

    def row_set(key):
        return sorted(map(str, QUERIES[key](spark, sf_dir).collect()))

    utc_sens = row_set("ts_sessionize")
    utc_stable = row_set("project_rename")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ny_sens = row_set("ts_sessionize")
        ny_stable = row_set("project_rename")
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert ny_sens != utc_sens, (
        "ts_sessionize no longer tz-sensitive — TZ_SENSITIVE_KEYS is stale"
    )
    assert ny_stable == utc_stable, "project_rename became tz-sensitive"
