"""Registry contract (round 5): the driver's correctness gate records
only the first 50 registry entries, so the registry must stay at
EXACTLY 50, every entry must carry a SQL oracle, and the bench
component map must reference real registry entries. Pure-python —
no SparkSession — so a violation fails in milliseconds."""

from __future__ import annotations

from shazam_an_industrial_strength_audio_search_algorithm__spark import api


def test_registry_is_exactly_the_driver_window():
    assert len(api.QUERIES) == 50


def test_every_query_has_a_value_oracle():
    missing = set(api.QUERIES) - set(api.ORACLE_SQL)
    assert not missing, f"rows-only queries: {missing}"
    stale = set(api.ORACLE_SQL) - set(api.QUERIES)
    assert not stale, f"oracle entries without a query: {stale}"


def test_bench_components_reference_registry_entries():
    assert set(api.BENCH_COMPONENTS) <= set(api.QUERIES)
    # historical per-plan names must not collide with registry names
    # of OTHER entries (each may reuse its own base name)
    for base, comps in api.BENCH_COMPONENTS.items():
        for cname, fn in comps:
            assert callable(fn)
            assert cname == base or cname not in api.QUERIES, cname


def test_plan_union_sql_replays_once_per_label():
    sql = api._plan_union_sql("SELECT 1 AS x", ("a", "b"))
    import duckdb

    df = duckdb.sql(sql).df()
    assert sorted(df["plan"]) == ["a", "b"]
    assert list(df.columns) == ["plan", "x"]
