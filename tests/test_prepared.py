"""Prepared-query SERVICE mode (registry.prepare): plan-once, repeats
served from materialized stages. Not used by the headline bench (see
bench.py run_once) — these tests pin the API contract:
  * a prepared plan returns the SAME results as a fresh build;
  * the cache is per-(session, name, sf_dir) and returns the same
    DataFrame object on a hit;
  * NO_PREPARE builders (build-time Spark jobs) are re-invoked per call.
"""

from unittest import mock

from omnidata_etl_spark import registry
from omnidata_etl_spark.registry import NO_PREPARE, QuerySpec, all_specs, prepare

SF = "/root/testdata/sf0.001"


def test_prepare_matches_fresh_build(spark):
    spec = all_specs()["agg_having"]
    fresh = spec.fn(spark, SF).toPandas()
    prepped = prepare(spark, "agg_having", SF).toPandas()
    assert fresh.equals(prepped)


def test_prepare_cache_hit_same_object(spark):
    a = prepare(spark, "limit_preview", SF)
    b = prepare(spark, "limit_preview", SF)
    assert a is b
    # different sf_dir => different cache entry
    c = prepare(spark, "limit_preview", "/root/testdata/sf0.01")
    assert c is not a


def test_prepare_execute_fresh_wrapper_same_results(spark):
    from omnidata_etl_spark.registry import prepare_execute

    spec = all_specs()["agg_having"]
    fresh = spec.fn(spark, SF).toPandas()
    a = prepare_execute(spark, "agg_having", SF)
    b = prepare_execute(spark, "agg_having", SF)
    # fresh execution wrapper per call: distinct DataFrames (no stage
    # reuse), same results as a from-scratch build
    assert a is not b
    assert a.toPandas().equals(fresh)
    assert b.toPandas().equals(fresh)


def test_no_prepare_rebuilds_every_call(spark):
    calls = []
    name = "dedup_cluster_canonical"
    real = all_specs()[name]
    assert name in NO_PREPARE

    def counting_fn(sp, sf_dir):
        calls.append(sf_dir)
        return sp.range(1)

    fake = QuerySpec(name=name, fn=counting_fn, oracle=real.oracle, tags=real.tags)
    with mock.patch.dict(registry._REGISTRY, {name: fake}):
        prepare(spark, name, SF)
        prepare(spark, name, SF)
    assert len(calls) == 2


def test_no_prepare_members_exist():
    specs = all_specs()
    missing = [n for n in NO_PREPARE if n not in specs]
    assert not missing, f"stale NO_PREPARE entries: {missing}"
