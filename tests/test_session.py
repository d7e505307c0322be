"""Session factory: the L17 autoscale preset must emit the full
dynamic-allocation conf set mirroring the reference's pool-autoscale
formula (``Readme.md:29-41``) — cap, backlog debounce, idle release,
and shuffle-safe decommission."""

from __future__ import annotations

from azure_batch_map_reduce_spark.session import autoscale_conf


def test_autoscale_conf_mirrors_reference_formula():
    conf = autoscale_conf()
    # Scale-to-pending with the reference's 5-node cap (Readme.md:36-38).
    assert conf["spark.dynamicAllocation.enabled"] == "true"
    assert conf["spark.dynamicAllocation.maxExecutors"] == "5"
    assert conf["spark.dynamicAllocation.executorAllocationRatio"] == "1.0"
    # Idle release ≈ taskcompletion deallocation (Readme.md:40).
    assert conf["spark.dynamicAllocation.executorIdleTimeout"].endswith("s")
    # Safe scale-down without an external shuffle service.
    assert conf["spark.dynamicAllocation.shuffleTracking.enabled"] == "true"
    assert conf["spark.decommission.enabled"] == "true"


def test_autoscale_conf_parameterized_cap():
    conf = autoscale_conf(max_executors=1000, min_executors=8, idle_timeout_s=120)
    assert conf["spark.dynamicAllocation.maxExecutors"] == "1000"
    assert conf["spark.dynamicAllocation.minExecutors"] == "8"
    assert conf["spark.dynamicAllocation.executorIdleTimeout"] == "120s"
