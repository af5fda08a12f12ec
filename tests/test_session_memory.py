"""default_driver_memory: the local-mode driver-heap sizing rule
(r15 optimization — guide §5 applied to the local-mode driver that
hosts every executor slot). Pure-function tests; no Spark session."""

import cdk_datalake_ingest_spark.session as S


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "3g")
    assert S.default_driver_memory() == "3g"


def test_scales_with_slot_count(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "32")
    val = S.default_driver_memory()
    # on any box with >= 32 GiB RAM the 32-slot formula yields
    # 256 MB/slot = 8192m; smaller boxes clamp to RAM/4 or fall back
    with open("/proc/meminfo") as f:
        mem_mb = int(f.readline().split()[1]) // 1024
    expect = min(32 * 256, mem_mb // 4)
    assert val == (f"{expect}m" if expect > 1024 else None)


def test_tiny_slot_count_keeps_stock_default(monkeypatch):
    # 4 slots -> 1024m == Spark's own default: return None, set nothing
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "4")
    assert S.default_driver_memory() is None
