"""LaggedMetrics: lag-1 consumption order, context passing, flush."""
from implicit_normalizing_flows_tpu.utils import LaggedMetrics


def test_lagged_metrics_order_and_flush():
    seen = []
    lag = LaggedMetrics(lambda m, i: seen.append((m, i)))

    lag.push({"loss": 1.0}, i=0)
    assert seen == []  # nothing consumed until the next push
    lag.push({"loss": 2.0}, i=1)
    assert seen == [({"loss": 1.0}, 0)]
    lag.push({"loss": 3.0}, i=2)
    assert seen == [({"loss": 1.0}, 0), ({"loss": 2.0}, 1)]
    lag.flush()
    assert seen[-1] == ({"loss": 3.0}, 2)
    lag.flush()  # idempotent
    assert len(seen) == 3


def test_lagged_metrics_flush_then_reuse():
    seen = []
    lag = LaggedMetrics(lambda m: seen.append(m))
    lag.push("a")
    lag.flush()
    lag.push("b")
    lag.push("c")
    lag.flush()
    assert seen == ["a", "b", "c"]
