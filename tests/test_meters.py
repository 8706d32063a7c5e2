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


def test_sgdr_schedule_matches_reference_formula():
    """cosine_annealing_warm_restarts (lib/lr_scheduler.py:40-75): cycle
    boundaries restart at base_lr, midpoints hit (base+eta_min)/2, and the
    T_mult=2 geometric cycle bookkeeping tracks the closed form — all under
    jit (the schedule runs inside the optimizer)."""
    import math
    import jax
    import numpy as np
    from implicit_normalizing_flows_tpu.training import (
        cosine_annealing_warm_restarts)

    s = cosine_annealing_warm_restarts(1.0, 100, 1, 0.1)
    f = jax.jit(s)
    assert abs(float(f(0)) - 1.0) < 1e-6
    assert abs(float(f(50)) - 0.55) < 1e-6  # (1.0 + 0.1) / 2
    assert abs(float(f(100)) - 1.0) < 1e-6  # restart
    assert abs(float(f(150)) - 0.55) < 1e-6

    s2 = jax.jit(cosine_annealing_warm_restarts(1.0, 100, 2, 0.0))
    # cycles: [0,100) len 100, [100,300) len 200, [300,700) len 400
    assert abs(float(s2(100)) - 1.0) < 1e-6
    assert abs(float(s2(200)) - 0.5) < 1e-6   # midpoint of the len-200 cycle
    assert abs(float(s2(300)) - 1.0) < 1e-6
    assert abs(float(s2(500)) - 0.5) < 1e-6

    sw = jax.jit(cosine_annealing_warm_restarts(1.0, 1000, 1, 0.0,
                                                warmup_iters=10))
    assert float(sw(0)) < 0.2  # warmup suppresses the start
    np.testing.assert_allclose(float(sw(9)), math.cos(math.pi * 9 / 1000) / 2 + 0.5,
                               rtol=1e-5)


def test_packed_metrics_view():
    import jax.numpy as jnp
    import numpy as np

    from implicit_normalizing_flows_tpu.utils.meters import PackedMetrics

    names = ("a", "b", "c")
    packed = jnp.asarray([1.0, 2.5, -3.0])
    rest = {"vec": jnp.arange(4.0)}
    m = PackedMetrics(names, packed, rest)
    assert "a" in m and "vec" in m and "zzz" not in m
    assert float(m["b"]) == 2.5
    assert m.get("zzz", 7) == 7
    np.testing.assert_array_equal(np.asarray(m["vec"]), np.arange(4.0))
    assert set(m.keys()) == {"a", "b", "c", "vec"}
    assert dict(m.items())["a"] == 1.0
    assert m.block() is m
