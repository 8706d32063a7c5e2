"""Mesh/sharding unit tests beyond the end-to-end N-chip parity check in
test_toy_train.py: the Hutchinson probe axis must land on the mesh 'trace'
axis when a mesh is active (SURVEY.md §2.5; the reference has no analogue —
its only parallelism is DataParallel scatter/gather, train_img.py:203-204)
and must be numerically inert (same probes, same math, different layout)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P, set_mesh

from implicit_normalizing_flows_tpu.layers import ImplicitBlock
from implicit_normalizing_flows_tpu.models.builders import build_lipschitz_mlp
from implicit_normalizing_flows_tpu.parallel import make_mesh
from implicit_normalizing_flows_tpu.parallel.mesh import constrain_probe_axis


def _probe_block(n_probes):
    mk = lambda: build_lipschitz_mlp([4, 16, 4], "swish", 0.9, [2, 2], [2, 2],
                                     n_iterations=5)
    return ImplicitBlock(
        mk(), mk(), n_probes=n_probes, n_exact_terms=2, n_power_series=None,
        neumann_grad=True, grad_in_forward=False, threshold=20,
    )


def test_constrain_probe_axis_noop_without_mesh():
    x = jnp.ones((4, 8, 3))
    y = jax.jit(constrain_probe_axis)(x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_constrain_probe_axis_applies_trace_spec():
    mesh = make_mesh(n_data=2, n_trace=4)

    @jax.jit
    def f(x):
        return constrain_probe_axis(x)

    with set_mesh(mesh):
        y = f(jnp.ones((4, 8, 3)))
    assert tuple(y.sharding.spec)[:2] == ("trace", "data")

    # Indivisible probe axis -> constraint skipped, not an error.
    with set_mesh(mesh):
        y2 = f(jnp.ones((3, 8, 3)))
    np.testing.assert_array_equal(np.asarray(y2), 1.0)


def test_probe_axis_sharding_is_numerically_inert(monkeypatch):
    """loss and grads identical with/without the trace mesh (same RNG).
    f32 estimator: under bf16 (the TPU default) resharding legitimately
    reassociates the reductions, so exact parity is an f32 property."""
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    block = _probe_block(n_probes=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    variables = block.init(rng, x)
    params, state = variables["params"], variables["state"]

    @jax.jit
    def loss_fn(params, state, x, key):
        y, logdet, new_state = block.forward(
            {"params": params, "state": state}, x, jnp.zeros(x.shape[0]),
            rng=key, train=True)
        return (y ** 2).mean() - logdet.mean()

    key = jax.random.PRNGKey(2)
    l1, g1 = jax.value_and_grad(loss_fn)(params, state, x, key)

    mesh = make_mesh(n_data=2, n_trace=4)
    with set_mesh(mesh):
        lN, gN = jax.value_and_grad(loss_fn)(params, state, x, key)

    np.testing.assert_allclose(float(l1), float(lN), rtol=2e-5)
    f1 = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, g1))[0]
    fN = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, gN))[0]
    np.testing.assert_allclose(np.asarray(f1), np.asarray(fN), atol=2e-5)


@pytest.mark.slow  # >90s on CPU; excluded from the fast CI subset
def test_tensor_parallel_matches_replicated(monkeypatch):
    """data x model mesh: Lipschitz-net channel dims sharded over 'model'
    (place_tp) must reproduce the unsharded single-program step — same loss,
    same updated params (f32: sharded reductions reassociate, so tolerances
    are loose-ish rather than exact)."""
    monkeypatch.setenv("IMNF_BF16_EST", "0")
    monkeypatch.setenv("IMNF_BWD_PRECISION", "f32")
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _build
    from implicit_normalizing_flows_tpu.parallel import place_batch, place_tp
    from implicit_normalizing_flows_tpu.training import adam, ema_init, linear_warmup
    from implicit_normalizing_flows_tpu.training.loops import make_image_step

    batch, size, idim = 8, 8, 16
    model = _build([1, 1], idim, size, batch, n_exact_terms=2, n_lip_iters=2)
    x0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, 3, size, size),
                            minval=0.05, maxval=0.95)
    variables = model.init(jax.random.PRNGKey(1), x0)
    variables = model.init_with_batch(variables, x0, rng=jax.random.PRNGKey(2))
    params, state = variables["params"], variables["state"]
    optimizer = adam(linear_warmup(1e-3, 10), betas=(0.9, 0.99), grad_clip=1.0)
    opt_state, shadow = optimizer.init(params), ema_init(params)
    x_u8 = jnp.asarray(np.random.RandomState(0).randint(
        0, 256, size=(batch, 3, size, size), dtype=np.uint8))
    y = jnp.zeros((batch,), jnp.int32)
    key = jax.random.PRNGKey(3)

    step1 = make_image_step(model, optimizer, im_dim=3, imagesize=size,
                            task="density", n_lipschitz_iters=2)
    p1, *_, m1 = step1(params, state, opt_state, shadow, x_u8, y, key, jnp.ones(()))

    mesh = make_mesh(n_data=4, n_model=2)
    stepT = make_image_step(model, optimizer, im_dim=3, imagesize=size,
                            task="density", n_lipschitz_iters=2, mesh=mesh)
    pT, *_, mT = stepT(
        place_tp(mesh, params, idim), place_tp(mesh, state, idim),
        place_tp(mesh, opt_state, idim), place_tp(mesh, shadow, idim),
        place_batch(mesh, x_u8), place_batch(mesh, y), key, jnp.ones(()),
    )
    np.testing.assert_allclose(float(m1["bpd"]), float(mT["bpd"]), rtol=2e-5)
    l1 = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, p1))[0]
    lT = jax.flatten_util.ravel_pytree(jax.tree.map(np.asarray, pT))[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(lT), atol=2e-5)


def test_tp_sharding_path_rules():
    """tp_sharding shards ONLY the Lipschitz nets' tensors: hidden conv
    weights column-parallel (dim 0), final projection row-parallel (dim 1),
    idim-length net vectors on dim 0 — and replicates everything else even
    when it is coincidentally idim-sized (e.g. actnorm scales when
    idim == channel count), which the old dim-size-only heuristic
    mis-sharded."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _build
    from implicit_normalizing_flows_tpu.parallel.mesh import tp_sharding
    from jax.sharding import PartitionSpec as P
    from jax.tree_util import tree_flatten_with_path, keystr

    idim = 12  # == channel count at scale 2 (3 * 4 after squeeze): trap for
               # the old heuristic — actnorm scales there are (12,) too
    model = _build([1, 1], idim, 8, 4, n_exact_terms=1, n_lip_iters=1)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 3, 8, 8),
                           minval=0.05, maxval=0.95)
    variables = model.init(jax.random.PRNGKey(1), x)
    mesh = make_mesh(n_data=4, n_model=2)
    shardings = tp_sharding(mesh, variables["params"], idim)

    flat_p = dict((keystr(p), a) for p, a in
                  tree_flatten_with_path(variables["params"])[0])
    flat_s = dict((keystr(p), s) for p, s in
                  tree_flatten_with_path(shardings)[0])
    checked_col = checked_row = checked_trap = 0
    for k, a in flat_p.items():
        spec = flat_s[k].spec
        in_net = "nnet_x" in k or "nnet_z" in k
        if not in_net:
            assert spec == P(), (k, spec)  # replicated, even (12,) actnorm
            if a.ndim == 1 and a.shape[0] == idim:
                checked_trap += 1
            continue
        if a.ndim >= 2 and a.shape[0] == idim:
            assert spec[0] == "model", (k, spec)
            checked_col += 1
        elif a.ndim >= 2 and a.shape[1] == idim:
            assert spec[1] == "model", (k, spec)
            checked_row += 1
        elif a.ndim == 1 and a.shape[0] == idim:
            assert spec[0] == "model", (k, spec)
    assert checked_col > 0 and checked_row > 0 and checked_trap > 0
