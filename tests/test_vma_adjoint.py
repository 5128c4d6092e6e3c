"""Strict varying-manual-axes (vma) contract for the adjoint custom-VJP.

Round-2 driver failure (MULTICHIP_r02.json): under strict shard_map vma
checking, `odeint_adjoint`'s bwd rule produced varying cotangents for
replicated (unvarying) primal inputs — e.g. `prep['_alpha_eff']` — and the
custom-VJP type check rejected the whole DistTrainer train step. The fix
(graphax.dist.mesh.ensure_varying_tree + odeint_adjoint(vma_axes=...))
casts every custom-VJP input to varying first; the cast's transpose psums
the cotangent, so gradients stay globally correct without an outer psum.

These tests pin (1) the type-level contract via jax.typeof().vma at trace
time and (2) the value-level contract: shard_map'd adjoint gradients must
equal single-device adjoint gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphax.dist.mesh import HAS_VMA, ensure_varying, ensure_varying_tree
from graphax.ode import odeint_adjoint

pytestmark = pytest.mark.skipif(not HAS_VMA,
                                reason="this JAX predates the vma system")


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("g",))


def test_ensure_varying_tree_casts_only_unvarying_leaves():
    mesh = _mesh()
    seen = {}

    def body(scalar, vec):
        tree = {"s": scalar, "v": vec[0]}
        out = ensure_varying_tree(tree, "g")
        seen["before"] = {k: jax.typeof(v).vma for k, v in tree.items()}
        seen["after"] = {k: jax.typeof(v).vma for k, v in out.items()}
        # idempotent: a second pass must not error on already-varying leaves
        out2 = ensure_varying_tree(out, "g")
        seen["again"] = {k: jax.typeof(v).vma for k, v in out2.items()}
        return jax.lax.psum(out["s"] + jnp.sum(out2["v"]), "g")

    f = shard_map(body, mesh=mesh, in_specs=(P(), P("g")), out_specs=P())
    # trace only (types are established at trace time)
    jax.eval_shape(f, jnp.float32(1.0), jnp.zeros((8, 4)))
    assert "g" not in seen["before"]["s"] and "g" in seen["before"]["v"]
    assert all("g" in v for v in seen["after"].values())
    assert all("g" in v for v in seen["again"].values())


def test_adjoint_custom_vjp_inputs_all_varying():
    """Every leaf entering the adjoint custom_vjp must be varying when
    vma_axes is passed — the exact contract the driver's JAX enforces."""
    mesh = _mesh()
    vmas = []

    def rhs(params, t, y):
        # record the vma of each param leaf as the solver traces the RHS
        vmas.append({k: jax.typeof(v).vma for k, v in params.items()})
        return -params["a"] * y + params["c"]

    def body(a, ys):
        y = ys[0]
        params = {"a": a, "c": jnp.zeros_like(a)}  # replicated scalars
        res = odeint_adjoint(rhs, params, y, 0.0, 1.0, method="rk4",
                             step_size=0.25, adjoint_method="rk4",
                             adjoint_step_size=0.25, vma_axes=("g",))
        return jnp.sum(res.y ** 2)[None]  # rank-1 for a varying out_spec

    g = jax.grad(lambda a: jnp.sum(shard_map(
        body, mesh=mesh, in_specs=(P(), P("g")), out_specs=P("g"))(
            a, jnp.ones((8, 3)))))(jnp.float32(0.7))
    assert np.isfinite(float(g))
    assert vmas, "RHS was never traced"
    for rec in vmas:
        for k, vma in rec.items():
            assert "g" in vma, f"param {k!r} entered custom_vjp unvarying"


def test_sharded_adjoint_grads_match_single_device():
    """shard_map'd adjoint grads (via ensure_varying_tree at loss entry, no
    outer psum) == single-device adjoint grads on the same problem."""
    mesh = _mesh()
    rng = np.random.RandomState(0)
    n_per, d = 4, 6  # 8 shards x 4 rows
    y0 = jnp.asarray(rng.randn(8, n_per, d).astype(np.float32))
    W = jnp.asarray((rng.randn(d, d) * 0.1).astype(np.float32))
    a0 = jnp.float32(0.3)

    def rhs(params, t, y):
        return jnp.tanh(y @ params["W"]) - params["a"] * y

    def single_loss(params):
        y = y0.reshape(-1, d)
        res = odeint_adjoint(rhs, params, y, 0.0, 1.0, method="rk4",
                             step_size=0.2, adjoint_method="rk4",
                             adjoint_step_size=0.2)
        return jnp.sum(res.y ** 2)

    def body(params, ys):
        y = ys[0]

        def loss_fn(p):
            p = ensure_varying_tree(p, "g")
            res = odeint_adjoint(rhs, p, y, 0.0, 1.0, method="rk4",
                                 step_size=0.2, adjoint_method="rk4",
                                 adjoint_step_size=0.2, vma_axes=("g",))
            return jax.lax.psum(jnp.sum(res.y ** 2), "g")

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads  # grads already globally reduced by the casts

    sharded = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P(), P("g")), out_specs=(P(), P())))
    params = {"W": W, "a": a0}
    loss_s, grads_s = sharded(params, y0)
    loss_1, grads_1 = jax.value_and_grad(single_loss)(params)

    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads_s["a"]),
                               np.asarray(grads_1["a"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grads_s["W"]),
                               np.asarray(grads_1["W"]), rtol=1e-4,
                               atol=1e-6)


def test_ensure_varying_outside_shard_map_is_noop():
    x = jnp.ones((3,))
    y = ensure_varying(x, "g")
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
