"""Solver-layer unit tests: convergence on analytically solvable ODEs,
adaptive-step behavior, NFE budget semantics, observer hook, adjoint
gradients. These replace the reference's reliance on torchdiffeq being
correct; oracles are closed-form solutions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphax.ode import odeint, odeint_adjoint, Observer


def exp_decay(t, y):
    return -y


def test_euler_converges():
    y0 = jnp.ones((4,))
    res = odeint(exp_decay, y0, 0.0, 1.0, method="euler", step_size=1e-3)
    np.testing.assert_allclose(res.y, np.exp(-1.0) * np.ones(4), rtol=1e-2)
    assert res.success


def test_rk4_high_accuracy():
    y0 = jnp.ones((4,))
    res = odeint(exp_decay, y0, 0.0, 1.0, method="rk4", step_size=0.1)
    np.testing.assert_allclose(res.y, np.exp(-1.0) * np.ones(4), rtol=1e-6)


def test_midpoint_order2():
    y0 = jnp.ones(())
    err1 = abs(float(odeint(exp_decay, y0, 0.0, 1.0, method="midpoint",
                            step_size=0.1).y) - np.exp(-1))
    err2 = abs(float(odeint(exp_decay, y0, 0.0, 1.0, method="midpoint",
                            step_size=0.05).y) - np.exp(-1))
    assert err2 < err1 / 3.0  # ~4x for order 2


@pytest.mark.parametrize("method,rtol,check", [
    ("dopri5", 1e-7, 1e-5),
    ("adaptive_heun", 1e-5, 1e-3),  # order 2: tight tols blow the NFE budget
    ("bosh3", 1e-6, 1e-4),
])
@pytest.mark.parametrize("differentiable", [True, False])
def test_adaptive_accuracy(method, rtol, check, differentiable):
    y0 = jnp.ones((3,))
    res = odeint(exp_decay, y0, 0.0, 2.0, method=method, rtol=rtol,
                 atol=rtol * 1e-2, max_nfe=5000, differentiable=differentiable)
    np.testing.assert_allclose(res.y, np.exp(-2.0) * np.ones(3), rtol=check)
    assert bool(res.success)
    assert int(res.nfe) > 0


def test_adaptive_scan_matches_while():
    """The bounded-scan (differentiable) and while_loop paths must agree."""
    y0 = jnp.linspace(0.5, 1.5, 8)

    def rhs(t, y):
        return jnp.sin(t) * y

    a = odeint(rhs, y0, 0.0, 3.0, method="dopri5", differentiable=True)
    b = odeint(rhs, y0, 0.0, 3.0, method="dopri5", differentiable=False)
    np.testing.assert_allclose(a.y, b.y, rtol=1e-6)
    assert int(a.nfe) == int(b.nfe)
    assert int(a.steps) == int(b.steps)


def test_nonlinear_vs_scipy_style_reference():
    # logistic equation dy/dt = y(1-y), y(0)=0.1 → y(t) = 1/(1+9 e^{-t})
    def rhs(t, y):
        return y * (1 - y)

    y0 = jnp.asarray(0.1)
    res = odeint(rhs, y0, 0.0, 4.0, method="dopri5", rtol=1e-8, atol=1e-10,
                 max_nfe=5000)
    expected = 1.0 / (1.0 + 9.0 * np.exp(-4.0))
    np.testing.assert_allclose(float(res.y), expected, rtol=1e-6)


def test_max_nfe_budget_halts_without_raising():
    """JAX analog of MaxNFEException: success=False, no crash."""
    def stiff(t, y):
        return -2000.0 * (y - jnp.cos(t))

    res = odeint(stiff, jnp.asarray(0.0), 0.0, 10.0, method="dopri5",
                 rtol=1e-9, atol=1e-11, max_nfe=30)
    assert not bool(res.success)
    assert int(res.nfe) <= 30 + 6


def test_pytree_state():
    y0 = {"x": jnp.ones((2, 3)), "aux": jnp.zeros(5)}

    def rhs(t, y):
        return {"x": -y["x"], "aux": jnp.ones(5)}

    res = odeint(rhs, y0, 0.0, 1.0, method="dopri5")
    np.testing.assert_allclose(res.y["x"], np.exp(-1) * np.ones((2, 3)), rtol=1e-5)
    np.testing.assert_allclose(res.y["aux"], np.ones(5), rtol=1e-5)


def test_observer_sees_monotone_time():
    obs = Observer(
        init={"count": jnp.asarray(0), "max_t": jnp.asarray(0.0)},
        update=lambda c, t, y: {"count": c["count"] + 1,
                                "max_t": jnp.maximum(c["max_t"], t)},
    )
    res = odeint(exp_decay, jnp.ones(2), 0.0, 1.0, method="rk4",
                 step_size=0.25, observer=obs)
    assert int(res.observer["count"]) == 4
    np.testing.assert_allclose(float(res.observer["max_t"]), 1.0, rtol=1e-6)


def test_gradients_through_scan_dopri5():
    def loss(scale):
        def rhs(t, y):
            return -scale * y

        res = odeint(rhs, jnp.ones(()), 0.0, 1.0, method="dopri5",
                     differentiable=True)
        return res.y

    g = jax.grad(loss)(jnp.asarray(1.0))
    # d/ds e^{-s} at s=1 = -e^{-1}
    np.testing.assert_allclose(float(g), -np.exp(-1.0), rtol=1e-4)


def test_adjoint_gradients_match_direct():
    def rhs_p(params, t, y):
        return -params["k"] * y + params["b"]

    params = {"k": jnp.asarray(1.3), "b": jnp.asarray(0.2)}
    y0 = jnp.asarray(1.0)

    def loss_adj(params, y0):
        res = odeint_adjoint(rhs_p, params, y0, 0.0, 1.0, method="dopri5",
                             adjoint_method="dopri5", rtol=1e-8, atol=1e-10,
                             adjoint_rtol=1e-8, adjoint_atol=1e-10)
        return jnp.sum(res.y)

    def loss_direct(params, y0):
        res = odeint(lambda t, y: rhs_p(params, t, y), y0, 0.0, 1.0,
                     method="dopri5", rtol=1e-8, atol=1e-10,
                     differentiable=True)
        return jnp.sum(res.y)

    ga = jax.grad(loss_adj, argnums=(0, 1))(params, y0)
    gd = jax.grad(loss_direct, argnums=(0, 1))(params, y0)
    np.testing.assert_allclose(float(ga[1]), float(gd[1]), rtol=1e-4)
    np.testing.assert_allclose(float(ga[0]["k"]), float(gd[0]["k"]), rtol=1e-4)
    np.testing.assert_allclose(float(ga[0]["b"]), float(gd[0]["b"]), rtol=1e-4)


def test_jit_compatible():
    @jax.jit
    def run(y0):
        return odeint(exp_decay, y0, 0.0, 1.0, method="dopri5").y

    np.testing.assert_allclose(run(jnp.ones(3)), np.exp(-1) * np.ones(3),
                               rtol=1e-5)


@pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams"])
def test_adams_accuracy(method):
    """AB4 / AM4-PECE on exp decay: 4th-order accuracy at modest steps
    (reference runs torchdiffeq's explicit/implicit_adams,
    `src/run_explicit_implicit_exp.py:304-307`)."""
    y0 = jnp.ones((4,))
    res = odeint(exp_decay, y0, 0.0, 1.0, method=method, step_size=0.025)
    np.testing.assert_allclose(res.y, np.exp(-1.0) * np.ones(4), rtol=1e-6)
    assert res.success


@pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams"])
def test_adams_order_four(method):
    """Halving the step shrinks the error ~16x (order 4)."""
    y0 = jnp.ones((2,))
    exact = np.exp(-2.0)

    def err(dt):
        r = odeint(exp_decay, y0, 0.0, 2.0, method=method, step_size=dt)
        return float(np.abs(np.asarray(r.y) - exact).max())

    e1, e2 = err(0.2), err(0.1)
    assert e2 < e1 / 8     # allow slack vs the asymptotic 16x


def test_adams_observer_and_oscillator():
    """Harmonic oscillator (nonlinear in state coupling): y'' = -y as a
    2-state system; observer sees monotone time."""
    def f(t, y):
        return jnp.stack([y[1], -y[0]])

    y0 = jnp.asarray([1.0, 0.0])
    seen = Observer(init=jnp.asarray(-1.0),
                    update=lambda c, t, y: jnp.maximum(c, t))
    res = odeint(f, y0, 0.0, 3.1, method="implicit_adams", step_size=0.05,
                 observer=seen)
    np.testing.assert_allclose(
        np.asarray(res.y), [np.cos(3.1), -np.sin(3.1)], atol=1e-5)
    assert float(res.observer) > 3.0


def test_adams_nfe_prologue():
    """The RK4 bootstrap runs only on the first 3 steps (round-2 fix): NFE =
    3·4 + (n−3)·1 for explicit, + corrector evals for implicit."""
    def f(t, y):
        return -y

    y0 = jnp.ones(4)
    n = 20  # steps over [0, 2] at dt=0.1
    res = odeint(f, y0, 0.0, 2.0, method="explicit_adams", step_size=0.1)
    assert int(res.nfe) == 3 * 4 + (n - 3) * 1
    res_i = odeint(f, y0, 0.0, 2.0, method="implicit_adams", step_size=0.1)
    assert int(res_i.nfe) == 3 * 4 + (n - 3) * 2


def test_adjoint_bwd_nfe_recorded():
    from graphax.ode import last_adjoint_bwd_nfe, reset_adjoint_bwd_nfe
    from graphax.ode import odeint_adjoint

    def f(p, t, y):
        return -p["k"] * y

    y0 = jnp.ones(8)
    params = {"k": jnp.asarray(0.7)}
    reset_adjoint_bwd_nfe()

    def loss(p):
        res = odeint_adjoint(f, p, y0, 0.0, 1.5, method="dopri5",
                             rtol=1e-6, atol=1e-6,
                             adjoint_method="adaptive_heun",
                             adjoint_rtol=1e-6, adjoint_atol=1e-6)
        return jnp.sum(res.y ** 2)

    g = jax.jit(jax.grad(loss))(params)
    jax.block_until_ready(g)
    assert last_adjoint_bwd_nfe() > 0


def test_norm_fn_override_changes_controller():
    """A norm_fn scaled 10x forces smaller accepted steps -> more NFE."""
    def f(t, y):
        return jnp.sin(3 * t) * y

    y0 = jnp.ones(16)
    base = odeint(f, y0, 0.0, 4.0, method="dopri5", rtol=1e-6, atol=1e-6)
    hard = odeint(f, y0, 0.0, 4.0, method="dopri5", rtol=1e-6, atol=1e-6,
                  norm_fn=lambda v: 10.0 * jnp.sqrt(jnp.mean(v * v)))
    np.testing.assert_allclose(np.asarray(base.y), np.asarray(hard.y),
                               rtol=1e-4)
    assert int(hard.nfe) > int(base.nfe)


def test_stage_remat_gradients_identical():
    """``stage_remat=True`` only changes WHEN activations are recomputed
    (per RHS evaluation instead of per step) — values and gradients must be
    bit-identical to the plain differentiable path, fixed-step and
    adaptive."""
    a = jnp.asarray(np.random.RandomState(0).randn(6, 6), jnp.float32) * 0.3

    def make_loss(method, **kw):
        def loss(scale):
            def rhs(t, y):
                return scale * jnp.tanh(y @ a.T) - 0.5 * y

            res = odeint(rhs, jnp.ones(6), 0.0, 2.0, method=method,
                         differentiable=True, **kw)
            return jnp.sum(res.y ** 2)

        return loss

    s = jnp.asarray(1.3)
    for method, kw in (("rk4", dict(step_size=0.5)),
                       ("dopri5", dict(rtol=1e-6, atol=1e-8))):
        base = make_loss(method, **kw)
        remat = make_loss(method, stage_remat=True, **kw)
        # primal is identical (remat changes only the backward schedule);
        # gradients agree to fp reassociation noise (XLA refuses the exact
        # same fusion order for the recomputed stages)
        np.testing.assert_array_equal(np.asarray(base(s)),
                                      np.asarray(remat(s)))
        g0 = jax.grad(base)(s)
        g1 = jax.grad(remat)(s)
        np.testing.assert_allclose(np.asarray(g0), np.asarray(g1),
                                   rtol=1e-5, atol=1e-6)
