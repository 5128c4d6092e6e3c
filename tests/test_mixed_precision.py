"""Mixed-precision ODE solve (cfg.dtype): bf16 state, f32 time/controller.

The solver must (a) keep the integration grid and error control in f32 —
a bf16 `t` would quantize the step grid — and (b) produce a forward close
to the f32 solve on smooth diffusion dynamics."""

import numpy as np
import jax
import jax.numpy as jnp

from graphax.data.synthetic import make_sbm_dataset
from graphax.models import make_gnn
from graphax.ode import odeint
from graphax.train import Config


def test_bf16_state_fixed_step_close_to_f32():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(12, 12) * 0.1, jnp.float32)

    def f(t, y):
        return (y @ a.astype(y.dtype)).astype(y.dtype)

    y0 = jnp.asarray(rng.randn(12, 12), jnp.float32)
    r32 = odeint(f, y0, 0.0, 1.0, method="rk4", step_size=0.25)
    r16 = odeint(f, y0.astype(jnp.bfloat16), 0.0, 1.0, method="rk4",
                 step_size=0.25)
    assert r16.y.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(r16.y, np.float32),
                               np.asarray(r32.y), rtol=0.05, atol=0.05)


def test_bf16_state_adaptive_time_stays_f32():
    def f(t, y):
        return (-y).astype(y.dtype)

    y0 = jnp.ones((8,), jnp.bfloat16)
    res = odeint(f, y0, 0.0, 2.0, method="dopri5", rtol=1e-2, atol=1e-2,
                 max_nfe=500)
    assert res.t_final.dtype == jnp.float32
    assert bool(res.success)
    # e^-2 ≈ 0.135
    np.testing.assert_allclose(np.asarray(res.y, np.float32), 0.135,
                               rtol=0.15)


def test_gnn_forward_bf16_ode_state_matches_f32():
    data = make_sbm_dataset(num_nodes=96, num_classes=3, num_features=10,
                            p_in=0.05, p_out=0.01, seed=0)
    common = dict(dataset="Cora", block="constant", function="laplacian",
                  hidden_dim=16, method="rk4", step_size=0.5, time=2.0,
                  add_source=True, self_loop_weight=1.0, input_dropout=0.0,
                  dropout=0.0, no_early=True)
    m32 = make_gnn(Config(**common), num_features=10, num_classes=3)
    m16 = make_gnn(Config(**common, dtype="bfloat16"), num_features=10,
                   num_classes=3)
    params, state = m32.init(jax.random.PRNGKey(0))
    l32, _, _ = m32.apply(params, state, data.graph, data.x, train=False)
    l16, _, _ = m16.apply(params, state, data.graph, data.x, train=False)
    assert l16.dtype == l32.dtype == jnp.float32  # decode back in f32
    # same classifier up to bf16 rounding of the solve
    agree = (np.argmax(np.asarray(l32), -1)
             == np.argmax(np.asarray(l16), -1)).mean()
    assert agree > 0.9, agree
