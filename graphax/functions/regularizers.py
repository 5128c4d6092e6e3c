"""FFJORD/RNODE-style regularizers as ODE state augmentation.

Twin of `src/regularized_ODE_function.py` (adapted there from ffjord-rnode):
the solver state becomes ``(x, reg_states)`` where each reg state ``[N]``
integrates a per-node penalty rate alongside the diffusion; the training loss
adds ``Σ coeff · mean(reg_state(T))`` (`src/graph_datasets/run_GNN.py:81-88`).

Rates (per node, `:36-81`):
- kinetic_energy:      ½·mean_d(f²)
- jacobian_norm2:      exact divergence Σ_i ∂f_i/∂x_i (D vjp calls — the
                       reference's `divergence_bf`), or a Hutchinson
                       estimator for large D
- directional_penalty: ½·mean_d((Jᵀf)²)  (the reference computes the VJP
                       `autograd.grad(dx, x, dx)` = fᵀJ)
- total_deriv:         ½·mean_d((fᵀJ + ∂f/∂t)²)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

REGULARIZER_NAMES = ("kinetic_energy", "jacobian_norm2", "total_deriv",
                     "directional_penalty")


def _exact_divergence(f_of_x, x, dx):
    """Σ_i ∂f_i/∂x_i per node via D basis-vector VJPs
    (`divergence_bf`, `src/regularized_ODE_function.py:72-81`)."""
    _, vjp = jax.vjp(f_of_x, x)
    d = x.shape[-1]
    div = jnp.zeros(x.shape[:-1], x.dtype)
    for i in range(d):
        basis = jnp.zeros_like(x).at[..., i].set(1.0)
        div = div + vjp(basis)[0][..., i]
    return div


def _hutchinson_divergence(f_of_x, x, dx, key, samples: int = 1):
    """E_ε[εᵀ J ε] Rademacher estimator — for large feature dims where D
    VJPs are prohibitive (SURVEY §7.3 item 7)."""
    _, vjp = jax.vjp(f_of_x, x)

    def one(k):
        eps = jax.random.rademacher(k, x.shape, dtype=x.dtype)
        return jnp.sum(vjp(eps)[0] * eps, axis=-1)

    keys = jax.random.split(key, samples)
    return jnp.mean(jax.vmap(one)(keys), axis=0)


def make_regularized_rhs(base_rhs, reg_names: Sequence[str],
                         exact_divergence: bool = True,
                         hutchinson_key=None):
    """Wrap ``base_rhs(params, fstate, t, x) -> dx`` into an augmented RHS on
    state ``(x, tuple_of_reg_states)``."""
    reg_names = tuple(reg_names)
    needs_vjp = any(n in ("jacobian_norm2", "total_deriv",
                          "directional_penalty") for n in reg_names)

    def aug_rhs(params, fstate, t, state):
        x, _ = state
        f_of_x = lambda xx: base_rhs(params, fstate, t, xx)

        if needs_vjp:
            dx, vjp = jax.vjp(f_of_x, x)
        else:
            dx = f_of_x(x)
            vjp = None

        rates = []
        for name in reg_names:
            if name == "kinetic_energy":
                rates.append(0.5 * jnp.mean(dx * dx, axis=-1))
            elif name == "jacobian_norm2":
                if exact_divergence:
                    rates.append(_exact_divergence(f_of_x, x, dx))
                else:
                    key = hutchinson_key if hutchinson_key is not None \
                        else jax.random.PRNGKey(0)
                    rates.append(_hutchinson_divergence(f_of_x, x, dx, key))
            elif name == "directional_penalty":
                jtf = vjp(dx)[0]
                rates.append(0.5 * jnp.mean(jtf * jtf, axis=-1))
            elif name == "total_deriv":
                jtf = vjp(dx)[0]
                f_of_t = lambda tt: base_rhs(params, fstate, tt, x)
                t_arr = jnp.asarray(t, x.dtype)
                _, df_dt = jax.jvp(f_of_t, (t_arr,),
                                   (jnp.ones_like(t_arr),))
                total = jtf + df_dt
                rates.append(0.5 * jnp.mean(total * total, axis=-1))
            else:
                raise ValueError(f"unknown regularizer {name!r}")
        return (dx, tuple(rates))

    return aug_rhs


def init_reg_states(num_nodes: int, reg_names: Sequence[str], dtype=jnp.float32):
    """Zero initial reg accumulators (`src/block_constant.py:29-31`)."""
    return tuple(jnp.zeros((num_nodes,), dtype) for _ in reg_names)


def regularization_loss(reg_states, coeffs: Sequence[float]):
    """Σ coeff·mean(state) (`src/graph_datasets/run_GNN.py:81-88`)."""
    total = 0.0
    for state, coeff in zip(reg_states, coeffs):
        total = total + coeff * jnp.mean(state)
    return total
