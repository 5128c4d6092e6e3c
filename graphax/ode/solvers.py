"""ODE integrators under jit.

Design (vs the reference's `torchdiffeq` + `src/early_stop_solver.py`):

- the state pytree is flattened once (`ravel_pytree`) so error norms and the
  step controller are simple vector ops;
- fixed-step methods run a `lax.scan` over a statically-known grid;
- adaptive methods (dopri5 / adaptive_heun / bosh3) come in two executions of
  the same step logic:
    * ``differentiable=True`` — a *bounded* `lax.scan` over ``max_steps``
      iterations with masked no-op steps after completion. Reverse-mode
      differentiable (the discretize-then-optimize gradient path, the
      reference's non-adjoint mode);
    * ``differentiable=False`` — a `lax.while_loop` that exits as soon as the
      integration lands on t1 (inference / early-stop evaluation path);
- the `max_nfe` stiffness guard (`src/utils.py:13`,
  `src/function_laplacian_diffusion.py:65-67`) cannot raise inside a trace:
  stepping halts once the NFE budget is exhausted and the result carries
  ``success=False`` for the host to act on;
- an :class:`Observer` callback runs on every *accepted* step with
  ``(carry, t, y) -> carry`` — the generalization of the reference's
  early-stop solver, which re-decodes and evaluates accuracy after each
  adaptive step (`src/early_stop_solver.py:71-128`).

Tolerance semantics match `src/base_classes.py:57-62` via Config
(atol = tol_scale·1e-7, rtol = tol_scale·1e-9); the controller itself follows
the torchdiffeq conventions the reference depends on (RMS error norm,
safety=0.9, ifactor=10, dfactor=0.2, Hairer initial-step selection).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from graphax.ode.tableaus import TABLEAUS, stacked

FIXED_STEP_METHODS = ("euler", "midpoint", "rk4", "rk4_classic")
ADAMS_METHODS = ("explicit_adams", "implicit_adams")
ADAPTIVE_METHODS = ("dopri5", "adaptive_heun", "bosh3")

SAFETY, IFACTOR, DFACTOR = 0.9, 10.0, 0.2


class Observer(NamedTuple):
    """Per-accepted-step observation hook. ``update(carry, t, y) -> carry``
    with ``y`` the *unflattened* state pytree."""

    init: Any
    update: Callable[[Any, jax.Array, Any], Any]


class ODEResult(NamedTuple):
    y: Any                 # final state (pytree, same structure as y0)
    nfe: jax.Array         # int32 — number of RHS evaluations
    steps: jax.Array       # int32 — accepted steps
    success: jax.Array     # bool — False iff the max_nfe budget was exhausted
    observer: Any          # final observer carry (None when no observer)
    t_final: jax.Array     # time actually reached


def _rms_norm(x):
    return jnp.sqrt(jnp.mean(jnp.square(x)))


# -- adjoint backward-NFE surfacing ------------------------------------
# The reference logs forward and backward NFE separately as a tuning signal
# (`src/graph_datasets/run_GNN.py:90-95`). A custom_vjp backward cannot add
# outputs, so the adjoint solve reports its NFE through a host callback into
# this module-level cell; Trainer reads it after the step's device_get.

_ADJOINT_BWD_NFE = {"last": 0, "total": 0, "count": 0}


def _record_adjoint_nfe(nfe):
    n = int(nfe)
    _ADJOINT_BWD_NFE["last"] = n
    _ADJOINT_BWD_NFE["total"] += n
    _ADJOINT_BWD_NFE["count"] += 1


def last_adjoint_bwd_nfe() -> int:
    """NFE of the most recent adjoint backward solve (0 if none ran)."""
    return _ADJOINT_BWD_NFE["last"]


_IO_CALLBACK_OK = None


def _io_callback_supported() -> bool:
    """The axon TPU tunnel rejects host send/recv callbacks at run time
    ("UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks"),
    which made every adjoint training step crash on that hardware. Detect
    it from the PJRT platform_version string (an executed probe is worse:
    its async error surfaces at the NEXT device synchronization and
    poisons an unrelated step). When unsupported, the adjoint silently
    skips bwd-NFE recording — the bm meter reads 0 there."""
    global _IO_CALLBACK_OK
    if _IO_CALLBACK_OK is None:
        try:
            pv = str(getattr(jax.devices()[0].client, "platform_version",
                             ""))
            _IO_CALLBACK_OK = "axon" not in pv.lower()
        except Exception:
            _IO_CALLBACK_OK = True
    return _IO_CALLBACK_OK


def reset_adjoint_bwd_nfe():
    _ADJOINT_BWD_NFE.update(last=0, total=0, count=0)


def _rk_step(flat_func, tableau_name, t, y, h, f0=None):
    """One explicit RK step on flat state. Returns (y1, f1_or_None, err, nfe).

    ``f0`` may carry the FSAL derivative from the previous accepted step.
    Stage combinations accumulate in f32 even when the state is bf16 (mixed
    precision: time/step control/error estimates never drop below f32); the
    returned state is cast back to ``y.dtype``.
    """
    a, b, c, e = stacked(TABLEAUS[tableau_name])
    tab = TABLEAUS[tableau_name]
    acc = jnp.promote_types(y.dtype, jnp.float32)
    s = len(c)
    ks = []
    nfe = 0
    for i in range(s):
        if i == 0 and f0 is not None:
            ki = f0
        else:
            yi = y.astype(acc)
            for j in range(i):
                if a[i, j] != 0.0:
                    yi = yi + (h * a[i, j]) * ks[j].astype(acc)
            ki = flat_func(t + c[i] * h, yi.astype(y.dtype))
            nfe += 1
        ks.append(ki)
    y1 = y.astype(acc)
    for i in range(s):
        if b[i] != 0.0:
            y1 = y1 + (h * b[i]) * ks[i].astype(acc)
    y1 = y1.astype(y.dtype)
    err = None
    if e is not None:
        err = jnp.zeros(y.shape, acc)
        for i in range(s):
            if e[i] != 0.0:
                err = err + (h * e[i]) * ks[i].astype(acc)
    f1 = ks[-1] if tab.fsal else None
    return y1, f1, err, nfe


def _error_ratio(err, y0, y1, rtol, atol, norm_fn=_rms_norm):
    acc = jnp.promote_types(y0.dtype, jnp.float32)
    scale = atol + rtol * jnp.maximum(jnp.abs(y0.astype(acc)),
                                      jnp.abs(y1.astype(acc)))
    return norm_fn(err.astype(acc) / scale)


def _optimal_step(h, ratio, order):
    """torchdiffeq `_optimal_step_size`: grow by ≤ IFACTOR, shrink by ≥ DFACTOR."""
    ratio = jnp.maximum(ratio, 1e-10)
    factor = jnp.clip(SAFETY * ratio ** (-1.0 / order), DFACTOR, IFACTOR)
    return h * factor


def _initial_step(flat_func, t0, y0, f0, order, rtol, atol,
                  norm_fn=_rms_norm):
    """Hairer/Wanner initial step selection (torchdiffeq `_select_initial_step`).
    Costs one extra RHS evaluation."""
    acc = jnp.promote_types(y0.dtype, jnp.float32)
    y0a, f0a = y0.astype(acc), f0.astype(acc)
    scale = atol + jnp.abs(y0a) * rtol
    d0 = norm_fn(y0a / scale)
    d1 = norm_fn(f0a / scale)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)
    y1 = (y0a + h0 * f0a).astype(y0.dtype)
    f1 = flat_func(t0 + h0, y1)
    d2 = norm_fn((f1.astype(acc) - f0a) / scale) / h0
    small = jnp.maximum(d1, d2) <= 1e-15
    h1 = jnp.where(
        small,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1)),
    )
    return jnp.minimum(100.0 * h0, h1)


# ----------------------------------------------------------------------
# Fixed-step path (lax.scan over a static grid)
# ----------------------------------------------------------------------

def _fixed_grid(t0: float, t1: float, step_size: float):
    """Step endpoints like torchdiffeq's grid constructor: uniform steps of
    ``step_size`` from t0, with a final clamp onto t1."""
    import numpy as np

    t0, t1, dt = float(t0), float(t1), float(step_size)
    n_full = max(int(np.floor((t1 - t0) / dt + 1e-9)), 0)
    ts = [t0 + i * dt for i in range(n_full + 1)]
    if ts[-1] < t1 - 1e-9 * max(1.0, abs(t1)):
        ts.append(t1)
    else:
        ts[-1] = t1
    return np.asarray(ts, dtype=np.float64)


def _odeint_fixed(flat_func, y0_flat, t0, t1, method, step_size, observer,
                  unravel, dtype):
    import numpy as np

    ts = _fixed_grid(t0, t1, step_size)
    tdt = jnp.promote_types(dtype, jnp.float32)
    starts = jnp.asarray(ts[:-1], tdt)
    hs = jnp.asarray(np.diff(ts), tdt)
    n_stages = len(TABLEAUS[method].c)

    # rematerialize each step in the backward pass (same trade as the
    # adaptive differentiable path): without this the scan stores every
    # stage's activations — a per-NFE attention recompute at ogbn-arxiv
    # scale needs >100 GB of HBM saved, with it memory is O(carry)
    @jax.checkpoint
    def body(carry, t_h):
        y, obs = carry
        t, h = t_h
        y1, _, _, _ = _rk_step(flat_func, method, t, y, h)
        if observer is not None:
            obs = observer.update(obs, t + h, unravel(y1))
        return (y1, obs), None

    obs0 = observer.init if observer is not None else None
    (y1, obs), _ = jax.lax.scan(body, (y0_flat, obs0), (starts, hs))
    nfe = jnp.asarray(len(ts[:-1]) * n_stages, jnp.int32)
    return ODEResult(
        y=unravel(y1), nfe=nfe,
        steps=jnp.asarray(len(ts) - 1, jnp.int32),
        success=jnp.asarray(True),
        observer=obs, t_final=jnp.asarray(t1, tdt))


# ----------------------------------------------------------------------
# Fixed-step Adams multistep path (explicit_adams / implicit_adams)
#
# The reference's solver-comparison experiment runs torchdiffeq's
# `explicit_adams` and `implicit_adams` (`src/run_explicit_implicit_exp.py:
# 304-307`). TPU-native realization: 4th-order Adams–Bashforth (explicit)
# and Adams–Bashforth-predict / Adams–Moulton-correct PECE (implicit), as a
# `lax.scan` carrying the last-4 derivative ring buffer; the first 3 steps
# bootstrap with classic RK4 on the same grid.
# ----------------------------------------------------------------------

_AB4 = (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0)   # f_n..f_{n-3}
_AM4 = (9.0 / 24.0, 19.0 / 24.0, -5.0 / 24.0, 1.0 / 24.0)      # f_{n+1}..f_{n-2}


def _odeint_adams(flat_func, y0_flat, t0, t1, method, step_size, observer,
                  unravel, dtype, corrector_iters: int = 1):
    import numpy as np

    ts = _fixed_grid(t0, t1, step_size)
    tdt = jnp.promote_types(dtype, jnp.float32)
    starts = jnp.asarray(ts[:-1], tdt)
    hs = jnp.asarray(np.diff(ts), tdt)
    n_steps = len(ts) - 1
    implicit = method == "implicit_adams"
    fdt = jnp.promote_types(dtype, jnp.float32)

    def ab_predict(y, hist, h):
        # hist rows: [f_n, f_{n-1}, f_{n-2}, f_{n-3}]
        incr = sum(c * hist[i] for i, c in enumerate(_AB4))
        return y + h * incr.astype(y.dtype)

    def multistep(y, hist, t, h):
        """One AB4 (or AB-predict/AM-correct) step. ``hist`` carries the
        previous 3 derivatives [f_{n-1}, f_{n-2}, f_{n-3}]; f_n is evaluated
        here, giving the 4-entry window the formulas need."""
        f_n = flat_func(t, y).astype(fdt)
        hist4 = jnp.concatenate([f_n[None], hist], axis=0)  # f_n..f_{n-3}
        y_ab = ab_predict(y, hist4, h)
        nfe = 1
        if implicit:
            y_next = y_ab
            for _ in range(corrector_iters):        # PECE (fixed iterations)
                f_pred = flat_func(t + h, y_next).astype(fdt)
                incr = (_AM4[0] * f_pred + _AM4[1] * hist4[0]
                        + _AM4[2] * hist4[1] + _AM4[3] * hist4[2])
                y_next = y + h * incr.astype(y.dtype)
                nfe += 1
            return y_next, hist4[:-1], nfe
        return y_ab, hist4[:-1], nfe

    obs0 = observer.init if observer is not None else None
    # bootstrap PROLOGUE: the first min(3, n) steps run classic RK4 outside
    # the scan (statically unrolled), feeding the history ring buffer — the
    # scan body then pays only the multistep cost (the round-1 version
    # computed RK4 *and* the multistep on every step and selected: 4 wasted
    # RHS evals per step forever)
    n_boot = min(3, n_steps)
    y, obs = y0_flat, obs0
    hist = jnp.zeros((3,) + y0_flat.shape, fdt)   # f_{n-1}, f_{n-2}, f_{n-3}
    nfe_host = 0
    for i in range(n_boot):
        t_i, h_i = starts[i], hs[i]
        f_i = flat_func(t_i, y).astype(fdt)
        hist = jnp.concatenate([f_i[None], hist[:-1]], axis=0)
        # reuse f_i as the RK4 first stage (stage c0 = 0)
        y, _, _, n_extra = _rk_step(flat_func, "rk4_classic", t_i, y, h_i,
                                    f0=f_i.astype(y0_flat.dtype))
        nfe_host += 1 + n_extra
        if observer is not None:
            obs = observer.update(obs, t_i + h_i, unravel(y))

    @jax.checkpoint   # O(carry) backward memory, like the other scans
    def body(carry, t_h):
        y, hist, obs = carry
        t, h = t_h
        y1, hist, _ = multistep(y, hist, t, h)
        if observer is not None:
            obs = observer.update(obs, t + h, unravel(y1))
        return (y1, hist, obs), None

    n_ms = n_steps - n_boot
    if n_ms > 0:
        (y, hist, obs), _ = jax.lax.scan(
            body, (y, hist, obs), (starts[n_boot:], hs[n_boot:]))
    nfe_host += n_ms * (1 + (corrector_iters if implicit else 0))
    return ODEResult(
        y=unravel(y), nfe=jnp.asarray(nfe_host, jnp.int32),
        steps=jnp.asarray(n_steps, jnp.int32),
        success=jnp.asarray(True), observer=obs,
        t_final=jnp.asarray(t1, tdt))


# ----------------------------------------------------------------------
# Adaptive path (bounded scan or while_loop over the same step logic)
# ----------------------------------------------------------------------

class _AdaptState(NamedTuple):
    t: jax.Array
    y: jax.Array
    f: jax.Array          # FSAL derivative at (t, y)
    h: jax.Array
    nfe: jax.Array
    steps: jax.Array      # accepted
    attempts: jax.Array   # accepted + rejected
    done: jax.Array
    obs: Any


def _odeint_adaptive(flat_func, y0_flat, t0, t1, method, rtol, atol, max_nfe,
                     max_steps, observer, unravel, dtype, differentiable,
                     first_step=None, norm_fn=None):
    norm_fn = _rms_norm if norm_fn is None else norm_fn
    tab = TABLEAUS[method]
    order = tab.order
    # time / step-size arithmetic never drops below f32 (a bf16 state must
    # not quantize the integration grid)
    tdt = jnp.promote_types(dtype, jnp.float32)
    t0a = jnp.asarray(t0, tdt)
    t1a = jnp.asarray(t1, tdt)
    span = t1a - t0a

    f0 = flat_func(t0a, y0_flat)
    if first_step is None:
        h0 = jax.lax.stop_gradient(
            _initial_step(flat_func, t0a, y0_flat, f0, order, rtol, atol,
                          norm_fn))
        nfe0 = jnp.asarray(2, jnp.int32)
    else:
        h0 = jnp.asarray(first_step, tdt)
        nfe0 = jnp.asarray(1, jnp.int32)
    h0 = jnp.minimum(h0, span)

    obs0 = observer.init if observer is not None else None
    if observer is not None:
        obs0 = observer.update(obs0, t0a, unravel(y0_flat))

    nfe_per_step = len(tab.c) - (1 if tab.fsal else 0)

    def step_once(st: _AdaptState) -> _AdaptState:
        h = jnp.minimum(st.h, t1a - st.t)
        f_in = st.f if tab.fsal else None
        y_prop, f_prop, err, _ = _rk_step(flat_func, method, st.t, st.y, h, f_in)
        # The step-size controller is non-differentiable control flow
        # (accept/reject + next-h); stop_gradient keeps reverse-mode clean —
        # gradients flow through the accepted RK updates only, matching the
        # discretize-then-optimize convention (and torchdiffeq's behavior).
        ratio = jax.lax.stop_gradient(
            _error_ratio(err, st.y, y_prop, rtol, atol, norm_fn))
        accept = ratio <= 1.0
        h_next = jax.lax.stop_gradient(_optimal_step(h, ratio, order))

        t_new = jnp.where(accept, st.t + h, st.t)
        y_new = jnp.where(accept, y_prop, st.y)
        if tab.fsal:
            f_new = jnp.where(accept, f_prop, st.f)
        else:
            f_new = st.f
        reached = t_new >= t1a - 1e-12 * jnp.maximum(1.0, jnp.abs(t1a))
        nfe = st.nfe + nfe_per_step
        obs = st.obs
        if observer is not None:
            obs_upd = observer.update(st.obs, t_new, unravel(y_new))
            obs = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, b, a), st.obs, obs_upd)
        return _AdaptState(
            t=t_new, y=y_new, f=f_new, h=h_next, nfe=nfe,
            steps=st.steps + accept.astype(jnp.int32),
            attempts=st.attempts + 1,
            done=reached, obs=obs)

    init = _AdaptState(
        t=t0a, y=y0_flat, f=f0, h=h0, nfe=nfe0,
        steps=jnp.asarray(0, jnp.int32), attempts=jnp.asarray(0, jnp.int32),
        done=span <= 0, obs=obs0)

    def can_continue(st: _AdaptState):
        return (~st.done) & (st.nfe + nfe_per_step <= max_nfe) & \
               (st.attempts < max_steps)

    if differentiable:
        # rematerialize each step in the backward pass: without this the
        # bounded scan stores every stage's activations (max_steps × state ×
        # stages — tens of GB at large N), with it memory is O(carry)
        @jax.checkpoint
        def body(st, _):
            st_next = step_once(st)
            keep = can_continue(st)
            st = jax.tree_util.tree_map(
                lambda a, b: jnp.where(keep, b, a), st, st_next)
            return st, None

        final, _ = jax.lax.scan(body, init, None, length=int(max_steps))
    else:
        final = jax.lax.while_loop(can_continue, step_once, init)

    return ODEResult(
        y=unravel(final.y), nfe=final.nfe, steps=final.steps,
        success=final.done, observer=final.obs, t_final=final.t)


# ----------------------------------------------------------------------
# Public entry points
# ----------------------------------------------------------------------

def odeint(func, y0, t0, t1, *, method: str = "dopri5", rtol: float = 1e-9,
           atol: float = 1e-7, step_size: float = 1.0, max_nfe: int = 1000,
           max_steps: Optional[int] = None, observer: Optional[Observer] = None,
           differentiable: bool = True, first_step=None,
           norm_fn=None, stage_remat: bool = False) -> ODEResult:
    """Integrate ``dy/dt = func(t, y)`` from t0 to t1 (t1 > t0).

    ``y0`` is any pytree. ``t0``, ``t1``, ``step_size`` must be Python floats
    (the step grid / loop bounds are part of the compiled program — the
    reference's T is likewise a fixed hyperparameter, `best_params.py`).

    ``norm_fn(flat_vec) -> scalar`` overrides the RMS error norm of the
    adaptive controller. Inside ``shard_map`` over a partitioned state this
    MUST be a psum'd norm: every device has to take identical accept/reject
    decisions or the per-step collectives deadlock (graphax.dist.model
    supplies the masked global-RMS version).

    ``stage_remat``: additionally rematerialize each RHS EVALUATION in the
    backward pass (on top of the per-step scan remat). Without it, the
    recomputed step body materializes every stage's RHS internals at once
    before the stage backwards run — for a per-NFE attention RHS at
    ogbn-arxiv scale that is ~3.5 GB × stages of edge-sized buffers live
    simultaneously (measured 14 GiB peak, at the HBM edge); with it, one
    stage's internals are recomputed exactly when its backward needs them
    (peak O(one stage), cost one extra RHS eval per stage). Enable for
    RHS with large per-evaluation footprints (per-NFE transformer/GAT
    attention); pointless for cheap RHS (laplacian SpMM).
    """
    y0_flat, unravel = ravel_pytree(y0)
    dtype = y0_flat.dtype

    def flat_func(t, y_flat):
        dy = func(t, unravel(y_flat))
        dy_flat, _ = ravel_pytree(dy)
        return dy_flat

    if stage_remat and differentiable:
        flat_func = jax.checkpoint(flat_func)

    if method in FIXED_STEP_METHODS:
        return _odeint_fixed(flat_func, y0_flat, t0, t1, method, step_size,
                             observer, unravel, dtype)
    if method in ADAMS_METHODS:
        return _odeint_adams(flat_func, y0_flat, t0, t1, method, step_size,
                             observer, unravel, dtype)
    if method not in ADAPTIVE_METHODS:
        raise ValueError(f"unknown method {method!r}")
    if max_steps is None:
        nfe_per_step = len(TABLEAUS[method].c) - (1 if TABLEAUS[method].fsal else 0)
        max_steps = max(int(max_nfe) // nfe_per_step + 1, 4)
    return _odeint_adaptive(flat_func, y0_flat, t0, t1, method, rtol, atol,
                            max_nfe, max_steps, observer, unravel, dtype,
                            differentiable, first_step, norm_fn)


# ----------------------------------------------------------------------
# Adjoint (optimize-then-discretize) gradients
# ----------------------------------------------------------------------

def odeint_adjoint(func, params, y0, t0, t1, *, method: str = "dopri5",
                   rtol: float = 1e-9, atol: float = 1e-7,
                   step_size: float = 1.0, max_nfe: int = 1000,
                   max_steps=None,
                   adjoint_method: str = "adaptive_heun",
                   adjoint_rtol: float = 1e-9, adjoint_atol: float = 1e-7,
                   adjoint_step_size: float = 1.0,
                   norm_fn=None, adjoint_norm_fn=None,
                   record_bwd_nfe: bool = True,
                   vma_axes: tuple = ()) -> ODEResult:
    """O(1)-memory gradients through the solve via the continuous adjoint.

    Equivalent of the reference's `odeint_adjoint` path selected by
    ``--adjoint`` (`src/base_classes.py:45-49`, `src/block_constant.py:34-44`),
    including separate adjoint solver/tolerances (`adjoint_method`,
    `tol_scale_adjoint`). ``func(params, t, y) -> dy``; gradients flow to
    ``params`` and ``y0``.

    ``norm_fn`` / ``adjoint_norm_fn`` override the error norms of the forward
    and backward adaptive controllers (see :func:`odeint` — mandatory psum'd
    norms inside shard_map). When ``record_bwd_nfe`` the backward solve
    reports its NFE through a host callback readable via
    :func:`last_adjoint_bwd_nfe` (the reference's `bm` meter,
    `src/graph_datasets/run_GNN.py:90-95`).

    ``vma_axes``: mesh axis names when called inside ``shard_map``. The
    custom-VJP bwd rule computes *per-shard* cotangents; strict shard_map
    vma checking requires the cotangent type to match the primal input's.
    Passing the axis names casts every ``params``/``y0`` leaf to "varying"
    first, so the contract holds on any JAX. For a leaf that was replicated,
    the cast's transpose psums its cotangent over the axes — the gradient
    returned to the caller is then already globally reduced; do NOT psum it
    again outside.
    """
    if vma_axes:
        from graphax.dist.mesh import ensure_varying_tree

        for _ax in vma_axes:
            params = ensure_varying_tree(params, _ax)
            y0 = ensure_varying_tree(y0, _ax)
    solve_kwargs = dict(method=method, rtol=rtol, atol=atol,
                        step_size=step_size, max_nfe=max_nfe,
                        max_steps=max_steps, norm_fn=norm_fn)
    adj_kwargs = dict(method=adjoint_method, rtol=adjoint_rtol,
                      atol=adjoint_atol, step_size=adjoint_step_size,
                      max_nfe=max_nfe, norm_fn=adjoint_norm_fn)

    @jax.custom_vjp
    def _solve(params, y0):
        res = odeint(lambda t, y: func(params, t, y), y0, t0, t1,
                     differentiable=False, **solve_kwargs)
        return res.y, (res.nfe, res.steps, res.success, res.t_final)

    def _solve_fwd(params, y0):
        out = _solve(params, y0)
        y1, _ = out
        return out, (params, y1)

    def _solve_bwd(residuals, cotangents):
        params, y1 = residuals
        g_y1, _ = cotangents  # aux outputs are integer/bool — no gradients

        y1_flat, unravel_y = ravel_pytree(y1)
        g_flat, _ = ravel_pytree(g_y1)
        p_flat, unravel_p = ravel_pytree(params)
        zero_p = jnp.zeros_like(p_flat)

        # Augmented state z(s) = (y(t), a_y(t), a_p(t)) with s = t1 - t.
        def aug_dynamics(s, z):
            y_flat, a_flat, ap_flat = z
            t = t1 - s
            y = unravel_y(y_flat)
            a = unravel_y(a_flat)

            def f_of(y_, p_):
                return func(p_, t, y_)

            # residuals here live within ONE adjoint step (no scan stacking)
            # — let the Pallas SpMM save its gathered sources instead of
            # re-gathering in its backward (kernels.pallas_tiled)
            from graphax.kernels.pallas_tiled import adjoint_residual_mode

            with adjoint_residual_mode():
                f_val, vjp_fn = jax.vjp(f_of, y, unravel_p(p_flat))
            vy, vp = vjp_fn(a)
            f_flat, _ = ravel_pytree(f_val)
            vy_flat, _ = ravel_pytree(vy)
            vp_flat, _ = ravel_pytree(vp)
            # dy/ds = -f ;  da_y/ds = +aᵀ∂f/∂y ;  da_p/ds = +aᵀ∂f/∂p
            return (-f_flat, vy_flat, vp_flat)

        z0 = (y1_flat, g_flat, zero_p)
        res = odeint(aug_dynamics, z0, 0.0, float(t1 - t0),
                     differentiable=False, **adj_kwargs)
        if record_bwd_nfe and _io_callback_supported():
            from jax.experimental import io_callback

            io_callback(_record_adjoint_nfe, None, res.nfe, ordered=False)
        _, a0_flat, ap_flat = res.y
        return unravel_p(ap_flat), unravel_y(a0_flat)

    _solve.defvjp(_solve_fwd, _solve_bwd)
    y1, (nfe, steps, success, t_final) = _solve(params, y0)
    return ODEResult(y=y1, nfe=nfe, steps=steps, success=success,
                     observer=None, t_final=t_final)
