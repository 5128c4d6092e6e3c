"""graphax.ode — jit-native ODE solvers for graph diffusion.

Replaces the reference's dependency on `torchdiffeq` (used by every ODE block,
`src/block_constant.py:29-58`) and its subclassed early-stop integrators
(`src/early_stop_solver.py`) with solvers built for XLA's compilation model:
fixed-step methods are a `lax.scan`, adaptive methods are a `lax.while_loop`
with a PI step-size controller, NFE is a carried counter (JAX cannot raise
mid-trace, so the `max_nfe` guard halts integration and reports
``success=False`` instead of raising `MaxNFEException`), and mid-trajectory
observation (the early-stop solver) is a user callback folded into the carry.
"""

from graphax.ode.solvers import (
    ODEResult,
    Observer,
    odeint,
    odeint_adjoint,
    last_adjoint_bwd_nfe,
    reset_adjoint_bwd_nfe,
    FIXED_STEP_METHODS,
    ADAMS_METHODS,
    ADAPTIVE_METHODS,
)

__all__ = [
    "ODEResult",
    "Observer",
    "odeint",
    "odeint_adjoint",
    "last_adjoint_bwd_nfe",
    "reset_adjoint_bwd_nfe",
    "FIXED_STEP_METHODS",
    "ADAMS_METHODS",
    "ADAPTIVE_METHODS",
]
