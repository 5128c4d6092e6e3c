"""END-TO-END TRAINING parity for the tuned-config families beyond fixed-step
rk4 (VERDICT r3 item 3). Each family trains the graphax GNN and an
independent torch twin from the SAME initial weights on the SAME fixture and
compares loss/accuracy trajectories and accepted-step counts:

(a) adaptive dopri5, non-adjoint — the Cora family
    (`src/best_params.py` Cora: block=attention, method=dopri5,
    adjoint=False, optimizer=adamax). Twin: autograd through a torch dopri5
    with torchdiffeq's controller conventions (detached step-size control,
    matching graphax's stop_gradient — `ode/solvers.py` step_once).
(b) dopri5 + continuous adjoint — the Pubmed/CoauthorCS family
    (Pubmed: adjoint=True, adjoint_method=adaptive_heun, cosine_sim
    attention, optimizer=adamax). The twin differentiates THROUGH the
    forward solve (the exact discrete gradient); graphax integrates the
    continuous adjoint with its own method/tolerances — agreement within
    the solver-tolerance budget is exactly the property the reference
    relies on when it trains Pubmed with the adjoint.
(c) hard attention + adjoint — the ogbn-arxiv family
    (block=hard_attention, method=dopri5, adjoint_method=rk4,
    optimizer=rmsprop, att_samp_pct<1, selection under no_grad).

Fixture dims are scaled down (60 nodes, hidden 12) but every structural
switch of the family — solver, adjoint path + method, attention flavor,
norm index, quantile subsampling, optimizer — is the tuned config's.
Per-family an initial-weights gradient check pins the adjoint against
torch's exact discrete gradient before any trajectory drift accumulates.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from graphax import Config
from graphax.data.splits import set_train_val_test_split
from graphax.models import make_gnn
from graphax.ode.tableaus import TABLEAUS, stacked
from graphax.sparse import Graph
from graphax.train.loop import cross_entropy_loss
from graphax.train.optimizers import get_optimizer

from tests.test_reference_parity import torch_segment_softmax
from tests.test_training_parity import _sbm_fixture

SAFETY, IFACTOR, DFACTOR = 0.9, 10.0, 0.2


# ----------------------------------------------------------------------
# torch dopri5 with graphax/torchdiffeq controller conventions
# ----------------------------------------------------------------------

def torch_dopri5(f, y0, t0, t1, rtol, atol, max_steps=10_000):
    """Differentiable dopri5: gradients flow through the accepted RK stages;
    the h sequence is plain f32 arithmetic on detached error norms (graphax
    stop_gradients its controller identically). Clamp-on-t1 convention.
    Returns (y, nfe, accepted_ts)."""
    a, b, c, e = stacked(TABLEAUS["dopri5"])
    order = TABLEAUS["dopri5"].order

    def rms(v):
        return float(np.sqrt(np.mean(np.square(v))))

    y = y0
    t = np.float32(t0)
    f0 = f(t, y)
    nfe = 1

    with torch.no_grad():
        y_d, f_d = y.detach().numpy(), f0.detach().numpy()
        scale = atol + np.abs(y_d) * rtol
        d0, d1 = rms(y_d / scale), rms(f_d / scale)
        h0 = 1e-6 if (d0 < 1e-5 or d1 < 1e-5) else 0.01 * d0 / d1
        f1 = f(t + h0, (y + h0 * f0)).detach().numpy()
        nfe += 1
        d2 = rms((f1 - f_d) / scale) / h0
        if max(d1, d2) <= 1e-15:
            h1 = max(1e-6, h0 * 1e-3)
        else:
            h1 = (0.01 / max(d1, d2)) ** (1.0 / (order + 1))
        h = np.float32(min(min(100.0 * h0, h1), t1 - t0))

    ts, attempts = [], 0
    k_first = f0
    while t < t1 - 1e-12 * max(1.0, abs(t1)) and attempts < max_steps:
        h_use = np.float32(min(h, t1 - t))
        ks = [k_first]
        for i in range(1, len(c)):
            yi = y
            for j in range(i):
                if a[i, j] != 0.0:
                    yi = yi + float(np.float32(h_use * a[i, j])) * ks[j]
            ks.append(f(t + c[i] * h_use, yi))
            nfe += 1
        y_prop = y
        for i in range(len(c)):
            if b[i] != 0.0:
                y_prop = y_prop + float(np.float32(h_use * b[i])) * ks[i]
        with torch.no_grad():
            err = np.zeros_like(y.detach().numpy(), np.float32)
            for i in range(len(c)):
                if e[i] != 0.0:
                    err = err + np.float32(h_use * e[i]) \
                        * ks[i].detach().numpy()
            yd, ypd = y.detach().numpy(), y_prop.detach().numpy()
            scale = np.float32(atol) + np.float32(rtol) \
                * np.maximum(np.abs(yd), np.abs(ypd))
            ratio = max(rms(err / scale), 1e-10)
        accept = ratio <= 1.0
        attempts += 1
        factor = min(max(SAFETY * ratio ** (-1.0 / order), DFACTOR), IFACTOR)
        h = np.float32(h_use * factor)
        if accept:
            t = np.float32(t + h_use)
            y = y_prop
            k_first = ks[-1]            # FSAL
            ts.append(float(t))
    return y, nfe, ts


def torch_rk4_38(f, y0, t1, step_size):
    """3/8-rule rk4 on a uniform grid (torchdiffeq rk4_alt_step_func)."""
    h = step_size
    steps = int(round(t1 / step_size))
    y = y0
    for _ in range(steps):
        k1 = f(0.0, y)
        k2 = f(0.0, y + h * k1 / 3.0)
        k3 = f(0.0, y + h * (k2 - k1 / 3.0))
        k4 = f(0.0, y + h * (k1 - k2 + k3))
        y = y + h * (k1 + 3.0 * k2 + 3.0 * k3 + k4) / 8.0
    return y


# ----------------------------------------------------------------------
# generalized torch twin
# ----------------------------------------------------------------------

class FamilyTwin:
    """Reference math in torch, parameterized over the family switches:
    encoder m1 → block attention pinned at x0 (scaled_dot or cosine_sim,
    segment softmax over norm_idx, head mean; optional hard-attention
    quantile subsampling under no_grad) → laplacian RHS → dopri5 or 3/8-rk4
    → relu → m2. Autograd through the solve (exact discrete gradient)."""

    def __init__(self, cfg, params, r, c, n):
        t = lambda a: torch.tensor(np.asarray(a, np.float32),
                                   requires_grad=True)
        self.m1w, self.m1b = t(params["m1"]["w"]), t(params["m1"]["b"])
        self.m2w, self.m2b = t(params["m2"]["w"]), t(params["m2"]["b"])
        ap = params["block"]["att_layer"]
        self.qw, self.qb = t(ap["Q"]["w"]), t(ap["Q"]["b"])
        self.kw, self.kb = t(ap["K"]["w"]), t(ap["K"]["b"])
        self.ov = t(ap["output_var"]) if "output_var" in ap else None
        self.ls = t(ap["lengthscale"]) if "lengthscale" in ap else None
        if cfg.batch_norm:
            self.bn_w = t(params["bn_in"]["scale"])
            self.bn_b = t(params["bn_in"]["bias"])
        else:
            self.bn_w = self.bn_b = None
        self.alpha_raw = t(params["block"]["func"]["alpha_train"])
        self.beta_raw = t(params["block"]["func"]["beta_train"])
        self.cfg, self.n = cfg, n
        self.tr, self.tc = torch.tensor(r), torch.tensor(c)
        self.last_nfe = 0
        self.last_ts = []

    def parameters(self):
        ps = [self.m1w, self.m1b, self.m2w, self.m2b, self.qw, self.qb,
              self.kw, self.kb, self.alpha_raw, self.beta_raw]
        for extra in (self.ov, self.ls, self.bn_w, self.bn_b):
            if extra is not None:
                ps.append(extra)
        return ps

    def _attention(self, z0):
        cfg, n = self.cfg, self.n
        q = (z0 @ self.qw + self.qb).reshape(n, cfg.heads, -1)
        k = (z0 @ self.kw + self.kb).reshape(n, cfg.heads, -1)
        qs, kd = q[self.tr], k[self.tc]
        if cfg.attention_type == "cosine_sim":
            qn = torch.clamp(qs.norm(dim=-1), min=1e-5)
            kn = torch.clamp(kd.norm(dim=-1), min=1e-5)
            scores = (qs * kd).sum(-1) / (qn * kn)
        elif cfg.attention_type == "pearson":
            # centered cosine (`src/function_transformer_attention.py:
            # 248-252`)
            qc = qs - qs.mean(dim=-1, keepdim=True)
            kc = kd - kd.mean(dim=-1, keepdim=True)
            qn = torch.clamp(qc.norm(dim=-1), min=1e-5)
            kn = torch.clamp(kc.norm(dim=-1), min=1e-5)
            scores = (qc * kc).sum(-1) / (qn * kn)
        elif cfg.attention_type == "exp_kernel":
            # Gaussian kernel with learned output_var/lengthscale
            # (`src/function_transformer_attention.py:253-259`)
            sq = ((qs - kd) ** 2).sum(-1)
            scores = self.ov ** 2 * torch.exp(-sq / (2 * self.ls ** 2))
        else:
            d_k = q.shape[-1]
            scores = (qs * (kd / d_k ** 0.5)).sum(-1)
        idx = self.tr if cfg.attention_norm_idx == 0 else self.tc
        if cfg.square_plus:
            # squareplus normalization (`src/utils.py:129-140`): global-max
            # shift, (x + sqrt(x²+4))/2, segment-sum denominator
            out = scores - scores.max()
            out = (out + torch.sqrt(out * out + 4.0)) / 2.0
            denom = torch.zeros(n, scores.shape[1]) \
                .index_add_(0, idx, out)
            return out / (denom[idx] + 1e-16)
        return torch_segment_softmax(scores, idx, n)      # [E, H]

    def _edge_values(self, z0):
        cfg = self.cfg
        att = self._attention(z0)
        vals = att.mean(dim=1)
        if cfg.block == "hard_attention":
            # quantile subsampling under no_grad
            # (`src/block_transformer_hard_attention.py:41-60`)
            with torch.no_grad():
                thresh = torch.quantile(vals, 1.0 - cfg.att_samp_pct)
                keep = vals > thresh
                idx = self.tr if cfg.attention_norm_idx == 0 else self.tc
                kept = torch.where(keep, vals, torch.zeros_like(vals))
                sums = torch.zeros(self.n).index_add_(0, idx, kept)
                vals = torch.where(keep, kept / (sums[idx] + 1e-16),
                                   torch.zeros_like(vals))
        return vals

    def forward(self, tx):
        cfg, n = self.cfg, self.n
        z0 = tx @ self.m1w + self.m1b
        if self.bn_w is not None:
            # train-mode BatchNorm1d: biased batch stats
            # (graphax.models.layers.batchnorm_apply)
            mean = z0.mean(dim=0)
            var = z0.var(dim=0, unbiased=False)
            z0 = (z0 - mean) / torch.sqrt(var + 1e-5) * self.bn_w + self.bn_b
        vals = self._edge_values(z0)
        alpha = torch.sigmoid(self.alpha_raw)
        # the reference PINS x0 detached (`src/base_classes.py:53-55`:
        # x0.clone().detach()) — the source term carries no gradient to the
        # encoder; graphax mirrors with stop_gradient (blocks/common.py)
        x0 = z0.detach()

        def f(t, y):
            ax = torch.zeros_like(y)
            ax.index_add_(0, self.tr, y[self.tc] * vals[:, None])
            out = alpha * (ax - y)
            if cfg.add_source:
                out = out + self.beta_raw * x0
            return out

        if cfg.method == "dopri5":
            y, self.last_nfe, self.last_ts = torch_dopri5(
                f, z0, 0.0, cfg.time, cfg.rtol, cfg.atol)
        else:
            y = torch_rk4_38(f, z0, cfg.time, cfg.step_size)
        return torch.relu(y) @ self.m2w + self.m2b


# ----------------------------------------------------------------------
# shared harness
# ----------------------------------------------------------------------

def _setup(cfg, seed=3, split_seed=41):
    r, c, x, y = _sbm_fixture(seed=seed)
    n, f_dim, n_class = x.shape[0], x.shape[1], int(y.max()) + 1
    masks_np = set_train_val_test_split(split_seed, y, num_development=30,
                                        num_per_class=5)
    g = Graph.from_edges(r, c, n, np.ones(len(r), np.float32),
                         edge_buffer_size=len(r) + 16)
    model = make_gnn(cfg, num_features=f_dim, num_classes=n_class)
    params, state = model.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    ad = cfg.attention_dim
    params["block"]["att_layer"]["Q"]["w"] = \
        0.4 * jax.random.normal(key, (cfg.hidden_dim, ad))
    params["block"]["att_layer"]["K"]["w"] = \
        0.4 * jax.random.normal(jax.random.fold_in(key, 1),
                                (cfg.hidden_dim, ad))
    params["block"]["func"]["alpha_train"] = jnp.asarray(0.3)
    params["block"]["func"]["beta_train"] = jnp.asarray(0.2)
    return r, c, x, y, masks_np, g, model, params, state


def _jax_step_fn(cfg, model, state, g, xj, yj, masks):
    tx_opt = get_optimizer(cfg.optimizer, cfg.lr, cfg.decay)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _, aux = model.apply(p, state, g, xj, train=True)
            return cross_entropy_loss(logits, yj, masks[0]), (logits, aux)

        (loss, (logits, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx_opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        accs = tuple(
            (jnp.sum((jnp.argmax(logits, 1) == yj) & m) / jnp.sum(m))
            for m in masks)
        return params, opt_state, loss, jnp.stack(accs), aux["steps"]

    return step, tx_opt


def _initial_grads_jax(cfg, model, state, g, xj, yj, mask, params):
    def loss_fn(p):
        logits, _, _ = model.apply(p, state, g, xj, train=True)
        return cross_entropy_loss(logits, yj, mask)

    return jax.grad(loss_fn)(params)


def _initial_grads_twin(twin, tx_t, ty, t_mask):
    for p in twin.parameters():
        p.grad = None
    logits = twin.forward(tx_t)
    loss = torch.nn.functional.cross_entropy(logits[t_mask], ty[t_mask])
    loss.backward()
    return loss


def _grad_cosine(a, b):
    a, b = np.ravel(a), np.ravel(b)
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 and nb == 0:
        return 1.0
    return float(np.dot(a, b) / max(na * nb, 1e-30))


def _run_family(cfg, epochs, make_torch_opt, loss_atol, acc_tol,
                grad_cos_min, check_steps=False):
    r, c, x, y, masks_np, g, model, params, state = _setup(cfg)
    xj = jnp.asarray(x)
    yj = jnp.asarray(y.astype(np.int32))
    masks = tuple(jnp.asarray(m) for m in masks_np)
    step, tx_opt = _jax_step_fn(cfg, model, state, g, xj, yj, masks)
    opt_state = tx_opt.init(params)

    twin = FamilyTwin(cfg, jax.tree_util.tree_map(np.asarray, params),
                      r, c, x.shape[0])
    t_opt = make_torch_opt(twin.parameters())
    tx_t = torch.tensor(x)
    ty = torch.tensor(y)
    t_masks = tuple(torch.tensor(m) for m in masks_np)

    # -- initial-weights gradient pin (adjoint vs exact discrete grad) ----
    gj = _initial_grads_jax(cfg, model, state, g, xj, yj, masks[0], params)
    _initial_grads_twin(twin, tx_t, ty, t_masks[0])
    pairs = [
        ("m1.w", gj["m1"]["w"], twin.m1w.grad),
        ("m2.w", gj["m2"]["w"], twin.m2w.grad),
        ("alpha", gj["block"]["func"]["alpha_train"], twin.alpha_raw.grad),
    ]
    for name, ja, ta in pairs:
        ja = np.asarray(ja)
        ta = np.zeros_like(ja) if ta is None else ta.detach().numpy()
        cos = _grad_cosine(ja, ta)
        assert cos > grad_cos_min, (name, cos, ja.ravel()[:4], ta.ravel()[:4])

    # -- trajectories -----------------------------------------------------
    j_loss, j_accs, j_steps = [], [], []
    t_loss, t_accs, t_steps = [], [], []
    for _ in range(epochs):
        params, opt_state, lj, accj, stepsj = step(params, opt_state)
        j_loss.append(float(lj))
        j_accs.append(np.asarray(accj))
        j_steps.append(int(stepsj))

        t_opt.zero_grad()
        logits = twin.forward(tx_t)
        per = torch.nn.functional.cross_entropy(
            logits[t_masks[0]], ty[t_masks[0]])
        per.backward()
        t_opt.step()
        t_loss.append(float(per.detach()))
        t_steps.append(len(twin.last_ts))
        with torch.no_grad():
            pred = logits.argmax(1)
            t_accs.append(np.asarray([
                float((pred[m] == ty[m]).float().mean()) for m in t_masks]))

    j_loss, t_loss = np.asarray(j_loss), np.asarray(t_loss)
    j_accs, t_accs = np.stack(j_accs), np.stack(t_accs)

    np.testing.assert_allclose(j_loss, t_loss, atol=loss_atol,
                               rtol=loss_atol)
    assert np.mean(np.abs(j_accs - t_accs)) < acc_tol, \
        (j_accs[-5:], t_accs[-5:])
    # both learn
    assert j_accs[-1, 1] > 0.5 and j_accs[-1, 2] > 0.5, j_accs[-1]
    assert t_accs[-1, 1] > 0.5 and t_accs[-1, 2] > 0.5, t_accs[-1]
    assert j_loss[-1] < j_loss[0] - 0.2
    assert t_loss[-1] < t_loss[0] - 0.2
    if check_steps and cfg.method == "dopri5":
        # identical accepted-step count at identical (initial) weights,
        # near-identical as weights drift
        assert j_steps[0] == t_steps[0], (j_steps[0], t_steps[0])
        assert np.mean(np.abs(np.asarray(j_steps) - np.asarray(t_steps))) \
            <= 1.0, (j_steps, t_steps)
    return j_loss, t_loss, j_steps, t_steps


# ----------------------------------------------------------------------
# the three families
# ----------------------------------------------------------------------

def test_family_cora_dopri5_nonadjoint():
    """(a) Cora family: attention block + dopri5, autograd through the
    bounded-scan solve on both sides; adamax. Accepted-step counts compare
    EXACTLY at the initial weights."""
    cfg = Config(block="attention", function="laplacian", hidden_dim=12,
                 heads=2, attention_dim=8, attention_type="scaled_dot",
                 attention_norm_idx=1, method="dopri5", tol_scale=821.98,
                 time=3.0, add_source=True, self_loop_weight=1.0,
                 data_norm="rw", input_dropout=0.0, dropout=0.0,
                 no_early=True, optimizer="adamax", lr=0.022, decay=0.0,
                 max_nfe=2000)
    _run_family(cfg, epochs=40,
                make_torch_opt=lambda ps: torch.optim.Adamax(ps, lr=0.022),
                loss_atol=0.03, acc_tol=0.03, grad_cos_min=0.999,
                check_steps=True)


def test_family_pubmed_dopri5_adjoint():
    """(b) Pubmed family: dopri5 forward + continuous adjoint
    (adaptive_heun) vs torch's exact discrete gradient; cosine_sim
    attention, norm_idx 0, adamax."""
    cfg = Config(block="attention", function="laplacian", hidden_dim=12,
                 heads=1, attention_dim=8, attention_type="cosine_sim",
                 attention_norm_idx=0, method="dopri5", tol_scale=1991.07,
                 time=3.0, add_source=True, self_loop_weight=1.0,
                 data_norm="rw", input_dropout=0.0, dropout=0.0,
                 no_early=True, optimizer="adamax", lr=0.0147, decay=0.0,
                 max_nfe=5000, adjoint=True, adjoint_method="adaptive_heun",
                 tol_scale_adjoint=100.0)
    _run_family(cfg, epochs=40,
                make_torch_opt=lambda ps: torch.optim.Adamax(ps, lr=0.0147),
                loss_atol=0.05, acc_tol=0.04, grad_cos_min=0.99,
                check_steps=True)


def test_family_arxiv_hard_attention_adjoint():
    """(c) ogbn-arxiv family: hard-attention quantile subsampling (no_grad)
    + dopri5 forward + rk4 continuous adjoint; rmsprop."""
    cfg = Config(block="hard_attention", function="laplacian", hidden_dim=12,
                 heads=2, attention_dim=8, attention_type="scaled_dot",
                 attention_norm_idx=0, method="dopri5", tol_scale=11353.6,
                 time=3.0, step_size=1.0, add_source=False,
                 self_loop_weight=1.0, data_norm="rw", input_dropout=0.0,
                 dropout=0.0, no_early=True, optimizer="rmsprop", lr=0.0055,
                 decay=0.0, max_nfe=500, att_samp_pct=0.81, use_flux=False,
                 adjoint=True, adjoint_method="rk4", adjoint_step_size=0.5)
    _run_family(cfg, epochs=30,
                make_torch_opt=lambda ps: torch.optim.RMSprop(
                    ps, lr=0.0055, alpha=0.99, eps=1e-8),
                loss_atol=0.08, acc_tol=0.05, grad_cos_min=0.97,
                check_steps=True)


def test_family_citeseer_exp_kernel():
    """(d) Citeseer family (`src/best_params.py:2`): attention block +
    exp_kernel Gaussian attention (learned output_var/lengthscale),
    squareplus normalization over norm_idx=1, dopri5 non-adjoint, adam
    with coupled weight decay."""
    cfg = Config(block="attention", function="laplacian", hidden_dim=12,
                 heads=2, attention_dim=8, attention_type="exp_kernel",
                 attention_norm_idx=1, square_plus=True, method="dopri5",
                 tol_scale=2.9010446330432815, time=3.0, add_source=True,
                 self_loop_weight=1.0, data_norm="rw", input_dropout=0.0,
                 dropout=0.0, no_early=True, optimizer="adam",
                 lr=0.00863585231323069, decay=0.1, max_nfe=3000)
    _run_family(cfg, epochs=40,
                make_torch_opt=lambda ps: torch.optim.Adam(
                    ps, lr=0.00863585231323069, weight_decay=0.1),
                loss_atol=0.05, acc_tol=0.04, grad_cos_min=0.99,
                check_steps=True)


def test_family_photo_pearson_batchnorm():
    """(e) Photo family (`src/best_params.py:6`): hard-attention quantile
    subsampling + pearson (centered-cosine) attention + train-mode
    batch norm in the encoder + dopri5 forward with rk4 continuous
    adjoint; adam with coupled weight decay."""
    cfg = Config(block="hard_attention", function="laplacian",
                 hidden_dim=12, heads=2, attention_dim=8,
                 attention_type="pearson", attention_norm_idx=0,
                 batch_norm=True, method="dopri5",
                 tol_scale=2086.525473167121, time=3.0,
                 add_source=False, self_loop_weight=0.05783612585280118,
                 data_norm="rw", input_dropout=0.0, dropout=0.0,
                 no_early=True, optimizer="adam", lr=0.005560726683883279,
                 decay=0.004707800883497945, max_nfe=500,
                 att_samp_pct=0.9282359956104751, use_flux=False,
                 adjoint=True, adjoint_method="rk4", adjoint_step_size=0.5,
                 tol_scale_adjoint=14777.606112557354)
    _run_family(cfg, epochs=30,
                make_torch_opt=lambda ps: torch.optim.Adam(
                    ps, lr=0.005560726683883279,
                    weight_decay=0.004707800883497945),
                loss_atol=0.08, acc_tol=0.05, grad_cos_min=0.97,
                check_steps=True)
