"""END-TO-END TRAINING parity: graphax vs a transplanted-weights torch twin.

The strongest parity statement available in a zero-egress environment
(VERDICT r2 item 3): train the graphax GNN and an independent torch
re-implementation of the reference's training protocol
(`/root/reference/src/graph_datasets/run_GNN.py:62-96,137-148`: full-batch
Adam on masked CE, per-epoch train/val/test accuracy) from the SAME initial
weights on the SAME homophilous fixture graph with the SAME seeded split
(`src/graph_datasets/data.py:154-181` protocol) and a fixed-step rk4 solve
(torchdiffeq's 3/8 rule, what `--method rk4` runs), and assert the loss and
accuracy TRAJECTORIES agree epoch by epoch — not just one forward pass.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import optax

from graphax import Config
from graphax.data.splits import set_train_val_test_split
from graphax.models import make_gnn
from graphax.sparse import Graph
from graphax.train.loop import cross_entropy_loss

from tests.test_reference_parity import torch_rw_norm, torch_segment_softmax

EPOCHS = 50
LR = 0.01


def _sbm_fixture(seed=0, n=60, c=3, f=8):
    """Homophilous SBM + class-informative noisy features (numpy only)."""
    rng = np.random.RandomState(seed)
    y = rng.randint(0, c, n)
    rows, cols = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = 0.25 if y[i] == y[j] else 0.02
            if rng.rand() < p:
                rows += [i, j]
                cols += [j, i]
    proto = rng.randn(c, f).astype(np.float32)
    x = proto[y] + 1.5 * rng.randn(n, f).astype(np.float32)
    return (np.asarray(rows, np.int64), np.asarray(cols, np.int64),
            x, y.astype(np.int64))


class TorchTwin:
    """The reference math in torch: encoder m1 → rw-norm + self-loops →
    transformer attention pinned at x0 (head-mean, col-softmax) → 3/8-rule
    rk4 → relu → m2. Autograd through the solve (= the reference's
    non-adjoint discretize-then-optimize path)."""

    def __init__(self, cfg, params, r, c, n):
        t = lambda a: torch.tensor(np.asarray(a, np.float32),
                                   requires_grad=True)
        self.m1w, self.m1b = t(params["m1"]["w"]), t(params["m1"]["b"])
        self.m2w, self.m2b = t(params["m2"]["w"]), t(params["m2"]["b"])
        ap = params["block"]["att_layer"]
        self.qw, self.qb = t(ap["Q"]["w"]), t(ap["Q"]["b"])
        self.kw, self.kb = t(ap["K"]["w"]), t(ap["K"]["b"])
        self.alpha_raw = t(params["block"]["func"]["alpha_train"])
        self.beta_raw = t(params["block"]["func"]["beta_train"])
        self.cfg = cfg
        self.n = n
        self.tr, self.tc = torch.tensor(r), torch.tensor(c)
        w_norm = torch_rw_norm(self.tr, self.tc, torch.ones(len(r)), n,
                               norm_dim=1)
        self.w_norm = w_norm + torch.where(
            self.tr == self.tc,
            torch.full((len(r),), cfg.self_loop_weight), torch.zeros(len(r)))

    def parameters(self):
        return [self.m1w, self.m1b, self.m2w, self.m2b, self.qw, self.qb,
                self.kw, self.kb, self.alpha_raw, self.beta_raw]

    def forward(self, tx):
        cfg, n = self.cfg, self.n
        z0 = tx @ self.m1w + self.m1b
        q = (z0 @ self.qw + self.qb).reshape(n, cfg.heads, -1)
        k = (z0 @ self.kw + self.kb).reshape(n, cfg.heads, -1)
        d_k = q.shape[-1]
        scores = (q[self.tr] * (k[self.tc] / d_k ** 0.5)).sum(-1)
        idx = self.tr if cfg.attention_norm_idx == 0 else self.tc
        att = torch_segment_softmax(scores, idx, n)
        vals = att.mean(dim=1)
        alpha = torch.sigmoid(self.alpha_raw)

        # the reference pins x0 DETACHED (`src/base_classes.py:53-55`) — the
        # source term carries no gradient back to the encoder
        x0 = z0.detach()

        def f(y):
            ax = torch.zeros_like(y)
            ax.index_add_(0, self.tr, y[self.tc] * vals[:, None])
            out = alpha * (ax - y)
            if cfg.add_source:
                out = out + self.beta_raw * x0
            return out

        # 3/8-rule rk4 (torchdiffeq rk4_alt_step_func) on a uniform grid
        h = cfg.step_size
        steps = int(round(cfg.time / cfg.step_size))
        y = z0
        for _ in range(steps):
            k1 = f(y)
            k2 = f(y + h * k1 / 3.0)
            k3 = f(y + h * (k2 - k1 / 3.0))
            k4 = f(y + h * (k1 - k2 + k3))
            y = y + h * (k1 + 3.0 * k2 + 3.0 * k3 + k4) / 8.0
        return torch.relu(y) @ self.m2w + self.m2b


def test_training_trajectories_match_torch_twin():
    r, c, x, y = _sbm_fixture(seed=3)
    n, f_dim, n_class = x.shape[0], x.shape[1], int(y.max()) + 1
    tr_m, va_m, te_m = set_train_val_test_split(41, y, num_development=30,
                                                num_per_class=5)

    cfg = Config(block="attention", function="laplacian", hidden_dim=12,
                 heads=2, attention_dim=8, attention_type="scaled_dot",
                 attention_norm_idx=1, method="rk4", step_size=0.5,
                 time=2.0, add_source=True, self_loop_weight=1.0,
                 data_norm="rw", input_dropout=0.0, dropout=0.0,
                 no_early=True, lr=LR)

    g = Graph.from_edges(r, c, n, np.ones(len(r), np.float32),
                         edge_buffer_size=len(r) + 16)
    model = make_gnn(cfg, num_features=f_dim, num_classes=n_class)
    params, state = model.init(jax.random.PRNGKey(0))
    # nontrivial attention + diffusion scalars (init is near-constant)
    key = jax.random.PRNGKey(1)
    params["block"]["att_layer"]["Q"]["w"] = \
        0.4 * jax.random.normal(key, (12, 8))
    params["block"]["att_layer"]["K"]["w"] = \
        0.4 * jax.random.normal(jax.random.fold_in(key, 1), (12, 8))
    params["block"]["func"]["alpha_train"] = jnp.asarray(0.3)
    params["block"]["func"]["beta_train"] = jnp.asarray(0.2)

    xj = jnp.asarray(x)
    yj = jnp.asarray(y.astype(np.int32))
    masks = tuple(jnp.asarray(m) for m in (tr_m, va_m, te_m))

    tx_opt = optax.adam(LR)
    opt_state = tx_opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, _, _ = model.apply(p, state, g, xj, train=True)
            return cross_entropy_loss(logits, yj, masks[0]), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx_opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
        accs = tuple(
            (jnp.sum((jnp.argmax(logits, 1) == yj) & m) / jnp.sum(m))
            for m in masks)
        return params, opt_state, loss, jnp.stack(accs)

    # ---- torch twin with the SAME initial weights -----------------------
    twin = TorchTwin(cfg, jax.tree_util.tree_map(np.asarray, params),
                     r, c, n)
    t_opt = torch.optim.Adam(twin.parameters(), lr=LR)
    tx_t = torch.tensor(x)
    ty = torch.tensor(y)
    t_masks = tuple(torch.tensor(m) for m in (tr_m, va_m, te_m))

    j_loss, j_accs, t_loss, t_accs = [], [], [], []
    for _ in range(EPOCHS):
        params, opt_state, lj, accj = step(params, opt_state)
        j_loss.append(float(lj))
        j_accs.append(np.asarray(accj))

        t_opt.zero_grad()
        logits = twin.forward(tx_t)
        per = torch.nn.functional.cross_entropy(
            logits[t_masks[0]], ty[t_masks[0]])
        per.backward()
        t_opt.step()
        t_loss.append(float(per))
        with torch.no_grad():
            pred = logits.argmax(1)
            t_accs.append(np.asarray([
                float((pred[m] == ty[m]).float().mean()) for m in t_masks]))

    j_loss, t_loss = np.asarray(j_loss), np.asarray(t_loss)
    j_accs, t_accs = np.stack(j_accs), np.stack(t_accs)

    # loss trajectories track each other through all 50 epochs
    np.testing.assert_allclose(j_loss, t_loss, atol=0.02, rtol=0.02)
    # accuracy trajectories agree (discrete — allow a couple of nodes of
    # drift late in training, f32 divergence through 50 Adam steps)
    assert np.mean(np.abs(j_accs - t_accs)) < 0.03, \
        (j_accs[-5:], t_accs[-5:])
    assert np.max(np.abs(j_accs[:, 1:] - t_accs[:, 1:])) <= 0.15
    # both learn: final val/test accuracy well above the 1/3 random rate
    assert j_accs[-1, 1] > 0.5 and j_accs[-1, 2] > 0.5, j_accs[-1]
    assert t_accs[-1, 1] > 0.5 and t_accs[-1, 2] > 0.5, t_accs[-1]
    # and both improve over their first epoch
    assert j_loss[-1] < j_loss[0] - 0.2
    assert t_loss[-1] < t_loss[0] - 0.2
