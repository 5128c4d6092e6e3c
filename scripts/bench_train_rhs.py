"""Quick TPU timing: GRAND-nl training RHS fwd+bwd, Pallas vs XLA route."""
import dataclasses, json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from bench import bench_chained, build_sorted_edges
    from graphax import Config
    from graphax.functions import get_function
    from graphax.functions.common import prepare_scalars
    from graphax.kernels.dispatch import attach_tiles
    from graphax.sparse import Graph
    from graphax.blocks.common import make_fstate

    n, avg_deg, d = 169_343, 14, 162
    row, col = build_sorted_edges(n, avg_deg)
    g = dataclasses.replace(attach_tiles(Graph.from_edges(row, col, n)),
                            strategy="tiled")
    rng = np.random.RandomState(1)
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.randn(n, d), dtype)
    cfg = Config(function="transformer", heads=2, attention_dim=32,
                 hidden_dim=d, attention_type="scaled_dot",
                 self_loop_weight=1.0)
    f = get_function(cfg, d)
    p = prepare_scalars(f.init(jax.random.PRNGKey(0)), cfg, dtype)

    def grad_step(fs_unused):
        def step(s, _fs):
            def loss(xx, qw):
                pp = {**p, "att": {**p["att"], "Q": {**p["att"]["Q"], "w": qw}}}
                return jnp.sum(f.rhs(pp, _fs, 0.0, xx).astype(jnp.float32))
            gx, gq = jax.grad(loss, argnums=(0, 1))(s, p["att"]["Q"]["w"])
            return (s * 0.99 + 0.01 * gx.astype(s.dtype)
                    + (jnp.sum(gq) * 1e-12).astype(s.dtype))
        return step

    fs_pl = make_fstate(g, x, train=True, cfg=cfg)
    fs_xla = make_fstate(g, x, train=True)
    assert fs_pl.fast_attention and not fs_xla.fast_attention
    t_pl = bench_chained(grad_step(None), x, fs_pl, iters=6)
    t_xla = bench_chained(grad_step(None), x, fs_xla, iters=6)
    print(json.dumps(dict(train_pallas_ms=round(t_pl*1e3,2),
                          train_xla_ms=round(t_xla*1e3,2),
                          speedup=round(t_xla/t_pl,2))))

main()
