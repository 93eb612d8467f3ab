"""bfloat16 mixed-precision path: close to f32 and structurally identical."""
import jax
import numpy as np

from taxoexpan_tpu.models import TaxoExpan
from tests.test_model_and_losses import P, S, V, D, make_group_batch


def test_bf16_close_to_f32(rng):
    kwargs = dict(in_dim=D, hidden_dim=16, out_dim=8, pos_dim=4, num_layers=1,
                  heads=[2, 1], feat_drop=0.0, attn_drop=0.0, max_parents=P,
                  expand_factor=S)
    m32 = TaxoExpan("PGAT", "WMR", "BIM", **kwargs)
    m16 = TaxoExpan("PGAT", "WMR", "BIM", compute_dtype="bfloat16", **kwargs)
    params = m32.init(jax.random.PRNGKey(0))
    table = jax.numpy.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng, g=4, c=3)
    s32 = np.asarray(m32.forward(params, batch, table,
                                 rng=jax.random.PRNGKey(1), train=False))
    s16 = np.asarray(m16.forward(params, batch, table,
                                 rng=jax.random.PRNGKey(1), train=False))
    assert s16.dtype == np.float32  # outputs come back in f32
    scale = np.abs(s32).mean() + 1e-6
    assert np.abs(s32 - s16).max() / scale < 0.05, (s32, s16)


def test_bf16_grads_finite(rng):
    m16 = TaxoExpan("PGAT", "WMR", "LBM", compute_dtype="bfloat16", in_dim=D,
                    hidden_dim=16, out_dim=8, pos_dim=4, num_layers=1,
                    heads=[2, 1], feat_drop=0.1, attn_drop=0.1, max_parents=P,
                    expand_factor=S)
    params = m16.init(jax.random.PRNGKey(0))
    table = jax.numpy.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng, g=4, c=3)

    def loss(p):
        s = m16.forward(p, batch, table, rng=jax.random.PRNGKey(2), train=True)
        return (s ** 2).sum()

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf, dtype=np.float32)).all()
