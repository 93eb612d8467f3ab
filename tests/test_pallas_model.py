"""Full-model parity: kernel='pallas' (interpret on CPU) == kernel='xla'."""
import jax
import numpy as np

from taxoexpan_tpu.models import TaxoExpan
from tests.test_model_and_losses import P, S, V, D, make_group_batch


def test_pallas_model_matches_xla(rng):
    kwargs = dict(in_dim=D, hidden_dim=16, out_dim=8, pos_dim=4, num_layers=1,
                  heads=[2, 1], feat_drop=0.0, attn_drop=0.0, max_parents=P,
                  expand_factor=S)
    m_xla = TaxoExpan("PGAT", "WMR", "BIM", kernel="xla", **kwargs)
    m_pal = TaxoExpan("PGAT", "WMR", "BIM", kernel="pallas", **kwargs)
    params = m_xla.init(jax.random.PRNGKey(0))
    table = jax.numpy.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng, g=4, c=2)
    s_xla = np.asarray(m_xla.forward(params, batch, table,
                                     rng=jax.random.PRNGKey(1), train=False))
    s_pal = np.asarray(m_pal.forward(params, batch, table,
                                     rng=jax.random.PRNGKey(1), train=False))
    np.testing.assert_allclose(s_pal, s_xla, rtol=2e-4, atol=1e-5)

    # gradients agree end-to-end through the custom VJP
    def loss(m):
        def f(p):
            s = m.forward(p, batch, table, rng=jax.random.PRNGKey(1),
                          train=False)
            return (s ** 2).sum()
        return f

    g_xla = jax.grad(loss(m_xla))(params)
    g_pal = jax.grad(loss(m_pal))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla),
                    jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-4)
