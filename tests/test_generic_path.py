"""Full-model parity: generic segment path == star fast path (eval mode)."""
import jax
import numpy as np
import pytest

from taxoexpan_tpu.models import TaxoExpan
from taxoexpan_tpu.models.generic import forward_generic
from tests.test_model_and_losses import P, S, V, D, make_group_batch


@pytest.mark.parametrize("pm,rm", [("PGAT", "WMR"), ("PGCN", "MR"),
                                   ("GAT", "CR"), ("GCN", "WMR")])
def test_forward_paths_agree(rng, pm, rm):
    model = TaxoExpan(pm, rm, "BIM", in_dim=D, hidden_dim=16, out_dim=8,
                      pos_dim=4, num_layers=1, heads=[2, 1], feat_drop=0.3,
                      attn_drop=0.3, max_parents=P, expand_factor=S)
    params = model.init(jax.random.PRNGKey(0))
    table = jax.numpy.asarray(rng.normal(size=(V, D)).astype(np.float32))
    batch = make_group_batch(rng, g=4, c=3)
    star = model.forward(params, batch, table, rng=jax.random.PRNGKey(1),
                         train=False)
    generic = forward_generic(model, params, batch, table,
                              rng=jax.random.PRNGKey(2), train=False)
    np.testing.assert_allclose(np.asarray(star), np.asarray(generic),
                               rtol=2e-4, atol=2e-5)
