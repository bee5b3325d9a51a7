"""Planar normalising flows: log-det correctness and the BaselineVAE
flow-KL branch (reference models/vae_config.py:80-86 law, live here
behind --num_flows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genesis_tpu.core.attrdict import AttrDict
from genesis_tpu.ops.flows import AmortisedPlanarFlow, planar_step


def test_planar_step_ldj_matches_autodiff():
    """ldj must equal log|det(dz'/dz)| from the exact Jacobian."""
    rs = np.random.RandomState(0)
    B, D = 4, 6
    z = jnp.asarray(rs.randn(B, D).astype(np.float32))
    u = jnp.asarray(rs.randn(B, D).astype(np.float32))
    w = jnp.asarray(rs.randn(B, D).astype(np.float32))
    b = jnp.asarray(rs.randn(B).astype(np.float32))

    _, ldj = planar_step(z, u, w, b)

    def single(zi, ui, wi, bi):
        out, _ = planar_step(zi[None], ui[None], wi[None], bi[None])
        return out[0]

    for i in range(B):
        jac = jax.jacfwd(single)(z[i], u[i], w[i], b[i])
        ref = np.log(abs(np.linalg.det(np.asarray(jac))))
        np.testing.assert_allclose(float(ldj[i]), ref, atol=1e-4)


def test_planar_step_invertibility_bound():
    """u_hat correction must keep det = 1 + u_hat.psi > 0 even for
    adversarial (u, w) with w.u << -1."""
    rs = np.random.RandomState(1)
    B, D = 64, 8
    z = jnp.asarray(rs.randn(B, D).astype(np.float32))
    w = jnp.asarray(rs.randn(B, D).astype(np.float32))
    u = -10.0 * w  # w.u strongly negative
    b = jnp.zeros(B)
    _, ldj = planar_step(z, u, w, b)
    assert np.all(np.isfinite(np.asarray(ldj)))
    # The guarantee is det = 1 + u_hat.psi > 0, not just finiteness;
    # recompute det via the exact Jacobian to catch a sign regression
    # in the u_hat correction (planar_step's log would mask it only if
    # it used |det|, which it deliberately does not).
    def single(zi, ui, wi, bi):
        out, _ = planar_step(zi[None], ui[None], wi[None], bi[None])
        return out[0]

    for i in range(0, B, 8):
        jac = jax.jacfwd(single)(z[i], u[i], w[i], b[i])
        assert np.linalg.det(np.asarray(jac)) > 0


def test_zero_flows_is_identity():
    flow = AmortisedPlanarFlow(z_size=5, num_flows=0)
    h = jnp.ones((3, 7))
    z0 = jnp.arange(15.0).reshape(3, 5)
    variables = flow.init(jax.random.PRNGKey(0), h, z0)
    z, ldj = flow.apply(variables, h, z0)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z0))
    np.testing.assert_array_equal(np.asarray(ldj), np.zeros(3))


@pytest.mark.parametrize("num_flows", [0, 4])
def test_baseline_vae_flow_branch(num_flows):
    """Forward contract with flows on: stats carry z_0/z_k/ldj and the
    KL follows the reference flow law; num_flows=0 keeps the plain path
    (no flow params in the tree, no flow stats)."""
    from genesis_tpu.models import vae_config

    cfg = AttrDict(
        K_steps=None, img_size=32, pixel_bound=True, pixel_std=0.7,
        latent_dimension=16, num_flows=num_flows,
        compute_dtype="float32")
    model = vae_config.load(cfg)
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, x, True)

    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    has_flow = any("flow" in jax.tree_util.keystr(p) for p, _ in flat)
    assert has_flow == (num_flows > 0)

    recon, losses, stats, _, _ = model.apply(
        variables, x, True, rngs={"sample": jax.random.PRNGKey(2)})
    assert recon.shape == x.shape
    assert losses["err"].shape == (2,)
    assert losses["kl_l"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(losses["kl_l"])))
    if num_flows > 0:
        # Reference law: kl = log q(z_0) - log p(z_K) - ldj.
        from genesis_tpu.ops import losses as L
        lq = jnp.sum(L.normal_log_prob(stats.z_0, stats.mu_0,
                                       stats.sigma_0), axis=-1)
        lp = jnp.sum(L.std_normal_log_prob(stats.z), axis=-1)
        np.testing.assert_allclose(
            np.asarray(losses["kl_l"]),
            np.asarray(lq - lp - stats.ldj), rtol=1e-5)
        # Flows actually move the sample.
        assert float(jnp.abs(stats.z - stats.z_0).max()) > 0
    else:
        assert "z_0" not in stats and "ldj" not in stats
