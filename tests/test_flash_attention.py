"""Flash window-attention kernel vs the XLA reference formulation.

Runs in Pallas interpret mode on the CPU test mesh — identical kernel
math to the TPU path."""

import jax.numpy as jnp
import numpy as np
import pytest

from fgt_tpu.ops.attention import TMHSA, _attend
from fgt_tpu.ops.flash_attention import flash_attend, flash_mhsa

pytestmark = pytest.mark.heavy  # jit-compile heavy (minutes on a 1-core host)


@pytest.mark.parametrize("n,l,ch", [(2, 128, 128), (3, 300, 128),
                                    (1, 1000, 128), (2, 64, 64)])
def test_flash_matches_xla_attention(n, l, ch):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(n, l, ch).astype(np.float32))
    k = jnp.asarray(rng.randn(n, l, ch).astype(np.float32))
    v = jnp.asarray(rng.randn(n, l, ch).astype(np.float32))
    scale = 1.0 / np.sqrt(ch)
    want = np.asarray(_attend(q, k, v, scale))
    got = np.asarray(flash_mhsa(q, k, v, scale=scale, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_flash_attend_leading_dims():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 3, 4, 50, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 3, 4, 50, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 3, 4, 50, 32).astype(np.float32))
    want = np.asarray(_attend(q, k, v, 0.25))
    got = np.asarray(flash_attend(q, k, v, 0.25))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_tmhsa_flash_equals_xla():
    """The full TMHSA module must produce identical outputs with the
    fused kernel and the XLA path."""
    import jax

    rng = np.random.RandomState(2)
    t, h, w, c = 3, 8, 12, 64
    x = jnp.asarray(rng.randn(2 * t, h * w, c).astype(np.float32))
    m_xla = TMHSA(d_model=c, group_size=2, num_heads=4, use_flash=False)
    m_fl = TMHSA(d_model=c, group_size=2, num_heads=4, use_flash=True)
    params = m_xla.init(jax.random.PRNGKey(0), x, t, h, w)
    a = np.asarray(m_xla.apply(params, x, t, h, w))
    b = np.asarray(m_fl.apply(params, x, t, h, w))
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5)


def test_flash_vjp_matches_xla_gradients():
    """Flash backward (Pallas dq/dkv kernels) vs autodiff through the XLA
    attention, including a non-multiple-of-block L."""
    import jax

    rng = np.random.RandomState(3)
    n, l, ch = 2, 200, 64
    q = jnp.asarray(rng.randn(n, l, ch).astype(np.float32))
    k = jnp.asarray(rng.randn(n, l, ch).astype(np.float32))
    v = jnp.asarray(rng.randn(n, l, ch).astype(np.float32))
    scale = 1.0 / np.sqrt(ch)
    cot = jnp.asarray(rng.randn(n, l, ch).astype(np.float32))

    def ref_loss(q, k, v):
        return jnp.sum(_attend(q, k, v, scale) * cot)

    def flash_loss(q, k, v):
        return jnp.sum(flash_mhsa(q, k, v, scale=scale, interpret=True)
                       * cot)

    g_ref = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=3e-4)
