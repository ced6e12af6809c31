"""ops/linalg: batched pivot-free SPD inverse vs jnp.linalg.inv."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx.ops.linalg import spd_inverse


def _spd(key, b, n, cond, dtype):
    a = jax.random.normal(key, (b, n, n), dtype)
    q, _ = jnp.linalg.qr(a)
    lam = jnp.logspace(0, np.log10(cond), n, dtype=dtype)
    return jnp.einsum("bij,j,bkj->bik", q, lam, q)


@pytest.mark.parametrize("n", [3, 8, 20, 21])
def test_matches_lu_inverse(n):
    k = _spd(jax.random.PRNGKey(0), 4, n, 1e4, jnp.float64)
    got = spd_inverse(k)
    want = jnp.linalg.inv(k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-8, atol=1e-10)


def test_unbatched_and_jit():
    k = _spd(jax.random.PRNGKey(1), 1, 12, 1e3, jnp.float64)[0]
    got = jax.jit(spd_inverse)(k)
    np.testing.assert_allclose(
        np.asarray(k @ got), np.eye(12), atol=1e-9
    )
    # symmetric output
    np.testing.assert_allclose(np.asarray(got), np.asarray(got.T))


def test_f32_residual_small():
    k = _spd(jax.random.PRNGKey(2), 64, 20, 1e3, jnp.float32)
    got = spd_inverse(k)
    res = jnp.max(jnp.abs(k @ got - jnp.eye(20, dtype=jnp.float32)))
    assert float(res) < 5e-2  # comparable to LU at this conditioning


def test_singular_gives_nonfinite():
    k = jnp.zeros((5, 5))
    out = spd_inverse(k)
    assert not bool(jnp.all(jnp.isfinite(out)))


def test_ridge():
    k = jnp.zeros((4, 4), jnp.float64)
    out = spd_inverse(k, eps=2.0)
    np.testing.assert_allclose(np.asarray(out), np.eye(4) / 2.0)
