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


def test_gj_inverse_general_matrices():
    from koopmanx.ops.linalg import gj_inverse

    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (8, 12, 12), jnp.float64)
    got = gj_inverse(a)
    want = jnp.linalg.inv(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-11)


def test_gj_inverse_needs_pivoting():
    """Zero leading pivot: pivot-free elimination would produce NaN."""
    from koopmanx.ops.linalg import gj_inverse

    a = jnp.array([[0.0, 1.0], [1.0, 0.0]], jnp.float64)
    got = gj_inverse(a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(a))  # own inverse


def test_gj_solve_dare_operand_shape():
    """(I + G H)^{-1} A — the doubling-DARE solve, batched."""
    from koopmanx.ops.linalg import gj_solve

    key = jax.random.PRNGKey(4)
    b1 = jax.random.normal(key, (4, 8, 2), jnp.float64)
    g = jnp.einsum("bij,bkj->bik", b1, b1)
    h = _spd(jax.random.PRNGKey(5), 4, 8, 1e2, jnp.float64)
    a = jax.random.normal(jax.random.PRNGKey(6), (4, 8, 8), jnp.float64)
    m = jnp.eye(8) + g @ h
    got = gj_solve(m, a)
    want = jnp.linalg.solve(m, a)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-8, atol=1e-10)


def test_spd_inverse_blocked_matches_scalar():
    """Block Gauss-Jordan (block=r) inverts identically to the scalar path
    (f64) and at LEAST as accurately at f32/cond 1e3 — the block rows are
    normalized by in-block scalar GJ, avoiding the scalar path's
    cancellation trick (measured f32 residual 8e-6 blocked vs 2.7e-4
    scalar at n=40)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for n in (6, 20, 40, 43):  # 43: non-divisible tail block
        a = rng.normal(size=(5, n, n))
        k = jnp.asarray(a @ a.transpose(0, 2, 1) + n * np.eye(n))
        ref = jnp.linalg.inv(k)
        for blk in (2, 4, 8):
            got = spd_inverse(k, block=blk)
            assert jnp.max(jnp.abs(got - ref)) < 1e-8 * jnp.max(
                jnp.abs(ref)
            ) + 1e-10, (n, blk)

    # f32, ill-conditioned: blocked must be no worse than scalar
    lam = np.logspace(0, 3, 40)
    q, _ = np.linalg.qr(rng.normal(size=(8, 40, 40)))
    k32 = jnp.asarray(
        np.einsum("bij,j,bkj->bik", q, lam, q), jnp.float32
    )
    k64 = np.asarray(k32, np.float64)

    def res(blk):
        out = np.asarray(spd_inverse(k32, block=blk), np.float64)
        return np.abs(
            np.einsum("bij,bjk->bik", k64, out) - np.eye(40)
        ).max()

    r1 = res(1)
    for blk in (2, 4):
        assert res(blk) <= 2.0 * r1, (blk, res(blk), r1)
