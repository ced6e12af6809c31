import numpy as np
import pytest

from koopmanx.eval import oracle
from koopmanx.ops import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _random_spd(rng, n):
    m = rng.randn(n, n)
    return m @ m.T + 0.5 * np.eye(n)


def test_boxqp_unconstrained_interior():
    rng = np.random.RandomState(0)
    p = _random_spd(rng, 6)
    x_star = rng.randn(6) * 0.1
    q = -p @ x_star  # unconstrained optimum strictly inside wide bounds
    x = native.boxqp_solve(p, q, -1e3, 1e3)
    np.testing.assert_allclose(x, x_star, atol=1e-10)


def test_boxqp_matches_scipy_on_active_bounds():
    rng = np.random.RandomState(1)
    for _ in range(5):
        p = _random_spd(rng, 8)
        q = rng.randn(8) * 3
        x = native.boxqp_solve(p, q, -0.5, 0.5)
        ref = oracle.solve_box_qp_scipy(p, q, -0.5, 0.5)
        np.testing.assert_allclose(x, ref, atol=1e-6)
        assert (x >= -0.5 - 1e-12).all() and (x <= 0.5 + 1e-12).all()


def test_boxqp_batched():
    rng = np.random.RandomState(2)
    ps = np.stack([_random_spd(rng, 5) for _ in range(4)])
    qs = rng.randn(4, 5)
    xs = native.boxqp_solve(ps, qs, -1.0, 1.0)
    for k in range(4):
        single = native.boxqp_solve(ps[k], qs[k], -1.0, 1.0)
        np.testing.assert_allclose(xs[k], single, atol=1e-12)


def test_admm_validated_against_native_oracle():
    """The TPU ADMM solver agrees with the exact native active-set solver
    (quadprog-semantics parity, SURVEY §7.4)."""
    import jax.numpy as jnp

    from koopmanx.control import ADMMConfig, solve_box_qp

    rng = np.random.RandomState(3)
    p = _random_spd(rng, 10)
    q = rng.randn(10) * 2
    exact = native.boxqp_solve(p, q, -1.0, 1.0)
    sol = solve_box_qp(
        jnp.asarray(p), jnp.asarray(q), -1.0, 1.0, ADMMConfig(iters=500)
    )
    np.testing.assert_allclose(np.asarray(sol.x), exact, atol=2e-5)
