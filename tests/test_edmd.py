import jax
import jax.numpy as jnp
import numpy as np

from koopmanx.edmd import (
    edmd_fit,
    edmd_fit_pinv_direct,
    fit_from_grams,
    gram_stats,
    rls_init,
    rls_init_from_grams,
    rls_update_ab,
    rls_update_c,
    storage_init,
    storage_model,
    storage_update,
)
from koopmanx.eval import oracle
from koopmanx.lifts import identity_dictionary
from koopmanx.systems.data import Snapshots
from koopmanx.types import model_from_rls


def _linear_system_data(key, s=400, n=3, m=1):
    """Snapshots from a known linear system: EDMD with identity lift must
    recover (A, B) exactly."""
    a = jnp.array([[0.9, 0.1, 0.0], [0.0, 0.8, 0.05], [0.02, 0.0, 0.95]])
    b = jnp.array([[0.1], [0.2], [0.0]])
    kx, ku = jax.random.split(key)
    x = jax.random.normal(kx, (s, n), dtype=jnp.float64)
    u = jax.random.normal(ku, (s, m), dtype=jnp.float64)
    y = x @ a.T + u @ b.T
    return Snapshots(x=x, y=y, u=u), a, b


def test_edmd_recovers_linear_system():
    data, a, b = _linear_system_data(jax.random.PRNGKey(0))
    d = identity_dictionary(3)
    model = edmd_fit(d, data)
    np.testing.assert_allclose(np.asarray(model.A), np.asarray(a), atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.B), np.asarray(b), atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.C), np.eye(3), atol=1e-8)


def test_gram_path_matches_direct_pinv():
    data, _, _ = _linear_system_data(jax.random.PRNGKey(1))
    d = identity_dictionary(3)
    m1 = edmd_fit(d, data, method="pinv")
    m2 = edmd_fit_pinv_direct(d, data)
    np.testing.assert_allclose(np.asarray(m1.A), np.asarray(m2.A), atol=1e-7)
    np.testing.assert_allclose(np.asarray(m1.C), np.asarray(m2.C), atol=1e-7)


def test_edmd_matches_numpy_oracle():
    data, _, _ = _linear_system_data(jax.random.PRNGKey(2))
    a, b, c = oracle.edmd_pinv(
        np.asarray(data.x), np.asarray(data.y), np.asarray(data.u), np.asarray(data.x)
    )
    model = edmd_fit(identity_dictionary(3), data)
    np.testing.assert_allclose(np.asarray(model.A), a, atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.B), b, atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.C), c, atol=1e-8)


def test_rls_update_matches_oracle_recursion():
    nlift, m, n = 4, 1, 2
    state = rls_init(nlift, m, n, c_ab=1e4, c_c=1e2, dtype=jnp.float64)
    k_a = np.zeros((nlift, nlift + m))
    inv_g = 1e4 * np.eye(nlift + m)
    bar_x = np.zeros((n, nlift))
    bar_q = 1e2 * np.eye(nlift)
    rng = np.random.RandomState(0)
    for _ in range(20):
        z = rng.randn(nlift)
        u = rng.randn(m)
        z_next = rng.randn(nlift)
        x_t = rng.randn(n)
        state = rls_update_ab(state, jnp.asarray(z), jnp.asarray(u), jnp.asarray(z_next))
        state = rls_update_c(state, jnp.asarray(z), jnp.asarray(x_t))
        k_a, inv_g = oracle.rls_ab_step(k_a, inv_g, z, u, z_next)
        bar_x, bar_q = oracle.rls_c_step(bar_x, bar_q, z, x_t)
    np.testing.assert_allclose(np.asarray(state.K_A), k_a, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(state.invG), inv_g, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(state.barX), bar_x, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(state.barQ), bar_q, rtol=1e-7)


def test_sherman_morrison_tracks_true_inverse():
    """invG after k updates == inv(G0 + sum v v^T) (the SM identity)."""
    d = 5
    state = rls_init(4, 1, 2, c_ab=100.0, dtype=jnp.float64)
    g_direct = np.eye(d) / 100.0
    rng = np.random.RandomState(1)
    vs = rng.randn(12, d)
    for v in vs:
        z, u = jnp.asarray(v[:4]), jnp.asarray(v[4:])
        state = rls_update_ab(state, z, u, jnp.zeros(4, dtype=jnp.float64))
        g_direct += np.outer(v, v)
    np.testing.assert_allclose(
        np.asarray(state.invG), np.linalg.inv(g_direct), rtol=1e-6
    )


def test_rls_warm_start_converges_to_refit():
    """Warm-started RLS after extra observations ~= batch refit on all data
    (Revise_2/Koopman_update.m:264-265 warm start semantics)."""
    data, a_true, b_true = _linear_system_data(jax.random.PRNGKey(3), s=200)
    d = identity_dictionary(3)
    stats = gram_stats(data.x, data.y, data.u, data.x)
    state = rls_init_from_grams(stats)
    # feed 50 more snapshots one at a time
    extra, _, _ = _linear_system_data(jax.random.PRNGKey(4), s=50)
    for i in range(50):
        state = rls_update_ab(state, extra.x[i], extra.u[i], extra.y[i])
        state = rls_update_c(state, extra.x[i], extra.x[i])
    model = model_from_rls(state, 3)
    np.testing.assert_allclose(np.asarray(model.A), np.asarray(a_true), atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.B), np.asarray(b_true), atol=1e-6)


def test_storage_method_equals_batch_refit():
    data, _, _ = _linear_system_data(jax.random.PRNGKey(5), s=100)
    d = identity_dictionary(3)
    stats = gram_stats(data.x[:80], data.y[:80], data.u[:80], data.x[:80])
    st = storage_init(stats)
    for i in range(80, 100):
        st = storage_update(st, data.x[i], data.u[i], data.y[i], data.x[i])
    m_stream = storage_model(st, 3)
    m_batch = edmd_fit(d, data)
    np.testing.assert_allclose(np.asarray(m_stream.A), np.asarray(m_batch.A), atol=1e-7)
    np.testing.assert_allclose(np.asarray(m_stream.C), np.asarray(m_batch.C), atol=1e-7)


def test_forgetting_factor_discounts_history():
    state = rls_init(2, 1, 1, c_ab=1e4, dtype=jnp.float64)
    rng = np.random.RandomState(2)
    lam = 0.95
    inv_g = 1e4 * np.eye(3)
    k_a = np.zeros((2, 3))
    for _ in range(10):
        z, u, zn = rng.randn(2), rng.randn(1), rng.randn(2)
        state = rls_update_ab(state, jnp.asarray(z), jnp.asarray(u), jnp.asarray(zn), lam=lam)
        k_a, inv_g = oracle.rls_ab_step(k_a, inv_g, z, u, zn, lam=lam)
    np.testing.assert_allclose(np.asarray(state.invG), inv_g, rtol=1e-7)
