import jax
import jax.numpy as jnp
import numpy as np

from koopmanx import configs as C
from koopmanx.edmd.rls import (
    chol_rank1_update,
    rls_init,
    rls_update_ab,
    rls_update_c,
    sqrt_rls_init,
    sqrt_rls_model,
    sqrt_rls_update_ab,
    sqrt_rls_update_c,
)
from koopmanx.run import build_pipeline, run_single
from koopmanx.types import model_from_rls


def test_chol_rank1_update():
    rng = np.random.RandomState(0)
    r = np.triu(rng.randn(6, 6))
    r[np.diag_indices(6)] = np.abs(r[np.diag_indices(6)]) + 1.0
    v = rng.randn(6)
    r2 = chol_rank1_update(jnp.asarray(r), jnp.asarray(v))
    np.testing.assert_allclose(
        np.asarray(r2.T @ r2), r.T @ r + np.outer(v, v), rtol=1e-10
    )
    # result stays upper triangular
    assert np.allclose(np.tril(np.asarray(r2), -1), 0.0)


def test_sqrt_rls_matches_sm_rls_in_f64():
    """In f64 the square-root form and the reference's Sherman–Morrison
    form produce the same model."""
    nlift, m, n = 5, 1, 2
    sm = rls_init(nlift, m, n, 1e4, 1e2, jnp.float64)
    sq = sqrt_rls_init(nlift, m, n, 1e4, 1e2, jnp.float64)
    rng = np.random.RandomState(1)
    for _ in range(30):
        z = jnp.asarray(rng.randn(nlift))
        u = jnp.asarray(rng.randn(m))
        zn = jnp.asarray(rng.randn(nlift))
        xt = jnp.asarray(rng.randn(n))
        sm = rls_update_ab(sm, z, u, zn)
        sm = rls_update_c(sm, z, xt)
        sq = sqrt_rls_update_ab(sq, z, u, zn)
        sq = sqrt_rls_update_c(sq, z, xt)
    m_sm = model_from_rls(sm, nlift)
    m_sq = sqrt_rls_model(sq, nlift)
    np.testing.assert_allclose(np.asarray(m_sq.A), np.asarray(m_sm.A), atol=1e-8)
    np.testing.assert_allclose(np.asarray(m_sq.B), np.asarray(m_sm.B), atol=1e-8)
    np.testing.assert_allclose(np.asarray(m_sq.C), np.asarray(m_sm.C), atol=1e-8)


def test_sqrt_rls_is_f32_stable_where_sm_is_not():
    """The f32 Tank loop diverges with SM-RLS (observed) but tracks with
    square-root RLS — the production f32 configuration."""
    cfg = C.tank_preset()
    cfg.steps = 300
    cfg.dtype = "float32"
    cfg.data = C.DataConfig(n_step=40, n_traj=40, u_range=(-5.0, 5.0), clamp_x0=True)
    # the f32 production recipe: sqrt RLS + ridge trickle + normalized lift
    cfg.update.mode = "rls_sqrt"
    cfg.update.ridge = 3e-2
    cfg.lift.normalize = True
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    x2 = np.asarray(log.x[:, 1], dtype=np.float64)
    assert np.isfinite(np.asarray(log.x)).all()
    # pre-switch window settles near 1
    assert abs(x2[60:100].mean() - 1.0) < 0.25, x2[80:100]


def test_rls_chol_mode_tracks():
    """Gram-carry + Newton-Schulz extraction ('rls_chol') — the fastest
    f32 estimator — closes the duffing loop."""
    cfg = C.duffing_nn_preset()
    cfg.steps = 150
    cfg.update.mode = "rls_chol"
    cfg.data = C.DataConfig(n_step=40, n_traj=40)
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    x1 = np.asarray(log.x[:, 0], dtype=np.float64)
    assert np.isfinite(x1).all()
    assert abs(x1[-20:].mean() - 1.0) < 0.1


def test_windowed_estimator_readapts_through_switch_f32():
    """The sliding-window estimator (ring buffer + per-step Schulz refit)
    fully re-adapts the f32 Tank loop through the plant switch — the
    scenario where unbounded-history RLS converges to a biased equilibrium."""
    cfg = C.tank_preset()
    cfg.steps = 700
    cfg.dtype = "float32"
    cfg.data = C.DataConfig(n_step=40, n_traj=40, u_range=(-5.0, 5.0), clamp_x0=True)
    cfg.update.mode = "windowed"
    cfg.update.window = 256
    pipe = build_pipeline(cfg)
    _, log = run_single(pipe)
    x2 = np.asarray(log.x[:, 1], dtype=np.float64)
    assert np.isfinite(np.asarray(log.x)).all()
    assert abs(x2[-60:].mean() - 1.0) < 0.1, x2[-10:]


def test_windowed_refit_cadence_and_scheduled_filter_readapt():
    """The perf schedule (refit every k-th step + shorter late Schulz
    chain) must keep the windowed estimator's defining property: full f32
    re-adaptation through the Tank plant switch — AND keep the warm-up
    transient bounded (the static short chain violated it, BENCHMARKS.md
    'Tank-path attribution')."""
    def run(knobs):
        cfg = C.tank_preset()
        cfg.steps = 700
        cfg.dtype = "float32"
        cfg.data = C.DataConfig(
            n_step=40, n_traj=40, u_range=(-5.0, 5.0), clamp_x0=True
        )
        for k, v in knobs.items():
            setattr(cfg.update, k, v)
        pipe = build_pipeline(cfg)
        _, log = run_single(pipe)
        return np.asarray(log.x[:, 1], dtype=np.float64), cfg.switch_step

    x2_def, sw = run({})
    x2, _ = run({
        "window_refit_every": 4,
        "window_filter_late": 12,
        "window_filter_warmup": 300,
    })
    assert np.isfinite(x2).all()
    assert abs(x2[-60:].mean() - 1.0) < 0.1, x2[-10:]
    # warm-up gate: the schedule refits EVERY step with the long chain
    # during warm-up, so the pre-switch transient must match the default
    # path (a 4-step-stale model during the sparse-window phase blew it
    # to 1.65 before the warm-up gating of the cadence)
    assert x2[:sw].max() <= x2_def[:sw].max() + 1e-3, (
        x2[:sw].max(), x2_def[:sw].max()
    )


def test_tank_default_cadence_inert_under_warmup():
    """The tank preset's production refit cadence (window_refit_every=8,
    the round-4 20.7 ms/step default) is BIT-IDENTICAL to every-step refit
    for any run shorter than the 300-step warm-up — the warm-up phase
    always refits, so short runs (every CPU test, the 120-step parity
    gate) are untouched by the perf schedule."""
    def run(refit_every):
        cfg = C.tank_preset()
        assert cfg.update.window_refit_every == 8  # production default
        cfg.update.window_refit_every = refit_every
        cfg.steps = 250
        cfg.dtype = "float32"
        cfg.data = C.DataConfig(
            n_step=40, n_traj=40, u_range=(-5.0, 5.0), clamp_x0=True
        )
        pipe = build_pipeline(cfg)
        _, log = run_single(pipe)
        return np.asarray(log.x)

    np.testing.assert_array_equal(run(8), run(1))


def test_windowed_unit_semantics():
    """Ring-buffer mechanics + refit equals a direct lstsq on the window."""
    import jax

    from koopmanx.edmd.windowed import (
        window_init,
        window_model,
        window_update,
    )

    rng = np.random.RandomState(0)
    w, nlift, m, n = 16, 3, 1, 2
    st = window_init(w, nlift, m, n, jnp.float64)
    obs = []
    for i in range(20):  # wraps past W
        z, u, zn, xt = rng.randn(nlift), rng.randn(m), rng.randn(nlift), rng.randn(n)
        st = window_update(st, jnp.asarray(z), jnp.asarray(u), jnp.asarray(zn), jnp.asarray(xt))
        obs.append((z, u, zn, xt))
    last = obs[-w:]
    v = np.array([np.concatenate([z, u]) for z, u, _, _ in last])
    zy = np.array([zn for _, _, zn, _ in last])
    ridge = 1e-6
    k_ref = np.linalg.solve(v.T @ v + ridge * np.eye(nlift + m), v.T @ zy).T
    model = window_model(st, nlift, ridge=ridge)
    np.testing.assert_allclose(np.asarray(model.A), k_ref[:, :nlift], atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.B), k_ref[:, nlift:], atol=1e-6)


def test_window_carry_woodbury_matches_exact_refit():
    """The Woodbury lane's carried statistics track the exact window
    normal equations: after wrapping the ring several times (including
    evicting the zero rows of a partial prefill), the carried-inverse
    extraction equals a from-scratch exact refit at f64 tightness."""
    import jax

    from koopmanx.edmd.windowed import (
        window_init,
        window_model_carry,
        window_reanchor,
        window_update_carry,
    )

    rng = np.random.RandomState(3)
    w, nlift, m, n = 16, 4, 2, 2
    ridge = 1e-3
    st = window_init(w, nlift, m, n, jnp.float64, carry=True, ridge=ridge)
    obs = []
    for i in range(41):  # 2.5 wraps
        z, u, zn, xt = (
            rng.randn(nlift), rng.randn(m), rng.randn(nlift), rng.randn(n)
        )
        st = window_update_carry(
            st, jnp.asarray(z), jnp.asarray(u), jnp.asarray(zn),
            jnp.asarray(xt), polish=1,
        )
        obs.append((z, u, zn, xt))
    last = obs[-w:]
    v = np.array([np.concatenate([z, u]) for z, u, _, _ in last])
    zy = np.array([zn for _, _, zn, _ in last])
    zx = np.array([z for z, _, _, _ in last])
    xs = np.array([xt for _, _, _, xt in last])
    k_ref = np.linalg.solve(
        v.T @ v + ridge * np.eye(nlift + m), v.T @ zy
    ).T
    c_ref = np.linalg.solve(
        zx.T @ zx + ridge * np.eye(nlift), zx.T @ xs
    ).T
    model = window_model_carry(st, nlift)
    np.testing.assert_allclose(np.asarray(model.A), k_ref[:, :nlift],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(model.B), k_ref[:, nlift:],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(model.C), c_ref, atol=1e-9)
    # the anchor rebuild is a fixed point of already-exact statistics
    st2 = window_reanchor(st, ridge)
    for a, b in zip(st, st2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_window_carry_woodbury_f32_closed_loop_consistency():
    """f32, many wraps, with NS polish: the carried inverse stays within
    f32 working accuracy of the exact window inverse (the self-correcting
    drift claim), including through an abrupt data-regime change."""
    from koopmanx.edmd.windowed import (
        window_init,
        window_update_carry,
    )

    rng = np.random.RandomState(5)
    w, nlift, m, n = 32, 6, 2, 2
    ridge = 3e-2
    st = window_init(w, nlift, m, n, jnp.float32, carry=True, ridge=ridge)
    scale = 1.0
    worst = 0.0
    for i in range(300):
        if i == 150:
            scale = 4.0  # regime change: new rows 16x the Gram energy
        z = (scale * rng.randn(nlift)).astype(np.float32)
        u = (scale * rng.randn(m)).astype(np.float32)
        zn = (scale * rng.randn(nlift)).astype(np.float32)
        xt = rng.randn(n).astype(np.float32)
        st = window_update_carry(
            st, jnp.asarray(z), jnp.asarray(u), jnp.asarray(zn),
            jnp.asarray(xt), polish=1,
        )
        if i % 50 == 49:
            res = np.abs(
                np.asarray(st.g, np.float64) @ np.asarray(st.g_inv, np.float64)
                - np.eye(nlift + m)
            ).max()
            worst = max(worst, res)
    assert worst < 5e-3, worst


def test_window_bf16_ring_consistency():
    """Compressed (bf16) ring storage: (a) the chain-lane refit computes
    at full precision on the quantized data — its model matches an f32
    refit on pre-quantized rows exactly; (b) the Woodbury lane's carried
    Grams track the quantized buffer contents bit-consistently through
    wraps (the quantize-before-use rule), so reanchor is a fixed point."""
    from koopmanx.edmd.windowed import (
        window_init,
        window_model,
        window_model_carry,
        window_reanchor,
        window_update,
        window_update_carry,
    )

    rng = np.random.RandomState(11)
    w, nlift, m, n = 12, 4, 1, 2
    ridge = 1e-2

    # (a) chain lane
    st16 = window_init(w, nlift, m, n, jnp.float32,
                       store_dtype=jnp.bfloat16)
    st32 = window_init(w, nlift, m, n, jnp.float32)
    for i in range(30):
        z, u, zn, xt = (rng.randn(nlift).astype(np.float32),
                        rng.randn(m).astype(np.float32),
                        rng.randn(nlift).astype(np.float32),
                        rng.randn(n).astype(np.float32))
        st16 = window_update(st16, jnp.asarray(z), jnp.asarray(u),
                             jnp.asarray(zn), jnp.asarray(xt))
        # f32 buffer fed the PRE-QUANTIZED rows: same data, so the models
        # must agree to f32 arithmetic noise
        qz = jnp.asarray(z).astype(jnp.bfloat16).astype(jnp.float32)
        qu = jnp.asarray(u).astype(jnp.bfloat16).astype(jnp.float32)
        qzn = jnp.asarray(zn).astype(jnp.bfloat16).astype(jnp.float32)
        qxt = jnp.asarray(xt).astype(jnp.bfloat16).astype(jnp.float32)
        st32 = window_update(st32, qz, qu, qzn, qxt)
    m16 = window_model(st16, nlift, ridge=ridge, schulz_iters=0)
    m32 = window_model(st32, nlift, ridge=ridge, schulz_iters=0)
    np.testing.assert_allclose(np.asarray(m16.A), np.asarray(m32.A),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m16.C), np.asarray(m32.C),
                               atol=1e-5)

    # (b) Woodbury lane on a bf16 ring
    st = window_init(w, nlift, m, n, jnp.float32, carry=True,
                     ridge=ridge, store_dtype=jnp.bfloat16)
    for i in range(30):
        st = window_update_carry(
            st,
            jnp.asarray(rng.randn(nlift), jnp.float32),
            jnp.asarray(rng.randn(m), jnp.float32),
            jnp.asarray(rng.randn(nlift), jnp.float32),
            jnp.asarray(rng.randn(n), jnp.float32),
            polish=1,
        )
    st2 = window_reanchor(st, ridge)
    # reanchor (recompute from the bf16 buffers) must agree with the
    # carried statistics — the quantize-before-use rule at work
    np.testing.assert_allclose(np.asarray(st.g), np.asarray(st2.g),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(st.mg), np.asarray(st2.mg),
                               atol=2e-4)
    model = window_model_carry(st, nlift)
    assert np.isfinite(np.asarray(model.A)).all()


def test_window_carry_divergence_recovery():
    """The Woodbury lane's divergence safeguard: a corrupted carried
    inverse (the observed f32 blow-up mode) is detected from the polish's
    free residual and restarted from the Schulz seed; subsequent per-step
    polish reconverges it — the state NEVER goes non-finite (which would
    freeze the engine's rls-finiteness guard forever)."""
    from koopmanx.edmd.windowed import (
        window_init,
        window_update_carry,
    )

    rng = np.random.RandomState(9)
    w, nlift, m, n = 32, 8, 1, 2
    ridge = 3e-2
    st = window_init(w, nlift, m, n, jnp.float32, carry=True, ridge=ridge)
    step = lambda s: window_update_carry(
        s,
        jnp.asarray(rng.randn(nlift), jnp.float32),
        jnp.asarray(rng.randn(m), jnp.float32),
        jnp.asarray(rng.randn(nlift), jnp.float32),
        jnp.asarray(rng.randn(n), jnp.float32),
        polish=1,
    )
    for _ in range(60):
        st = step(st)
    # corrupt the carry the way the f32 failure manifests (huge values on
    # their way to inf)
    st = st._replace(g_inv=st.g_inv * 1e12)
    res_hist = []
    for i in range(60):
        st = step(st)
        assert np.isfinite(np.asarray(st.g_inv)).all(), i
        res = np.abs(
            np.asarray(st.g, np.float64) @ np.asarray(st.g_inv, np.float64)
            - np.eye(nlift + m)
        ).max()
        res_hist.append(res)
    # recovered to a working inverse
    assert res_hist[-1] < 1e-2, res_hist[-5:]
    # and an already-infinite carry also recovers (where() selects the
    # seed, SM-on-inf produces NaN that the residual check catches)
    st = st._replace(g_inv=st.g_inv * np.float32(np.inf))
    for i in range(60):
        st = step(st)
        assert np.isfinite(np.asarray(st.g_inv)).all(), i
    res = np.abs(
        np.asarray(st.g, np.float64) @ np.asarray(st.g_inv, np.float64)
        - np.eye(nlift + m)
    ).max()
    assert res < 1e-2, res
