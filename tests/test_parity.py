"""Golden-trajectory parity vs the float64 NumPy oracle of the reference.

Three gates (SURVEY §7.2):
  gate 2 — batch EDMD fit on the reference's exact seed-101 dataset;
  gate 2b — open-loop prediction replay RMSE;
  gate 5 — closed-loop trajectories (QP engine vs L-BFGS-B oracle).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx.edmd import edmd_fit
from koopmanx.engine.loop import EngineConfig, make_closed_loop
from koopmanx.engine import ref as refgen
from koopmanx.engine.loop import MPCParams
from koopmanx.edmd.rls import rls_init
from koopmanx.eval import parity
from koopmanx.eval.openloop import openloop_validate
from koopmanx.lifts.io import load_mat_mlp
from koopmanx.lifts.mlp import encoder_dictionary
from koopmanx.systems import DUFFING, from_reference_layout
from koopmanx.types import LinearModel

WEIGHTS = "/root/reference/Revise_2/duffing_weights.mat"


@pytest.fixture(scope="module")
def reference_setup():
    X, Y, U = parity.generate_duffing_data(seed=101, n_step=60, n_traj=60)
    enc = parity.load_encoder_np(WEIGHTS)
    a0, b0, c0 = parity.edmd_fit_np(enc, X, Y, U)
    return X, Y, U, enc, a0, b0, c0


def test_edmd_fit_parity(reference_setup):
    """Gate 2: our Gram-path EDMD on the identical snapshot set matches the
    oracle's pinv fit."""
    X, Y, U, enc, a0, b0, c0 = reference_setup
    data = from_reference_layout(X, Y, U)
    d = encoder_dictionary(load_mat_mlp(WEIGHTS, dtype=jnp.float64), n=2)
    model = edmd_fit(d, data, method="pinv")
    np.testing.assert_allclose(np.asarray(model.A), a0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.B), b0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.C), c0, atol=1e-5)


def test_openloop_replay_parity(reference_setup):
    """Gate 2b: free-run the lifted model along the recorded inputs; our
    replay must equal the oracle's replay step-for-step."""
    X, Y, U, enc, a0, b0, c0 = reference_setup
    plot_t = 100
    # oracle replay (duffing.py:264-344 semantics, no re-encode markers)
    z = parity.encoder_forward(enc, X[:, :1]).ravel()
    y_oracle = []
    for i in range(plot_t):
        y_oracle.append(c0 @ z)
        z = a0 @ z + b0[:, 0] * U[0, i]
    y_oracle = np.stack(y_oracle)

    d = encoder_dictionary(load_mat_mlp(WEIGHTS, dtype=jnp.float64), n=2)
    model = LinearModel(
        A=jnp.asarray(a0), B=jnp.asarray(b0), C=jnp.asarray(c0)
    )
    res = openloop_validate(
        model,
        d,
        jnp.asarray(X.T[:plot_t]),
        jnp.asarray(U.T[:plot_t]),
        reencode_every=0,
    )
    np.testing.assert_allclose(np.asarray(res.y_pred), y_oracle, atol=1e-8)
    # and the reference's RMSE formula agrees
    rmse_oracle = np.linalg.norm((y_oracle[:, 0] - X[0, :plot_t]) / plot_t)
    np.testing.assert_allclose(float(res.rmse_ref), rmse_oracle, rtol=1e-6)


@pytest.mark.parametrize("update", [False, True])
def test_closed_loop_parity(reference_setup, update):
    """Gate 5: closed-loop trajectory of the QP engine vs the L-BFGS-B
    oracle on the same model/weights. The solvers differ (condensed QP
    solved to optimality vs L-BFGS-B), so parity is on the trajectory
    within tolerance, not bitwise (SURVEY §7.4)."""
    X, Y, U, enc, a0, b0, c0 = reference_setup
    steps = 80
    log_x_o, log_u_o = parity.duffing_closed_loop_oracle(
        enc, a0, b0, c0, steps=steps, update=update
    )

    d = encoder_dictionary(load_mat_mlp(WEIGHTS, dtype=jnp.float64), n=2)
    cfg = EngineConfig(
        horizon=10,
        steps=steps,
        update="rls" if update else "off",
        c_pairing="next",
        symmetrize=False,
        switch_step=10**9,
        qp_iters=150,
        qp_rho=0.1,
    )
    ref_fn = refgen.constant(
        jnp.array([1.0, 0.0], dtype=jnp.float64), 10, 2, jnp.float64
    )
    loop = make_closed_loop(DUFFING, d, cfg, ref_fn)
    params = MPCParams(
        q_block=100.0 * jnp.eye(2, dtype=jnp.float64),
        r_block=1e-4 * jnp.eye(1, dtype=jnp.float64),
        u_min=jnp.array([-2.0], dtype=jnp.float64),
        u_max=jnp.array([2.0], dtype=jnp.float64),
    )
    model0 = LinearModel(
        A=jnp.asarray(a0), B=jnp.asarray(b0), C=jnp.asarray(c0)
    )
    rls0 = rls_init(8, 1, 2, c_ab=1e4, c_c=1e2, dtype=jnp.float64)
    _, log = jax.jit(loop)(
        params, jnp.array([-2.0, -2.0], dtype=jnp.float64), model0, rls0
    )
    x_ours = np.asarray(log.x)
    err = np.abs(x_ours - log_x_o).max()
    # observed ~1.3e-3: the only deviations come from L-BFGS-B stopping
    # short of the QP optimum on saturated steps
    assert err < 0.02, (
        f"max traj deviation {err}; ours tail {x_ours[-3:,0]}, "
        f"oracle tail {log_x_o[-3:,0]}"
    )
    # u shows isolated transient spikes (max ~0.31 observed with the
    # online update) where L-BFGS-B stops short of the QP optimum; the
    # state trajectory is the parity criterion, u just must stay close
    u_err = np.abs(np.asarray(log.u) - log_u_o).max()
    assert u_err < 0.5


@pytest.mark.parametrize("update", [False, True])
def test_closed_loop_exact_qp_parity(reference_setup, update):
    """Gate 5-tight: engine vs the EXACT condensed-QP oracle (same convex
    problem solved to optimality by scipy). Unlike the L-BFGS-B gate this
    carries no solver-stopping-short slop, so it pins the engine (QP build
    + ADMM + RLS + plant chain) at ~1e-7 — a real engine regression cannot
    hide here."""
    X, Y, U, enc, a0, b0, c0 = reference_setup
    steps = 80
    log_x_o, log_u_o = parity.duffing_closed_loop_oracle_qp(
        enc, a0, b0, c0, steps=steps, update=update
    )

    d = encoder_dictionary(load_mat_mlp(WEIGHTS, dtype=jnp.float64), n=2)
    cfg = EngineConfig(
        horizon=10,
        steps=steps,
        update="rls" if update else "off",
        c_pairing="next",
        symmetrize=False,
        switch_step=10**9,
        qp_iters=400,
        qp_rho=0.1,
    )
    ref_fn = refgen.constant(
        jnp.array([1.0, 0.0], dtype=jnp.float64), 10, 2, jnp.float64
    )
    loop = make_closed_loop(DUFFING, d, cfg, ref_fn)
    params = MPCParams(
        q_block=100.0 * jnp.eye(2, dtype=jnp.float64),
        r_block=1e-4 * jnp.eye(1, dtype=jnp.float64),
        u_min=jnp.array([-2.0], dtype=jnp.float64),
        u_max=jnp.array([2.0], dtype=jnp.float64),
    )
    model0 = LinearModel(A=jnp.asarray(a0), B=jnp.asarray(b0), C=jnp.asarray(c0))
    rls0 = rls_init(8, 1, 2, c_ab=1e4, c_c=1e2, dtype=jnp.float64)
    _, log = jax.jit(loop)(
        params, jnp.array([-2.0, -2.0], dtype=jnp.float64), model0, rls0
    )
    # observed: 9e-9 (static model) / 3.5e-8 (online RLS) state deviation
    x_err = np.abs(np.asarray(log.x) - log_x_o).max()
    u_err = np.abs(np.asarray(log.u) - log_u_o).max()
    assert x_err < 1e-6, x_err
    assert u_err < 1e-5, u_err


FLAGSHIP_PKL = "/root/reference/AutoEncoder_20220418_duffing_2.pkl"


def test_flagship_pkl_closed_loop_parity(reference_setup):
    """Gate 5-pkl: the reference flagship loads
    ``AutoEncoder_20220418_duffing_2.pkl`` (duffing.py:57); Revise_2's
    ``duffing_weights.mat`` is its exact export (duffing.py:61-64). Assert
    the weights are bit-identical AND run the closed-loop gate through the
    pkl-loaded (torch-free) dictionary against the exact-QP oracle."""
    from koopmanx.lifts.io import load_torch_autoencoder

    X, Y, U, enc, a0, b0, c0 = reference_setup
    enc_pkl, _ = load_torch_autoencoder(FLAGSHIP_PKL, dtype=jnp.float64)
    mat = load_mat_mlp(WEIGHTS, dtype=jnp.float64)
    for (w1, b1), (w2, b2) in zip(enc_pkl, mat):
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))

    steps = 40
    log_x_o, log_u_o = parity.duffing_closed_loop_oracle_qp(
        enc, a0, b0, c0, steps=steps, update=True
    )
    d = encoder_dictionary(enc_pkl, n=2)
    cfg = EngineConfig(
        horizon=10, steps=steps, update="rls", c_pairing="next",
        symmetrize=False, switch_step=10**9, qp_iters=400, qp_rho=0.1,
    )
    ref_fn = refgen.constant(
        jnp.array([1.0, 0.0], dtype=jnp.float64), 10, 2, jnp.float64
    )
    loop = make_closed_loop(DUFFING, d, cfg, ref_fn)
    params = MPCParams(
        q_block=100.0 * jnp.eye(2, dtype=jnp.float64),
        r_block=1e-4 * jnp.eye(1, dtype=jnp.float64),
        u_min=jnp.array([-2.0], dtype=jnp.float64),
        u_max=jnp.array([2.0], dtype=jnp.float64),
    )
    model0 = LinearModel(A=jnp.asarray(a0), B=jnp.asarray(b0), C=jnp.asarray(c0))
    rls0 = rls_init(8, 1, 2, c_ab=1e4, c_c=1e2, dtype=jnp.float64)
    _, log = jax.jit(loop)(
        params, jnp.array([-2.0, -2.0], dtype=jnp.float64), model0, rls0
    )
    assert np.abs(np.asarray(log.x) - log_x_o[:steps]).max() < 1e-6
    assert np.abs(np.asarray(log.u) - log_u_o[:steps]).max() < 1e-5


VDP_WEIGHTS = "/root/reference/VDP_Revise_2/Good_VDP.mat"


@pytest.fixture(scope="module")
def vdp_setup():
    X, Y, U = parity.generate_vdp_data(seed=101, n_step=60, n_traj=60)
    enc = parity.load_encoder_np(VDP_WEIGHTS)
    a0, b0, c0 = parity.edmd_fit_np(enc, X, Y, U)
    return X, Y, U, enc, a0, b0, c0


def test_vdp_closed_loop_parity_with_live_switch(vdp_setup):
    """Gate 5b: the VDP lifted-tracking loop — encoded reference, online
    RLS, and the LIVE plant-parameter switch (vanderpol.py:923-931) — vs
    the L-BFGS-B oracle."""
    from koopmanx.systems import VANDERPOL

    X, Y, U, enc, a0, b0, c0 = vdp_setup
    steps = 60
    switch = 40
    log_x_o, log_u_o = parity.vdp_closed_loop_oracle(
        enc, a0, b0, c0, steps=steps, update=True, switch_step=switch
    )

    d = encoder_dictionary(load_mat_mlp(VDP_WEIGHTS, dtype=jnp.float64), n=2)
    cfg = EngineConfig(
        horizon=10,
        steps=steps,
        update="rls",
        c_pairing="next",
        symmetrize=False,
        track_lifted=True,
        switch_step=switch + 1,  # reference rebuilds at end of body i>switch
        qp_iters=200,
        qp_rho=0.1,
    )
    base = refgen.constant_state(
        jnp.array([1.0, 0.0], dtype=jnp.float64), 10, dtype=jnp.float64
    )
    ref_fn = refgen.encoded(base, d, 2)
    loop = make_closed_loop(VANDERPOL, d, cfg, ref_fn)
    params = MPCParams(
        q_block=100.0 * jnp.eye(8, dtype=jnp.float64),
        r_block=1e-4 * jnp.eye(1, dtype=jnp.float64),
        u_min=jnp.array([-6.0], dtype=jnp.float64),
        u_max=jnp.array([6.0], dtype=jnp.float64),
    )
    model0 = LinearModel(A=jnp.asarray(a0), B=jnp.asarray(b0), C=jnp.asarray(c0))
    rls0 = rls_init(8, 1, 2, c_ab=1e5, c_c=1e5, dtype=jnp.float64)
    _, log = jax.jit(loop)(
        params, jnp.array([-2.0, -2.0], dtype=jnp.float64), model0, rls0
    )
    x_ours = np.asarray(log.x)
    err = np.abs(x_ours - log_x_o).max()
    assert err < 0.15, (
        f"max VDP traj deviation {err}; ours tail {x_ours[-3:,0]}, "
        f"oracle tail {log_x_o[-3:,0]}"
    )


def test_vdp_closed_loop_exact_qp_parity(vdp_setup):
    """Gate 5b-tight: the VDP lifted-tracking loop (encoded reference,
    online RLS, LIVE plant switch) vs the EXACT condensed-QP oracle —
    pins the track_lifted path at ~1e-7 without L-BFGS-B slop."""
    from koopmanx.systems import VANDERPOL

    X, Y, U, enc, a0, b0, c0 = vdp_setup
    steps = 60
    switch = 40
    log_x_o, log_u_o = parity.vdp_closed_loop_oracle_qp(
        enc, a0, b0, steps=steps, update=True, switch_step=switch
    )

    d = encoder_dictionary(load_mat_mlp(VDP_WEIGHTS, dtype=jnp.float64), n=2)
    cfg = EngineConfig(
        horizon=10,
        steps=steps,
        update="rls",
        c_pairing="next",
        symmetrize=False,
        track_lifted=True,
        switch_step=switch + 1,
        qp_iters=500,
        qp_rho=0.1,
    )
    base = refgen.constant_state(
        jnp.array([1.0, 0.0], dtype=jnp.float64), 10, dtype=jnp.float64
    )
    ref_fn = refgen.encoded(base, d, 2)
    loop = make_closed_loop(VANDERPOL, d, cfg, ref_fn)
    params = MPCParams(
        q_block=100.0 * jnp.eye(8, dtype=jnp.float64),
        r_block=1e-4 * jnp.eye(1, dtype=jnp.float64),
        u_min=jnp.array([-6.0], dtype=jnp.float64),
        u_max=jnp.array([6.0], dtype=jnp.float64),
    )
    model0 = LinearModel(A=jnp.asarray(a0), B=jnp.asarray(b0), C=jnp.asarray(c0))
    rls0 = rls_init(8, 1, 2, c_ab=1e5, c_c=1e5, dtype=jnp.float64)
    _, log = jax.jit(loop)(
        params, jnp.array([-2.0, -2.0], dtype=jnp.float64), model0, rls0
    )
    # observed: 1.4e-7 state / 1.2e-5 input at 500 ADMM iterations
    x_err = np.abs(np.asarray(log.x) - log_x_o).max()
    u_err = np.abs(np.asarray(log.u) - log_u_o).max()
    assert x_err < 1e-6, x_err
    assert u_err < 1e-4, u_err


def test_tank_delta_u_parity():
    """Gate 5c: the Tank Δu formulation — augmentation, exact-QP input
    constraints, scratch RLS with 'same' pairing, per-step rebuild — engine
    vs a NumPy oracle implementing Tank_System.m's loop on IDENTICAL data
    (MATLAB's rng(55) streams are not replicable in NumPy, so parity is
    engine-vs-oracle, not vs MATLAB runs)."""
    from koopmanx.engine.loop import EngineConfig, MPCParams, make_closed_loop
    from koopmanx.lifts import rbf_dictionary
    from koopmanx.systems import TANK, collect

    # shared data + dictionary
    data = collect(
        TANK,
        jax.random.PRNGKey(5),
        n_step=40,
        n_traj=40,
        u_range=(-5.0, 5.0),
        clamp_x0=True,
        dtype=jnp.float64,
    )
    centers = jax.random.uniform(jax.random.PRNGKey(6), (10, 2), dtype=jnp.float64)
    d = rbf_dictionary(centers, "thinplate")
    model0 = edmd_fit(d, data, method="pinv")
    a0, b0, c0 = (np.asarray(model0.A), np.asarray(model0.B), np.asarray(model0.C))

    def lift_np(x):
        return np.asarray(d(jnp.asarray(x, dtype=jnp.float64)))

    steps = 50
    log_x_o, log_u_o = parity.tank_closed_loop_oracle(
        lift_np, a0, b0, c0, steps=steps, switch_step=10**9
    )

    cfg = EngineConfig(
        horizon=20,
        steps=steps,
        delta_u=True,
        update="rls",
        c_pairing="same",
        symmetrize=False,
        switch_step=10**9,
        qp_iters=300,
        qp_rho=0.1,
    )
    ref_fn = refgen.constant(
        jnp.array([1.0], dtype=jnp.float64), 20, 1, jnp.float64
    )
    loop = make_closed_loop(TANK, d, cfg, ref_fn)
    params = MPCParams(
        q_block=10.0 * jnp.eye(1, dtype=jnp.float64),
        r_block=1e-3 * jnp.eye(1, dtype=jnp.float64),
        u_min=jnp.array([-0.5], dtype=jnp.float64),
        u_max=jnp.array([0.5], dtype=jnp.float64),
        cy=jnp.array([[0.0, 1.0]], dtype=jnp.float64),
        applied_min=jnp.array([-8.0], dtype=jnp.float64),
        applied_max=jnp.array([8.0], dtype=jnp.float64),
    )
    from koopmanx.edmd.rls import rls_init as rls_init_fn

    rls0 = rls_init_fn(10, 1, 2, c_ab=1e4, c_c=1e4, dtype=jnp.float64)
    _, log = jax.jit(loop)(
        params, jnp.zeros(2, dtype=jnp.float64), model0, rls0
    )
    x_ours = np.asarray(log.x)
    dev = np.abs(x_ours - log_x_o).max(axis=1)
    # scratch-RLS warm-up (steps ~5-30) is transiently solver-path
    # sensitive (both models are still garbage; ADMM vs exact-QP
    # differences amplify through the plant) but the loops re-converge:
    # observed profile peaks ~0.55 around step 20 and decays to ~0.01
    assert dev.max() < 0.8, dev.max()
    assert dev[-10:].max() < 0.05, dev[-10:]
    # both settle at r=1 on the tracked level
    assert abs(x_ours[-10:, 1].mean() - 1.0) < 0.05
    assert abs(log_x_o[-10:, 1].mean() - 1.0) < 0.05


def test_tank_delta_u_parity_warmstarted_tight():
    """Gate 5d (VERDICT r2 item 4): the Tank Δu loop pinned at exact-QP
    tightness. The scratch-RLS gate above measures solver-path sensitivity
    during the chaotic warm-up; HERE both the oracle's and the engine's
    RLS are warm-started from the SAME batch Grams
    (Revise_2/Koopman_update.m:264-265 protocol), so the estimates stay
    sane from step 0 and the Δu path must match like the Duffing/VDP
    exact-QP gates do (reference loop: Tank_System.m:107-290)."""
    from koopmanx.edmd.batch import gram_stats, lift_snapshots
    from koopmanx.edmd.rls import rls_init_from_grams
    from koopmanx.engine.loop import EngineConfig, MPCParams, make_closed_loop
    from koopmanx.lifts import rbf_dictionary
    from koopmanx.systems import TANK, collect

    data = collect(
        TANK,
        jax.random.PRNGKey(5),
        n_step=40,
        n_traj=40,
        u_range=(-5.0, 5.0),
        clamp_x0=True,
        dtype=jnp.float64,
    )
    centers = jax.random.uniform(jax.random.PRNGKey(6), (10, 2), dtype=jnp.float64)
    d = rbf_dictionary(centers, "thinplate")
    model0 = edmd_fit(d, data, method="pinv")
    a0, b0, c0 = (np.asarray(model0.A), np.asarray(model0.B), np.asarray(model0.C))

    zx, zy = lift_snapshots(d, data)
    stats = gram_stats(zx, zy, data.u, data.x)
    rls0 = rls_init_from_grams(stats)

    def lift_np(x):
        return np.asarray(d(jnp.asarray(x, dtype=jnp.float64)))

    # 120 steps: the Gram warm start carries 1600 snapshots of inertia,
    # so the level settles slower than the scratch loop — but stays
    # solver-tight the whole way
    steps = 120
    log_x_o, log_u_o = parity.tank_closed_loop_oracle(
        lift_np, a0, b0, c0, steps=steps, switch_step=10**9,
        rls_state0=(rls0.K_A, rls0.invG, rls0.barX, rls0.barQ),
    )

    cfg = EngineConfig(
        horizon=20,
        steps=steps,
        delta_u=True,
        update="rls",
        c_pairing="same",
        symmetrize=False,
        switch_step=10**9,
        qp_iters=500,
        qp_rho=0.1,
    )
    ref_fn = refgen.constant(
        jnp.array([1.0], dtype=jnp.float64), 20, 1, jnp.float64
    )
    loop = make_closed_loop(TANK, d, cfg, ref_fn)
    params = MPCParams(
        q_block=10.0 * jnp.eye(1, dtype=jnp.float64),
        r_block=1e-3 * jnp.eye(1, dtype=jnp.float64),
        u_min=jnp.array([-0.5], dtype=jnp.float64),
        u_max=jnp.array([0.5], dtype=jnp.float64),
        cy=jnp.array([[0.0, 1.0]], dtype=jnp.float64),
        applied_min=jnp.array([-8.0], dtype=jnp.float64),
        applied_max=jnp.array([8.0], dtype=jnp.float64),
    )
    _, log = jax.jit(loop)(
        params, jnp.zeros(2, dtype=jnp.float64), model0, rls0
    )
    x_err = np.abs(np.asarray(log.x) - log_x_o).max()
    u_err = np.abs(np.asarray(log.u) - log_u_o).max()
    assert x_err < 1e-4, x_err
    assert u_err < 1e-3, u_err
    # the warm start carries 1600 snapshots of estimator inertia, so the
    # level converges slowly (the documented unbounded-history tank bias,
    # BENCHMARKS.md) — assert it is CONVERGING to r=1, not settled yet
    lvl = np.asarray(log.x)[:, 1]
    assert abs(lvl[-1] - 1.0) < 0.2, lvl[-1]
    # observed decay: |err| 0.276 (step 60) -> 0.153 (step 120)
    assert abs(lvl[-1] - 1.0) < 0.7 * abs(lvl[steps // 2] - 1.0) or \
        abs(lvl[steps // 2] - 1.0) < 0.05
