import jax
import jax.numpy as jnp
import numpy as np
import pytest

from koopmanx.lifts import (
    Dictionary,
    encoder_dictionary,
    hermite_dictionary,
    identity_dictionary,
    kmeans,
    mlp_apply,
    mlp_init,
    monomial_dictionary,
    rbf_dictionary,
    state_augmented,
)

REF = "/root/reference"


def test_mlp_apply_matches_manual_forward():
    key = jax.random.PRNGKey(0)
    params = mlp_init(key, (2, 5, 5, 3), dtype=jnp.float64)
    x = jnp.array([0.3, -0.7], dtype=jnp.float64)
    h = np.asarray(x)
    for w, b in [(np.asarray(w), np.asarray(b)) for w, b in params[:-1]]:
        h = np.maximum(w @ h + b, 0.0)
    w, b = params[-1]
    expected = np.asarray(w) @ h + np.asarray(b)
    np.testing.assert_allclose(np.asarray(mlp_apply(params, x)), expected, rtol=1e-12)


def test_mlp_batched_forward():
    key = jax.random.PRNGKey(1)
    params = mlp_init(key, (2, 8, 4), dtype=jnp.float64)
    xb = jax.random.normal(key, (10, 2), dtype=jnp.float64)
    batched = mlp_apply(params, xb)
    single = jnp.stack([mlp_apply(params, xb[i]) for i in range(10)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), rtol=1e-12)


def test_mat_import_duffing_weights():
    # reference artifact: Revise_2/duffing_weights.mat (W1..W4/b1..b4 schema)
    from koopmanx.lifts.io import load_mat_mlp

    params = load_mat_mlp(f"{REF}/Revise_2/duffing_weights.mat", dtype=jnp.float64)
    assert len(params) == 4
    assert params[0][0].shape == (100, 2)
    assert params[-1][0].shape[0] == 8
    d = encoder_dictionary(params, n=2)
    z = d(jnp.array([0.1, 0.2], dtype=jnp.float64))
    assert z.shape == (8,)
    # manual forward using the raw .mat arrays (Encoder_Duffing.m semantics:
    # poslin(W x + b) chained, linear final layer)
    import scipy.io as sio

    raw = sio.loadmat(f"{REF}/Revise_2/duffing_weights.mat")
    h = np.array([0.1, 0.2])
    for i in (1, 2, 3):
        h = np.maximum(raw[f"W{i}"] @ h + raw[f"b{i}"].ravel(), 0.0)
    expected = raw["W4"] @ h + raw["b4"].ravel()
    np.testing.assert_allclose(np.asarray(z), expected, rtol=1e-10)


def test_torch_pkl_import():
    from koopmanx.lifts.io import load_torch_autoencoder

    enc, dec = load_torch_autoencoder(
        f"{REF}/AutoEncoder_20220418_duffing_2.pkl", dtype=jnp.float64
    )
    assert [w.shape for w, _ in enc] == [(100, 2), (100, 100), (100, 100), (8, 100)]
    assert [w.shape for w, _ in dec] == [(100, 8), (100, 100), (100, 100), (2, 100)]


def test_torch_free_unpickler_matches_torch_load():
    """The storage-level zip unpickler (no torch import) must decode bit-
    identical weights to torch.load on the reference flagship checkpoint."""
    import pickle

    import torch

    from koopmanx.lifts.io import load_torch_state_dict

    class _SU(pickle.Unpickler):
        def find_class(self, module, name):
            if name in ("AutoEncoder", "Encoder", "Decoder"):
                import torch.nn as nn

                return type(name, (nn.Module,), {})
            return super().find_class(module, name)

    class _M:
        Unpickler = _SU

        @staticmethod
        def load(f, **k):
            return _SU(f).load()

    path = f"{REF}/AutoEncoder_20220418_duffing_2.pkl"
    ours = load_torch_state_dict(path)
    with open(path, "rb") as f:
        m = torch.load(f, map_location="cpu", pickle_module=_M, weights_only=False)
    theirs = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    assert set(ours) == set(theirs)
    for k in ours:
        np.testing.assert_array_equal(ours[k], theirs[k])


def test_torch_free_unpickler_without_torch(tmp_path):
    """Loading must succeed in a process where importing torch is
    impossible (the 'no torch needed' claim, checked for real)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.modules['torch'] = None\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from koopmanx.lifts.io import load_torch_autoencoder\n"
        "enc, dec = load_torch_autoencoder("
        f"'{REF}/AutoEncoder_20220418_duffing_2.pkl')\n"
        "assert len(enc) == 4 and len(dec) == 4\n"
        "print('OK')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_thinplate_rbf_matches_formula():
    centers = jnp.array([[0.0, 0.0], [1.0, 1.0]], dtype=jnp.float64)
    d = rbf_dictionary(centers, "thinplate")
    x = jnp.array([0.5, -0.5], dtype=jnp.float64)
    r2 = np.sum((np.asarray(x) - np.asarray(centers)) ** 2, axis=1)
    expected = r2 * np.log(np.sqrt(r2))
    np.testing.assert_allclose(np.asarray(d(x)), expected, rtol=1e-12)
    # r = 0 gives 0 (NaN guard, rbf.m:29)
    at_center = d(jnp.array([0.0, 0.0], dtype=jnp.float64))
    assert np.isfinite(np.asarray(at_center)).all()
    assert float(at_center[0]) == 0.0


def test_gauss_invquad_rbf():
    centers = jnp.zeros((1, 2), dtype=jnp.float64)
    x = jnp.array([1.0, 1.0], dtype=jnp.float64)
    g = rbf_dictionary(centers, "gauss", eps=2.0)
    np.testing.assert_allclose(float(g(x)[0]), np.exp(-4.0 * 2.0), rtol=1e-12)
    iq = rbf_dictionary(centers, "invquad", eps=2.0)
    np.testing.assert_allclose(float(iq(x)[0]), 1.0 / (1.0 + 4.0 * 2.0), rtol=1e-12)


def test_hermite_dictionary_standard():
    d = hermite_dictionary(degree=4)
    assert d.nlift == 25
    x = jnp.array([0.5, -0.3], dtype=jnp.float64)
    z = np.asarray(d(x))
    # H0=1, H1=2x, H2=4x^2-2 at x=0.5 -> H2 = -1
    assert z[0] == 1.0
    np.testing.assert_allclose(z[1], 2 * 0.5, rtol=1e-12)
    np.testing.assert_allclose(z[2], 4 * 0.25 - 2, rtol=1e-12)


def test_hermite_reference_quirk():
    # reference Hermite(0,x) = 2x + 2 (DeepLearning...py:207-213 fallthrough)
    d = hermite_dictionary(degree=4, reference_quirk=True)
    x = jnp.array([0.5, 0.0], dtype=jnp.float64)
    z = np.asarray(d(x))
    h0x = 2 * 0.5 + 2
    h0y = 2.0
    np.testing.assert_allclose(z[0], h0x * h0y, rtol=1e-12)


def test_monomial_dictionary():
    d = monomial_dictionary()
    z = np.asarray(d(jnp.array([2.0, 3.0], dtype=jnp.float64)))
    np.testing.assert_allclose(z, [2, 3, 6, 18, 12], rtol=1e-12)


def test_state_augmented_zero_offset():
    inner = identity_dictionary(2)
    aug = state_augmented(inner, zero_offset=True)
    x = jnp.array([0.4, -0.1], dtype=jnp.float64)
    z = np.asarray(aug(x))
    assert z.shape == (4,)
    np.testing.assert_allclose(z[:2], np.asarray(x), rtol=1e-12)
    zero = np.asarray(aug(jnp.zeros(2, dtype=jnp.float64)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-15)


def test_kmeans_centers():
    key = jax.random.PRNGKey(3)
    pts = jnp.concatenate(
        [
            jax.random.normal(key, (50, 2), dtype=jnp.float64) * 0.1 + 5.0,
            jax.random.normal(key, (50, 2), dtype=jnp.float64) * 0.1 - 5.0,
        ]
    )
    centers, assign = kmeans(jax.random.PRNGKey(4), pts, 2)
    centers = np.sort(np.asarray(centers)[:, 0])
    np.testing.assert_allclose(centers, [-5.0, 5.0], atol=0.5)


def test_dictionary_is_pytree():
    d = rbf_dictionary(jnp.zeros((3, 2)), "gauss")
    leaves, treedef = jax.tree_util.tree_flatten(d)
    d2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert d2.nlift == 3
    # jit through a dictionary argument
    f = jax.jit(lambda dd, x: dd(x))
    out = f(d, jnp.ones(2))
    assert out.shape == (3,)


def test_rff_dictionary_matches_formula():
    """psi(x) = sqrt(2/D) cos(W x + b) (lifts/fourier.py), batched, with
    frequencies scaled per state dim."""
    from koopmanx.lifts.fourier import fourier_dictionary, rff_init

    key = jax.random.PRNGKey(3)
    w, b = rff_init(
        key, n=2, nlift=16, bandwidth=2.0,
        feature_scale=jnp.array([0.5, 2.0]), dtype=jnp.float64,
    )
    d = fourier_dictionary(w, b)
    x = jax.random.normal(jax.random.PRNGKey(4), (7, 2), jnp.float64)
    got = jax.vmap(d)(x)
    ref = np.sqrt(2.0 / 16) * np.cos(
        np.asarray(x) @ np.asarray(w).T + np.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=1e-12)
    # frequency scaling: dim-1 frequencies are 4x smaller than dim-0's
    # relative to the unscaled draw (scale 0.5 vs 2.0)
    assert np.abs(np.asarray(w)[:, 1]).mean() < np.abs(np.asarray(w)[:, 0]).mean()
