"""Statistical and golden tests for RNG and direction sampling.

Channels-first: directions are (3, N), GGX alphas (2, N).
"""

import numpy as np
import jax
import jax.numpy as jnp

from path_tracer_tpu.core import sampling as sa
from path_tracer_tpu.core import vec
from path_tracer_tpu.core.constants import PI


def _rng(n=8192, seed=7):
    return sa.Rng.seed(jnp.arange(n, dtype=jnp.uint32), seed)


def test_rng_uniformity_and_decorrelation():
    rng = _rng(1 << 14)
    u1 = np.asarray(rng.uniform())
    u2 = np.asarray(rng.uniform())
    assert 0.0 <= u1.min() and u1.max() < 1.0
    assert abs(u1.mean() - 0.5) < 0.01
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.05
    # Chi-square over 64 bins at 3-sigma.
    hist, _ = np.histogram(u1, bins=64, range=(0, 1))
    expected = len(u1) / 64
    chi2 = ((hist - expected) ** 2 / expected).sum()
    assert chi2 < 64 + 3 * np.sqrt(2 * 64)


def test_random_direction_is_uniform_sphere():
    rng = _rng(1 << 14)
    d = np.asarray(sa.random_direction(rng))  # (3, N)
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-5)
    assert np.abs(d.mean(axis=1)).max() < 0.02
    assert abs(d[2].mean()) < 0.02
    assert abs((d[2] ** 2).mean() - 1 / 3) < 0.02


def test_vmf_concentration_and_pdf_normalization():
    kappa = 20.0
    n = 1 << 14
    rng = _rng(n)
    mu = vec.splat3([0.0, 0.0, 1.0], n)
    d = np.asarray(sa.random_von_mises_fisher(rng, kappa, mu))
    expected = 1 / np.tanh(kappa) - 1 / kappa
    assert abs(d[2].mean() - expected) < 0.01
    # PDF integrates to 1 over the sphere (MC with uniform directions).
    rng2 = _rng(1 << 15, seed=3)
    u = sa.random_direction(rng2)
    pdf = np.asarray(sa.von_mises_fisher_pdf(
        kappa, vec.splat3([0.0, 0.0, 1.0], 1 << 15), u))
    integral = pdf.mean() * 4 * PI
    assert abs(integral - 1.0) < 0.05


def test_hg_mean_cosine_matches_reference_convention():
    # The reference's HG sampler yields E[cos theta] = -g relative to +Z
    # (it negates the textbook inverse CDF); we preserve that behavior.
    for g in (-0.5, 0.0, 0.7):
        rng = _rng(1 << 14, seed=11)
        d = np.asarray(sa.sample_direction_hg(g, rng.uniform(), rng.uniform()))
        assert abs(d[2].mean() + g) < 0.02, g


def test_ggx_vndf_normalization_and_distribution():
    n = 1 << 13
    alpha = jnp.broadcast_to(jnp.asarray([[0.3], [0.3]]), (2, n))
    view = np.asarray([0.4, -0.2, 0.8])
    view /= np.linalg.norm(view)
    v = vec.splat3(view, n)
    rng = _rng(n, seed=5)
    h = np.asarray(sa.ggx_visible_normal(v, alpha, rng.uniform(), rng.uniform()))
    assert (h[2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(h, axis=0), 1.0, atol=1e-5)
    # dot(V, H) >= 0 for visible normals.
    assert (view @ h > -1e-6).all()


def test_ggx_ndf_integrates_to_one_projected():
    # Integral over hemisphere of D(m) cos(theta) dm = 1.
    n = 1 << 16
    alpha = jnp.broadcast_to(jnp.asarray([[0.5], [0.5]]), (2, n))
    rng = _rng(n, seed=13)
    d = np.array(sa.random_direction(rng))
    d[2] = np.abs(d[2])  # fold to upper hemisphere, pdf = 1/(2 pi)
    dd = np.asarray(sa.ggx_distribution(jnp.asarray(d), alpha))
    integral = (dd * d[2]).mean() * 2 * PI
    assert abs(integral - 1.0) < 0.05


def test_smith_g1_bounds():
    alpha = jnp.asarray([[0.4], [0.4]])
    up = jnp.asarray([[0.0], [0.0], [1.0]])
    assert np.isclose(float(sa.ggx_smith_g1(up, alpha)[0]), 1.0, atol=1e-5)
    grazing = vec.normalize(jnp.asarray([[1.0], [0.0], [0.01]]))
    assert float(sa.ggx_smith_g1(grazing, alpha)[0]) < 0.1


def test_safe_normalize_degenerate():
    v = jnp.zeros((3, 4))
    out = np.asarray(vec.safe_normalize(v))
    np.testing.assert_allclose(out, np.tile([[0], [0], [1.0]], (1, 4)))


def test_coordinate_frame_orthonormal():
    rng = _rng(256, seed=17)
    z = sa.random_direction(rng)
    x, y = sa.coordinate_frame(z)
    x, y, z = np.asarray(x), np.asarray(y), np.asarray(z)
    assert np.abs((x * z).sum(0)).max() < 1e-5
    assert np.abs((x * y).sum(0)).max() < 1e-5
    assert np.abs((y * z).sum(0)).max() < 1e-5
    # The reference frame (common.glsl.inc:120-125, Y = cross(X, Z)) is
    # left-handed: X x Y = -Z.
    np.testing.assert_allclose(
        np.linalg.norm(np.cross(x, y, axis=0) + z, axis=0), 0, atol=1e-5)


def test_vec_helpers():
    a = jnp.asarray([[1.0], [0.0], [0.0]])
    b = jnp.asarray([[0.0], [1.0], [0.0]])
    np.testing.assert_allclose(np.asarray(vec.cross(a, b)), [[0], [0], [1.0]])
    assert float(vec.dot(a, b)[0]) == 0.0
    m = jnp.eye(4)
    p = jnp.asarray([[1.0], [2.0], [3.0]])
    np.testing.assert_allclose(np.asarray(vec.transform_point(m, p)), np.asarray(p))
