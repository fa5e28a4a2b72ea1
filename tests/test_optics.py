"""Tests for Fresnel, dispersion, and tone mapping."""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core import optics, tonemap
from path_tracer_tpu.core.constants import (
    TONE_MAPPING_MODE_ACES,
    TONE_MAPPING_MODE_CLAMP,
    TONE_MAPPING_MODE_HABLE,
    TONE_MAPPING_MODE_REINHARD,
)


def test_cauchy_ior_at_fraunhofer_d_line():
    # At the d line (587.6 nm) the Cauchy formula returns the base IOR.
    ior = float(optics.cauchy_empirical_ior(1.5, 30.0, 587.6))
    assert np.isclose(ior, 1.5, atol=1e-4)
    # Dispersion: blue > red.
    blue = float(optics.cauchy_empirical_ior(1.5, 30.0, 450.0))
    red = float(optics.cauchy_empirical_ior(1.5, 30.0, 700.0))
    assert blue > 1.5 > red
    # Higher Abbe number -> less dispersion.
    blue_lo = float(optics.cauchy_empirical_ior(1.5, 80.0, 450.0))
    assert blue_lo < blue


def test_fresnel_normal_incidence_matches_schlick_f0():
    # R(0 deg) = ((n1 - n2) / (n1 + n2))^2; eta = n1/n2 entering glass.
    eta = 1.0 / 1.5
    f = float(optics.fresnel_dielectric(jnp.asarray(eta), jnp.asarray(1.0)))
    assert np.isclose(f, ((1.0 - 1.5) / (1.0 + 1.5)) ** 2, atol=1e-5)


def test_fresnel_grazing_is_total():
    eta = 1.0 / 1.5
    f = float(optics.fresnel_dielectric(jnp.asarray(eta), jnp.asarray(1e-4)))
    assert f > 0.99


def test_total_internal_reflection():
    # Leaving glass at a steep angle: TIR -> cos2 = 0 -> F = 1.
    eta = 1.5
    cos1 = 0.3  # beyond critical angle (cos_c ~ 0.745)
    cos2 = float(optics.cos_theta_refracted(jnp.asarray(eta), jnp.asarray(cos1)))
    assert cos2 == 0.0
    f = float(optics.fresnel_dielectric(jnp.asarray(eta), jnp.asarray(cos1), jnp.asarray(cos2)))
    assert np.isclose(f, 1.0, atol=1e-5)


def test_schlick_metal_limits():
    # Channels-first: (4, N) spectra.
    base = jnp.asarray([[0.9], [0.8], [0.7], [0.6]])
    spec = jnp.ones((4, 1))
    # Normal incidence -> base reflectance.
    f = np.asarray(optics.schlick_fresnel_metal(base, spec, jnp.asarray([1.0])))
    np.testing.assert_allclose(f[:, 0], np.asarray(base)[:, 0], atol=1e-5)
    # Grazing -> 1 (with specular tint 1).
    f = np.asarray(optics.schlick_fresnel_metal(base, spec, jnp.asarray([0.0])))
    np.testing.assert_allclose(f[:, 0], 1.0, atol=1e-5)


def test_tonemaps_basic_properties():
    # Channels-first: (3, N) colors.
    c = jnp.asarray([[0.5, 4.0], [0.25, 2.0], [0.125, 1.0]])
    for mode in (TONE_MAPPING_MODE_CLAMP, TONE_MAPPING_MODE_REINHARD,
                 TONE_MAPPING_MODE_HABLE, TONE_MAPPING_MODE_ACES):
        out = np.asarray(tonemap.tonemap(c, mode, white_level=4.0))
        assert out.shape == (3, 2)
        assert np.isfinite(out).all()
    # Clamp golden.
    out = np.asarray(tonemap.tonemap(c, TONE_MAPPING_MODE_CLAMP))
    np.testing.assert_allclose(out[:, 1], [1.0, 1.0, 1.0])
    # Reinhard maps white_level to ~1.
    col = jnp.ones((3, 1))
    out = np.asarray(tonemap.tonemap_reinhard(col, white_level=1.0))
    np.testing.assert_allclose(out, 1.0, atol=1e-5)
    # ACES black -> ~0.
    out = np.asarray(tonemap.tonemap_aces(jnp.zeros((3, 1))))
    assert np.abs(out).max() < 1e-3
