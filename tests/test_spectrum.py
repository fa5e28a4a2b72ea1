"""Golden and property tests for the spectral core."""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core import spectrum as sp
from path_tracer_tpu.core.constants import CIE_LAMBDA_MIN, CIE_LAMBDA_MAX


def test_observer_goldens():
    # Golden values computed directly from the Wyman et al. fit formulas
    # (reference spectrum.glsl.inc:10-34).
    xyz = np.asarray(sp.sample_standard_observer(550.0))
    # Manual evaluation at 550 nm:
    def lobe(scale, center, lo, hi, lam=550.0):
        t = (lam - center) * (lo if lam < center else hi)
        return scale * np.exp(-0.5 * t * t)
    x = lobe(0.362, 442.0, 0.0624, 0.0374) + lobe(1.056, 599.8, 0.0264, 0.0323) \
        - lobe(0.065, 501.1, 0.0490, 0.0382)
    y = lobe(0.821, 568.8, 0.0213, 0.0247) + lobe(0.286, 530.9, 0.0613, 0.0322)
    z = lobe(1.217, 437.0, 0.0845, 0.0278) + lobe(0.681, 459.0, 0.0385, 0.0725)
    np.testing.assert_allclose(xyz, [x, y, z], rtol=1e-5)
    # Y peaks near 555 nm and is near zero at the extremes.
    lams = np.linspace(CIE_LAMBDA_MIN, CIE_LAMBDA_MAX, 471)
    ys = np.asarray(sp.sample_standard_observer(lams))[1]
    assert 550 < lams[np.argmax(ys)] < 560
    assert ys[0] < 1e-3 and ys[-1] < 1e-3


def test_d65_table_interpolation():
    # Exact table nodes (360 nm -> 46.638, 560 nm -> 100.0).
    assert np.isclose(float(sp.sample_illuminant_d65(0.0)), 46.638, atol=1e-3)
    nl_560 = (560.0 - CIE_LAMBDA_MIN) / (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN)
    assert np.isclose(float(sp.sample_illuminant_d65(nl_560)), 100.0, atol=1e-3)
    # Midpoint interpolation between two nodes.
    nl = (360.5 - CIE_LAMBDA_MIN) / (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN)
    assert np.isclose(float(sp.sample_illuminant_d65(nl)), (46.638 + 47.183) / 2, atol=1e-3)


def test_parametric_spectrum_range_and_monotone_sigmoid():
    beta = jnp.asarray([0.0, 0.0, 100.0])
    assert float(sp.sample_parametric_spectrum(beta, 550.0)) > 0.999
    beta = jnp.asarray([0.0, 0.0, -100.0])
    assert float(sp.sample_parametric_spectrum(beta, 550.0)) < 0.001
    beta = jnp.asarray([0.0, 0.0, 0.0])
    assert np.isclose(float(sp.sample_parametric_spectrum(beta, 550.0)), 0.5)


def test_xyz_srgb_roundtrip():
    rgb = np.random.RandomState(0).rand(3, 100).astype(np.float32)
    back = np.asarray(sp.xyz_to_srgb(sp.srgb_to_xyz(jnp.asarray(rgb))))
    # The reference's 4-decimal matrices are not exact inverses of each
    # other; ~1.5e-2 roundtrip error is inherent to its constants.
    np.testing.assert_allclose(back, rgb, atol=2e-2)


def test_hero_cluster_rotation():
    lam = np.asarray(sp.hero_wavelength_cluster(0.0))
    np.testing.assert_allclose(
        lam,
        CIE_LAMBDA_MIN + np.asarray([0.0, 0.25, 0.5, 0.75]) * (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN),
        rtol=1e-6,
    )
    # Wrap-around.
    lam = np.asarray(sp.hero_wavelength_cluster(0.9))
    nl = (lam - CIE_LAMBDA_MIN) / (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN)
    np.testing.assert_allclose(np.sort(nl), [0.15, 0.4, 0.65, 0.9], atol=1e-5)


def test_observe_unit_spectrum_is_whitepoint():
    # A perfectly flat reflectance=1 spectrum under D65 observes to the
    # D65 white point (Y ~= 1 by normalization, x,y ~= 0.3127, 0.3290).
    beta = jnp.asarray([0.0, 0.0, 1e6])
    xyz = np.asarray(sp.observe_parametric_spectrum_under_d65(beta, sample_count=471))
    assert np.isclose(xyz[1], 1.0, atol=0.02)
    chroma = xyz / xyz.sum()
    assert np.isclose(chroma[0], 0.3127, atol=0.01)
    assert np.isclose(chroma[1], 0.3290, atol=0.01)
