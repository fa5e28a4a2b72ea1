"""Spectral core: CIE observer, illuminant D65, parametric spectra, color.

TPU-native (pure jnp, fully vectorized) implementation of the spectral
machinery used throughout the renderer. Behavioral reference:
/root/reference/src/core/spectrum.glsl.inc (device sampling) and
/root/reference/src/core/spectrum.cpp (host color math). All functions are
shape-polymorphic: they accept scalars or arrays of any batch shape and
broadcast, so the integrator can call them on (N,) lanes or (N,4)
wavelength clusters directly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import CIE_LAMBDA_MIN, CIE_LAMBDA_MAX
from ._d65_data import CIE_ILLUMINANT_D65

# Normalization constant for D65 luminance used by the reference when
# observing spectra under D65 (spectrum.glsl.inc:205, spectrum.cpp:202).
D65_NORMALIZATION = 10566.864005

_D65_TABLE = np.asarray(CIE_ILLUMINANT_D65, dtype=np.float32)

# Conversion between CIE XYZ and linear sRGB (spectrum.glsl.inc:50-55,
# spectrum.cpp:7-19). Stored row-major: result = M @ vec.
XYZ_TO_SRGB = np.array(
    [
        [+3.2406, -1.5372, -0.4986],
        [-0.9689, +1.8758, +0.0415],
        [+0.0557, -0.2040, +1.0570],
    ],
    dtype=np.float32,
)

SRGB_TO_XYZ = np.array(
    [
        [+0.4124, +0.3576, +0.1805],
        [+0.2126, +0.7152, +0.0722],
        [+0.0193, +0.1192, +0.9505],
    ],
    dtype=np.float32,
)


def sample_standard_observer(lam):
    """CIE 1931 standard observer response at wavelength(s) `lam` (in nm).

    Multi-lobe piecewise Gaussian fit by Wyman et al., identical to the
    reference's SampleStandardObserver (spectrum.glsl.inc:10-34).
    Returns an array of shape lam.shape + (3,) with X, Y, Z responses.
    """
    lam = jnp.asarray(lam, jnp.float32)

    def lobe(scale, center, slope_lo, slope_hi):
        t = (lam - center) * jnp.where(lam < center, slope_lo, slope_hi)
        return scale * jnp.exp(-0.5 * t * t)

    x = lobe(0.362, 442.0, 0.0624, 0.0374) \
        + lobe(1.056, 599.8, 0.0264, 0.0323) \
        - lobe(0.065, 501.1, 0.0490, 0.0382)
    y = lobe(0.821, 568.8, 0.0213, 0.0247) \
        + lobe(0.286, 530.9, 0.0613, 0.0322)
    z = lobe(1.217, 437.0, 0.0845, 0.0278) \
        + lobe(0.681, 459.0, 0.0385, 0.0725)
    return jnp.stack([x, y, z], axis=-1)


def sample_illuminant_d65(normalized_lambda):
    """Interpolated D65 power at normalized wavelength(s) in [0, 1].

    Matches SampleIlluminantD65 (spectrum.glsl.inc:159-164): linear
    interpolation of the 1 nm table over 360-830 nm.
    """
    nl = jnp.asarray(normalized_lambda, jnp.float32)
    offset = nl * 470.0
    idx = jnp.clip(offset.astype(jnp.int32), 0, 469)
    frac = offset - idx.astype(jnp.float32)
    table = jnp.asarray(_D65_TABLE)
    lo = table[idx]
    hi = table[idx + 1]
    return lo * (1.0 - frac) + hi * frac


def sample_parametric_spectrum(beta, lam):
    """Sigmoid-polynomial reflectance spectrum sample (Jakob-Hanika).

    beta: (..., 3) polynomial coefficients (denormalized, i.e. in physical
    wavelength space), lam: (...) wavelengths in nm. Broadcasts beta
    against lam; returns reflectance in (0, 1).
    Matches SampleParametricSpectrum (spectrum.glsl.inc:169-180).
    """
    beta = jnp.asarray(beta, jnp.float32)
    lam = jnp.asarray(lam, jnp.float32)
    x = (beta[..., 0] * lam + beta[..., 1]) * lam + beta[..., 2]
    return 0.5 + x / (2.0 * jnp.sqrt(1.0 + x * x))


def sample_parametric_spectrum_scaled(beta_and_intensity, lam):
    """As above with a 4th intensity component (spectrum.glsl.inc:183-192)."""
    b = jnp.asarray(beta_and_intensity, jnp.float32)
    return b[..., 3] * sample_parametric_spectrum(b[..., :3], lam)


def observe_parametric_spectrum_under_d65(beta_and_intensity, sample_count=16):
    """XYZ tristimulus response of a parametric spectrum under D65.

    Used for preview colors of spectral materials; matches
    ObserveParametricSpectrumUnderD65 (spectrum.glsl.inc:197-210) including
    its 16-sample quadrature.
    beta_and_intensity: (..., 3) or (..., 4). Returns (..., 3) XYZ.
    """
    b = jnp.asarray(beta_and_intensity, jnp.float32)
    if b.shape[-1] == 3:
        intensity = jnp.ones(b.shape[:-1], jnp.float32)
    else:
        intensity = b[..., 3]
    beta = b[..., :3]

    nl = jnp.linspace(0.0, 1.0, sample_count, dtype=jnp.float32)
    delta = (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN) / sample_count
    lam = CIE_LAMBDA_MIN + (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN) * nl
    d65 = sample_illuminant_d65(nl) / D65_NORMALIZATION          # (S,)
    obs = sample_standard_observer(lam)                          # (S, 3)
    refl = sample_parametric_spectrum(beta[..., None, :], lam)   # (..., S)
    xyz = jnp.einsum('...s,sc->...c', refl * d65, obs) * delta
    return xyz * intensity[..., None]


def xyz_to_srgb(xyz):
    """CIE XYZ -> linear sRGB. xyz: (..., 3)."""
    return jnp.einsum('ij,...j->...i', jnp.asarray(XYZ_TO_SRGB), xyz)


def srgb_to_xyz(rgb):
    """Linear sRGB -> CIE XYZ. rgb: (..., 3)."""
    return jnp.einsum('ij,...j->...i', jnp.asarray(SRGB_TO_XYZ), rgb)


def hero_wavelength_cluster(normalized_lambda0):
    """Expand a primary normalized wavelength into the 4-hero cluster.

    The cluster is rotated by 0.25 steps in normalized wavelength space
    with wrap-around, as in the reference's Scatter
    (basic_scatter.glsl:116-122). Returns (..., 4) wavelengths in nm.
    """
    nl0 = jnp.asarray(normalized_lambda0, jnp.float32)
    offsets = jnp.asarray([0.0, 0.25, 0.5, 0.75], jnp.float32)
    nl = jnp.mod(nl0[..., None] + offsets, 1.0)
    # fract() of the first component is the identity since nl0 is in [0,1);
    # the reference applies mix() without fract for component 0 as well.
    nl = nl.at[..., 0].set(nl0)
    return CIE_LAMBDA_MIN + (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN) * nl
