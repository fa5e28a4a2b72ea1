"""Spectral core: CIE observer, illuminant D65, parametric spectra, color.

TPU-native (pure jnp, fully vectorized) implementation of the spectral
machinery used throughout the renderer. Behavioral reference:
/root/reference/src/core/spectrum.glsl.inc (device sampling) and
/root/reference/src/core/spectrum.cpp (host color math).

Channels-first convention (core/vec.py): colors are (3, ...), spectrum
coefficients (3, ...), wavelength clusters (4, ...); the trailing axes
are lane/batch axes.
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

# Conversion between CIE XYZ and linear sRGB tristimulus values
# (spectrum.glsl.inc:50-55, spectrum.cpp:7-19). Row-major: out = M @ in.
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
    """CIE 1931 standard observer response at wavelength(s) `lam` (nm).

    Multi-lobe piecewise Gaussian fit by Wyman et al., identical to the
    reference's SampleStandardObserver (spectrum.glsl.inc:10-34).
    Returns (3,) + lam.shape with X, Y, Z leading.
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
    return jnp.stack([x, y, z], axis=0)


def sample_illuminant_d65(normalized_lambda):
    """Interpolated D65 power at normalized wavelength(s) in [0, 1].

    Matches SampleIlluminantD65 (spectrum.glsl.inc:159-164).
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

    beta: (3, ...) denormalized coefficients; lam: wavelengths in nm with
    a shape that broadcasts against beta[i] (e.g. beta (3, N) against
    lam (4, N)). Matches SampleParametricSpectrum
    (spectrum.glsl.inc:169-180).
    """
    beta = jnp.asarray(beta, jnp.float32)
    lam = jnp.asarray(lam, jnp.float32)
    x = (beta[0] * lam + beta[1]) * lam + beta[2]
    return 0.5 + x / (2.0 * jnp.sqrt(1.0 + x * x))


def sample_parametric_spectrum_scaled(beta_and_intensity, lam):
    """As above with a 4th intensity channel (spectrum.glsl.inc:183-192)."""
    b = jnp.asarray(beta_and_intensity, jnp.float32)
    return b[3] * sample_parametric_spectrum(b[:3], lam)


def observe_parametric_spectrum_under_d65(beta_and_intensity, sample_count=16):
    """XYZ tristimulus response of a parametric spectrum under D65.

    Matches ObserveParametricSpectrumUnderD65 (spectrum.glsl.inc:197-210)
    including its 16-sample quadrature. beta_and_intensity: (3, ...) or
    (4, ...). Returns (3, ...) XYZ.
    """
    b = jnp.asarray(beta_and_intensity, jnp.float32)
    if b.shape[0] == 4:
        intensity = b[3]
        beta = b[:3]
    else:
        intensity = jnp.ones(b.shape[1:], jnp.float32)
        beta = b

    nl = jnp.linspace(0.0, 1.0, sample_count, dtype=jnp.float32)
    delta = (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN) / sample_count
    lam = CIE_LAMBDA_MIN + (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN) * nl
    d65 = sample_illuminant_d65(nl) / D65_NORMALIZATION          # (S,)
    obs = sample_standard_observer(lam)                          # (3, S)
    extra = (1,) * (beta.ndim - 1)
    lam_b = lam.reshape((sample_count,) + extra)                 # (S, 1...)
    refl = sample_parametric_spectrum(beta[:, None], lam_b)      # (S, ...)
    weight = (d65 * delta).reshape((sample_count,) + extra)
    xyz = jnp.tensordot(obs, refl * weight, axes=([1], [0]))     # (3, ...)
    return xyz * intensity


def xyz_to_srgb(xyz):
    """CIE XYZ -> linear sRGB; xyz: (3, ...)."""
    return jnp.tensordot(jnp.asarray(XYZ_TO_SRGB), xyz, axes=([1], [0]))


def srgb_to_xyz(rgb):
    """Linear sRGB -> CIE XYZ; rgb: (3, ...)."""
    return jnp.tensordot(jnp.asarray(SRGB_TO_XYZ), rgb, axes=([1], [0]))


def hero_wavelength_cluster(normalized_lambda0):
    """Expand a primary normalized wavelength into the 4-hero cluster.

    Rotated by 0.25 steps with wrap-around (basic_scatter.glsl:116-122).
    normalized_lambda0: (N,) -> (4, N) wavelengths in nm.
    """
    nl0 = jnp.asarray(normalized_lambda0, jnp.float32)
    offsets = jnp.asarray([0.0, 0.25, 0.5, 0.75], jnp.float32)
    nl = jnp.mod(nl0[None] + offsets.reshape((4,) + (1,) * nl0.ndim), 1.0)
    nl = nl.at[0].set(nl0)
    return CIE_LAMBDA_MIN + (CIE_LAMBDA_MAX - CIE_LAMBDA_MIN) * nl
