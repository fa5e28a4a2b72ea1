"""Tone mapping operators: Clamp, Reinhard-extended, Hable filmic, ACES.

Pure-jnp equivalents of the reference resolve shader
(/root/reference/src/integrator/resolve.glsl:60-110). All operate on
linear-sRGB color arrays of shape (..., 3).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import (
    TONE_MAPPING_MODE_ACES,
    TONE_MAPPING_MODE_CLAMP,
    TONE_MAPPING_MODE_HABLE,
    TONE_MAPPING_MODE_REINHARD,
)

_LUMA = np.array([0.2126, 0.7152, 0.0722], dtype=np.float32)

# ACES fitted matrices (resolve.glsl:90-102), row-major.
_ACES_INPUT = np.array(
    [
        [0.59719, 0.35458, 0.04823],
        [0.07600, 0.90834, 0.01566],
        [0.02840, 0.13383, 0.83777],
    ],
    dtype=np.float32,
)
_ACES_OUTPUT = np.array(
    [
        [1.60475, -0.53108, -0.07367],
        [-0.10208, 1.10813, -0.00605],
        [-0.00327, -0.07276, 1.07602],
    ],
    dtype=np.float32,
)


def luminance(color):
    """color: (3, ...) -> (...)."""
    return jnp.tensordot(jnp.asarray(_LUMA), color, axes=([0], [0]))


def tonemap_clamp(color):
    return jnp.clip(color, 0.0, 1.0)


def tonemap_reinhard(color, white_level=1.0):
    old_l = jnp.maximum(luminance(color), 1e-12)
    max_l = jnp.asarray(white_level, jnp.float32)
    n = old_l * (1.0 + old_l / (max_l * max_l))
    new_l = n / (1.0 + old_l)
    return color * (new_l / old_l)


def _hable_partial(x):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return (x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f) - e / f


def tonemap_hable(color):
    exposure_bias = 2.0
    current = _hable_partial(color * exposure_bias)
    white_scale = 1.0 / _hable_partial(jnp.float32(11.2))
    return current * white_scale


def tonemap_aces(color):
    v = jnp.tensordot(jnp.asarray(_ACES_INPUT), color, axes=([1], [0]))
    a = v * (v + 0.0245786) - 0.000090537
    b = v * (0.983729 * v + 0.4329510) + 0.238081
    return jnp.tensordot(jnp.asarray(_ACES_OUTPUT), a / b, axes=([1], [0]))


def tonemap(color, mode, white_level=1.0):
    """Apply the tone mapping operator selected by the static int `mode`."""
    if mode == TONE_MAPPING_MODE_CLAMP:
        return tonemap_clamp(color)
    if mode == TONE_MAPPING_MODE_REINHARD:
        return tonemap_reinhard(color, white_level)
    if mode == TONE_MAPPING_MODE_HABLE:
        return tonemap_hable(color)
    if mode == TONE_MAPPING_MODE_ACES:
        return tonemap_aces(color)
    raise ValueError(f'unknown tone mapping mode {mode}')
