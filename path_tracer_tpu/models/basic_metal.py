"""Basic Metal material: GGX VNDF with F82-tint spectral Fresnel.

Vectorized equivalent of /root/reference/src/scene/basic_metal.glsl.inc.
Channels-first: `view`/`scattered` (3, N), spectra (4, N).
`view` = direction toward viewer (reference BSDF "In"); `scattered` =
sampled/evaluated light direction (reference BSDF "Out").
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import EPSILON
from ..core.optics import schlick_fresnel_metal
from ..core.sampling import (
    ggx_distribution,
    ggx_roughness_alpha,
    ggx_smith_g1,
    ggx_visible_normal,
)
from ..core.vec import dot, safe_normalize


def _params(ctx):
    alpha = ggx_roughness_alpha(ctx['roughness'], ctx['roughness_anisotropy'])
    rough = alpha[0] * alpha[1] > EPSILON
    return alpha, rough


def has_dirac_bsdf(ctx):
    return ctx['roughness'] < 1e-3


def evaluate_bsdf(ctx, view, scattered):
    """basic_metal.glsl.inc:44-83.

    probability = G1(view) D(h) / (4 cos(view)) -- the VNDF pdf;
    throughput = probability * G1(scattered) * F(view.h).
    """
    n = view.shape[1]
    alpha, rough = _params(ctx)
    valid = (view[2] > 0.0) & (scattered[2] > 0.0) & rough

    half = safe_normalize(view + scattered)

    gm = ggx_smith_g1(view, alpha)
    d = ggx_distribution(half, alpha)
    probability = jnp.broadcast_to(
        gm * d / (4.0 * jnp.maximum(view[2], 1e-8)), (4, n))

    gs = ggx_smith_g1(scattered, alpha)
    cos_view_half = dot(view, half)
    f = schlick_fresnel_metal(ctx['base_reflectance'],
                              ctx['specular_reflectance'], cos_view_half)
    throughput = probability * gs * f
    return throughput, probability, valid


def sample_bsdf(ctx, view, u1, u2, u3):
    """basic_metal.glsl.inc:86-141: VNDF half-vector sample + mirror
    reflection; Dirac surfaces (roughness < 1e-3) report probability 1
    as the coefficient of an implied delta distribution."""
    n = view.shape[1]
    alpha, rough = _params(ctx)
    valid = view[2] > 0.0

    normal = ggx_visible_normal(view, alpha, u1, u2)
    cos_theta = jnp.minimum(dot(normal, view), 1.0)
    scattered = 2.0 * cos_theta * normal - view
    valid &= scattered[2] > 0.0

    gm = ggx_smith_g1(view, alpha)
    d = ggx_distribution(normal, alpha)
    rough_pdf = gm * d / (4.0 * jnp.maximum(view[2], 1e-8))
    probability = jnp.broadcast_to(jnp.where(rough, rough_pdf, 1.0), (4, n))

    gs = ggx_smith_g1(scattered, alpha)
    f = schlick_fresnel_metal(ctx['base_reflectance'],
                              ctx['specular_reflectance'], cos_theta)
    throughput = probability * gs * f
    return scattered, throughput, probability, valid
