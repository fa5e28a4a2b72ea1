"""Basic Translucent material: rough dispersive dielectric + interior medium.

Vectorized equivalent of
/root/reference/src/scene/basic_translucent.glsl.inc: GGX
reflect/refract with Cauchy dispersion over the 4-wavelength hero
cluster, per-wavelength refraction half-vector bookkeeping (secondary-
wavelength densities for the same refraction event), spectral collapse
to the primary wavelength on smooth refraction, and a Beer-Lambert /
Henyey-Greenstein interior medium derived from transmission color/depth.

`view` = direction toward viewer (reference BSDF "In"); `scattered` =
sampled light direction (reference BSDF "Out").
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import EPSILON
from ..core.optics import cauchy_empirical_ior, cos_theta_refracted, fresnel_dielectric
from ..core.sampling import (
    ggx_distribution,
    ggx_roughness_alpha,
    ggx_smith_g1,
    ggx_visible_normal,
    safe_normalize,
)
from ..core.spectrum import sample_parametric_spectrum


def _params(ctx, view):
    """Relative IOR per wavelength + roughness (basic_translucent.glsl.inc:10-48)."""
    interior = cauchy_empirical_ior(ctx['ior'][:, None], ctx['abbe_number'][:, None],
                                    ctx['lam'])
    exterior = ctx['exterior_ior']
    entering = view[:, 2] >= 0.0
    relative = jnp.where(entering[:, None], exterior / interior, interior / exterior)
    alpha = ggx_roughness_alpha(ctx['roughness'], ctx['roughness_anisotropy'])
    rough = alpha[:, 0] * alpha[:, 1] > EPSILON
    return relative, alpha, rough


def has_dirac_bsdf(ctx):
    return ctx['roughness'] < 1e-3


def load_medium(ctx):
    """Interior participating medium (basic_translucent.glsl.inc:55-82).

    Returns dict(ior (N,4), absorption (N,4), scattering (N,4),
    anisotropy (N,), has_medium (N,) bool).
    """
    lam = ctx['lam']
    ior = cauchy_empirical_ior(ctx['ior'][:, None], ctx['abbe_number'][:, None], lam)
    depth = ctx['transmission_depth']
    has_depth = depth > 0.0
    safe_depth = jnp.where(has_depth, depth, 1.0)[:, None]
    transmission = sample_parametric_spectrum(
        ctx['transmission_spectrum'][:, None, :], lam)
    extinction = -jnp.log(jnp.maximum(transmission, 1e-9)) / safe_depth
    scattering = sample_parametric_spectrum(
        ctx['scattering_spectrum'][:, None, :], lam) / safe_depth
    absorption = jnp.maximum(extinction - scattering, 0.0)
    zero = jnp.zeros_like(absorption)
    return dict(
        ior=ior,
        absorption=jnp.where(has_depth[:, None], absorption, zero),
        scattering=jnp.where(has_depth[:, None], scattering, zero),
        anisotropy=jnp.where(has_depth, ctx['scattering_anisotropy'], 0.0),
        has_medium=jnp.ones(lam.shape[0], jnp.bool_),
    )


def evaluate_bsdf(ctx, view, scattered):
    """basic_translucent.glsl.inc:90-169. Rough surfaces only; smooth
    surfaces return zero (their lobes are Dirac deltas)."""
    n = view.shape[0]
    relative_ior, alpha, rough = _params(ctx, view)

    gm = ggx_smith_g1(view, alpha)
    gs = ggx_smith_g1(scattered, alpha)

    same_side = view[:, 2] * scattered[:, 2] > 0.0

    # --- reflection branch -------------------------------------------------
    half_r = safe_normalize(scattered + view)
    cos_in_r = jnp.sum(half_r * view, axis=-1)
    f_r = fresnel_dielectric(relative_ior, cos_in_r[:, None])
    d_r = ggx_distribution(half_r, alpha)
    prob_reflect = f_r * (gm * d_r / (4.0 * jnp.maximum(jnp.abs(view[:, 2]), 1e-8)))[:, None]

    # --- refraction branch (per-wavelength half vectors) -------------------
    halves = safe_normalize(scattered[:, None, :] + view[:, None, :] * relative_ior[..., None])
    cos_in = jnp.sum(view[:, None, :] * halves, axis=-1)      # (N, 4)
    cos_out = jnp.sum(scattered[:, None, :] * halves, axis=-1)  # (N, 4)
    f_t = fresnel_dielectric(relative_ior, cos_in, cos_out)
    d_each = ggx_distribution(halves, alpha[:, None, :])
    d_t = jnp.where(cos_in * cos_out < 0.0, d_each, 0.0)
    j = jnp.abs(cos_out) / jnp.square(cos_in * relative_ior + cos_out)
    prob_refract = d_t * (1.0 - f_t) * gm[:, None] * j * jnp.abs(
        cos_in / jnp.where(jnp.abs(view[:, 2]) < 1e-8, 1e-8, view[:, 2])[:, None])

    probability = jnp.where(same_side[:, None], prob_reflect, prob_refract)
    probability = jnp.where(rough[:, None], probability, 0.0)
    throughput = probability * gs[:, None]
    valid = jnp.ones((n,), jnp.bool_)
    return throughput, probability, valid


def sample_bsdf(ctx, view, u1, u2, u3):
    """basic_translucent.glsl.inc:172-339.

    u1/u2 drive the VNDF normal, u3 the reflect/refract choice at the
    primary wavelength's Fresnel coefficient.
    """
    n = view.shape[0]
    relative_ior, alpha, rough = _params(ctx, view)
    eta0 = relative_ior[:, 0]

    sign_z = jnp.sign(jnp.where(view[:, 2] == 0.0, 1.0, view[:, 2]))
    normal = ggx_visible_normal(view * sign_z[:, None], alpha, u1, u2)

    cos_in = jnp.clip(jnp.sum(normal * view, axis=-1), -1.0, 1.0)
    cos_refracted = cos_theta_refracted(eta0, cos_in)
    reflectance0 = fresnel_dielectric(eta0, cos_in, cos_refracted)

    reflect = u3 < reflectance0

    # --- reflection --------------------------------------------------------
    out_reflect = 2.0 * cos_in[:, None] * normal - view
    reflect_ok = out_reflect[:, 2] * view[:, 2] > 0.0
    f = fresnel_dielectric(relative_ior, cos_in[:, None])
    gm = ggx_smith_g1(view, alpha)
    d = ggx_distribution(normal, alpha)
    rough_factor = (gm * d / (4.0 * jnp.maximum(jnp.abs(view[:, 2]), 1e-8)))[:, None]
    prob_reflect = f * jnp.where(rough[:, None], rough_factor, 1.0)

    # --- refraction --------------------------------------------------------
    out_refract = (cos_refracted + eta0 * cos_in)[:, None] * normal - eta0[:, None] * view
    refract_ok = out_refract[:, 2] * view[:, 2] < 0.0

    # Secondary-wavelength half vectors for the same refraction.
    halves = safe_normalize(out_refract[:, None, :] + view[:, None, :] * relative_ior[..., None])
    halves = halves.at[:, 0, :].set(normal)
    cos_in4 = jnp.sum(view[:, None, :] * halves, axis=-1)
    cos_in4 = cos_in4.at[:, 0].set(cos_in)
    cos_out4 = jnp.sum(out_refract[:, None, :] * halves, axis=-1)
    cos_out4 = cos_out4.at[:, 0].set(cos_refracted)

    f4 = fresnel_dielectric(relative_ior, cos_in4, cos_out4)
    d4 = ggx_distribution(halves, alpha[:, None, :])
    plausible = cos_in4 * cos_out4 < 0.0
    d4 = jnp.where(plausible, d4, 0.0)
    d4 = d4.at[:, 0].set(ggx_distribution(normal, alpha))
    j4 = jnp.abs(cos_out4) / jnp.square(cos_in4 * relative_ior + cos_out4)
    prob_refract_rough = d4 * (1.0 - f4) * gm[:, None] * j4 * jnp.abs(
        cos_in4 / jnp.where(jnp.abs(view[:, 2]) < 1e-8, 1e-8, view[:, 2])[:, None])
    # Smooth surface: spectral collapse to the primary wavelength
    # (basic_translucent.glsl.inc:327-332).
    prob_refract_smooth = jnp.stack([
        1.0 - reflectance0, jnp.zeros(n), jnp.zeros(n), jnp.zeros(n)], axis=-1)
    prob_refract = jnp.where(rough[:, None], prob_refract_rough, prob_refract_smooth)

    scattered = jnp.where(reflect[:, None], out_reflect, out_refract)
    probability = jnp.where(reflect[:, None], prob_reflect, prob_refract)
    valid = jnp.where(reflect, reflect_ok, refract_ok)

    gs = ggx_smith_g1(scattered, alpha)
    throughput = probability * gs[:, None]
    return scattered, throughput, probability, valid
