"""Basic Translucent material: rough dispersive dielectric + interior medium.

Vectorized equivalent of
/root/reference/src/scene/basic_translucent.glsl.inc: GGX
reflect/refract with Cauchy dispersion over the 4-wavelength hero
cluster, per-wavelength refraction half-vector bookkeeping (secondary-
wavelength densities for the same refraction event), spectral collapse
to the primary wavelength on smooth refraction, and a Beer-Lambert /
Henyey-Greenstein interior medium derived from transmission color/depth.

Channels-first: `view`/`scattered` (3, N); spectral quantities (4, N).
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
)
from ..core.vec import dot, safe_normalize
from ..core.spectrum import sample_parametric_spectrum


def _params(ctx, view):
    """Relative IOR per wavelength + roughness (basic_translucent.glsl.inc:10-48)."""
    interior = cauchy_empirical_ior(ctx['ior'], ctx['abbe_number'], ctx['lam'])
    exterior = ctx['exterior_ior']
    entering = view[2] >= 0.0
    relative = jnp.where(entering, exterior / interior, interior / exterior)
    alpha = ggx_roughness_alpha(ctx['roughness'], ctx['roughness_anisotropy'])
    rough = alpha[0] * alpha[1] > EPSILON
    return relative, alpha, rough


def has_dirac_bsdf(ctx):
    return ctx['roughness'] < 1e-3


def load_medium(ctx):
    """Interior participating medium (basic_translucent.glsl.inc:55-82).

    Returns dict(ior (4, N), absorption (4, N), scattering (4, N),
    anisotropy (N,), has_medium (N,) bool).
    """
    lam = ctx['lam']
    ior = cauchy_empirical_ior(ctx['ior'], ctx['abbe_number'], lam)
    depth = ctx['transmission_depth']
    has_depth = depth > 0.0
    safe_depth = jnp.where(has_depth, depth, 1.0)
    transmission = sample_parametric_spectrum(ctx['transmission_spectrum'], lam)
    extinction = -jnp.log(jnp.maximum(transmission, 1e-9)) / safe_depth
    scattering = sample_parametric_spectrum(ctx['scattering_spectrum'], lam) / safe_depth
    absorption = jnp.maximum(extinction - scattering, 0.0)
    zero = jnp.zeros_like(absorption)
    return dict(
        ior=ior,
        absorption=jnp.where(has_depth, absorption, zero),
        scattering=jnp.where(has_depth, scattering, zero),
        anisotropy=jnp.where(has_depth, ctx['scattering_anisotropy'], 0.0),
        has_medium=jnp.ones(lam.shape[1], jnp.bool_),
    )


def _refraction_halves(scattered, view, relative_ior):
    """Per-wavelength refraction half vectors: (4, 3, N) stacked over the
    spectral axis (basic_translucent.glsl.inc:133-139)."""
    # (4, 3, N): scattered + view * eta_k, per wavelength k.
    h = scattered[None, :, :] + view[None, :, :] * relative_ior[:, None, :]
    lsq = jnp.sum(h * h, axis=1, keepdims=True)
    bad = lsq < 1e-12
    inv = 1.0 / jnp.sqrt(jnp.where(bad, 1.0, lsq))
    unit_z = jnp.zeros_like(h).at[:, 2, :].set(1.0)
    return jnp.where(bad, unit_z, h * inv)


def evaluate_bsdf(ctx, view, scattered):
    """basic_translucent.glsl.inc:90-169. Rough surfaces only; smooth
    surfaces return zero (their lobes are Dirac deltas)."""
    n = view.shape[1]
    relative_ior, alpha, rough = _params(ctx, view)

    gm = ggx_smith_g1(view, alpha)
    gs = ggx_smith_g1(scattered, alpha)

    same_side = view[2] * scattered[2] > 0.0

    # --- reflection branch -------------------------------------------------
    half_r = safe_normalize(scattered + view)
    cos_in_r = dot(half_r, view)
    f_r = fresnel_dielectric(relative_ior, cos_in_r)
    d_r = ggx_distribution(half_r, alpha)
    prob_reflect = f_r * (gm * d_r / (4.0 * jnp.maximum(jnp.abs(view[2]), 1e-8)))

    # --- refraction branch (per-wavelength half vectors) -------------------
    halves = _refraction_halves(scattered, view, relative_ior)   # (4, 3, N)
    cos_in = jnp.sum(view[None] * halves, axis=1)                # (4, N)
    cos_out = jnp.sum(scattered[None] * halves, axis=1)          # (4, N)
    f_t = fresnel_dielectric(relative_ior, cos_in, cos_out)
    d_each = ggx_distribution(jnp.moveaxis(halves, 1, 0), alpha[:, None, :])
    d_t = jnp.where(cos_in * cos_out < 0.0, d_each, 0.0)
    j = jnp.abs(cos_out) / jnp.square(cos_in * relative_ior + cos_out)
    vz_safe = jnp.where(jnp.abs(view[2]) < 1e-8, 1e-8, view[2])
    prob_refract = d_t * (1.0 - f_t) * gm * j * jnp.abs(cos_in / vz_safe)

    probability = jnp.where(same_side, prob_reflect, prob_refract)
    probability = jnp.where(rough, probability, 0.0)
    throughput = probability * gs
    valid = jnp.ones((n,), jnp.bool_)
    return throughput, probability, valid


def sample_bsdf(ctx, view, u1, u2, u3):
    """basic_translucent.glsl.inc:172-339.

    u1/u2 drive the VNDF normal, u3 the reflect/refract choice at the
    primary wavelength's Fresnel coefficient.
    """
    n = view.shape[1]
    relative_ior, alpha, rough = _params(ctx, view)
    eta0 = relative_ior[0]

    sign_z = jnp.sign(jnp.where(view[2] == 0.0, 1.0, view[2]))
    normal = ggx_visible_normal(view * sign_z, alpha, u1, u2)

    cos_in = jnp.clip(dot(normal, view), -1.0, 1.0)
    cos_refracted = cos_theta_refracted(eta0, cos_in)
    reflectance0 = fresnel_dielectric(eta0, cos_in, cos_refracted)

    reflect = u3 < reflectance0

    # --- reflection --------------------------------------------------------
    out_reflect = 2.0 * cos_in * normal - view
    reflect_ok = out_reflect[2] * view[2] > 0.0
    f = fresnel_dielectric(relative_ior, cos_in)
    gm = ggx_smith_g1(view, alpha)
    d = ggx_distribution(normal, alpha)
    rough_factor = gm * d / (4.0 * jnp.maximum(jnp.abs(view[2]), 1e-8))
    prob_reflect = f * jnp.where(rough, rough_factor, 1.0)

    # --- refraction --------------------------------------------------------
    out_refract = (cos_refracted + eta0 * cos_in) * normal - eta0 * view
    refract_ok = out_refract[2] * view[2] < 0.0

    # Secondary-wavelength half vectors for the same refraction.
    halves = _refraction_halves(out_refract, view, relative_ior)  # (4, 3, N)
    halves = halves.at[0].set(normal)
    cos_in4 = jnp.sum(view[None] * halves, axis=1)
    cos_in4 = cos_in4.at[0].set(cos_in)
    cos_out4 = jnp.sum(out_refract[None] * halves, axis=1)
    cos_out4 = cos_out4.at[0].set(cos_refracted)

    f4 = fresnel_dielectric(relative_ior, cos_in4, cos_out4)
    d4 = ggx_distribution(jnp.moveaxis(halves, 1, 0), alpha[:, None, :])
    plausible = cos_in4 * cos_out4 < 0.0
    d4 = jnp.where(plausible, d4, 0.0)
    d4 = d4.at[0].set(ggx_distribution(normal, alpha))
    j4 = jnp.abs(cos_out4) / jnp.square(cos_in4 * relative_ior + cos_out4)
    vz_safe = jnp.where(jnp.abs(view[2]) < 1e-8, 1e-8, view[2])
    prob_refract_rough = d4 * (1.0 - f4) * gm * j4 * jnp.abs(cos_in4 / vz_safe)
    # Smooth surface: spectral collapse to the primary wavelength
    # (basic_translucent.glsl.inc:327-332).
    zero = jnp.zeros(n)
    prob_refract_smooth = jnp.stack(
        [1.0 - reflectance0, zero, zero, zero], axis=0)
    prob_refract = jnp.where(rough, prob_refract_rough, prob_refract_smooth)

    scattered = jnp.where(reflect, out_reflect, out_refract)
    probability = jnp.where(reflect, prob_reflect, prob_refract)
    valid = jnp.where(reflect, reflect_ok, refract_ok)

    gs = ggx_smith_g1(scattered, alpha)
    throughput = probability * gs
    return scattered, throughput, probability, valid
