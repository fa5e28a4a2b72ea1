"""OpenPBR layered surface model.

Target behavior: /root/reference/src/scene/openpbr.glsl.inc -- a
stochastic layered slab (coat / metal / translucent-base / glossy-
diffuse) with specular-weight IOR remapping, coat absorption, and
emission. The reference packs this material host-side but ships with its
device dispatch disabled (scene.glsl.inc:685), so OpenPBR surfaces shade
as the fallback there; we wire it into dispatch.

Current implementation: a physically-plausible single-bounce reduction
of the slab (metalness lerp between an F82 metal lobe and a dielectric
specular-over-diffuse base, plus interior medium from transmission
parameters). The full stochastic layer walk (openpbr.glsl.inc:463-515)
is the next milestone for this model.

Channels-first: directions (3, N), spectra (4, N).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import EPSILON, PI
from ..core.optics import (
    cauchy_empirical_ior,
    fresnel_dielectric,
    schlick_fresnel_metal,
)
from ..core.sampling import (
    ggx_distribution,
    ggx_roughness_alpha,
    ggx_smith_g1,
    ggx_visible_normal,
)
from ..core.vec import dot, safe_normalize, vec3
from ..core.spectrum import sample_parametric_spectrum


def _params(ctx):
    alpha = ggx_roughness_alpha(ctx['roughness'], ctx['roughness_anisotropy'])
    rough = alpha[0] * alpha[1] > EPSILON
    base = ctx['base_reflectance'] * ctx['base_weight']
    return alpha, rough, base


def has_dirac_bsdf(ctx):
    return (ctx['base_metalness'] > 0.999) & (ctx['roughness'] < 1e-3)


def load_medium(ctx):
    """Interior medium from transmission color/depth/scatter
    (openpbr.hpp:106-121 parameter semantics)."""
    lam = ctx['lam']
    ior = cauchy_empirical_ior(
        ctx['specular_ior'], ctx['transmission_dispersion_abbe'], lam)
    depth = ctx['transmission_depth']
    has_depth = depth > 0.0
    safe_depth = jnp.where(has_depth, depth, 1.0)
    transmission = sample_parametric_spectrum(ctx['transmission_spectrum'], lam)
    extinction = -jnp.log(jnp.maximum(transmission, 1e-9)) / safe_depth
    scattering = sample_parametric_spectrum(
        ctx['transmission_scatter_spectrum'], lam) / safe_depth
    absorption = jnp.maximum(extinction - scattering, 0.0)
    zero = jnp.zeros_like(absorption)
    return dict(
        ior=ior,
        absorption=jnp.where(has_depth, absorption, zero),
        scattering=jnp.where(has_depth, scattering, zero),
        anisotropy=jnp.where(has_depth, ctx['transmission_scatter_anisotropy'], 0.0),
        has_medium=jnp.ones(lam.shape[1], jnp.bool_),
    )


def evaluate_bsdf(ctx, view, scattered):
    n = view.shape[1]
    alpha, rough, base = _params(ctx)
    valid = (view[2] > 0.0) & (scattered[2] > 0.0)

    half = safe_normalize(view + scattered)
    cos_vh = dot(view, half)
    gm = ggx_smith_g1(view, alpha)
    gs = ggx_smith_g1(scattered, alpha)
    d = ggx_distribution(half, alpha)
    spec_pdf = gm * d / (4.0 * jnp.maximum(view[2], 1e-8))
    spec_pdf = jnp.where(rough, spec_pdf, 0.0)

    # Metal lobe (F82 tint).
    f_metal = schlick_fresnel_metal(
        base, ctx['specular_reflectance'] * ctx['specular_weight'], cos_vh)
    metal_throughput = spec_pdf * gs * f_metal

    # Dielectric: specular reflection + energy-compensated diffuse.
    f_dielectric = fresnel_dielectric(1.0 / ctx['specular_ior'], cos_vh)
    f_dielectric = jnp.clip(f_dielectric * ctx['specular_weight'], 0.0, 1.0)
    diffuse_pdf = jnp.maximum(scattered[2], 0.0) / PI
    spec_throughput = spec_pdf * gs * f_dielectric
    diffuse_throughput = diffuse_pdf * base * (1.0 - f_dielectric)
    dielectric_pdf = 0.5 * spec_pdf + 0.5 * diffuse_pdf
    dielectric_throughput = spec_throughput + diffuse_throughput

    metalness = ctx['base_metalness']
    throughput = metalness * metal_throughput + (1.0 - metalness) * dielectric_throughput
    pdf = metalness * spec_pdf + (1.0 - metalness) * dielectric_pdf
    probability = jnp.broadcast_to(pdf, (4, n))
    return throughput, probability, valid


def sample_bsdf(ctx, view, u1, u2, u3, u4, u5):
    n = view.shape[1]
    alpha, rough, base = _params(ctx)
    valid = view[2] > 0.0

    # Specular direction via VNDF.
    normal = ggx_visible_normal(view, alpha, u1, u2)
    cos_theta = jnp.minimum(dot(normal, view), 1.0)
    spec_dir = 2.0 * cos_theta * normal - view

    # Diffuse direction (cosine lobe).
    z = 2.0 * u4 - 1.0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u5
    diff_dir = safe_normalize(vec3(r * jnp.cos(phi), r * jnp.sin(phi), z + 1.0))

    # Lobe choice: metal/specular with probability driven by metalness and
    # a 50/50 dielectric split (matches the evaluate-side pdf mix).
    metal = u3 < ctx['base_metalness']
    choose_spec = metal | (u3 >= 0.5 * (1.0 + ctx['base_metalness']))
    scattered = jnp.where(choose_spec, spec_dir, diff_dir)
    valid &= scattered[2] > 0.0

    throughput, probability, ok = evaluate_bsdf(ctx, view, scattered)
    # Smooth metal: treat as Dirac (probability is a delta coefficient).
    dirac = has_dirac_bsdf(ctx)
    f_metal = schlick_fresnel_metal(
        base, ctx['specular_reflectance'] * ctx['specular_weight'], cos_theta)
    gs = ggx_smith_g1(scattered, alpha)
    throughput = jnp.where(dirac, f_metal * gs, throughput)
    probability = jnp.where(dirac, jnp.ones((4, n)), probability)
    return scattered, throughput, probability, valid & ok
