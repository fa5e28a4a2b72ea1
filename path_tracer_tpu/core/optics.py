"""Reflection/refraction optics: Fresnel, dispersion, metal F82-tint.

Vectorized jnp equivalents of /root/reference/src/core/common.glsl.inc:356-436.
All functions broadcast over arbitrary batch shapes; wavelength-cluster
quantities use a trailing axis of 4.
"""

from __future__ import annotations

import jax.numpy as jnp


def cauchy_empirical_ior(base_ior, abbe_number, lam):
    """Wavelength-dependent IOR via the Cauchy empirical formula.

    base_ior/abbe_number broadcast against lam (nm). Matches
    CauchyEmpiricalIOR (common.glsl.inc:360-371).
    """
    lc, ld, lf = 656.3, 587.6, 486.1
    base_ior = jnp.asarray(base_ior, jnp.float32)
    abbe = jnp.asarray(abbe_number, jnp.float32)
    b = (base_ior - 1.0) / (abbe * (1.0 / (lf * lf) - 1.0 / (lc * lc)))
    a = base_ior - b / (ld * ld)
    return a + b / (lam * lam)


def cos_theta_refracted(eta, cos_theta):
    """Cosine of refraction angle; 0 on total internal reflection.

    Matches ComputeCosThetaRefracted (common.glsl.inc:379-390). Signs
    follow the reference convention: the result is measured against the
    same normal as cos_theta and has the opposite sign.
    """
    cos2 = 1.0 - eta * eta * (1.0 - cos_theta * cos_theta)
    return -jnp.sign(cos_theta) * jnp.sqrt(jnp.maximum(cos2, 0.0))


def fresnel_dielectric(eta, cos_theta1, cos_theta2=None):
    """Unpolarized dielectric Fresnel reflectance (common.glsl.inc:396-420).

    If cos_theta2 is omitted it is derived from eta and cos_theta1.
    """
    if cos_theta2 is None:
        cos_theta2 = cos_theta_refracted(eta, cos_theta1)
    ks = eta * cos_theta1
    sqrt_rs = (ks + cos_theta2) / (ks - cos_theta2)
    kp = eta * cos_theta2
    sqrt_rp = (kp + cos_theta1) / (kp - cos_theta1)
    return 0.5 * (sqrt_rs * sqrt_rs + sqrt_rp * sqrt_rp)


def schlick_fresnel_metal(base, specular, cos_theta):
    """F82-tint spectral metal Fresnel (Kutz et al.), common.glsl.inc:425-436.

    base/specular: (4, N) spectral reflectances; cos_theta (N,)
    broadcasts over the leading spectral axis (channels-first).
    """
    cos_theta_max = 1.0 / 7.0
    cos_theta = jnp.asarray(cos_theta, jnp.float32)
    one_minus = jnp.maximum(0.0, 1.0 - cos_theta)
    f_schlick = base + (1.0 - base) * one_minus ** 5
    f_schlick_max = base + (1.0 - base) * (1.0 - cos_theta_max) ** 5
    f_max = specular * f_schlick_max
    denominator = cos_theta_max * (1.0 - cos_theta_max) ** 6
    nominator = cos_theta * one_minus ** 6
    return f_schlick - (nominator / denominator) * (f_schlick_max - f_max)
