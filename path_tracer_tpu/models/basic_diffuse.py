"""Basic Diffuse material: Lambertian with texturable base color.

Vectorized equivalent of
/root/reference/src/scene/basic_diffuse.glsl.inc. Channels-first:
directions (3, N) in the hit tangent frame (+Z = shading normal);
spectral quantities (4, N) over the hero wavelength cluster.

Naming: `view` is the direction toward the viewer (the reference's BSDF
"In"), `scattered` is the sampled/evaluated light direction (the
reference's BSDF "Out", which becomes the extension ray).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import PI
from ..core.vec import safe_normalize, vec3


def has_dirac_bsdf(ctx):
    n = ctx['type'].shape[0]
    return jnp.zeros((n,), jnp.bool_)


def evaluate_bsdf(ctx, view, scattered):
    """Cosine-lobe evaluation (basic_diffuse.glsl.inc:19-34).

    Returns (throughput (4, N), probability (4, N), valid (N,)).
    Deviation from the reference: basic_diffuse.glsl.inc:31 computes the
    PDF from the *view* cosine (`In.z / PI` with In = view). For pure
    BSDF sampling the factor cancels in the throughput/probability
    estimator (identical output), but it biases one-sample MIS against
    the vMF skybox pdf whenever SkyboxSamplingProbability > 0 (which the
    reference defaults to 0, so the bias is latent there). We use the
    correct cosine-lobe pdf of the *scattered* direction, which matches
    the reference bit-for-bit in its default configuration and is
    unbiased under MIS.
    """
    n = ctx['type'].shape[0]
    probability = jnp.broadcast_to(
        jnp.maximum(scattered[2], 0.0) / PI, (4, n))
    throughput = probability * ctx['base_reflectance']
    valid = jnp.ones((n,), jnp.bool_)
    return throughput, probability, valid


def sample_bsdf(ctx, view, u1, u2, u3):
    """Cosine-weighted hemisphere sample (basic_diffuse.glsl.inc:37-50):
    uniform sphere direction + z-axis, normalized."""
    z = 2.0 * u1 - 1.0
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2.0 * PI * u2
    scattered = safe_normalize(
        vec3(r * jnp.cos(phi), r * jnp.sin(phi), z + 1.0))
    throughput, probability, valid = evaluate_bsdf(ctx, view, scattered)
    return scattered, throughput, probability, valid
