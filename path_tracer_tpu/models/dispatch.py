"""Material dispatch: compute-all-and-select over material types.

The reference dispatches per GPU thread with branches
(/root/reference/src/scene/scene.glsl.inc:687-764). On TPU every lane
evaluates every material model and the results are selected by type --
the BSDF math is cheap relative to traversal, branches would serialize
the vector unit, and this keeps all shapes static. OpenPBR is included
in dispatch (improving on the reference, which left its device dispatch
disabled at scene.glsl.inc:685).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import (
    MATERIAL_TYPE_BASIC_DIFFUSE,
    MATERIAL_TYPE_BASIC_METAL,
    MATERIAL_TYPE_BASIC_TRANSLUCENT,
    MATERIAL_TYPE_OPENPBR,
)
from . import basic_diffuse, basic_metal, basic_translucent, openpbr


def _select(mat_type, results):
    """Select per-lane results from {material_type: value} by type.

    Channels-first means (N,) masks broadcast against (C, N) values with
    no reshaping.
    """
    types = list(results.keys())
    out = results[types[0]]
    for t in types[1:]:
        mask = mat_type == t
        if isinstance(out, tuple):
            out = tuple(jnp.where(mask, n, o) for o, n in zip(out, results[t]))
        else:
            out = jnp.where(mask, results[t], out)
    return out


def has_dirac_bsdf(ctx):
    """MaterialHasDiracBSDF (scene.glsl.inc:713-718)."""
    return _select(ctx['type'], {
        MATERIAL_TYPE_BASIC_DIFFUSE: basic_diffuse.has_dirac_bsdf(ctx),
        MATERIAL_TYPE_BASIC_METAL: basic_metal.has_dirac_bsdf(ctx),
        MATERIAL_TYPE_BASIC_TRANSLUCENT: basic_translucent.has_dirac_bsdf(ctx),
        MATERIAL_TYPE_OPENPBR: openpbr.has_dirac_bsdf(ctx),
    })


def sample_bsdf(ctx, view, rng):
    """MaterialSampleBSDF over all lanes. Draws a fixed uniform budget
    from `rng` shared by all models so lane streams stay aligned."""
    u1 = rng.uniform()
    u2 = rng.uniform()
    u3 = rng.uniform()
    u4 = rng.uniform()
    u5 = rng.uniform()
    results = {
        MATERIAL_TYPE_BASIC_DIFFUSE: basic_diffuse.sample_bsdf(ctx, view, u1, u2, u3),
        MATERIAL_TYPE_BASIC_METAL: basic_metal.sample_bsdf(ctx, view, u1, u2, u3),
        MATERIAL_TYPE_BASIC_TRANSLUCENT:
            basic_translucent.sample_bsdf(ctx, view, u1, u2, u3),
        MATERIAL_TYPE_OPENPBR: openpbr.sample_bsdf(ctx, view, u1, u2, u3, u4, u5),
    }
    return _select(ctx['type'], results)


def evaluate_bsdf(ctx, view, scattered):
    """MaterialEvaluateBSDF over all lanes."""
    results = {
        MATERIAL_TYPE_BASIC_DIFFUSE: basic_diffuse.evaluate_bsdf(ctx, view, scattered),
        MATERIAL_TYPE_BASIC_METAL: basic_metal.evaluate_bsdf(ctx, view, scattered),
        MATERIAL_TYPE_BASIC_TRANSLUCENT:
            basic_translucent.evaluate_bsdf(ctx, view, scattered),
        MATERIAL_TYPE_OPENPBR: openpbr.evaluate_bsdf(ctx, view, scattered),
    }
    return _select(ctx['type'], results)


def surface_emission(ctx):
    """Emission radiance (4, N) of the hit surface. Only OpenPBR carries
    emission (openpbr.hpp:127-133); the reference packs it but never
    accumulates it (openpbr.glsl.inc:294-298 is commented out) -- we
    wire it through the integrator, enabling emissive area surfaces."""
    em = openpbr.emission(ctx)
    return jnp.where(ctx['type'] == MATERIAL_TYPE_OPENPBR, em, 0.0)


def load_medium(ctx):
    """MaterialLoadMedium (scene.glsl.inc:704-708): only translucent and
    OpenPBR materials define an interior medium."""
    n = ctx['type'].shape[0]
    default = dict(
        ior=jnp.ones((4, n)),
        absorption=jnp.zeros((4, n)),
        scattering=jnp.zeros((4, n)),
        anisotropy=jnp.zeros((n,)),
        has_medium=jnp.zeros((n,), jnp.bool_),
    )
    translucent = basic_translucent.load_medium(ctx)
    pbr = openpbr.load_medium(ctx)
    out = {}
    for key in default:
        v = default[key]
        for t, r in ((MATERIAL_TYPE_BASIC_TRANSLUCENT, translucent),
                     (MATERIAL_TYPE_OPENPBR, pbr)):
            v = jnp.where(ctx['type'] == t, r[key], v)
        out[key] = v
    return out
