"""Material dispatch: compute-all-and-select over material types.

The reference dispatches per GPU thread with branches
(/root/reference/src/scene/scene.glsl.inc:687-764). On TPU every lane
evaluates every material model and the results are selected by type --
the BSDF math is cheap relative to traversal, branches would serialize
the vector unit, and this keeps all shapes static. OpenPBR is included
in dispatch (improving on the reference, which left its device dispatch
disabled at scene.glsl.inc:685).

`types` (static, from SceneLayout.material_types) prunes the dispatch
to the material types actually present in the scene: a scene without
an OpenPBR material never compiles the 8-bounce layer walk, and a
diffuse-only scene runs one model with no selects at all. An empty
tuple means "assume everything" (layout-less callers). Lanes whose
type is not in the active set (e.g. missed rays carrying the fallback
slot) get the first active model's result; callers mask those lanes.
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

_ALL_TYPES = (MATERIAL_TYPE_BASIC_DIFFUSE, MATERIAL_TYPE_BASIC_METAL,
              MATERIAL_TYPE_BASIC_TRANSLUCENT, MATERIAL_TYPE_OPENPBR)


def active_types(types):
    if not types:
        return _ALL_TYPES
    return tuple(t for t in _ALL_TYPES if t in types)


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


def has_dirac_bsdf(ctx, types=()):
    """MaterialHasDiracBSDF (scene.glsl.inc:713-718)."""
    fns = {
        MATERIAL_TYPE_BASIC_DIFFUSE: basic_diffuse.has_dirac_bsdf,
        MATERIAL_TYPE_BASIC_METAL: basic_metal.has_dirac_bsdf,
        MATERIAL_TYPE_BASIC_TRANSLUCENT: basic_translucent.has_dirac_bsdf,
        MATERIAL_TYPE_OPENPBR: openpbr.has_dirac_bsdf,
    }
    return _select(ctx['type'], {t: fns[t](ctx) for t in active_types(types)})


def sample_bsdf(ctx, view, rng, types=()):
    """MaterialSampleBSDF over all lanes. Draws a fixed uniform budget
    from `rng` shared by all models so lane streams stay aligned."""
    act = active_types(types)
    u1 = rng.uniform()
    u2 = rng.uniform()
    u3 = rng.uniform()
    results = {}
    for t in act:
        if t == MATERIAL_TYPE_BASIC_DIFFUSE:
            results[t] = basic_diffuse.sample_bsdf(ctx, view, u1, u2, u3)
        elif t == MATERIAL_TYPE_BASIC_METAL:
            results[t] = basic_metal.sample_bsdf(ctx, view, u1, u2, u3)
        elif t == MATERIAL_TYPE_BASIC_TRANSLUCENT:
            results[t] = basic_translucent.sample_bsdf(ctx, view, u1, u2, u3)
        else:
            results[t] = openpbr.sample_bsdf(ctx, view, u1, u2, u3, rng)
    return _select(ctx['type'], results)


def evaluate_bsdf(ctx, view, scattered, types=()):
    """MaterialEvaluateBSDF over all lanes."""
    fns = {
        MATERIAL_TYPE_BASIC_DIFFUSE: basic_diffuse.evaluate_bsdf,
        MATERIAL_TYPE_BASIC_METAL: basic_metal.evaluate_bsdf,
        MATERIAL_TYPE_BASIC_TRANSLUCENT: basic_translucent.evaluate_bsdf,
        MATERIAL_TYPE_OPENPBR: openpbr.evaluate_bsdf,
    }
    return _select(ctx['type'], {t: fns[t](ctx, view, scattered)
                                 for t in active_types(types)})


def surface_emission(ctx, types=()):
    """Emission radiance (4, N) of the hit surface. Only OpenPBR carries
    emission (openpbr.hpp:127-133); the reference packs it but never
    accumulates it (openpbr.glsl.inc:294-298 is commented out) -- we
    wire it through the integrator, enabling emissive area surfaces."""
    if MATERIAL_TYPE_OPENPBR not in active_types(types):
        n = ctx['type'].shape[0]
        return jnp.zeros((4, n))
    em = openpbr.emission(ctx)
    return jnp.where(ctx['type'] == MATERIAL_TYPE_OPENPBR, em, 0.0)


def load_medium(ctx, types=()):
    """MaterialLoadMedium (scene.glsl.inc:704-708): only translucent and
    OpenPBR materials define an interior medium."""
    act = active_types(types)
    n = ctx['type'].shape[0]
    out = dict(
        ior=jnp.ones((4, n)),
        absorption=jnp.zeros((4, n)),
        scattering=jnp.zeros((4, n)),
        anisotropy=jnp.zeros((n,)),
        has_medium=jnp.zeros((n,), jnp.bool_),
    )
    sources = []
    if MATERIAL_TYPE_BASIC_TRANSLUCENT in act:
        sources.append((MATERIAL_TYPE_BASIC_TRANSLUCENT,
                        basic_translucent.load_medium(ctx)))
    if MATERIAL_TYPE_OPENPBR in act:
        sources.append((MATERIAL_TYPE_OPENPBR, openpbr.load_medium(ctx)))
    for key in out:
        v = out[key]
        for t, r in sources:
            v = jnp.where(ctx['type'] == t, r[key], v)
        out[key] = v
    return out


def has_any_medium(types):
    """Static: can any material in the scene define an interior medium?"""
    act = active_types(types)
    return (MATERIAL_TYPE_BASIC_TRANSLUCENT in act
            or MATERIAL_TYPE_OPENPBR in act)
