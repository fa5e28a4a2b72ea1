"""Shared material machinery: texture sampling and attribute fetch.

Equivalent of the texture/material accessor layer of the reference
(/root/reference/src/scene/scene.glsl.inc:181-302). Channels-first: UVs
are (2, N), spectra (3/4, N); material attributes come from the
column-oriented MaterialTable with gathers along the trailing material
axis, collected once per scatter into a `ctx` dict so the individual
BSDF models are pure elementwise math.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import TEXTURE_FLAG_FILTER_NEAREST, TEXTURE_INDEX_NONE
from ..core.spectrum import sample_parametric_spectrum
from ..core.vec import take_1d


def sample_texture(packed, texture_index, uv, atlas_size,
                   filter_modes=(True, True), use_quad=False, meta=None):
    """Sample the texture atlas (scene.glsl.inc:181-205).

    texture_index: (N,) int32 (TEXTURE_INDEX_NONE allowed -- result is
    garbage for those lanes; callers mask). uv: (2, N); atlas_size is
    the static layer edge length. Returns (4, N). Applies per-texture
    placement with wrap, then nearest or bilinear filtering by flag.

    Gathers cost per lane-index on TPU, so every knob here removes
    gathers: the per-texture metadata (placement, layer, flags) comes
    from ONE (T, 8) row-gather (or zero -- callers with a single static
    texture pass `meta` as an (8, 1) column fetched once, e.g. the
    skybox); with `use_quad` (static, from SceneLayout.atlas_quad_fit)
    a bilinear tap is ONE row-gather of the precomputed 2x2-quad atlas
    instead of four corner gathers, and the nearest tap selects among
    the same four values for free; `filter_modes` (static
    (has_bilinear, has_nearest)) skips whole filter paths.
    """
    if meta is None:
        safe_idx = jnp.where(texture_index == TEXTURE_INDEX_NONE, 0,
                             texture_index)
        meta = jnp.take(packed.texture_meta, safe_idx, axis=0).T  # (8, N)
    pmin = meta[0:2]
    pmax = meta[2:4]
    layer = meta[4].astype(jnp.int32)
    flags = meta[5].astype(jnp.int32)

    frac_uv = uv - jnp.floor(uv)
    u = pmin[0] + (pmax[0] - pmin[0]) * frac_uv[0]
    v = pmin[1] + (pmax[1] - pmin[1]) * frac_uv[1]

    size = atlas_size

    # Texel-space coordinates with half-texel convention.
    x = u * size - 0.5
    y = v * size - 0.5
    has_bilinear, has_nearest = filter_modes

    # The filter combine runs LANE-MAJOR (N, 4): gather output is
    # (N, k), so combining before the channels-first transpose shrinks
    # the lane/sublane shuffle 4x. Bit-identical output; measured -15 ms
    # on the STANDALONE scatter program at 2M lanes
    # (tools/exp_skytap3.py) -- the fused round program was already
    # neutral (XLA fuses the transpose there; bench unchanged), so this
    # pays in the standalone stage jits (viewer preview, tools).
    if use_quad == 'pair':
        # bf16 texel-pair rows [c(x,y) | c(x,y+1)]: TWO gathers per
        # bilinear tap (left column pair + right column pair) from an
        # operand small enough for the gather fast path where the f32
        # quad table is 4x over budget (production-size atlases;
        # scene/compile.py _build_atlas_pair). Corner clamping matches
        # the 4-gather path exactly; texels are bf16-rounded.
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = jnp.where(x0 < 0, 0.0, x - x0)[..., None]
        fy = jnp.where(y0 < 0, 0.0, y - y0)[..., None]
        x0c = jnp.clip(x0, 0, size - 1)
        x1c = jnp.clip(x0 + 1, 0, size - 1)
        y0c = jnp.clip(y0, 0, size - 1)
        base_i = (layer * size + y0c) * size
        pl = jnp.take(packed.atlas_pair, base_i + x0c,
                      axis=0).astype(jnp.float32)          # (N, 8)
        pr = jnp.take(packed.atlas_pair, base_i + x1c,
                      axis=0).astype(jnp.float32)
        c00, c01 = pl[..., 0:4], pl[..., 4:8]
        c10, c11 = pr[..., 0:4], pr[..., 4:8]
        linear = nearest = None
        if has_bilinear:
            linear = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
                      + (c01 * (1 - fx) + c11 * fx) * fy)  # (N, 4)
        if has_nearest:
            xn = jnp.clip(jnp.round(x).astype(jnp.int32), 0, size - 1)
            yn = jnp.clip(jnp.round(y).astype(jnp.int32), 0, size - 1)
            sx = (xn > x0c)[..., None]
            sy = (yn > y0c)[..., None]
            nearest = jnp.where(sx & sy, c11,
                                jnp.where(sx, c10, jnp.where(sy, c01, c00)))
    elif use_quad:
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        # Forcing the fraction to 0 when floor clips below 0 reproduces
        # the 4-gather path's double-clamped corners exactly.
        fx = jnp.where(x0 < 0, 0.0, x - x0)[..., None]
        fy = jnp.where(y0 < 0, 0.0, y - y0)[..., None]
        x0c = jnp.clip(x0, 0, size - 1)
        y0c = jnp.clip(y0, 0, size - 1)
        idx = (layer * size + y0c) * size + x0c
        q = jnp.take(packed.atlas_quad, idx, axis=0)     # (N, 16)
        c00, c10, c01, c11 = (q[..., 0:4], q[..., 4:8],
                              q[..., 8:12], q[..., 12:16])
        linear = nearest = None
        if has_bilinear:
            linear = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
                      + (c01 * (1 - fx) + c11 * fx) * fy)  # (N, 4)
        if has_nearest:
            xn = jnp.clip(jnp.round(x).astype(jnp.int32), 0, size - 1)
            yn = jnp.clip(jnp.round(y).astype(jnp.int32), 0, size - 1)
            sx = (xn > x0c)[..., None]
            sy = (yn > y0c)[..., None]
            nearest = jnp.where(sx & sy, c11,
                                jnp.where(sx, c10, jnp.where(sy, c01, c00)))
    else:
        rows = packed.atlas  # (texels, 4)

        def fetch(px, py):
            px = jnp.clip(px, 0, size - 1)
            py = jnp.clip(py, 0, size - 1)
            idx = (layer * size + py) * size + px
            return jnp.take(rows, idx, axis=0)   # (N, 4)

        linear = nearest = None
        if has_bilinear:
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            fx = (x - x0)[..., None]
            fy = (y - y0)[..., None]
            c00 = fetch(x0, y0)
            c10 = fetch(x0 + 1, y0)
            c01 = fetch(x0, y0 + 1)
            c11 = fetch(x0 + 1, y0 + 1)
            linear = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
                      + (c01 * (1 - fx) + c11 * fx) * fy)  # (N, 4)
        if has_nearest:
            xn = jnp.round(x).astype(jnp.int32)
            yn = jnp.round(y).astype(jnp.int32)
            nearest = fetch(xn, yn)

    if not has_nearest:
        return linear.T
    if not has_bilinear:
        return nearest.T
    use_nearest = ((flags & TEXTURE_FLAG_FILTER_NEAREST) != 0)[..., None]
    return jnp.where(use_nearest, nearest, linear).T


def texturable_reflectance(packed, beta, texture_index, lam, uv, textured,
                           atlas_size, filter_modes=(True, True),
                           use_quad=False):
    """Spectral reflectance of a texturable color attribute
    (scene.glsl.inc:276-290). beta: (3, N), lam: (4, N) -> (4, N).
    `textured` is a static flag: untextured scenes skip the taps."""
    value = sample_parametric_spectrum(beta, lam)
    if not textured:
        return value
    has_texture = texture_index != TEXTURE_INDEX_NONE
    tex_beta = sample_texture(packed, texture_index, uv, atlas_size,
                              filter_modes, use_quad)[:3]
    tex_value = sample_parametric_spectrum(tex_beta, lam)
    return jnp.where(has_texture, value * tex_value, value)


def texturable_value(packed, value, texture_index, uv, textured, atlas_size,
                     filter_modes=(True, True), use_quad=False):
    """Scalar texturable attribute (scene.glsl.inc:292-302)."""
    if not textured:
        return value
    has_texture = texture_index != TEXTURE_INDEX_NONE
    tex = sample_texture(packed, texture_index, uv, atlas_size,
                         filter_modes, use_quad)[0]
    return jnp.where(has_texture, value * tex, value)


def _col(table_column, i):
    """Gather a material column at lane material indices.

    Multi-component columns gather per component row (see core/vec.py
    take_vec rationale: slice gathers force lane-hostile layouts)."""
    if table_column.ndim == 1:
        return take_1d(table_column, i)
    return jnp.stack([take_1d(table_column[c], i)
                      for c in range(table_column.shape[0])], axis=0)


def _presence(types):
    """Static per-model presence flags from SceneLayout.material_types
    (empty tuple -> assume everything)."""
    from ..core.constants import (
        MATERIAL_TYPE_BASIC_METAL, MATERIAL_TYPE_BASIC_TRANSLUCENT,
        MATERIAL_TYPE_OPENPBR)
    if not types:
        return True, True, True
    return (MATERIAL_TYPE_BASIC_METAL in types,
            MATERIAL_TYPE_BASIC_TRANSLUCENT in types,
            MATERIAL_TYPE_OPENPBR in types)


def fetch_medium_ctx(packed, material_index, lam, types=()):
    """Gather only the columns needed by load_medium (no texture reads).
    Column gathers for models absent from the scene are skipped."""
    _, has_trans, has_pbr = _presence(types)
    m = packed.materials
    i = material_index
    ctx = dict(type=_col(m.type, i), lam=lam)
    if has_trans:
        ctx.update(
            ior=_col(m.ior, i),
            abbe_number=_col(m.abbe_number, i),
            transmission_spectrum=_col(m.transmission_spectrum, i),
            transmission_depth=_col(m.transmission_depth, i),
            scattering_spectrum=_col(m.scattering_spectrum, i),
            scattering_anisotropy=_col(m.scattering_anisotropy, i),
        )
    if has_pbr:
        ctx.update(
            specular_ior=_col(m.specular_ior, i),
            transmission_depth=_col(m.transmission_depth, i),
            transmission_spectrum=_col(m.transmission_spectrum, i),
            transmission_scatter_spectrum=_col(m.transmission_scatter_spectrum, i),
            transmission_scatter_anisotropy=_col(m.transmission_scatter_anisotropy, i),
            transmission_dispersion_abbe=_col(m.transmission_dispersion_abbe, i),
        )
    return ctx


ALL_TEXTURED_ATTRS = ('base', 'emission', 'specular', 'roughness',
                      'roughness_anisotropy')


def fetch_ctx(packed, material_index, lam, uv, exterior_ior,
              textured=True, atlas_size=8, types=(),
              filter_modes=(True, True), textured_attrs=ALL_TEXTURED_ATTRS,
              use_quad=False):
    """Gather every material attribute for the given lanes.

    material_index: (N,) int32 slots into the MaterialTable. Returns a
    dict of per-lane parameter arrays -- the vectorized analogue of
    bsdf_parameters (scene.glsl.inc:659-665) with all table reads done.
    `textured`/`atlas_size`/`types` are static (from SceneLayout);
    columns only read by material models absent from the scene are not
    gathered at all (gathers cost per index on TPU).
    """
    has_metal, has_trans, has_pbr = _presence(types)
    m = packed.materials
    i = material_index
    ctx = dict(
        type=_col(m.type, i),
        lam=lam,
        uv=uv,
        exterior_ior=exterior_ior,
        base_reflectance=texturable_reflectance(
            packed, _col(m.base_spectrum, i), _col(m.base_texture, i), lam, uv,
            textured and 'base' in textured_attrs, atlas_size, filter_modes,
            use_quad),
    )
    if has_metal or has_pbr:
        ctx['specular_reflectance'] = texturable_reflectance(
            packed, _col(m.specular_spectrum, i), _col(m.specular_texture, i),
            lam, uv, textured and 'specular' in textured_attrs, atlas_size,
            filter_modes, use_quad)
    if has_metal or has_trans or has_pbr:
        ctx['roughness'] = texturable_value(
            packed, _col(m.roughness, i), _col(m.roughness_texture, i), uv,
            textured and 'roughness' in textured_attrs, atlas_size,
            filter_modes, use_quad)
        ctx['roughness_anisotropy'] = texturable_value(
            packed, _col(m.roughness_anisotropy, i),
            _col(m.roughness_anisotropy_texture, i), uv,
            textured and 'roughness_anisotropy' in textured_attrs,
            atlas_size, filter_modes, use_quad)
    if has_trans:
        ctx.update(
            ior=_col(m.ior, i),
            abbe_number=_col(m.abbe_number, i),
            transmission_spectrum=_col(m.transmission_spectrum, i),
            transmission_depth=_col(m.transmission_depth, i),
            scattering_spectrum=_col(m.scattering_spectrum, i),
            scattering_anisotropy=_col(m.scattering_anisotropy, i),
        )
    if has_pbr:
        ctx.update(
            base_weight=_col(m.base_weight, i),
            base_metalness=_col(m.base_metalness, i),
            base_diffuse_roughness=_col(m.base_diffuse_roughness, i),
            specular_weight=_col(m.specular_weight, i),
            specular_ior=_col(m.specular_ior, i),
            transmission_weight=_col(m.transmission_weight, i),
            transmission_spectrum=_col(m.transmission_spectrum, i),
            transmission_depth=_col(m.transmission_depth, i),
            transmission_scatter_spectrum=_col(m.transmission_scatter_spectrum, i),
            transmission_scatter_anisotropy=_col(m.transmission_scatter_anisotropy, i),
            transmission_dispersion_abbe=_col(m.transmission_dispersion_abbe, i),
            coat_weight=_col(m.coat_weight, i),
            coat_spectrum=_col(m.coat_spectrum, i),
            coat_ior=_col(m.coat_ior, i),
            coat_roughness=_col(m.coat_roughness, i),
            coat_roughness_anisotropy=_col(m.coat_roughness_anisotropy, i),
            # coat_darkening stays in the table for serialization parity
            # but is gathered by no model (the reference declares
            # OPENPBR_COAT_DARKENING and likewise never reads it).
            emission_reflectance=texturable_reflectance(
                packed, _col(m.emission_spectrum, i),
                _col(m.emission_texture, i), lam, uv,
                textured and 'emission' in textured_attrs, atlas_size,
                filter_modes, use_quad),
            emission_luminance=_col(m.emission_luminance, i),
            layer_bounce_limit=_col(m.layer_bounce_limit, i),
        )
    return ctx
