"""The scatter stage: medium events, MIS surface shading, path bookkeeping.

Fully-masked vectorization of the reference scatter kernel
(/root/reference/src/integrator/basic_scatter.glsl:44-310): every lane
computes the volumetric, skybox and surface branches and selects by
mask; material dispatch is compute-all-and-select (models/dispatch).
Channels-first SoA: rays (3, N), spectra (4, N); masks (N,) broadcast
against channel-leading values for free. Nested-dielectric priority
logic operates on (ACTIVE_SHAPE_LIMIT, N) active-shape lists with int32
sentinel SHAPE_INDEX_NONE so min-reductions express the reference's
priority rules directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import (
    ACTIVE_SHAPE_LIMIT,
    EPSILON,
    HIT_TIME_LIMIT,
    PI,
    SHAPE_INDEX_NONE,
    TAU,
    TEXTURE_INDEX_NONE,
)
from ..core.sampling import (
    Rng,
    coordinate_frame,
    random_von_mises_fisher,
    sample_direction_hg,
    von_mises_fisher_pdf,
)
from ..core.spectrum import (
    hero_wavelength_cluster,
    sample_parametric_spectrum_scaled,
    sample_standard_observer,
)
from ..core.vec import dot, max4, normalize, splat3, sum4, take_1d, vec3
from ..models import dispatch
from ..models.common import fetch_ctx, fetch_medium_ctx, sample_texture


def fetch_medium(packed, shape_index, lam, types=()):
    """ResolveMedium (basic_scatter.glsl:44-64) for (N,) shape indices.

    Returns dict(priority (N,) int32, ior (4, N), absorption (4, N),
    scattering (4, N), anisotropy (N,)). Ambient medium for
    SHAPE_INDEX_NONE lanes: unit IOR, scene scatter rate.
    """
    n = shape_index.shape[0]
    is_none = shape_index == SHAPE_INDEX_NONE
    safe_shape = jnp.where(is_none, 0, shape_index)
    material = take_1d(packed.shape_material, safe_shape)
    # Media never sample textures; use the slim medium-column fetch.
    medium = dispatch.load_medium(
        fetch_medium_ctx(packed, material, lam, types), types)

    ambient_scatter = jnp.broadcast_to(packed.scene_scatter_rate, (4, n))
    return dict(
        priority=jnp.where(is_none, SHAPE_INDEX_NONE, shape_index),
        ior=jnp.where(is_none, 1.0, medium['ior']),
        absorption=jnp.where(is_none, 0.0, medium['absorption']),
        scattering=jnp.where(is_none, ambient_scatter, medium['scattering']),
        anisotropy=jnp.where(is_none, 0.0, medium['anisotropy']),
    )


def sample_skybox_radiance(packed, direction, lam, has_texture=True,
                           atlas_size=8, filter_modes=(True, True),
                           use_quad=False):
    """SampleSkyboxRadiance (scene.glsl.inc:209-229): equirect lookup of
    parametric emission spectrum, or the default (0,0,100,1) spectrum.
    direction: (3, N), lam: (4, N) -> (4, N). `has_texture` is static:
    textureless skies skip the atlas taps entirely."""
    n = direction.shape[1]
    if not has_texture:
        default = jnp.asarray([0.0, 0.0, 100.0, 1.0])[:, None]
        spectrum = jnp.broadcast_to(default, (4, n))
        return (sample_parametric_spectrum_scaled(spectrum, lam)
                * packed.skybox_brightness)
    phi = jnp.arctan2(direction[1], direction[0])
    theta = jnp.arcsin(jnp.clip(direction[2], -1.0, 1.0))
    uv = jnp.stack([0.5 + phi / TAU, 0.5 + theta / PI], axis=0)
    # The skybox is ONE texture: fetch its metadata row once and
    # broadcast, instead of a per-lane index gather (a 2M-lane gather
    # costs ~20 ms; this path runs every round for every lane).
    meta = jax.lax.dynamic_slice_in_dim(
        packed.texture_meta, packed.skybox_texture_index, 1, 0)[0][:, None]
    spectrum = sample_texture(packed, None, uv, atlas_size,
                              filter_modes, use_quad, meta=meta)  # (4, N)
    return (sample_parametric_spectrum_scaled(spectrum, lam)
            * packed.skybox_brightness)


def _sample_surface_integrand(packed, ctx, hit, view, rng: Rng, types=(),
                              sky_sampling=True):
    """SampleSurfaceIntegrand (basic_scatter.glsl:66-109): one-sample MIS
    between BSDF importance sampling and vMF skybox light sampling.

    view: (3, N) direction toward viewer in tangent space.
    Returns (scattered (3, N), throughput (4, N), probability (4, N),
    valid (N,)).

    sky_sampling (static, SceneLayout.has_skybox_sampling): scenes
    whose skybox_sampling_probability is 0 at compile time never take
    the light branch, so the second full BSDF evaluation, the vMF pdf
    and the MIS selects drop out of the program. The RNG draw ORDER is
    preserved (u_choice and the vMF draws still advance the counter),
    so output is bitwise identical to the general path.
    """
    if sky_sampling:
        has_dirac = dispatch.has_dirac_bsdf(ctx, types)
        light_probability = jnp.where(
            has_dirac, 0.0, packed.skybox_sampling_probability)

    # Skybox mean direction in the hit tangent frame.
    mean = packed.skybox_mean_direction  # (3,)
    mean_local = vec3(
        mean[0] * hit['tangent'][0] + mean[1] * hit['tangent'][1] + mean[2] * hit['tangent'][2],
        mean[0] * hit['bitangent'][0] + mean[1] * hit['bitangent'][1] + mean[2] * hit['bitangent'][2],
        mean[0] * hit['normal'][0] + mean[1] * hit['normal'][1] + mean[2] * hit['normal'][2],
    )

    u_choice = rng.uniform()
    light_dir = random_von_mises_fisher(
        rng, packed.skybox_concentration, mean_local)
    bsdf_dir, bsdf_thr, bsdf_pdf, bsdf_ok = dispatch.sample_bsdf(
        ctx, view, rng, types)
    if not sky_sampling:
        del u_choice, light_dir  # draws consumed; values dead-coded
        return bsdf_dir, bsdf_thr, bsdf_pdf, bsdf_ok
    eval_thr, eval_pdf, eval_ok = dispatch.evaluate_bsdf(
        ctx, view, light_dir, types)

    use_light = u_choice < light_probability
    scattered = jnp.where(use_light, light_dir, bsdf_dir)
    throughput = jnp.where(use_light, eval_thr, bsdf_thr)
    material_pdf = jnp.where(use_light, eval_pdf, bsdf_pdf)
    valid = jnp.where(use_light, eval_ok & (light_dir[2] >= 0.0), bsdf_ok)

    skybox_pdf = von_mises_fisher_pdf(
        packed.skybox_concentration, mean_local, scattered)
    probability = (light_probability * skybox_pdf
                   + (1.0 - light_probability) * material_pdf)
    return scattered, throughput, probability, valid


def scatter(packed, state, ray_origin, ray_direction, hit, rng: Rng,
            termination_probability, layout=None):
    """One scatter round for all lanes (basic_scatter.glsl:114-310).

    ray_origin/ray_direction: (3, N). Returns (new_state, new_origin,
    new_direction, alive (N,)). Dead lanes carry their final `sample`
    in new_state; the caller accumulates and respawns them. `layout`
    provides static texture-usage flags.
    """
    has_sky_tex = layout.has_skybox_texture if layout is not None else True
    textured = layout.materials_textured if layout is not None else True
    atlas_size = layout.atlas_size if layout is not None else 8
    types = layout.material_types if layout is not None else ()
    filters = (layout.texture_filter_modes if layout is not None
               else (True, True))
    use_quad = layout.atlas_quad_fit if layout is not None else False
    lam = hero_wavelength_cluster(state['lambda0'])  # (4, N)

    active_shapes = state['active_shapes']           # (LIMIT, N)
    active_shape = jnp.min(active_shapes, axis=0)

    # Statically medium-free scenes (no translucent/OpenPBR material AND
    # zero ambient scatter rate -- SceneLayout.scene_has_medium) skip the
    # two fetch_medium gathers, the absorption exp and the volumetric
    # branch entirely: priority reduces to the raw shape index and every
    # medium column to its ambient constant. The three RNG draws are
    # still consumed, so the sample stream (and every golden image) is
    # bitwise identical to the general path.
    scene_has_medium = (layout.scene_has_medium if layout is not None
                        else True)
    n_lanes = active_shape.shape[0]
    if scene_has_medium:
        medium = fetch_medium(packed, active_shape, lam, types)
        throughput = state['throughput'] * jnp.exp(
            -medium['absorption'] * hit['time'])
    else:
        # Only 'priority' is read outside the has-medium branches.
        medium = dict(priority=active_shape)
        throughput = state['throughput']
    probability = state['probability']
    sample = state['sample']                         # (3, N)

    # Scattering event time at the primary wavelength.
    u_scatter = rng.uniform()
    if scene_has_medium:
        rate0 = medium['scattering'][0]
        scattering_time = jnp.where(
            rate0 > 0.0,
            -jnp.log(jnp.maximum(u_scatter, 1e-12)) / jnp.maximum(rate0, 1e-12),
            HIT_TIME_LIMIT)
    else:
        scattering_time = jnp.full_like(hit['time'], HIT_TIME_LIMIT)

    medium_event = hit['time'] >= scattering_time
    vol_scatter = medium_event & (scattering_time < HIT_TIME_LIMIT)
    sky_hit = medium_event & ~vol_scatter
    surface_event = ~medium_event

    # --- volumetric scattering (basic_scatter.glsl:142-164) ---------------
    u1 = rng.uniform()
    u2 = rng.uniform()
    if scene_has_medium:
        hg_local = sample_direction_hg(medium['anisotropy'], u1, u2)
        vx, vy = coordinate_frame(ray_direction)
        vol_dir = normalize(hg_local[0] * vx + hg_local[1] * vy
                            + hg_local[2] * ray_direction)
        vol_origin = ray_origin + ray_direction * scattering_time
        density = medium['scattering'] * jnp.exp(
            -medium['scattering'] * scattering_time)
        density = density / jnp.maximum(EPSILON, max4(density))
        vol_throughput = throughput * density
        vol_probability = probability * density
    else:
        # vol_scatter is constant-False here; these are never selected.
        vol_dir = ray_direction
        vol_origin = ray_origin
        vol_throughput = throughput
        vol_probability = probability

    # --- skybox emission (basic_scatter.glsl:165-172) ----------------------
    emission = sample_skybox_radiance(packed, ray_direction, lam,
                                      has_sky_tex, atlas_size,
                                      filters, use_quad)  # (4, N)
    cluster_pdf = jnp.maximum(sum4(probability), 1e-20)
    observer = sample_standard_observer(lam)  # (3, 4, N)
    weighted = emission * throughput          # (4, N)
    sky_contrib = jnp.einsum('ckn,kn->cn', observer, weighted) / cluster_pdf
    sky_sample = sample + sky_contrib

    # --- surface interaction (basic_scatter.glsl:177-309) ------------------
    view = -vec3(
        dot(ray_direction, hit['tangent']),
        dot(ray_direction, hit['bitangent']),
        dot(ray_direction, hit['normal']),
    )

    hit_exterior = view[2] > 0.0
    shape_priority = hit['shape']
    is_real = jnp.where(hit_exterior,
                        medium['priority'] > shape_priority,
                        medium['priority'] == shape_priority)

    # Exterior IOR on the other side of the interface.
    exclude = jnp.where(active_shapes == active_shape, SHAPE_INDEX_NONE,
                        active_shapes)
    exterior_shape = jnp.min(exclude, axis=0)
    if scene_has_medium:
        exterior_medium = fetch_medium(packed, exterior_shape, lam, types)
        exterior_ior = jnp.where(hit_exterior, medium['ior'],
                                 jnp.where(is_real, exterior_medium['ior'],
                                           1.0))
        exterior_ior = jnp.where(is_real, exterior_ior, 1.0)
    else:
        exterior_ior = jnp.ones((4, n_lanes))

    tex_attrs = (layout.textured_attrs if layout is not None
                 else ('base', 'emission', 'specular', 'roughness',
                       'roughness_anisotropy'))
    ctx = fetch_ctx(packed, hit['material'], lam, hit['uv'], exterior_ior,
                    textured, atlas_size, types, filters, tex_attrs,
                    use_quad)

    # Stochastic transparency: with probability (1 - opacity) the hit is
    # a "ghost" -- the ray passes straight through the surface with no
    # BSDF event, no emission, no medium bookkeeping and no roulette.
    # The reference serializes/edits Opacity but never reads it in a
    # shader (scene.hpp:193, openpbr.hpp:142); we wire it, statically
    # gated so all-opaque scenes never pay the column gather.
    has_opacity = layout.has_opacity if layout is not None else False
    if has_opacity:
        from ..models.common import _col
        opacity = _col(packed.materials.opacity, hit['material'])  # (N,)
        ghost = surface_event & (rng.uniform() >= opacity)
    else:
        ghost = jnp.zeros(hit['time'].shape, jnp.bool_)

    # Surface emission (OpenPBR area lights): accumulate on real exterior
    # hits before the BSDF extends the path. The reference packs emission
    # but leaves its accumulation disabled (openpbr.glsl.inc:294-298).
    emission_spec = dispatch.surface_emission(ctx, types)
    emissive_hit = surface_event & is_real & hit_exterior & ~ghost
    emit_contrib = jnp.einsum('ckn,kn->cn', observer,
                              emission_spec * throughput) / cluster_pdf
    sample = jnp.where(emissive_hit, sample + emit_contrib, sample)

    sky_sampling = (layout.has_skybox_sampling if layout is not None
                    else True)
    scattered, s_throughput, s_probability, s_valid = _sample_surface_integrand(
        packed, ctx, hit, view, rng, types, sky_sampling=sky_sampling)

    scale = 1.0 / jnp.maximum(EPSILON, max4(s_probability))
    surf_throughput = jnp.where(is_real, throughput * s_throughput * scale,
                                throughput)
    surf_probability = jnp.where(is_real, probability * s_probability * scale,
                                 probability)
    in_dir = jnp.where(is_real, scattered, -view)
    surf_valid = jnp.where(is_real, s_valid, True)

    # Active-shape-list bookkeeping on boundary crossings
    # (basic_scatter.glsl:266-292). No material type in the scene can
    # refract (SceneLayout.has_transmissive=False) => nothing is ever
    # inserted or removed (backface reflection lanes raise `leaving`
    # but never match an empty list), so the whole block is a
    # value-level no-op and is dropped statically.
    if layout is not None and not layout.has_transmissive:
        new_active = active_shapes
    else:
        crossing = in_dir[2] * view[2] < 0.0
        entering = crossing & hit_exterior & surface_event
        leaving = crossing & ~hit_exterior & surface_event

        is_none = active_shapes == SHAPE_INDEX_NONE
        first_none = jnp.argmax(is_none, axis=0)
        has_none = jnp.any(is_none, axis=0)
        slots = jnp.arange(ACTIVE_SHAPE_LIMIT)[:, None]
        insert_mask = (entering & has_none) & (slots == first_none)
        new_active = jnp.where(insert_mask, hit['shape'], active_shapes)

        matches = new_active == hit['shape']
        first_match = jnp.argmax(matches, axis=0)
        has_match = jnp.any(matches, axis=0)
        remove_mask = (leaving & has_match) & (slots == first_match)
        new_active = jnp.where(remove_mask, SHAPE_INDEX_NONE, new_active)

    # Russian roulette (basic_scatter.glsl:294-298).
    u_rr = rng.uniform()
    rr_survive = u_rr >= termination_probability
    surf_probability = surf_probability * (1.0 - termination_probability)

    surf_dir = normalize(in_dir[0] * hit['tangent'] + in_dir[1] * hit['bitangent']
                         + in_dir[2] * hit['normal'])
    # Self-intersection offset scaled with hit distance: a fixed epsilon
    # re-hits the same surface on tiny scenes and tunnels on grazing
    # hits of huge ones.
    surf_eps = jnp.maximum(1e-3, 1e-4 * hit['time'])
    surf_origin = hit['position'] + surf_eps * surf_dir

    # --- merge branches -----------------------------------------------------
    new_throughput = jnp.where(
        vol_scatter, vol_throughput,
        jnp.where(sky_hit, throughput, surf_throughput))
    new_probability = jnp.where(
        vol_scatter, vol_probability,
        jnp.where(sky_hit, jnp.zeros_like(probability), surf_probability))
    new_sample = jnp.where(sky_hit, sky_sample, sample)
    new_origin = jnp.where(vol_scatter, vol_origin,
                           jnp.where(sky_hit, ray_origin, surf_origin))
    new_direction = jnp.where(vol_scatter, vol_dir,
                              jnp.where(sky_hit, ray_direction, surf_dir))
    new_active = jnp.where(surface_event, new_active, active_shapes)

    if has_opacity:
        new_direction = jnp.where(ghost, ray_direction, new_direction)
        new_origin = jnp.where(ghost,
                               hit['position'] + surf_eps * ray_direction,
                               new_origin)
        new_throughput = jnp.where(ghost, throughput, new_throughput)
        new_probability = jnp.where(ghost, probability, new_probability)
        new_active = jnp.where(ghost, active_shapes, new_active)

    alive = max4(new_probability) > EPSILON
    alive &= jnp.where(surface_event & ~ghost, surf_valid & rr_survive, True)
    alive &= ~sky_hit

    new_state = dict(
        lambda0=state['lambda0'],
        throughput=new_throughput,
        probability=new_probability,
        sample=new_sample,
        active_shapes=new_active,
    )
    return new_state, new_origin, new_direction, alive
