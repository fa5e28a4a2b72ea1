"""Ray-scene intersection: analytic primitives, triangles, BVH traversal.

TPU-native trace stage. Behavioral reference:
/root/reference/src/scene/scene.glsl.inc:304-611 (Moller-Trumbore,
stackless-stack BVH walk, analytic plane/sphere/cube in object space,
hit attribute resolution). The design differs from the SIMT original
where it matters for TPU:

  * Channels-first SoA everywhere (core/vec.py): rays are (3, N), so
    the lane axis rides the 128-wide minor dimension with no padding.
  * Analytic shapes are intersected as a dense (S_shapes, N_rays)
    broadcast batch -- no gathers at all; the winner is an argmin.
  * Mesh instances are traced one instance at a time (a static Python
    loop over the compile-time instance list), each as a vectorized
    BVH2 traversal over all rays with a per-lane traversal stack.
    The object->world matrices enter as statically-indexed slices, so
    lanes never gather transforms.
  * Leaf face intersection is unrolled to a compile-time maximum
    (the builder caps leaf size), keeping every loop bound static.

Hit state is a dict of SoA arrays over rays.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.constants import (
    EPSILON,
    HIT_TIME_LIMIT,
    INFINITY,
    PI,
    SHAPE_INDEX_NONE,
    TEXTURE_INDEX_NONE,
    SHAPE_TYPE_CUBE,
    SHAPE_TYPE_MESH_INSTANCE,
    SHAPE_TYPE_PLANE,
    SHAPE_TYPE_SPHERE,
    TAU,
)
from ..core.vec import (
    cross,
    dot,
    safe_normalize,
    take_1d,
    take_matrix,
    take_vec,
    transform_normal,
    transform_point,
    transform_vector,
    vec3,
)
from ..core.sampling import compute_tangent_vector

MAX_LEAF_FACES = 4


def ray_sort_key(packed, origin, direction):
    """Directional-spatial coherence key: 3-bit direction octant
    (major), 15-bit Morton cell of the origin within the scene bounds,
    then a 12-bit direction Morton as LOW-order tie-break.

    Octant-MAJOR ordering measured 2x fewer node pops on bounce packets
    and 6x faster traces than Morton-major (tools/diag_trace.py): a
    packet whose direction components span zero defeats both the
    near-first push order and any slab-sign coherence.

    The direction tie-break (tools/exp_dirtiebreak.py) refines WITHIN
    a (octant, origin-cell) tie group -- unlike the exp_sortkeys.py
    variants it removes no origin bits. It exists for freshly
    respawned camera rays, which all share the camera's origin cell
    and were otherwise left in lane (raster) order: a 3072-ray packet
    was a 1920 x 1.6 PIXEL STRIP sweeping a long thin wall of
    geometry. Direction-morton turns fresh packets into compact
    direction blocks (fresh pops -32-40%, kernel-only terrain +8.6% /
    viking +4.7% / multi-mesh-4k +3.2% on mixed mid-flight states);
    bounce packets tighten too (ties broken by direction within a
    1/32-span cell)."""
    lo = packed.scene_bounds[:, 0]
    hi = packed.scene_bounds[:, 1]
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip((origin - lo[:, None]) / span[:, None], 0.0, 1.0)
    cells = (q * 31.0).astype(jnp.int32)  # (3, N), 5 bits each

    morton = jnp.zeros_like(cells[0])
    for b in range(5):
        morton = (morton
                  | (((cells[0] >> b) & 1) << (3 * b + 2))
                  | (((cells[1] >> b) & 1) << (3 * b + 1))
                  | (((cells[2] >> b) & 1) << (3 * b)))
    octant = (((direction[0] < 0).astype(jnp.int32) << 2)
              | ((direction[1] < 0).astype(jnp.int32) << 1)
              | (direction[2] < 0).astype(jnp.int32))
    dq = jnp.clip((direction + 1.0) * (0.5 * 15.0), 0.0, 15.0)
    dcells = dq.astype(jnp.int32)  # (3, N), 4 bits each
    dmorton = jnp.zeros_like(dcells[0])
    for b in range(4):
        dmorton = (dmorton
                   | (((dcells[0] >> b) & 1) << (3 * b + 2))
                   | (((dcells[1] >> b) & 1) << (3 * b + 1))
                   | (((dcells[2] >> b) & 1) << (3 * b)))
    return ((((octant << 15) | morton) << 12) | dmorton)


# XLA's packed row gather leaves its VMEM-staged fast path once the
# operand passes ~64 MB (10/83/165 ms at 2/4/8M (N, 8) f32 lanes,
# tools/exp_waves3.py); permute_rows_waves keeps every gather operand
# one wave wide to stay under it.
GATHER_CLIFF_BYTES = 64 * 1024 * 1024


def permute_rows_waves(rows, perm_w, inverse=False):
    """Per-wave permute + cross-wave quantile interleave.

    rows: list of (N,) with N = W * n1 in wave-major layout (the
    multi-wave render state, integrator/wavefront.py). perm_w: (W, n1)
    per-wave sort permutations (inverse=False) or their inverses
    (inverse=True).

    Forward: each wave is sorted by its own key order and the W sorted
    streams are INTERLEAVED at 128-lane-row granularity -- output row
    q * W + w is wave w's rank-rows [q*128, q*128+128). Waves are iid
    samples of the same wavefront distribution, so same-rank rows of
    every wave sit at the same key quantile: a 3072-ray packet of
    consecutive interleaved rows spans ~1/W of the key range, the
    leaf-union density win of a GLOBAL sort (tools/exp_density.py) --
    without its cost cliff. The single global (N, 8) packed gather
    leaves XLA's VMEM-staged fast path once the operand passes ~64 MB
    (10 ms at 2M lanes, 83 at 4M, 165 at 8M, tools/exp_waves3.py);
    here every gather operand stays one wave wide, and the interleave
    is a tile-aligned row transpose (HBM bandwidth, not per-index).
    Caveat measured in tools/exp_waves5.py: rank alignment across iid
    waves carries order-statistic noise of ~sqrt(n1) ranks, which is
    within a packet's span at W = 2 (pops match the global sort) but
    exceeds it at W = 4 (+45% pops); trace() therefore caps the
    interleave at 2 waves per stream unless a repair pass runs.

    Inverse: rows are in interleaved order; returns wave-major lane
    order via out[w * n1 + j] = rows[rank_of_j_in_wave_w * W + w].
    """
    k = len(rows)
    width = -(-k // 8) * 8
    n = rows[0].shape[0]
    w_count, n1 = perm_w.shape
    assert n == w_count * n1, (n, perm_w.shape)
    assert n1 % 128 == 0, n1
    rows1 = n1 // 128
    cast = [r if r.dtype == jnp.float32
            else jax.lax.bitcast_convert_type(r, jnp.float32) for r in rows]
    matrix = jnp.stack(
        cast + [jnp.zeros(n, jnp.float32)] * (width - k), axis=0)

    def row_interleave(m, undo):
        # (width, N) wave-major <-> 128-lane-row interleaved: element
        # moves are whole 128-lane rows, so the transpose is
        # tile-aligned (HBM bandwidth) -- the earlier LANE-granular
        # moveaxis had minor dim `width` and cost ~50 ms at 4M lanes.
        if undo:   # interleaved (rows1, W) row-blocks -> wave-major
            x = m.reshape(width, rows1, w_count, 128)
        else:      # wave-major (W, rows1) row-blocks -> interleaved
            x = m.reshape(width, w_count, rows1, 128)
        return jnp.swapaxes(x, 1, 2).reshape(width, n)

    if inverse:
        # interleaved row order -> per-wave rank order, then un-sort
        # each wave back to lane order.
        matrix = row_interleave(matrix, undo=True)
    waves = matrix.T.reshape(w_count, n1, width)
    # optimization_barrier: force each wave slice to MATERIALIZE before
    # its gather. Without it XLA fuses the slice into the gather and the
    # gather operand is still the full (N, width) parent buffer -- over
    # the ~64 MB fast-path cliff this function exists to stay under
    # (measured: un-barriered fwd at 4M lanes was ~99 ms, barely below
    # the 119 ms global gather; barriered per-wave slices restore the
    # one-wave operand, tools/exp_waves4/5.py and exp_splitgather.py).
    # Shapes are static, so skip the barrier (and its materialized HBM
    # copy of every wave slice) when even the FULL parent operand sits
    # under the cliff -- the fused gather is then already on the fast
    # path and the round trip is pure cost.
    if n * width * 4 > GATHER_CLIFF_BYTES:
        slices = [jax.lax.optimization_barrier(waves[w])
                  for w in range(w_count)]
    else:
        slices = [waves[w] for w in range(w_count)]
    parts = [jnp.take(slices[w], perm_w[w], axis=0)
             for w in range(w_count)]
    flat = jnp.stack(parts, axis=0).reshape(n, width)  # wave-major
    out = flat.T
    if not inverse:
        out = row_interleave(out, undo=False)
    return [out[i] if rows[i].dtype == jnp.float32
            else jax.lax.bitcast_convert_type(out[i], rows[i].dtype)
            for i in range(k)]


def permute_rows(rows, perm, block=1):
    """Permute a list of (N,) rows by ONE packed row gather.

    TPU gathers cost per lane *index*, not per byte (a k-float row
    gather costs about the same as a scalar gather up to k=8, then
    grows sublinearly: 37/73/105 ms for (N,8)/(N,16)/(N,32) at 2M
    lanes, tools/exp_permute.py), so the rows are stacked into one
    (N, k<=8-padded) matrix, gathered once, and unpacked. Ints ride as
    bitcast f32. Returns the permuted rows with original dtypes.

    block > 1 applies a BLOCK permutation: `perm` then has N/block
    entries and moves whole groups of `block` consecutive lanes
    together -- block-times-fewer gather indices at wider rows, the
    cheap direction for the gather. Measured NEGATIVE as a sort
    granularity (tools/exp_blocksort.py): even 8-lane blocks lose the
    packets' octant purity and give back the entire 2.7x sort win, so
    production keeps block=1; the mechanism stays for measurement.
    """
    k = len(rows)
    width = -(-k // 8) * 8
    n = rows[0].shape[0]
    cast = [r if r.dtype == jnp.float32
            else jax.lax.bitcast_convert_type(r, jnp.float32) for r in rows]
    matrix = jnp.stack(
        cast + [jnp.zeros(n, jnp.float32)] * (width - k), axis=0)
    flat = matrix.T  # (n, width); reshape below is layout-free
    if block > 1:
        flat = flat.reshape(n // block, block * width)
    out = jnp.take(flat, perm, axis=0)
    if block > 1:
        out = out.reshape(n, width)
    out = out.T
    return [out[i] if rows[i].dtype == jnp.float32
            else jax.lax.bitcast_convert_type(out[i], rows[i].dtype)
            for i in range(k)]


# Measured negatives (on-chip, 2M lanes): un-permuting the kernel
# outputs with one packed (N, 8) row SCATTER (out[perm] = rows, no
# inverse permutation materialized) costs ~+100 ms per round vs
# gathering by the inverse -- TPU scatters do not share the gather's
# flat per-index cost even with unique_indices. Even the single (N,)
# int scatter that builds the inverse (inv[perm] = iota) costs ~6 ms
# where a second argsort costs ~0.4 (XLA's int32 sort is nearly free
# on TPU) -- the inverse is now built by argsort(perm) and the
# packed-row un-permute stays a gather. Gather cost is also completely
# INSENSITIVE to index locality (tools/exp_gather_locality.py), so the
# permutation tax does not shrink with smoother sort keys.
STACK_DEPTH = 48


@dataclass(frozen=True)
class SceneLayout:
    """Static (hashable) compile-time scene structure.

    Carried alongside PackedScene through jit boundaries; controls the
    unrolling of the trace stage. Rebuilt whenever the set of shapes
    changes (cheap; jit caches previous layouts).
    """

    # Analytic shapes as (shape_type, bucket-padded group size): ONLY
    # the type set and padded counts are static -- the shape indices
    # themselves ride in packed.analytic_idx as traced arrays, so
    # adding/deleting an entity inside a bucket reuses every compiled
    # program (tools/measure_editor.py: 23-95 s per edit before, one
    # dispatch after).
    analytic_buckets: Tuple[Tuple[int, int], ...]  # (shape_type, padded K)
    # Mesh instances, bucket-padded (0 = none, 1 = exactly one -- kept
    # exact so the single-instance attribute broadcast still fires --
    # else _bucket(count)). The (shape_index, root) pairs themselves
    # ride in packed.portable_inst_{shape,root} as traced arrays.
    instance_slots: int
    # Bucket-padded shape-table length (array dim, not true count).
    num_shapes: int
    # Static texture-usage flags: texture taps are skipped entirely at
    # trace time for scenes that cannot need them (per-lane table reads
    # are the scarce resource on TPU).
    has_skybox_texture: bool = False
    materials_textured: bool = False
    # Which texturable material attributes actually carry a texture in
    # this scene; fetch_ctx skips taps (5 row-gathers each at 2M lanes)
    # for the rest. Subset of ('base', 'emission', 'specular',
    # 'roughness', 'roughness_anisotropy').
    textured_attrs: Tuple[str, ...] = ('base', 'emission', 'specular',
                                       'roughness', 'roughness_anisotropy')
    atlas_size: int = 8
    # (has_bilinear, has_nearest): which filter paths any texture in the
    # scene actually uses; sample_texture skips the other entirely.
    texture_filter_modes: Tuple[bool, bool] = (True, True)
    # Bilinear tap strategy (static): 'quad' = the precomputed
    # 2x2-quad table exists (small atlases; ONE gather per tap),
    # 'pair' = the bf16 texel-pair table exists (big atlases; TWO
    # gathers, operand under the XLA gather cliff), False = 4 corner
    # gathers from the flat f32 atlas. Truthiness preserved for the
    # old boolean call sites.
    atlas_quad_fit: object = False
    # Static count of world-space triangle SLOTS in the wide tables
    # (leaf rows x 8, INCLUDING padding slots -- sparsely filled leaves
    # inflate this above the true face count). Drives the
    # sort-pays-for-itself heuristic in integrator.wavefront, whose
    # SORT_MIN_FACES threshold is calibrated in these slot units.
    wide_face_slots: int = 0
    # Any material with opacity < 1: enables the stochastic-transparency
    # pass-through in the scatter stage (the reference serializes and
    # edits Opacity but never reads it in a shader; we wire it).
    has_opacity: bool = False
    # Whether the flattened wide-BVH tables fit the packet kernel's
    # VMEM budget (decided from array *shapes* only -- no readbacks).
    wide_fit: bool = False
    # Packet table strategy (scene/compile.py choose_packet_mode):
    # 'flat' = v5 world-flattened single BVH; 'inst' = v6 two-level
    # object-space tables + TLAS (ops/trace_inst.py). tlas_rows is the
    # static TLAS row count at the head of inst_nodes; inst_fit gates
    # the v6 kernel on its VMEM budget.
    packet_mode: str = 'flat'
    tlas_rows: int = 0
    inst_fit: bool = False
    # Material types present in the scene: dispatch prunes absent
    # models statically (e.g. the OpenPBR layer walk never compiles
    # into scenes without an OpenPBR material).
    material_types: Tuple[int, ...] = ()
    # Can ANY lane ever be inside a participating medium? False only
    # when no material type defines an interior medium AND the scene's
    # ambient scatter rate is zero; the scatter stage then drops both
    # fetch_medium gathers and the volumetric branch (bitwise-identical
    # output -- the RNG draws are preserved).
    scene_has_medium: bool = True
    # skybox_sampling_probability > 0 at compile time: when False, the
    # MIS light branch (second BSDF eval, vMF pdf, selects) drops out
    # of scatter, RNG stream preserved (bitwise-identical output).
    has_skybox_sampling: bool = True
    # Any material type that can refract through a boundary
    # (translucent/OpenPBR)? When False the active-shape-list
    # bookkeeping is a value-level no-op and drops out of scatter.
    has_transmissive: bool = True

    @staticmethod
    def from_packed(packed):
        # compile_scene attaches a host-built layout; reading the packed
        # device arrays back would permanently degrade the TPU runtime.
        host = getattr(packed, 'host_layout', None)
        if host is not None:
            return host
        shape_type = np.asarray(packed.shape_type)
        i_real = int((shape_type == SHAPE_TYPE_MESH_INSTANCE).sum())
        slots = 0 if i_real == 0 else int(packed.portable_inst_root.shape[0])
        analytic = tuple(sorted(
            (int(t), int(idx.shape[0]))
            for t, idx in packed.analytic_idx.items()))
        m = packed.materials
        attr_cols = dict(base=m.base_texture, specular=m.specular_texture,
                         roughness=m.roughness_texture,
                         roughness_anisotropy=m.roughness_anisotropy_texture,
                         emission=m.emission_texture)
        textured_attrs = tuple(sorted(
            name for name, c in attr_cols.items()
            if bool((np.asarray(c) != TEXTURE_INDEX_NONE).any())))
        textured = bool(textured_attrs)
        from . import trace_packet
        mat_types = np.asarray(m.type)
        referenced = mat_types[np.asarray(packed.shape_material)]
        return SceneLayout(
            analytic, slots, len(shape_type),
            has_skybox_texture=int(packed.skybox_texture_index) != TEXTURE_INDEX_NONE,
            materials_textured=textured,
            textured_attrs=textured_attrs,
            atlas_size=int(packed.atlas_size),
            texture_filter_modes=_filter_modes_from_flags(
                np.asarray(packed.texture_flags)),
            atlas_quad_fit=('quad' if packed.atlas_quad.shape[0] > 1 else
                            'pair' if packed.atlas_pair.shape[0] > 1
                            else False),
            wide_face_slots=int(packed.wide_tris_g.shape[0]) * 8,
            has_opacity=bool((np.asarray(packed.materials.opacity) < 1.0).any()),
            wide_fit=trace_packet.tables_fit_vmem(packed.wide_nodes_g,
                                                  packed.wide_tris_g),
            # The raw reconstruction cannot recover the static TLAS row
            # count from array shapes; 'inst' scenes routed through it
            # fall back to the portable traversal. compile_scene always
            # attaches the host layout, which carries the real mode.
            material_types=tuple(sorted(int(t) for t in set(referenced))),
            scene_has_medium=_types_have_medium(set(referenced))
            or float(np.asarray(packed.scene_scatter_rate)) > 0.0,
            has_skybox_sampling=float(np.asarray(
                packed.skybox_sampling_probability)) > 0.0,
            has_transmissive=_types_have_medium(set(referenced)),
        )


def _types_have_medium(mat_types):
    from ..core.constants import (MATERIAL_TYPE_BASIC_TRANSLUCENT,
                                  MATERIAL_TYPE_OPENPBR)
    return (MATERIAL_TYPE_BASIC_TRANSLUCENT in mat_types
            or MATERIAL_TYPE_OPENPBR in mat_types)


def build_layout_host(scene, packed):
    """Build the SceneLayout from the host-side scene document (no
    device readbacks). Mirrors from_packed's semantics."""
    from ..core.constants import MATERIAL_TYPE_OPENPBR
    from ..scene.compile import _ENTITY_TO_SHAPE_TYPE, entity_packs_shape
    from . import trace_packet

    from ..scene.compile import _bucket

    by_type = {}
    i_real = 0
    mat_types = set()
    index = 0
    for entity in (e for e, _ in scene.walk_entities_with_transform()):
        if not entity_packs_shape(entity):
            continue
        stype = _ENTITY_TO_SHAPE_TYPE[entity.type]
        if stype == SHAPE_TYPE_MESH_INSTANCE:
            i_real += 1
        else:
            by_type.setdefault(int(stype), []).append(index)
        # Material slot 0 is the fallback OpenPBR surface.
        mat_types.add(int(entity.material.type) if entity.material is not None
                      else MATERIAL_TYPE_OPENPBR)
        index += 1
    # Generic-programs mode (scene.compile_generic, set by interactive
    # Sessions): every analytic shape type and material model is
    # compiled in from the start (empty bucket groups / the full
    # dispatch set) and the scatter-stage specialization flags are
    # forced conservative, so NO edit short of a texture import can
    # change the program structure -- the editor trades a modest
    # per-round cost for never stalling on a relay recompile
    # (tools/measure_editor.py: 20 s for the first entity of a new
    # type under specialized programs).
    generic = bool(getattr(scene, 'compile_generic', False))
    if generic:
        from ..core.constants import (
            MATERIAL_TYPE_BASIC_DIFFUSE, MATERIAL_TYPE_BASIC_METAL,
            MATERIAL_TYPE_BASIC_TRANSLUCENT, SHAPE_TYPE_CUBE,
            SHAPE_TYPE_SPHERE)
        for t in (SHAPE_TYPE_PLANE, SHAPE_TYPE_SPHERE, SHAPE_TYPE_CUBE):
            by_type.setdefault(int(t), [])
        mat_types |= {MATERIAL_TYPE_BASIC_DIFFUSE, MATERIAL_TYPE_BASIC_METAL,
                      MATERIAL_TYPE_BASIC_TRANSLUCENT, MATERIAL_TYPE_OPENPBR}
    # Mirror compile.py's analytic group sizing exactly: bucket-padded
    # under generic programs (editor stability), exact under
    # specialized ones (padded slots cost real per-lane work).
    analytic = tuple(sorted(
        (t, _bucket(len(idxs)) if generic else max(len(idxs), 1))
        for t, idxs in by_type.items()))
    slots = 0 if i_real == 0 else 1 if i_real == 1 else _bucket(i_real)

    attr_fields = dict(
        base=('base_texture', 'base_color_texture'),
        specular=('specular_texture',),
        roughness=('roughness_texture', 'specular_roughness_texture'),
        roughness_anisotropy=('roughness_anisotropy_texture',),
        emission=('emission_color_texture',),
    )
    textured_set = set()
    for material in scene.materials:
        for attr, fields in attr_fields.items():
            if any(getattr(material, f, None) is not None for f in fields):
                textured_set.add(attr)
    if generic:
        # Generic programs also compile every texturable attribute tap
        # and both filter paths, so ASSIGNING a texture to a material
        # never changes program structure (per-lane NONE indices are
        # masked inside sample_texture). Importing a texture can still
        # retrace if the atlas dimensions change.
        textured_set = set(attr_fields)
    textured = bool(textured_set) or generic
    from . import trace_inst
    packet_mode = getattr(scene, 'packet_mode', 'flat')
    tlas_rows = getattr(scene, 'packet_tlas_rows', 0)
    inst_fit = (packet_mode == 'inst' and trace_inst.residency_split(
        packed.inst_nodes.shape, packed.inst_tris.shape,
        packed.inst_rows.shape) is not None)
    wide_slots = (int(packed.inst_tris.shape[0]) * 8
                  if packet_mode == 'inst'
                  else int(packed.wide_tris_g.shape[0]) * 8)
    return SceneLayout(
        analytic, slots, _bucket(index),
        packet_mode=packet_mode,
        tlas_rows=tlas_rows,
        inst_fit=inst_fit,
        has_skybox_texture=scene.root.skybox_texture is not None,
        materials_textured=textured,
        textured_attrs=tuple(sorted(textured_set)),
        atlas_size=_host_atlas_size(scene),
        texture_filter_modes=(True, True) if generic else _filter_modes(
            [t.enable_nearest_filtering for t in scene.textures
             if t.pixels is not None]),
        atlas_quad_fit=('quad' if packed.atlas_quad.shape[0] > 1 else
                            'pair' if packed.atlas_pair.shape[0] > 1
                            else False),
        wide_face_slots=wide_slots,
        has_opacity=generic or any(getattr(m, 'opacity', 1.0) < 1.0
                                   for m in scene.materials),
        wide_fit=trace_packet.tables_fit_vmem(packed.wide_nodes_g,
                                              packed.wide_tris_g),
        material_types=tuple(sorted(mat_types)),
        scene_has_medium=generic or _types_have_medium(mat_types)
        or float(scene.root.scatter_rate) > 0.0,
        has_skybox_sampling=generic or float(
            scene.root.skybox_sampling_probability) > 0.0,
        has_transmissive=generic or _types_have_medium(mat_types),
    )


def _filter_modes(nearest_flags):
    """(has_bilinear, has_nearest) from per-texture nearest booleans;
    defaults to bilinear-only when the scene has no textures."""
    if not nearest_flags:
        return (True, False)
    return (any(not f for f in nearest_flags), any(nearest_flags))


def _filter_modes_from_flags(flags):
    from ..core.constants import TEXTURE_FLAG_FILTER_NEAREST
    return _filter_modes([bool(f & TEXTURE_FLAG_FILTER_NEAREST)
                          for f in flags.tolist()])


def _host_atlas_size(scene):
    from ..scene.atlas import choose_atlas_size
    return choose_atlas_size([t for t in scene.textures if t.pixels is not None])


def make_hit(n, duration):
    """Fresh hit record SoA (scene.glsl.inc:522-528)."""
    return dict(
        time=jnp.broadcast_to(jnp.asarray(duration, jnp.float32), (n,)),
        shape=jnp.full((n,), SHAPE_INDEX_NONE, jnp.int32),
        shape_type=jnp.zeros((n,), jnp.int32),
        primitive=jnp.zeros((n,), jnp.int32),
        # Shape-dependent primitive coordinates (barycentrics / local pos).
        coords=jnp.zeros((3, n), jnp.float32),
        # Traversal-cost counter for debug heatmaps (the reference's
        # SceneComplexity/MeshComplexity, scene.glsl.inc:115-118).
        complexity=jnp.zeros((n,), jnp.int32),
    )


def intersect_aabb(origin, inv_dir, reach, lo, hi):
    """Slab test (common.glsl.inc:153-185). origin/inv_dir: (3, N);
    lo/hi: (3, N) or broadcastable. Returns entry time, INFINITY on miss."""
    entry = -jnp.inf
    exit_ = jnp.inf
    for c in range(3):
        t0 = (lo[c] - origin[c]) * inv_dir[c]
        t1 = (hi[c] - origin[c]) * inv_dir[c]
        entry = jnp.maximum(entry, jnp.minimum(t0, t1))
        exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
    miss = (exit_ < entry) | (exit_ <= 0.0) | (entry >= reach)
    return jnp.where(miss, INFINITY, entry)


def moller_trumbore(origin, direction, p0, p1, p2, t_max):
    """Moller-Trumbore triangle test (scene.glsl.inc:304-334).

    All inputs (3, N)-style channels-first; returns (t, u, v, valid).
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = cross(direction, e2)
    det = dot(e1, pvec)
    valid = jnp.abs(det) >= EPSILON
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    s = origin - p0
    u = inv_det * dot(s, pvec)
    qvec = cross(s, e1)
    v = inv_det * dot(direction, qvec)
    t = inv_det * dot(e2, qvec)
    valid &= (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    valid &= (t >= 0.0) & (t <= t_max)
    return t, u, v, valid


# --- Analytic primitives (object space, scene.glsl.inc:401-466) ----------


def _intersect_plane(o, d, reach):
    dz = jnp.where(jnp.abs(d[2]) < 1e-12, 1e-12, d[2])
    t = -o[2] / dz
    hit = (t >= 0.0) & (t <= reach)
    return jnp.where(hit, t, INFINITY)


def _intersect_sphere(o, d, reach):
    v = dot(d, d)
    p = dot(o, d)
    q = dot(o, o) - 1.0
    d2 = p * p - q * v
    ok = d2 >= 0.0
    sq = jnp.sqrt(jnp.maximum(d2, 0.0))
    ok &= sq >= p
    s0 = -p - sq
    s1 = -p + sq
    s = jnp.where(s0 < 0.0, s1, s0)
    ok &= (s >= 0.0) & (s <= v * reach)
    return jnp.where(ok, s / jnp.maximum(v, 1e-20), INFINITY)


def _intersect_cube(o, d, reach):
    entry = -jnp.inf
    exit_ = jnp.inf
    for c in range(3):
        inv = 1.0 / jnp.where(jnp.abs(d[c]) < 1e-12, 1e-12, d[c])
        t0 = (-1.0 - o[c]) * inv
        t1 = (+1.0 - o[c]) * inv
        entry = jnp.maximum(entry, jnp.minimum(t0, t1))
        exit_ = jnp.minimum(exit_, jnp.maximum(t0, t1))
    t = jnp.where(entry < 0.0, exit_, entry)
    ok = (exit_ >= entry) & (exit_ > 0.0) & (t < reach)
    return jnp.where(ok, t, INFINITY)


def intersect_analytic(packed, layout: SceneLayout, origin, direction, hit):
    """Intersect all analytic shapes as type-grouped broadcast batches.

    origin/direction: (3, N). Shapes are grouped by type at compile time
    so each intersector runs only on its own (S_type, N) batch (the old
    all-types-for-all-shapes batch tripled the arithmetic), and the
    winner is resolved with an unrolled select sweep over the static
    shape list -- measured on-chip, the argmin + take_along_axis winner
    gathers this replaces cost ~70 ms at 2M lanes (TPU gathers pay per
    lane-index, see _sort_state).
    """
    if not layout.analytic_buckets:
        return hit

    intersectors = {
        SHAPE_TYPE_PLANE: _intersect_plane,
        SHAPE_TYPE_SPHERE: _intersect_sphere,
        SHAPE_TYPE_CUBE: _intersect_cube,
    }

    reach = hit['time'][None, :]
    groups = []  # (stype, idx (S,), o (3,S,N), d (3,S,N), t (S,N))
    for stype, k_pad in layout.analytic_buckets:
        # TRACED index array (packed.analytic_idx): only the type and
        # the bucket-padded group size are program structure, so entity
        # add/delete within a bucket reuses the compiled program.
        # Padded slots carry valid=0 and are masked to INFINITY below.
        idx = packed.analytic_idx[stype]           # (S,) int32, S == k_pad
        valid = packed.analytic_valid[stype] > 0.0  # (S,) bool
        from_world = packed.shape_object_from_world[:, :, idx]  # (4, 4, S)
        m = from_world[:, :, :, None]  # (4, 4, S, 1)
        o = jnp.stack([
            m[i, 0, :, 0][:, None] * origin[0]
            + m[i, 1, :, 0][:, None] * origin[1]
            + m[i, 2, :, 0][:, None] * origin[2] + m[i, 3, :, 0][:, None]
            for i in range(3)
        ], axis=0)
        d = jnp.stack([
            m[i, 0, :, 0][:, None] * direction[0]
            + m[i, 1, :, 0][:, None] * direction[1]
            + m[i, 2, :, 0][:, None] * direction[2]
            for i in range(3)
        ], axis=0)
        t = jnp.where(valid[:, None], intersectors[stype](o, d, reach),
                      INFINITY)
        groups.append((stype, idx, o, d, t))

    best_t = jnp.min(jnp.concatenate([t for *_, t in groups], axis=0), axis=0)
    improved = best_t < hit['time']

    # Winner attributes via a reverse unrolled select sweep (the lowest
    # slot within a group wins ties, applied last): zero gathers.
    shape_idx = hit['shape']
    shape_type = hit['shape_type']
    local = hit['coords']
    for stype, idx, o, d, t in reversed(groups):
        for s in range(t.shape[0] - 1, -1, -1):
            win = improved & (t[s] == best_t)
            shape_idx = jnp.where(win, idx[s], shape_idx)
            shape_type = jnp.where(win, stype, shape_type)
            local = jnp.where(win, o[:, s] + d[:, s] * best_t, local)

    return dict(
        time=jnp.where(improved, best_t, hit['time']),
        shape=shape_idx,
        shape_type=shape_type,
        primitive=jnp.where(improved, 0, hit['primitive']),
        coords=local,
        complexity=hit['complexity'] + sum(k for _, k in
                                           layout.analytic_buckets),
    )


# --- Mesh BVH traversal ----------------------------------------------------


def traverse_mesh_bvh(packed, root: int, origin, direction, hit, shape_index: int):
    """Vectorized BVH2 traversal of one mesh instance over all rays.

    Follows the reference's near-child-first two-fetch scheme
    (scene.glsl.inc:336-399) with an explicit (N, STACK_DEPTH) stack.
    origin/direction: (3, N), already in mesh object space (velocity
    parameterization keeps t consistent with world space). Loop bounds
    are static; lanes run until every lane's stack is exhausted.
    """
    n = origin.shape[1]
    inv_dir = 1.0 / jnp.where(jnp.abs(direction) < 1e-12, 1e-12, direction)

    node_min = packed.mesh_node_min   # (3, B)
    node_max = packed.mesh_node_max
    node_a = packed.mesh_node_a
    node_b = packed.mesh_node_b
    face_pos = packed.face_positions  # (3 verts, 3 comps, F)

    def gather_box(node_idx):
        # Per-component gathers (see core/vec.py take_vec rationale).
        lo = take_vec(node_min, node_idx)
        hi = take_vec(node_max, node_idx)
        return lo, hi

    # Prune rays that miss the root bounding box entirely. `root` may
    # be a TRACED scalar (the portable instance table); a padded slot's
    # degenerate root has inverted bounds, so start is -1 for every
    # lane and the loop below runs zero iterations.
    root = jnp.asarray(root, jnp.int32)
    root_lo = node_min[:, root][:, None]
    root_hi = node_max[:, root][:, None]
    root_entry = intersect_aabb(origin, inv_dir, hit['time'], root_lo, root_hi)
    start = jnp.where(root_entry < INFINITY, root, jnp.int32(-1))

    # The traversal stack is (STACK_DEPTH, N) channels-first and is
    # pushed/popped with one-hot selects instead of scatters/gathers:
    # measured 16x faster than per-lane scatter on TPU.
    state = dict(
        node=start,
        stack=jnp.zeros((STACK_DEPTH, n), jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
        time=hit['time'],
        primitive=hit['primitive'],
        u=hit['coords'][1],
        v=hit['coords'][2],
        found=jnp.zeros((n,), jnp.bool_),
        complexity=hit['complexity'],
    )

    slots = jnp.arange(STACK_DEPTH)[:, None]

    def cond(state):
        return jnp.any((state['node'] >= 0) | (state['depth'] > 0))

    def body(state):
        node, stack, depth = state['node'], state['stack'], state['depth']

        # Pop for lanes with no current node.
        need_pop = (node < 0) & (depth > 0)
        depth = jnp.where(need_pop, depth - 1, depth)
        pop_slot = jnp.clip(depth, 0, STACK_DEPTH - 1)
        popped = jnp.sum(jnp.where(slots == pop_slot, stack, 0), axis=0)
        node = jnp.where(need_pop, popped, node)

        active = node >= 0
        safe_node = jnp.maximum(node, 0)

        a = jnp.take(node_a, safe_node)
        b = jnp.take(node_b, safe_node)
        is_leaf = active & (b > 0)
        is_internal = active & (b == 0)

        time = state['time']
        primitive, u, v, found = state['primitive'], state['u'], state['v'], state['found']

        # Leaf: unrolled masked face tests.
        for k in range(MAX_LEAF_FACES):
            face = a + k
            face_ok = is_leaf & (face < b)
            safe_face = jnp.where(face_ok, face, 0)
            p0 = take_vec(face_pos[0], safe_face)
            p1 = take_vec(face_pos[1], safe_face)
            p2 = take_vec(face_pos[2], safe_face)
            t, fu, fv, valid = moller_trumbore(
                origin, direction, p0, p1, p2, time)
            take = face_ok & valid & (t < time)
            time = jnp.where(take, t, time)
            primitive = jnp.where(take, safe_face, primitive)
            u = jnp.where(take, fu, u)
            v = jnp.where(take, fv, v)
            found = found | take

        # Internal: fetch both children, near-first, push far.
        child_a = jnp.where(is_internal, a, 0)
        child_b = child_a + 1
        lo_a, hi_a = gather_box(child_a)
        lo_b, hi_b = gather_box(child_b)
        ta = jnp.where(is_internal,
                       intersect_aabb(origin, inv_dir, time, lo_a, hi_a),
                       INFINITY)
        tb = jnp.where(is_internal,
                       intersect_aabb(origin, inv_dir, time, lo_b, hi_b),
                       INFINITY)

        near = jnp.where(ta <= tb, child_a, child_b)
        far = jnp.where(ta <= tb, child_b, child_a)
        t_near = jnp.minimum(ta, tb)
        t_far = jnp.maximum(ta, tb)

        next_node = jnp.where(is_internal & (t_near < INFINITY), near, jnp.int32(-1))
        push = is_internal & (t_far < INFINITY) & (t_near < INFINITY) & (depth < STACK_DEPTH)
        push_slot = jnp.minimum(depth, STACK_DEPTH - 1)
        stack = jnp.where(push & (slots == push_slot), far, stack)
        depth = jnp.where(push, depth + 1, depth)
        # Only-far-hit case: go directly to far child.
        only_far = is_internal & (t_near == INFINITY) & (t_far < INFINITY)
        next_node = jnp.where(only_far, far, next_node)

        node = jnp.where(active, next_node, node)

        return dict(node=node, stack=stack, depth=depth, time=time,
                    primitive=primitive, u=u, v=v, found=found,
                    complexity=state['complexity'] + active.astype(jnp.int32))

    state = jax.lax.while_loop(cond, body, state)

    improved = state['found']
    coords = jnp.stack([1.0 - state['u'] - state['v'], state['u'], state['v']],
                       axis=0)
    return dict(
        time=jnp.where(improved, state['time'], hit['time']),
        shape=jnp.where(improved, shape_index, hit['shape']),
        shape_type=jnp.where(improved, SHAPE_TYPE_MESH_INSTANCE, hit['shape_type']),
        primitive=jnp.where(improved, state['primitive'], hit['primitive']),
        coords=jnp.where(improved, coords, hit['coords']),
        complexity=state['complexity'],
    )


def resolve_hit_attributes(packed, layout: SceneLayout, origin, direction, hit):
    """Compute world normal, tangent frame, UV and material of each hit.

    Equivalent of the attribute-resolution tail of Trace()
    (scene.glsl.inc:532-611). The winning shape's matrices are gathered
    once per lane (a small-table gather along the trailing axis).
    """
    n = origin.shape[1]
    shape = hit['shape']
    valid = shape != SHAPE_INDEX_NONE
    safe_shape = jnp.where(valid, shape, 0)

    to_world = take_matrix(packed.shape_world_from_object, safe_shape)
    from_world = take_matrix(packed.shape_object_from_world, safe_shape)
    material = take_1d(packed.shape_material, safe_shape)

    coords = hit['coords']  # (3, N)
    stype = hit['shape_type']
    zeros = jnp.zeros(n)
    ones = jnp.ones(n)

    # --- mesh: barycentric-interpolated vertex attributes -----------------
    if 'mesh_normal' in hit:
        # Packet-kernel path: attributes were interpolated in-kernel and
        # transformed per instance; no per-lane vertex gathers at all.
        mesh_normal_obj = None
        mesh_normal_world = hit['mesh_normal']
        mesh_uv = hit['mesh_uv']
    else:
        prim = hit['primitive']
        fv = take_vec(packed.face_vertices, prim)          # (3, N)
        n0 = take_vec(packed.vertex_normals, fv[0])        # (3, N)
        n1 = take_vec(packed.vertex_normals, fv[1])
        n2 = take_vec(packed.vertex_normals, fv[2])
        mesh_normal_obj = safe_normalize(
            n0 * coords[0] + n1 * coords[1] + n2 * coords[2])
        uv0 = take_vec(packed.vertex_uvs, fv[0])           # (2, N)
        uv1 = take_vec(packed.vertex_uvs, fv[1])
        uv2 = take_vec(packed.vertex_uvs, fv[2])
        mesh_uv = uv0 * coords[0] + uv1 * coords[1] + uv2 * coords[2]

    # --- analytic normals in object space ----------------------------------
    plane_normal_obj = vec3(zeros, zeros, ones)
    sphere_normal_obj = coords
    q = jnp.abs(coords)
    cube_axis_x = (q[0] >= q[1]) & (q[0] >= q[2])
    cube_axis_y = ~cube_axis_x & (q[1] >= q[0]) & (q[1] >= q[2])
    sx = jnp.sign(coords[0])
    sy = jnp.sign(coords[1])
    sz = jnp.sign(coords[2])
    cube_normal_obj = jnp.where(
        cube_axis_x, vec3(sx, zeros, zeros),
        jnp.where(cube_axis_y, vec3(zeros, sy, zeros), vec3(zeros, zeros, sz)))

    is_mesh = stype == SHAPE_TYPE_MESH_INSTANCE
    is_plane = stype == SHAPE_TYPE_PLANE
    is_sphere = stype == SHAPE_TYPE_SPHERE

    analytic_normal_obj = jnp.where(
        is_plane, plane_normal_obj,
        jnp.where(is_sphere, sphere_normal_obj, cube_normal_obj))

    # Normal transform: normalize(N^T * from_world) (common.glsl.inc:50-53).
    if mesh_normal_obj is None:
        normal = jnp.where(
            is_mesh, mesh_normal_world,
            transform_normal(analytic_normal_obj, from_world))
    else:
        normal_obj = jnp.where(is_mesh, mesh_normal_obj, analytic_normal_obj)
        normal = transform_normal(normal_obj, from_world)

    # Tangents (scene.glsl.inc:555, :563, :573, :584-604).
    mesh_tangent = compute_tangent_vector(normal)
    plane_tangent_obj = vec3(ones, zeros, zeros)
    p = coords
    sphere_tangent_obj = cross(p, vec3(-p[1], p[0], zeros))
    cube_tangent_obj = jnp.where(
        cube_axis_x, vec3(zeros, sx, zeros),
        jnp.where(cube_axis_y, vec3(zeros, zeros, sy), vec3(sz, zeros, zeros)))
    analytic_tangent_obj = jnp.where(
        is_plane, plane_tangent_obj,
        jnp.where(is_sphere, sphere_tangent_obj, cube_tangent_obj))
    analytic_tangent = safe_normalize(
        transform_vector(to_world, analytic_tangent_obj))
    tangent = jnp.where(is_mesh, mesh_tangent, analytic_tangent)
    bitangent = cross(normal, tangent)
    # Re-orthogonalize (tangent may drift off-orthogonal under
    # non-uniform instance scales).
    tangent = safe_normalize(cross(bitangent, normal))
    bitangent = cross(normal, tangent)

    # UV per shape type.
    plane_uv = coords[:2] - jnp.floor(coords[:2])
    sphere_uv = jnp.stack([
        (jnp.arctan2(p[1], p[0]) + PI) / TAU,
        (p[2] + 1.0) * 0.5,
    ], axis=0)
    cube_uv = jnp.where(
        cube_axis_x, 0.5 * (1.0 + coords[1:3]),
        jnp.where(cube_axis_y,
                  0.5 * (1.0 + jnp.stack([coords[0], coords[2]], 0)),
                  0.5 * (1.0 + coords[0:2])))
    uv = jnp.where(is_mesh, mesh_uv,
                   jnp.where(is_plane, plane_uv,
                             jnp.where(is_sphere, sphere_uv, cube_uv)))

    position = origin + direction * hit['time']

    return dict(
        time=hit['time'],
        shape=hit['shape'],
        shape_type=stype,
        primitive=hit['primitive'],
        material=jnp.where(valid, material, 0),
        position=position,
        normal=normal,
        tangent=tangent,
        bitangent=bitangent,
        uv=uv,
        complexity=hit.get('complexity', jnp.zeros(n, jnp.int32)),
    )


def trace(packed, layout: SceneLayout, origin, direction,
          duration=HIT_TIME_LIMIT, use_packet=None, interpret=False,
          sort_packets=False, sort_block=1, sort_waves=1):
    """Full trace: intersect every shape, resolve hit attributes.

    origin/direction: (3, N). Returns the resolved hit SoA dict. Lanes
    that hit nothing have shape == SHAPE_INDEX_NONE and time == duration.

    Mesh instances use the Pallas wide-BVH packet kernel on TPU
    whenever the flattened world-space tables fit VMEM
    (ops/trace_packet.py) -- one kernel launch for all instances; the
    portable XLA per-lane traversal is the fallback (and the CPU/test
    path).

    sort_packets=True feeds the packet kernel rays permuted into
    (direction octant, origin Morton) coherence order and inverse-
    permutes its compact outputs back to lane order, so only the 7
    kernel-input rows ride the forward gather and the 5 kernel-output
    rows the inverse gather. The previous design co-sorted the whole
    ~32-row render state every round (one (N,32) gather, ~105 ms at
    2M lanes); everything outside the kernel is elementwise or
    gathers by face/material index, so it never needed the
    permutation at all. Measured: 2x(N,8) gathers + 2 argsorts cost
    ~45 ms less per round (tools/exp_permute.py).
    """
    from . import trace_inst, trace_packet

    n = origin.shape[1]
    instanced = layout.packet_mode == 'inst' and layout.inst_fit
    if use_packet is None:
        use_packet = (jax.default_backend() == 'tpu'
                      and (layout.wide_fit or instanced))

    hit = make_hit(n, duration)
    hit = intersect_analytic(packed, layout, origin, direction, hit)

    if layout.instance_slots and use_packet:
        k_origin, k_direction, k_tin = origin, direction, hit['time']
        if sort_packets:
            # Block-quantized permutation (sort_block > 1): lanes move
            # in groups of G consecutive lanes keyed by the group's
            # minimum sort key. G-times-fewer gather indices at wider
            # rows is the cheap direction for the TPU gather (see
            # permute_rows); the coherence loss is bounded because
            # consecutive lanes are image-adjacent pixels whose rays
            # are already correlated. Measured knee: tools/exp_blocksort.py.
            G = math.gcd(sort_block, n) if sort_block > 1 else 1
            key = ray_sort_key(packed, origin, direction)
            # sort_waves > 1 (the multi-wave state, wave-major slots):
            # sort each wave separately and quantile-interleave the
            # sorted streams (permute_rows_waves) -- same packet
            # density as a global sort of the whole slot space, but
            # every gather operand stays one wave wide, under XLA's
            # ~64 MB fast-gather cliff (tools/exp_waves3.py). Only
            # valid when the lane layout is whole wave-major waves
            # (the sharded driver's shards are wave fragments: W = 1).
            W = (int(sort_waves)
                 if (sort_waves > 1 and G == 1 and n % sort_waves == 0
                     and (n // sort_waves) % 128 == 0)
                 else 1)
            if W > 1:
                perm_w = jnp.argsort(key.reshape(W, n // W), axis=1)
                inv = jnp.argsort(perm_w, axis=1)
                rows = permute_rows_waves(
                    [origin[0], origin[1], origin[2], direction[0],
                     direction[1], direction[2], hit['time']], perm_w)
            else:
                if G > 1:
                    key = key.reshape(n // G, G).min(axis=1)
                perm = jnp.argsort(key)
                # Inverse permutation by a SECOND argsort: XLA's int32
                # argsort is nearly free on TPU (~0.4 ms at 2M net of
                # dispatch, tools/exp_gather_locality.py session
                # probes) while the (N,) scatter build costs ~6 ms;
                # the fused viking round measured 4 ms faster this way.
                inv = jnp.argsort(perm)
                rows = permute_rows(
                    [origin[0], origin[1], origin[2], direction[0],
                     direction[1], direction[2], hit['time']], perm,
                    block=G)
            k_origin = jnp.stack(rows[0:3], axis=0)
            k_direction = jnp.stack(rows[3:6], axis=0)
            k_tin = rows[6]
        if instanced:
            t, face, fu, fv, inst = trace_inst.inst_trace(
                packed.inst_nodes, packed.inst_tris, packed.inst_rows,
                k_origin, k_direction, k_tin,
                tlas_rows=layout.tlas_rows, interpret=interpret)
            if sort_packets:
                if W > 1:
                    t, face, fu, fv, inst = permute_rows_waves(
                        [t, face, fu, fv, inst], inv, inverse=True)
                else:
                    t, face, fu, fv, inst = permute_rows(
                        [t, face, fu, fv, inst], inv, block=G)
            normal, uv, shp = trace_inst.resolve_inst_attributes(
                packed.inst_attrs, packed.inst_aux, face, fu, fv, inst,
                n_instances=layout.instance_slots)
        else:
            t, face, fu, fv = trace_packet.wide_trace5(
                packed.wide_nodes_g, packed.wide_tris_g, k_origin,
                k_direction, k_tin, interpret=interpret)
            if sort_packets:
                if W > 1:
                    t, face, fu, fv = permute_rows_waves(
                        [t, face, fu, fv], inv, inverse=True)
                else:
                    t, face, fu, fv = permute_rows([t, face, fu, fv], inv,
                                                   block=G)
            normal, uv, shp = trace_packet.resolve_wide_attributes(
                packed.wide_attrs, face, fu, fv)
        improved = face >= 0
        hit = dict(
            time=jnp.where(improved, t, hit['time']),
            shape=jnp.where(improved, shp, hit['shape']),
            shape_type=jnp.where(improved, SHAPE_TYPE_MESH_INSTANCE,
                                 hit['shape_type']),
            # Face SLOT into the wide tables (host code can translate
            # through packed.wide_face_map for display); a per-lane
            # gather to the mesh face id here would cost ~23 ms/trace
            # for a debug-only field.
            primitive=jnp.where(improved, face, hit['primitive']),
            coords=hit['coords'],
            complexity=hit['complexity'],
            mesh_normal=jnp.where(improved, safe_normalize(normal), 0.0),
            mesh_uv=jnp.where(improved, uv, 0.0),
        )
    else:
        # Portable path over the TRACED instance table: only the
        # bucket-padded slot count is program structure. Padded slots
        # point at the degenerate root (zero loop iterations).
        for k in range(layout.instance_slots):
            shape_index = packed.portable_inst_shape[k]
            root = packed.portable_inst_root[k]
            fw = packed.shape_object_from_world[:, :, shape_index]
            o = transform_point(fw, origin)
            d = transform_vector(fw, direction)
            hit = traverse_mesh_bvh(packed, root, o, d, hit, shape_index)
    return resolve_hit_attributes(packed, layout, origin, direction, hit)
