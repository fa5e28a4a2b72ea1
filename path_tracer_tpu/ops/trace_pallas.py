"""Pallas packet-traversal trace kernel (the hot path).

TPU-native replacement for per-lane BVH walking. Per-lane gathers are
architecturally slow on TPU (XLA's gather lowering sustains ~90M
indices/s -- three orders of magnitude under what ray traversal needs),
so this kernel restructures traversal around the TPU's scalar/vector
split, the way CPU-SIMD packet tracers did (Wald et al.) but at vreg
width:

  * A *packet* is one (8, 128) vreg block = 1024 rays (one grid step).
  * The traversal stack is shared per packet and lives in SMEM, driven
    by the scalar unit; node/triangle data are fetched as *scalar*
    VMEM reads and broadcast against the whole packet -- zero gathers.
  * A node is visited if any ray in the packet wants it (vector AABB
    test + any-reduce); leaf triangles are tested by all 1024 lanes
    simultaneously (Moller-Trumbore, scene.glsl.inc:304-334).
  * Vertex attributes (normals, UVs) are interpolated in-kernel at hit
    time from the same scalar-broadcast triangle rows, so the trace
    stage needs no per-lane attribute gathers at all.

Tables are packed flat into (rows, 128) f32/i32 VMEM arrays with manual
stride addressing, because a (B, small) table would pad its minor dim
to 128 lanes. Strides are powers of two so the scalar index math is
shifts.

Packet efficiency depends on ray coherence: primary rays in a tile
share almost all node visits; incoherent bounce rays degrade toward
the union of their traversals (mitigated later by ray sorting).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import INFINITY

PACKET_ROWS = 8          # sublanes per packet; packet = 8 x 128 = 1024 rays
NODE_STRIDE = 16         # floats per internal node: child A box (6) + child B box (6) + pad
META_STRIDE = 2          # ints per node: a (child | face begin), b (0 | face end)
TRI_STRIDE = 32          # floats per face: p0 p1 p2 (9), n0 n1 n2 (9), uv0/1/2 (6)
STACK_DEPTH = 64
MAX_LEAF_FACES = 4

# VMEM budget guard: tables beyond this fall back to the XLA traversal.
VMEM_TABLE_LIMIT_BYTES = 12 * 1024 * 1024


def pack_tables(node_min, node_max, node_a, node_b, face_positions,
                face_vertices, vertex_normals, vertex_uvs):
    """Host-side packing of BVH + triangle tables into flat (rows, 128)
    arrays for scalar VMEM addressing.

    node_min/node_max: (3, B); node_a/node_b: (B,);
    face_positions: (3 verts, 3 comps, F); face_vertices: (3, F);
    vertex_normals: (3, V); vertex_uvs: (2, V).
    """
    node_min = np.asarray(node_min)
    node_max = np.asarray(node_max)
    node_a = np.asarray(node_a)
    node_b = np.asarray(node_b)
    b = node_min.shape[1]
    # Two-fetch layout: each *internal* node's row holds BOTH children's
    # boxes, so one pop tests and orders both subtrees (the reference's
    # near-child-first scheme, scene.glsl.inc:336-399, packet-wide).
    nodes = np.zeros((b, NODE_STRIDE), np.float32)
    internal = node_b == 0
    ca = np.where(internal, node_a, 0)
    cb = np.minimum(ca + 1, b - 1)
    nodes[internal, 0:3] = node_min[:, ca[internal]].T
    nodes[internal, 3:6] = node_max[:, ca[internal]].T
    nodes[internal, 6:9] = node_min[:, cb[internal]].T
    nodes[internal, 9:12] = node_max[:, cb[internal]].T

    meta = np.stack([node_a, node_b], axis=1).astype(np.int32)

    fp = np.asarray(face_positions)   # (3, 3, F)
    fv = np.asarray(face_vertices)    # (3, F)
    vn = np.asarray(vertex_normals)   # (3, V)
    vt = np.asarray(vertex_uvs)       # (2, V)
    f = fp.shape[2]
    tris = np.zeros((f, TRI_STRIDE), np.float32)
    for v in range(3):
        tris[:, v * 3:(v + 1) * 3] = fp[v].T              # positions
        tris[:, 9 + v * 3:9 + (v + 1) * 3] = vn[:, fv[v]].T  # normals
        tris[:, 18 + v * 2:18 + (v + 1) * 2] = vt[:, fv[v]].T  # uvs

    def flat128(arr):
        flat = arr.reshape(-1)
        pad = (-len(flat)) % 128
        return np.pad(flat, (0, pad)).reshape(-1, 128)

    return dict(
        trace_nodes=flat128(nodes),
        trace_meta=flat128(meta),
        trace_tris=flat128(tris),
    )


def tables_fit_vmem(trace_nodes, trace_meta, trace_tris):
    total = (trace_nodes.size + trace_meta.size + trace_tris.size) * 4
    return total <= VMEM_TABLE_LIMIT_BYTES


def _kernel(nodes_ref, meta_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_in_ref,
            t_ref, face_ref, nx_ref, ny_ref, nz_ref, tu_ref, tv_ref,
            stack_ref, *, root):
    """One packet: shared-stack BVH2 traversal of 1024 rays."""

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    inv_x = 1.0 / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
    inv_y = 1.0 / jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)
    inv_z = 1.0 / jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)

    # Scalar fetches from VMEM: Mosaic requires lane indices to be
    # 128-aligned, so a direct ref[row, col] with dynamic col does not
    # compile. Instead: dynamic-slice one (1, 128) row (dynamic sublane
    # start is fine), then extract scalars with one-hot masked reduces.
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def extract(row, col):
        return jnp.sum(jnp.where(lane_iota == col, row, 0))

    def node_row(node):
        # NODE_STRIDE=16 floats per node: 8 nodes per 128-lane row.
        return nodes_ref[pl.ds(node // 8, 1), :], (node % 8) * NODE_STRIDE

    def meta_row(node):
        return meta_ref[pl.ds(node // 64, 1), :], (node % 64) * META_STRIDE

    def tri_row(face):
        return tris_ref[pl.ds(face // 4, 1), :], (face % 4) * TRI_STRIDE

    stack_ref[0] = jnp.int32(root)

    # The stack pointer lives in the while carry (not a ref): the loop
    # condition must read it, and carried scalars work identically in
    # compiled Mosaic and interpret mode.
    def cond(carry):
        return carry[0] > 0

    def slab_test(prow, base, t):
        lo0 = extract(prow, base + 0)
        lo1 = extract(prow, base + 1)
        lo2 = extract(prow, base + 2)
        hi0 = extract(prow, base + 3)
        hi1 = extract(prow, base + 4)
        hi2 = extract(prow, base + 5)
        tx0 = (lo0 - ox) * inv_x
        tx1 = (hi0 - ox) * inv_x
        ty0 = (lo1 - oy) * inv_y
        ty1 = (hi1 - oy) * inv_y
        tz0 = (lo2 - oz) * inv_z
        tz1 = (hi2 - oz) * inv_z
        entry = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1))
        exit_ = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
        wants = (exit_ >= entry) & (exit_ > 0.0) & (entry < t)
        # Packet-min entry doubles as the hit predicate (min < INF) and
        # the near-first ordering key.
        return jnp.min(jnp.where(wants, entry, jnp.float32(INFINITY)))

    def body(carry):
        sp, t, face, nx, ny, nz, tu, tv = carry

        sp = sp - 1
        node = stack_ref[sp]

        mrow, mbase = meta_row(node)
        a = extract(mrow, mbase + 0)
        b = extract(mrow, mbase + 1)
        is_leaf = b > 0

        # Internal: one row holds both children's boxes; test both, push
        # far-then-near among the passing ones (near popped first).
        prow, pbase = node_row(node)
        min_a = slab_test(prow, pbase, t)
        min_b = slab_test(prow, pbase + 6, t)

        inf = jnp.float32(INFINITY)
        not_leaf = jnp.logical_not(is_leaf)
        a_first = min_a <= min_b
        far = jnp.where(a_first, a + 1, a)
        far_ok = not_leaf & (jnp.where(a_first, min_b, min_a) < inf)
        near = jnp.where(a_first, a, a + 1)
        near_ok = not_leaf & (jnp.where(a_first, min_a, min_b) < inf)
        fits = sp < STACK_DEPTH - 2

        @pl.when(far_ok & fits)
        def _():
            stack_ref[sp] = far

        sp = jnp.where(far_ok & fits, sp + 1, sp)

        @pl.when(near_ok & fits)
        def _():
            stack_ref[sp] = near

        sp = jnp.where(near_ok & fits, sp + 1, sp)

        # Leaf: masked Moller-Trumbore + in-kernel attribute lerp.
        # Padding triangles (leaves hold up to MAX_LEAF_FACES) are
        # skipped with a scalar cond, and the 15-extract attribute lerp
        # only runs when some lane accepted the hit.
        def leaf_fn(carry):
            def one_tri(k, carry):
                t, face, nx, ny, nz, tu, tv = carry
                tri = a + k
                trow, tbase = tri_row(tri)
                p0x = extract(trow, tbase + 0)
                p0y = extract(trow, tbase + 1)
                p0z = extract(trow, tbase + 2)
                e1x = extract(trow, tbase + 3) - p0x
                e1y = extract(trow, tbase + 4) - p0y
                e1z = extract(trow, tbase + 5) - p0z
                e2x = extract(trow, tbase + 6) - p0x
                e2y = extract(trow, tbase + 7) - p0y
                e2z = extract(trow, tbase + 8) - p0z

                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                ok = jnp.abs(det) >= 1e-9
                inv_det = 1.0 / jnp.where(ok, det, 1.0)
                sx = ox - p0x
                sy = oy - p0y
                sz = oz - p0z
                fu = inv_det * (sx * pvx + sy * pvy + sz * pvz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                fv = inv_det * (dx * qx + dy * qy + dz * qz)
                ft = inv_det * (e2x * qx + e2y * qy + e2z * qz)
                ok &= (fu >= 0.0) & (fu <= 1.0) & (fv >= 0.0) & (fu + fv <= 1.0)
                ok &= (ft >= 0.0) & (ft < t)

                def accept(carry):
                    t, face, nx, ny, nz, tu, tv = carry
                    fw = 1.0 - fu - fv
                    t = jnp.where(ok, ft, t)
                    face = jnp.where(ok, tri, face)
                    nx = jnp.where(ok, fw * extract(trow, tbase + 9)
                                   + fu * extract(trow, tbase + 12)
                                   + fv * extract(trow, tbase + 15), nx)
                    ny = jnp.where(ok, fw * extract(trow, tbase + 10)
                                   + fu * extract(trow, tbase + 13)
                                   + fv * extract(trow, tbase + 16), ny)
                    nz = jnp.where(ok, fw * extract(trow, tbase + 11)
                                   + fu * extract(trow, tbase + 14)
                                   + fv * extract(trow, tbase + 17), nz)
                    tu = jnp.where(ok, fw * extract(trow, tbase + 18)
                                   + fu * extract(trow, tbase + 20)
                                   + fv * extract(trow, tbase + 22), tu)
                    tv = jnp.where(ok, fw * extract(trow, tbase + 19)
                                   + fu * extract(trow, tbase + 21)
                                   + fv * extract(trow, tbase + 23), tv)
                    return t, face, nx, ny, nz, tu, tv

                return jax.lax.cond(jnp.any(ok), accept, lambda c: c, carry)

            return jax.lax.fori_loop(0, b - a, one_tri, carry)

        t, face, nx, ny, nz, tu, tv = jax.lax.cond(
            is_leaf, leaf_fn, lambda c: c,
            (t, face, nx, ny, nz, tu, tv))
        return (sp, t, face, nx, ny, nz, tu, tv)

    zeros = jnp.zeros_like(t_in_ref[:])
    init = (jnp.int32(1), t_in_ref[:], jnp.full_like(face_ref, -1),
            zeros, zeros, zeros, zeros, zeros)
    _, t, face, nx, ny, nz, tu, tv = jax.lax.while_loop(cond, body, init)

    t_ref[:] = t
    face_ref[:] = face
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    tu_ref[:] = tu
    tv_ref[:] = tv


@functools.partial(jax.jit, static_argnames=('root', 'interpret'))
def packet_trace(trace_nodes, trace_meta, trace_tris, origin, direction,
                 t_in, root=0, interpret=False):
    """Trace rays against one mesh BVH with the packet kernel.

    origin/direction: (3, N) object-space rays (velocity
    parameterization -- t consistent with world space); t_in: (N,)
    current best hit times (reach pruning). N is padded internally to a
    packet multiple. Returns (t, face, normal_obj (3, N), uv (2, N))
    with face == -1 where no closer hit was found.
    """
    n = origin.shape[1]
    packet = PACKET_ROWS * 128
    n_pad = -n % packet
    if n_pad:
        origin = jnp.pad(origin, ((0, 0), (0, n_pad)))
        direction = jnp.pad(direction, ((0, 0), (0, n_pad)),
                            constant_values=1.0)
        t_in = jnp.pad(t_in, (0, n_pad))  # t=0: padded rays hit nothing
    total = n + n_pad
    rows = total // 128
    grid = rows // PACKET_ROWS

    def ray_block(_):
        return pl.BlockSpec((PACKET_ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def table_block(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    shape2 = (rows, 128)
    o = origin.reshape(3, rows, 128)
    d = direction.reshape(3, rows, 128)

    out_block = pl.BlockSpec((PACKET_ROWS, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, root=root),
        out_shape=tuple(
            jax.ShapeDtypeStruct(shape2, jnp.int32 if k == 1 else jnp.float32)
            for k in range(7)),
        grid=(grid,),
        in_specs=[
            table_block(trace_nodes),
            table_block(trace_meta),
            table_block(trace_tris),
        ] + [ray_block(k) for k in range(7)],
        out_specs=tuple(out_block for _ in range(7)),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
        ],
        interpret=interpret,
    )(trace_nodes, trace_meta, trace_tris,
      o[0], o[1], o[2], d[0], d[1], d[2], t_in.reshape(shape2))

    t, face, nx, ny, nz, tu, tv = (x.reshape(total)[:n] for x in out)
    normal = jnp.stack([nx, ny, nz], axis=0)
    uv = jnp.stack([tu, tv], axis=0)
    return t, face, normal, uv
