"""Wide-BVH packet trace kernel (the hot path).

Replaces the round-1 BVH2 packet kernel. That kernel's measured cost
was ~600 cycles per node pop, almost all in a *serialized chain* of
one-hot masked-reduce scalar extractions (14 per pop) that Mosaic does
not overlap. This kernel restructures every fetch so that no masked
reduce remains on the pop path:

  * The tree is 8-wide (scene/bvh8.py): one pop tests 8 child boxes,
    ~3x fewer pops than BVH2, and a whole node is ONE 128-lane row.
  * Row values are redistributed with a single MXU matmul against a
    constant one-hot matrix: either a lane->sublane transpose
    (y = S @ row^T, giving child-major (8,1) vectors) or a broadcast
    outer product (O = row^T @ ones, giving every lane as a (1,128)
    broadcast row). The MXU is otherwise idle in a ray tracer; using
    it as the scalar-broadcast engine removes the VPU reduce chains.
  * Node tests come in two flavors (static `node_mode`):
      - 'exact': per-child slab test of all 1024 rays
        (scene.glsl.inc:336-399 semantics, packet-wide), reduced to one
        (8,1) entry vector with a single two-stage min.
      - 'interval': conservative packet interval arithmetic (Wald-style
        packet culling): child boxes are tested against the packet's
        origin/inv-direction intervals only -- O(8) tiny-vector ops per
        pop, no (8,128) work at all. May visit extra nodes for
        incoherent packets but never misses a hit (triangle tests stay
        exact).
  * Near-first ordering: children are pre-sorted along a per-node axis
    at build time; the kernel flips the push order with one 8x8
    anti-identity matmul when the packet's mean direction along that
    axis is negative. The scalar unit then does 8 aligned (row, 0)
    scalar loads and conditional SMEM stack pushes per pop.
  * Leaves are 4-aligned triangle blocks: one row fetch + one outer
    product feeds 4 Moller-Trumbore tests and the attribute lerp
    (normals/uvs/shape inlined per triangle -- zero per-lane gathers).

Instancing is flattened into world space at compile time, so one
kernel launch traces the whole scene (the TLAS's culling role,
scene.glsl.inc:468-520, is subsumed by the top of the wide tree).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import INFINITY
from ..scene.bvh8 import AXIS_LANE, BIG, META_LANE, TRI_STRIDE

PACKET_ROWS = 8          # sublanes per packet; packet = 8 x 128 = 1024 rays
STACK_DEPTH = 96
PASS_LIMIT = 0.5 * BIG   # entries >= this mean "child not hit"

# VMEM budget guard: tables beyond this fall back to the XLA traversal.
VMEM_TABLE_LIMIT_BYTES = 13 * 1024 * 1024

def _eye(rows, cols):
    """One-hot constant built from iota (pallas kernels cannot capture
    array constants): identity redistributes lane i -> sublane i."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return (r == c).astype(jnp.float32)


def tables_fit_vmem(wide_nodes, wide_tris):
    return (wide_nodes.size + wide_tris.size) * 4 <= VMEM_TABLE_LIMIT_BYTES


def _outer(row):
    """(1, 128) row -> (128, 128) O with O[i, j] = row[0, i].

    A contraction over the singleton axis: every row value becomes a
    lane-broadcast (1, 128) slice, ready to meet (8, 128) ray data.
    """
    ones = jnp.ones((1, 128), jnp.float32)
    # HIGHEST precision is mandatory: the default TPU matmul truncates
    # f32 operands to bf16, which rounds child indices / leaf encodings
    # (exact integers up to ~1e5 stored as f32) to garbage. bf16x3
    # decomposition reproduces f32 exactly for these tiny matmuls.
    return jax.lax.dot_general(row, ones, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _kernel(nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_in_ref,
            t_ref, face_ref, nx_ref, ny_ref, nz_ref, tu_ref, tv_ref,
            shp_ref, *rest, node_mode, stats):
    # rest = [stats_ref?] + scratch [stack, sp, tp, sc, ct].
    if stats:
        stats_ref = rest[0]
        rest = rest[1:]
    stack_ref, sp_ref, tp_ref, sc_ref, ct_ref = rest
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def safe_inv(d):
        # Finite everywhere (|inv| <= 1e8) so interval products with the
        # BIG empty-box sentinel can never produce inf/NaN.
        return 1.0 / jnp.where(jnp.abs(d) < 1e-8,
                               jnp.where(d >= 0, 1e-8, -1e-8), d)

    inv_x, inv_y, inv_z = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    oinv_x, oinv_y, oinv_z = ox * inv_x, oy * inv_y, oz * inv_z

    s72 = _eye(72, 128)
    bigf = jnp.float32(BIG)

    # Packet direction majority per axis -> push-order flip flags.
    fwd = (jnp.sum(dx) >= 0.0, jnp.sum(dy) >= 0.0, jnp.sum(dz) >= 0.0)

    if node_mode == 'interval':
        o_lo = (jnp.min(ox), jnp.min(oy), jnp.min(oz))
        o_hi = (jnp.max(ox), jnp.max(oy), jnp.max(oz))
        i_lo = (jnp.min(inv_x), jnp.min(inv_y), jnp.min(inv_z))
        i_hi = (jnp.max(inv_x), jnp.max(inv_y), jnp.max(inv_z))

    # Output accumulators live in the output refs; scalars in SMEM.
    t_ref[:] = t_in_ref[:]
    face_ref[:] = jnp.full_like(face_ref, -1)
    zeros = jnp.zeros_like(ox)
    nx_ref[:] = zeros
    ny_ref[:] = zeros
    nz_ref[:] = zeros
    tu_ref[:] = zeros
    tv_ref[:] = zeros
    shp_ref[:] = jnp.zeros_like(face_ref)
    stack_ref[0] = jnp.int32(0)
    tp_ref[0] = jnp.max(t_in_ref[:])
    if stats:
        ct_ref[0] = jnp.int32(0)
        ct_ref[1] = jnp.int32(0)

    def interval_entries(y, t_pkt):
        """Conservative per-child (8,1) entry times from packet intervals."""
        entry = jnp.full((8, 1), -bigf)
        exit_ = jnp.full((8, 1), bigf)
        for ax, (olo, ohi, ilo, ihi) in enumerate(zip(o_lo, o_hi, i_lo, i_hi)):
            lo = y[8 * ax:8 * ax + 8]
            hi = y[24 + 8 * ax:24 + 8 * ax + 8]
            a_l, a_h = lo - ohi, lo - olo
            b_l, b_h = hi - ohi, hi - olo
            pa = (a_l * ilo, a_l * ihi, a_h * ilo, a_h * ihi)
            pb = (b_l * ilo, b_l * ihi, b_h * ilo, b_h * ihi)
            t_a_min = jnp.minimum(jnp.minimum(pa[0], pa[1]),
                                  jnp.minimum(pa[2], pa[3]))
            t_a_max = jnp.maximum(jnp.maximum(pa[0], pa[1]),
                                  jnp.maximum(pa[2], pa[3]))
            t_b_min = jnp.minimum(jnp.minimum(pb[0], pb[1]),
                                  jnp.minimum(pb[2], pb[3]))
            t_b_max = jnp.maximum(jnp.maximum(pb[0], pb[1]),
                                  jnp.maximum(pb[2], pb[3]))
            entry = jnp.maximum(entry, jnp.minimum(t_a_min, t_b_min))
            exit_ = jnp.minimum(exit_, jnp.maximum(t_a_max, t_b_max))
        ok = (exit_ >= entry) & (exit_ > 0.0) & (entry < t_pkt)
        return jnp.where(ok, entry, bigf)

    def exact_entries(o_node, t_pkt):
        """Exact packet-min (8,1) entry times: per-child 1024-ray slab."""
        rows = []
        for ch in range(8):
            lo0 = o_node[ch:ch + 1, :]
            lo1 = o_node[8 + ch:9 + ch, :]
            lo2 = o_node[16 + ch:17 + ch, :]
            hi0 = o_node[24 + ch:25 + ch, :]
            hi1 = o_node[32 + ch:33 + ch, :]
            hi2 = o_node[40 + ch:41 + ch, :]
            tx0 = lo0 * inv_x - oinv_x
            tx1 = hi0 * inv_x - oinv_x
            ty0 = lo1 * inv_y - oinv_y
            ty1 = hi1 * inv_y - oinv_y
            tz0 = lo2 * inv_z - oinv_z
            tz1 = hi2 * inv_z - oinv_z
            entry = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
            exit_ = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                            jnp.maximum(ty0, ty1)),
                                jnp.maximum(tz0, tz1))
            ok = (exit_ >= entry) & (exit_ > 0.0) & (entry < t_pkt)
            rows.append(jnp.min(jnp.where(ok, entry, bigf), axis=0,
                                keepdims=True))
        return jnp.min(jnp.concatenate(rows, axis=0), axis=1, keepdims=True)

    def interior(v, sp):
        if stats:
            ct_ref[0] = ct_ref[0] + 1
        row = nodes_ref[pl.ds(v, 1), :]
        t_pkt = tp_ref[0]
        if node_mode == 'interval':
            y = jax.lax.dot_general(s72, row, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
            ents = interval_entries(y, t_pkt)
            meta = y[META_LANE:META_LANE + 8]
            axis = y[AXIS_LANE:AXIS_LANE + 1]
        else:
            o_node = _outer(row)
            ents = exact_entries(o_node, t_pkt)
            meta = o_node[META_LANE:META_LANE + 8, 0:1]
            axis = o_node[AXIS_LANE:AXIS_LANE + 1, 0:1]

        # Empty child slots have meta == 0 (never a real child: node 0
        # is the root and leaves encode negative). Geometry alone can't
        # exclude them -- the symmetric min/max slab test treats an
        # inverted box like a regular one.
        ents = jnp.where(meta != 0.0, ents, bigf)

        block = jnp.concatenate(
            [ents, meta, jnp.broadcast_to(axis, (8, 1))], axis=0)  # (24, 1)
        sc_ref[:, :] = jnp.broadcast_to(block, (24, 128))

        # Children are build-sorted ascending along `axis`; when the
        # packet flies forward along it the near child is index 0, so
        # push order must be reversed (stack pops near-first). The flip
        # is decided and applied entirely on the scalar unit (a (1,1)
        # vector select does not lower on Mosaic).
        ax = sc_ref[16, 0]
        flip = jnp.where(ax == 0.0, fwd[0],
                         jnp.where(ax == 1.0, fwd[1], fwd[2]))
        for i in range(8):
            e = jnp.where(flip, sc_ref[7 - i, 0], sc_ref[i, 0])
            m = jnp.where(flip, sc_ref[15 - i, 0], sc_ref[8 + i, 0])
            ok = (e < PASS_LIMIT) & (sp < STACK_DEPTH)

            @pl.when(ok)
            def _():
                stack_ref[sp] = m.astype(jnp.int32)

            sp = jnp.where(ok, sp + 1, sp)
        sp_ref[0] = sp

    def leaf(v):
        if stats:
            ct_ref[1] = ct_ref[1] + 1
        u = -v
        count = jax.lax.rem(u, 8)
        tri_row = jax.lax.div(u, 8)
        o_tri = _outer(tris_ref[pl.ds(tri_row, 1), :])

        t = t_ref[:]
        face = face_ref[:]
        nx, ny, nz = nx_ref[:], ny_ref[:], nz_ref[:]
        tu, tv = tu_ref[:], tv_ref[:]
        shp = shp_ref[:]

        for k in range(4):
            b = TRI_STRIDE * k
            p0x, p0y, p0z = o_tri[b:b + 1], o_tri[b + 1:b + 2], o_tri[b + 2:b + 3]
            e1x = o_tri[b + 3:b + 4] - p0x
            e1y = o_tri[b + 4:b + 5] - p0y
            e1z = o_tri[b + 5:b + 6] - p0z
            e2x = o_tri[b + 6:b + 7] - p0x
            e2y = o_tri[b + 7:b + 8] - p0y
            e2z = o_tri[b + 8:b + 9] - p0z

            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            ok = jnp.abs(det) >= 1e-9
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
            fu = inv_det * (sx * pvx + sy * pvy + sz * pvz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            fv = inv_det * (dx * qx + dy * qy + dz * qz)
            ft = inv_det * (e2x * qx + e2y * qy + e2z * qz)
            ok &= (fu >= 0.0) & (fu <= 1.0) & (fv >= 0.0) & (fu + fv <= 1.0)
            ok &= (ft >= 0.0) & (ft < t) & (count > k)

            fw = 1.0 - fu - fv
            t = jnp.where(ok, ft, t)
            face = jnp.where(ok, tri_row * 4 + k, face)
            nx = jnp.where(ok, fw * o_tri[b + 9:b + 10]
                           + fu * o_tri[b + 12:b + 13]
                           + fv * o_tri[b + 15:b + 16], nx)
            ny = jnp.where(ok, fw * o_tri[b + 10:b + 11]
                           + fu * o_tri[b + 13:b + 14]
                           + fv * o_tri[b + 16:b + 17], ny)
            nz = jnp.where(ok, fw * o_tri[b + 11:b + 12]
                           + fu * o_tri[b + 14:b + 15]
                           + fv * o_tri[b + 17:b + 18], nz)
            tu = jnp.where(ok, fw * o_tri[b + 18:b + 19]
                           + fu * o_tri[b + 20:b + 21]
                           + fv * o_tri[b + 22:b + 23], tu)
            tv = jnp.where(ok, fw * o_tri[b + 19:b + 20]
                           + fu * o_tri[b + 21:b + 22]
                           + fv * o_tri[b + 23:b + 24], tv)
            shp = jnp.where(ok, o_tri[b + 24:b + 25].astype(jnp.int32), shp)

        t_ref[:] = t
        face_ref[:] = face
        nx_ref[:] = nx
        ny_ref[:] = ny
        nz_ref[:] = nz
        tu_ref[:] = tu
        tv_ref[:] = tv
        shp_ref[:] = shp
        # Tighten the packet reach for later node culling.
        tp_ref[0] = jnp.max(t)

    def cond(sp):
        return sp > 0

    def body(sp):
        sp = sp - 1
        v = stack_ref[sp]
        sp_ref[0] = sp

        @pl.when(v >= 0)
        def _():
            interior(v, sp)

        @pl.when(v < 0)
        def _():
            leaf(v)

        return sp_ref[0]

    jax.lax.while_loop(cond, body, jnp.int32(1))
    if stats:
        # Scalar stores to VMEM are unsupported; write a full block with
        # the counters in lanes 0/1 of row 0.
        li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        stats_ref[:, :] = jnp.where(
            ri == 0,
            jnp.where(li == 0, ct_ref[0], jnp.where(li == 1, ct_ref[1], 0)),
            0)


@functools.partial(jax.jit,
                   static_argnames=('node_mode', 'interpret', 'stats'))
def wide_trace(wide_nodes, wide_tris, origin, direction, t_in,
               node_mode='exact', interpret=False, stats=False):
    """Trace rays against the flattened world-space wide BVH.

    origin/direction: (3, N) world-space rays; t_in: (N,) current best
    hit times (reach pruning). Returns (t, face, world normal (3, N),
    uv (2, N), shape (N,)) with face == -1 where nothing closer was hit.
    Normals are the raw lerped world-space vertex normals (normalize
    downstream). With stats=True also returns a (packets, 2) int32
    array of per-packet (interior pops, leaf pops).
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

    def ray_block():
        return pl.BlockSpec((PACKET_ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def table_block(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    shape2 = (rows, 128)
    o = origin.reshape(3, rows, 128)
    d = direction.reshape(3, rows, 128)

    out_shapes = [jax.ShapeDtypeStruct(shape2, dt) for dt in
                  (jnp.float32, jnp.int32, jnp.float32, jnp.float32,
                   jnp.float32, jnp.float32, jnp.float32, jnp.int32)]
    out_specs = [ray_block() for _ in range(8)]
    if stats:
        out_shapes.append(jax.ShapeDtypeStruct((grid * 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_kernel, node_mode=node_mode, stats=stats),
        out_shape=tuple(out_shapes),
        grid=(grid,),
        in_specs=[table_block(wide_nodes), table_block(wide_tris)]
        + [ray_block() for _ in range(7)],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((24, 128), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),
        ],
        interpret=interpret,
    )(wide_nodes, wide_tris,
      o[0], o[1], o[2], d[0], d[1], d[2], t_in.reshape(shape2))

    t, face, nx, ny, nz, tu, tv, shp = (x.reshape(total)[:n] for x in out[:8])
    normal = jnp.stack([nx, ny, nz], axis=0)
    uv = jnp.stack([tu, tv], axis=0)
    if stats:
        return t, face, normal, uv, shp, out[8][::8, :2]
    return t, face, normal, uv, shp
