"""Wide-BVH packet trace kernel (the hot path).

Replaces the round-1 BVH2 packet kernel. Design facts, all measured on
the real v5e chip (tools/diag_trace.py; see git history for numbers):

  * The cost of traversal is a per-pop chain: row fetch ->
    redistribution matmul -> vector slab tests -> a vector->scalar
    crossing -> scalar stack pushes. Wald-style conservative
    packet-interval node tests were measured to cost the same per pop
    as exact 1024-ray slab tests while visiting 3x more nodes, so only
    the exact test survives.
  * The tree is 8-wide (scene/bvh8.py): one pop tests 8 child boxes,
    and a whole node is ONE 128-lane row fetched with a single
    `pl.ds` load. Row values are redistributed to lane broadcasts with
    one K=1 outer-product contraction against a constant ones-row.
  * The only vector->scalar crossing per pop is ONE reduce-to-scalar:
    an 8-bit child hit mask (sum of 2^child over passing children).
    Child meta words and the traversal axis are read by the scalar
    unit directly from the node table (scalar VMEM loads) -- no
    scratch-buffer roundtrip, no per-child masked reductions.
  * Leaves are 4-aligned triangle blocks of up to 8 triangles (two
    rows; the second row is predicated on the leaf's count): one pop
    amortizes its fetch over up to 8 Moller-Trumbore tests and the
    attribute lerp. Zero per-lane gathers anywhere.
  * Node culling uses each ray's CURRENT best hit (per-ray reach), not
    the packet max: with incoherent packets most rays find a nearby
    hit early and stop voting for far subtrees.
  * Near-first ordering: children are pre-sorted along a per-node axis
    at build time; the push order is flipped by scalar selects when
    the packet's mean direction along that axis is positive. (1,1)
    vector selects do not lower on Mosaic -- every per-node decision
    stays on the scalar unit.
  * `interleave` (default 1) can traverse several independent packets
    per kernel instance, round-robining one pop per packet per loop
    iteration. Measured on-chip: NO speedup at any interleave (719
    cyc/pop flat from 1 to 8 packets) -- the pop cost is throughput-
    bound on the VPU, not latency-bound, so overlapping chains buys
    nothing. Kept as a switch because the balance/occupancy tradeoff
    may differ on other TPU generations.
  * The redistribution "matmul" (K=1 contraction) measured identical
    time and identical results at DEFAULT and HIGHEST precision: Mosaic
    lowers singleton contractions as VPU broadcasts, not MXU passes.
    HIGHEST is kept in case a future Mosaic routes it to the MXU
    (where DEFAULT's bf16 truncation would corrupt the exact-integer
    lanes).

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
from ..scene.bvh8 import (
    AXIS_LANE, BIG, LEAF_MAX, LEAF_ROW_LIMIT, META_LANE, TRI_STRIDE, TRIS_PER_ROW,
)

PACKET_ROWS = 8          # sublanes per packet; packet = 8 x 128 = 1024 rays
INTERLEAVE = 1           # packets in flight per kernel instance (see above)
STACK_DEPTH = 96
PASS_LIMIT = 0.5 * BIG   # entries >= this mean "child not hit"
LEAF_ROWS = LEAF_MAX // TRIS_PER_ROW

# VMEM budget guard: tables beyond this fall back to the XLA traversal.
VMEM_TABLE_LIMIT_BYTES = 13 * 1024 * 1024


def tables_fit_vmem(wide_nodes, wide_tris):
    return (wide_nodes.size + wide_tris.size) * 4 <= VMEM_TABLE_LIMIT_BYTES


def _outer(row):
    """(1, 128) row -> (128, 128) O with O[i, j] = row[0, i].

    A contraction over the singleton axis: every row value becomes a
    lane-broadcast (1, 128) slice, ready to meet (8, 128) ray data.
    Mosaic lowers this K=1 contraction as VPU broadcasts (measured:
    DEFAULT and HIGHEST identical in time AND results); HIGHEST is kept
    so a future MXU lowering cannot bf16-truncate the exact-integer
    lanes (child indices / leaf encodings up to ~1e5).
    """
    ones = jnp.ones((1, 128), jnp.float32)
    return jax.lax.dot_general(row, ones, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _kernel(nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_in_ref,
            t_ref, face_ref, nx_ref, ny_ref, nz_ref, tu_ref, tv_ref,
            shp_ref, *rest, interleave, stats):
    # rest = [stats_ref?] + scratch [stack, sp, ct].
    if stats:
        stats_ref = rest[0]
        rest = rest[1:]
    stack_ref, sp_ref, ct_ref = rest

    bigf = jnp.float32(BIG)
    P = interleave

    def safe_inv(d):
        # Finite everywhere (|inv| <= 1e8) so products with the BIG
        # empty-box sentinel can never produce inf/NaN.
        return 1.0 / jnp.where(jnp.abs(d) < 1e-8,
                               jnp.where(d >= 0, 1e-8, -1e-8), d)

    # Per-packet cached ray registers: (8, 128) slices of the (P*8, 128)
    # blocks, plus inverse directions and origin*inv products.
    pk = []
    for p in range(P):
        sl = slice(8 * p, 8 * p + 8)
        ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
        dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
        inv = (safe_inv(dx), safe_inv(dy), safe_inv(dz))
        oinv = (ox * inv[0], oy * inv[1], oz * inv[2])
        fwd = (jnp.sum(dx) >= 0.0, jnp.sum(dy) >= 0.0, jnp.sum(dz) >= 0.0)
        pk.append(dict(sl=sl, o=(ox, oy, oz), d=(dx, dy, dz),
                       inv=inv, oinv=oinv, fwd=fwd))

    # Child-slot weights for the one reduce-to-scalar hit mask.
    pow2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    # Output accumulators live in the output refs; stacks in SMEM.
    t_ref[:] = t_in_ref[:]
    face_ref[:] = jnp.full_like(face_ref, -1)
    zeros = jnp.zeros_like(t_in_ref[:])
    nx_ref[:] = zeros
    ny_ref[:] = zeros
    nz_ref[:] = zeros
    tu_ref[:] = zeros
    tv_ref[:] = zeros
    shp_ref[:] = jnp.zeros_like(face_ref)
    for p in range(P):
        stack_ref[p, 0] = jnp.int32(0)
        sp_ref[p] = jnp.int32(1)
    if stats:
        ct_ref[0] = jnp.int32(0)
        ct_ref[1] = jnp.int32(0)
        ct_ref[2] = jnp.int32(0)

    def interior(p, v, sp):
        if stats:
            ct_ref[0] = ct_ref[0] + 1
        row = nodes_ref[pl.ds(v, 1), :]
        o_node = _outer(row)
        inv_x, inv_y, inv_z = pk[p]['inv']
        oinv_x, oinv_y, oinv_z = pk[p]['oinv']
        t_cur = t_ref[pk[p]['sl'], :]  # per-ray reach culling

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
            ok = (exit_ >= entry) & (exit_ > 0.0) & (entry < t_cur)
            rows.append(jnp.min(jnp.where(ok, entry, bigf), axis=0,
                                keepdims=True))
        ents = jnp.min(jnp.concatenate(rows, axis=0), axis=1, keepdims=True)

        # Empty child slots have meta == 0 (never a real child: node 0
        # is the root and leaves encode negative). Geometry alone can't
        # exclude them -- the symmetric min/max slab test treats an
        # inverted box like a regular one.
        meta = o_node[META_LANE:META_LANE + 8, 0:1]
        hit = (ents < PASS_LIMIT) & (meta != 0.0)

        # The ONE vector->scalar crossing: an 8-bit child hit mask.
        mask = jnp.sum(jnp.where(hit, pow2, 0.0)).astype(jnp.int32)

        # Children are build-sorted ascending along `axis`; when the
        # packet flies forward along it the near child is index 0, so
        # push order must be reversed (stack pops near-first). All
        # decided and applied on the scalar unit; child meta words are
        # scalar loads straight from the node table.
        fwd = pk[p]['fwd']
        ax = nodes_ref[v, AXIS_LANE]
        flip = jnp.where(ax == 0.0, fwd[0],
                         jnp.where(ax == 1.0, fwd[1], fwd[2]))
        for i in range(8):
            c_f, c_r = i, 7 - i
            take = jnp.where(flip, (mask >> c_r) & 1, (mask >> c_f) & 1)
            m = jnp.where(flip, nodes_ref[v, META_LANE + c_r],
                          nodes_ref[v, META_LANE + c_f])
            ok = (take != 0) & (sp < STACK_DEPTH)

            @pl.when(ok)
            def _():
                stack_ref[p, sp] = m.astype(jnp.int32)

            sp = jnp.where(ok, sp + 1, sp)
        sp_ref[p] = sp

    def leaf(p, v):
        if stats:
            ct_ref[1] = ct_ref[1] + 1
        u = -v
        count = jax.lax.div(u, LEAF_ROW_LIMIT)
        tri_row = jax.lax.rem(u, LEAF_ROW_LIMIT)
        sl = pk[p]['sl']
        ox, oy, oz = pk[p]['o']
        dx, dy, dz = pk[p]['d']

        def do_row(r):
            o_tri = _outer(tris_ref[pl.ds(tri_row + r, 1), :])

            t = t_ref[sl, :]
            face = face_ref[sl, :]
            nx, ny, nz = nx_ref[sl, :], ny_ref[sl, :], nz_ref[sl, :]
            tu, tv = tu_ref[sl, :], tv_ref[sl, :]
            shp = shp_ref[sl, :]

            for k in range(TRIS_PER_ROW):
                b = TRI_STRIDE * k
                p0x = o_tri[b:b + 1]
                p0y = o_tri[b + 1:b + 2]
                p0z = o_tri[b + 2:b + 3]
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
                ok &= (ft >= 0.0) & (ft < t) & (count > r * TRIS_PER_ROW + k)

                fw = 1.0 - fu - fv
                t = jnp.where(ok, ft, t)
                face = jnp.where(ok, (tri_row + r) * TRIS_PER_ROW + k, face)
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
                shp = jnp.where(ok, o_tri[b + 24:b + 25].astype(jnp.int32),
                                shp)

            t_ref[sl, :] = t
            face_ref[sl, :] = face
            nx_ref[sl, :] = nx
            ny_ref[sl, :] = ny
            nz_ref[sl, :] = nz
            tu_ref[sl, :] = tu
            tv_ref[sl, :] = tv
            shp_ref[sl, :] = shp

        do_row(0)
        for r in range(1, LEAF_ROWS):
            @pl.when(count > r * TRIS_PER_ROW)
            def _(r=r):
                do_row(r)

    def pop_one(p):
        sp = sp_ref[p]

        @pl.when(sp > 0)
        def _():
            sp1 = sp - 1
            v = stack_ref[p, sp1]
            sp_ref[p] = sp1

            @pl.when(v >= 0)
            def _():
                interior(p, v, sp1)

            @pl.when(v < 0)
            def _():
                leaf(p, v)

    def cond(total):
        return total > 0

    def body(_):
        if stats:
            ct_ref[2] = ct_ref[2] + 1
        for p in range(P):
            pop_one(p)
        total = sp_ref[0]
        for p in range(1, P):
            total = total + sp_ref[p]
        return total

    jax.lax.while_loop(cond, body, jnp.int32(P))
    if stats:
        # Scalar stores to VMEM are unsupported; write a full block with
        # the counters in lanes 0/1/2 of row 0.
        li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        vals = jnp.where(li == 0, ct_ref[0],
                         jnp.where(li == 1, ct_ref[1],
                                   jnp.where(li == 2, ct_ref[2], 0)))
        stats_ref[:, :] = jnp.where(ri == 0, vals, 0)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'stats', 'interleave'))
def wide_trace(wide_nodes, wide_tris, origin, direction, t_in,
               interpret=False, stats=False, interleave=INTERLEAVE):
    """Trace rays against the flattened world-space wide BVH.

    origin/direction: (3, N) world-space rays; t_in: (N,) current best
    hit times (reach pruning). Returns (t, face, world normal (3, N),
    uv (2, N), shape (N,)) with face == -1 where nothing closer was hit.
    Normals are the raw lerped world-space vertex normals (normalize
    downstream). With stats=True also returns a (grid, 3) int32 array
    of per-grid-step (interior pops, leaf pops, loop iterations); the
    iteration count exposes imbalance between interleaved packets.
    """
    n = origin.shape[1]
    group = interleave * PACKET_ROWS * 128
    n_pad = -n % group
    if n_pad:
        origin = jnp.pad(origin, ((0, 0), (0, n_pad)))
        direction = jnp.pad(direction, ((0, 0), (0, n_pad)),
                            constant_values=1.0)
        t_in = jnp.pad(t_in, (0, n_pad))  # t=0: padded rays hit nothing
    total = n + n_pad
    rows = total // 128
    grid = rows // (interleave * PACKET_ROWS)

    def ray_block():
        return pl.BlockSpec((interleave * PACKET_ROWS, 128),
                            lambda i: (i, 0), memory_space=pltpu.VMEM)

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
        functools.partial(_kernel, interleave=interleave, stats=stats),
        out_shape=tuple(out_shapes),
        grid=(grid,),
        in_specs=[table_block(wide_nodes), table_block(wide_tris)]
        + [ray_block() for _ in range(7)],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.SMEM((interleave, STACK_DEPTH), jnp.int32),
            pltpu.SMEM((interleave,), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
        ],
        interpret=interpret,
    )(wide_nodes, wide_tris,
      o[0], o[1], o[2], d[0], d[1], d[2], t_in.reshape(shape2))

    t, face, nx, ny, nz, tu, tv, shp = (x.reshape(total)[:n] for x in out[:8])
    normal = jnp.stack([nx, ny, nz], axis=0)
    uv = jnp.stack([tu, tv], axis=0)
    if stats:
        return t, face, normal, uv, shp, out[8][::8, :3]
    return t, face, normal, uv, shp
