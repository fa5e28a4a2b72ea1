"""Transposed wide-BVH packet kernel (v4): 128-ray sub-packets.

The v3 kernel (ops/trace_wide.py) traces 1024-ray packets and pays
~250 vector issues per interior pop (the 8 child slab tests are
sequential, each on the full (8, 128) ray block) and ~400 per leaf pop.
Measured on-chip (tools/exp_packet_size.py, viking hall, octant-sorted
uniform bounce rays): shrinking the packet to 128 rays only grows the
per-ray pop count 1.28x (0.63 -> 0.80 pops/ray) while a transposed
data layout cuts vector issues per pop ~7x on interiors and ~2.7x on
leaves:

  * Rays ride the LANE axis only (a sub-packet is one (1, 128) row).
  * The 8 child boxes of an interior node ride the SUBLANE axis: the
    node row's outer-product redistribution already yields (8, 128)
    tiles whose row c is child c's bound (the v3 node layout is
    coordinate-major, scene/bvh8.py), so ONE fused (8, 128) slab test
    covers all 8 children x 128 rays.
  * The 8 triangles of a leaf ride the sublane axis via the two-row
    transposed leaf layout (scene/bvh8.py transpose_wide): one (8, 128)
    Moller-Trumbore tests all 8 triangles, a sublane arg-min picks the
    winner, and attributes are lerped per-triangle then selected.

Everything else (one vector->scalar crossing per interior pop, scalar
push loop with near-first flip, per-ray reach culling, SMEM stacks)
matches v3. Each (8, 128) grid block holds 8 INDEPENDENT sub-packets
traversed by a fori_loop (code emitted once); per-sub-packet rows are
read/written with masked full-tile ops (dynamic sublane slices are
avoided -- Mosaic's support for them is spotty).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh8 import (
    ATTR_N0, ATTR_N1, ATTR_N2, ATTR_UV, AXIS_LANE, BIG,
    GEOM_E1, GEOM_E2, GEOM_FACE, GEOM_P0, GEOM_SHAPE,
    LEAF_ENC, META_LANE,
)

SUBPACKETS = 8           # sub-packets per (8, 128) grid block
STACK_DEPTH = 96
VMEM_TABLE_LIMIT_BYTES = 13 * 1024 * 1024


def tables_fit_vmem(nodes, tris_t):
    return (nodes.size + tris_t.size) * 4 <= VMEM_TABLE_LIMIT_BYTES


def _outer(row):
    """(1, 128) row -> (128, 128) O with O[i, j] = row[0, i] (see v3)."""
    ones = jnp.ones((1, 128), jnp.float32)
    return jax.lax.dot_general(row, ones, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _kernel(nodes_ref, tris_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_in_ref,
            t_ref, face_ref, nx_ref, ny_ref, nz_ref, tu_ref, tv_ref,
            shp_ref, *rest, stats):
    if stats:
        stats_ref = rest[0]
        rest = rest[1:]
    (stack_ref, sp_ref, ct_ref,
     invx_ref, invy_ref, invz_ref, fwd_ref) = rest

    bigf = jnp.float32(BIG)
    pass_limit = jnp.float32(0.5 * BIG)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    pow2 = jnp.float32(2.0) ** rowi
    lanei = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-8,
                               jnp.where(d >= 0, 1e-8, -1e-8), d)

    # Block-wide precompute: inverse directions for all 8 sub-packets,
    # and the per-sub-packet direction-sign sums (lanes 0/1/2 of a
    # scratch tile; the scalar unit reads them back per pop -- scalar
    # SMEM stores of vector data don't exist, VMEM scratch does).
    invx = safe_inv(dx_ref[:])
    invy = safe_inv(dy_ref[:])
    invz = safe_inv(dz_ref[:])
    invx_ref[:] = invx
    invy_ref[:] = invy
    invz_ref[:] = invz
    sx = jnp.sum(dx_ref[:], axis=1, keepdims=True)  # (8, 1)
    sy = jnp.sum(dy_ref[:], axis=1, keepdims=True)
    sz = jnp.sum(dz_ref[:], axis=1, keepdims=True)
    fwd_ref[:] = jnp.where(lanei == 0, sx, jnp.where(lanei == 1, sy, sz))

    t_ref[:] = t_in_ref[:]
    face_ref[:] = jnp.full_like(face_ref, -1)
    zeros = jnp.zeros_like(t_in_ref[:])
    nx_ref[:] = zeros
    ny_ref[:] = zeros
    nz_ref[:] = zeros
    tu_ref[:] = zeros
    tv_ref[:] = zeros
    shp_ref[:] = jnp.zeros_like(face_ref)
    if stats:
        ct_ref[0] = jnp.int32(0)
        ct_ref[1] = jnp.int32(0)
        ct_ref[2] = jnp.int32(0)

    def row_of(ref, s):
        """Sub-packet s's (1, 128) row of an (8, 128) block (masked
        reduce keeps every access pattern Mosaic-friendly)."""
        return jnp.sum(jnp.where(rowi == s, ref[:], 0.0), axis=0,
                       keepdims=True)

    def merge_row(ref, s, row, keep):
        """Write `row` into sublane s of ref where keep (1, 128)."""
        ref[:] = jnp.where((rowi == s) & keep, row, ref[:])

    def traverse(s, carry):
        ox = row_of(ox_ref, s)
        oy = row_of(oy_ref, s)
        oz = row_of(oz_ref, s)
        dx = row_of(dx_ref, s)
        dy = row_of(dy_ref, s)
        dz = row_of(dz_ref, s)
        ivx = row_of(invx_ref, s)
        ivy = row_of(invy_ref, s)
        ivz = row_of(invz_ref, s)
        oix = ox * ivx
        oiy = oy * ivy
        oiz = oz * ivz

        def interior(v, sp):
            if stats:
                ct_ref[0] = ct_ref[0] + 1
            o_node = _outer(nodes_ref[pl.ds(v, 1), :])
            t_cur = row_of(t_ref, s)
            tx0 = o_node[0:8] * ivx - oix
            ty0 = o_node[8:16] * ivy - oiy
            tz0 = o_node[16:24] * ivz - oiz
            tx1 = o_node[24:32] * ivx - oix
            ty1 = o_node[32:40] * ivy - oiy
            tz1 = o_node[40:48] * ivz - oiz
            entry = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                            jnp.minimum(ty0, ty1)),
                                jnp.minimum(tz0, tz1))
            exit_ = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                            jnp.maximum(ty0, ty1)),
                                jnp.maximum(tz0, tz1))
            meta = o_node[META_LANE:META_LANE + 8, 0:1]
            ok = ((exit_ >= entry) & (exit_ > 0.0) & (entry < t_cur)
                  & (meta != 0.0))
            # One vector->scalar crossing: the 8-bit child hit mask.
            hitc = jnp.max(jnp.where(ok, pow2, 0.0), axis=1, keepdims=True)
            mask = jnp.sum(hitc).astype(jnp.int32)

            fwd_x = fwd_ref[s, 0] >= 0.0
            fwd_y = fwd_ref[s, 1] >= 0.0
            fwd_z = fwd_ref[s, 2] >= 0.0
            ax = nodes_ref[v, AXIS_LANE]
            flip = jnp.where(ax == 0.0, fwd_x,
                             jnp.where(ax == 1.0, fwd_y, fwd_z))
            spv = sp
            for i in range(8):
                c_f, c_r = i, 7 - i
                take = jnp.where(flip, (mask >> c_r) & 1, (mask >> c_f) & 1)
                m = jnp.where(flip, nodes_ref[v, META_LANE + c_r],
                              nodes_ref[v, META_LANE + c_f])
                okp = (take != 0) & (spv < STACK_DEPTH)

                @pl.when(okp)
                def _():
                    stack_ref[s, spv] = m.astype(jnp.int32)

                spv = jnp.where(okp, spv + 1, spv)
            sp_ref[s] = spv

        def leaf(v):
            if stats:
                ct_ref[1] = ct_ref[1] + 1
            u = -v
            count = jax.lax.rem(u, LEAF_ENC)
            pair = jax.lax.div(u, LEAF_ENC)
            g = _outer(tris_ref[pl.ds(2 * pair, 1), :])
            a = _outer(tris_ref[pl.ds(2 * pair + 1, 1), :])

            p0x = g[GEOM_P0:GEOM_P0 + 8]
            p0y = g[GEOM_P0 + 8:GEOM_P0 + 16]
            p0z = g[GEOM_P0 + 16:GEOM_P0 + 24]
            e1x = g[GEOM_E1:GEOM_E1 + 8]
            e1y = g[GEOM_E1 + 8:GEOM_E1 + 16]
            e1z = g[GEOM_E1 + 16:GEOM_E1 + 24]
            e2x = g[GEOM_E2:GEOM_E2 + 8]
            e2y = g[GEOM_E2 + 8:GEOM_E2 + 16]
            e2z = g[GEOM_E2 + 16:GEOM_E2 + 24]

            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            ok = jnp.abs(det) >= 1e-9
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            sxv = ox - p0x
            syv = oy - p0y
            szv = oz - p0z
            fu = inv_det * (sxv * pvx + syv * pvy + szv * pvz)
            qx = syv * e1z - szv * e1y
            qy = szv * e1x - sxv * e1z
            qz = sxv * e1y - syv * e1x
            fv = inv_det * (dx * qx + dy * qy + dz * qz)
            ft = inv_det * (e2x * qx + e2y * qy + e2z * qz)

            t_cur = row_of(t_ref, s)
            ok &= (fu >= 0.0) & (fu <= 1.0) & (fv >= 0.0) & (fu + fv <= 1.0)
            ok &= (ft >= 0.0) & (ft < t_cur) & (rowi < count)

            key = jnp.where(ok, ft, bigf)
            tmin = jnp.min(key, axis=0, keepdims=True)        # (1, 128)
            improved = tmin < pass_limit
            winrow = jnp.min(jnp.where(ok & (key == tmin), rowi, 8),
                             axis=0, keepdims=True)           # (1, 128)
            sel = rowi == winrow                              # (8, 128)

            fw = 1.0 - fu - fv
            nx_all = (fw * a[ATTR_N0:ATTR_N0 + 8]
                      + fu * a[ATTR_N1:ATTR_N1 + 8]
                      + fv * a[ATTR_N2:ATTR_N2 + 8])
            ny_all = (fw * a[ATTR_N0 + 8:ATTR_N0 + 16]
                      + fu * a[ATTR_N1 + 8:ATTR_N1 + 16]
                      + fv * a[ATTR_N2 + 8:ATTR_N2 + 16])
            nz_all = (fw * a[ATTR_N0 + 16:ATTR_N0 + 24]
                      + fu * a[ATTR_N1 + 16:ATTR_N1 + 24]
                      + fv * a[ATTR_N2 + 16:ATTR_N2 + 24])
            tu_all = (fw * a[ATTR_UV:ATTR_UV + 8]
                      + fu * a[ATTR_UV + 16:ATTR_UV + 24]
                      + fv * a[ATTR_UV + 32:ATTR_UV + 40])
            tv_all = (fw * a[ATTR_UV + 8:ATTR_UV + 16]
                      + fu * a[ATTR_UV + 24:ATTR_UV + 32]
                      + fv * a[ATTR_UV + 40:ATTR_UV + 48])

            def pick(tile):
                return jnp.sum(jnp.where(sel, tile, 0.0), axis=0,
                               keepdims=True)

            merge_row(t_ref, s, jnp.broadcast_to(tmin, (8, 128)), improved)
            face = pick(g[GEOM_FACE:GEOM_FACE + 8]).astype(jnp.int32)
            shp = pick(g[GEOM_SHAPE:GEOM_SHAPE + 8]).astype(jnp.int32)
            face_ref[:] = jnp.where((rowi == s) & improved, face, face_ref[:])
            shp_ref[:] = jnp.where((rowi == s) & improved, shp, shp_ref[:])
            merge_row(nx_ref, s, jnp.broadcast_to(pick(nx_all), (8, 128)),
                      improved)
            merge_row(ny_ref, s, jnp.broadcast_to(pick(ny_all), (8, 128)),
                      improved)
            merge_row(nz_ref, s, jnp.broadcast_to(pick(nz_all), (8, 128)),
                      improved)
            merge_row(tu_ref, s, jnp.broadcast_to(pick(tu_all), (8, 128)),
                      improved)
            merge_row(tv_ref, s, jnp.broadcast_to(pick(tv_all), (8, 128)),
                      improved)

        stack_ref[s, 0] = jnp.int32(0)
        sp_ref[s] = jnp.int32(1)

        def body(_):
            if stats:
                ct_ref[2] = ct_ref[2] + 1
            sp = sp_ref[s]
            sp1 = sp - 1
            v = stack_ref[s, sp1]
            sp_ref[s] = sp1

            @pl.when(v >= 0)
            def _():
                interior(v, sp1)

            @pl.when(v < 0)
            def _():
                leaf(v)

            return sp_ref[s]

        jax.lax.while_loop(lambda t: t > 0, body, jnp.int32(1))
        return carry

    jax.lax.fori_loop(0, SUBPACKETS, traverse, jnp.int32(0))

    if stats:
        vals = jnp.where(lanei == 0, ct_ref[0],
                         jnp.where(lanei == 1, ct_ref[1],
                                   jnp.where(lanei == 2, ct_ref[2], 0)))
        stats_ref[:, :] = jnp.where(rowi == 0, vals, 0)


@functools.partial(jax.jit, static_argnames=('interpret', 'stats'))
def wide_trace_t(nodes, tris_t, origin, direction, t_in,
                 interpret=False, stats=False):
    """Trace rays with the transposed (v4) kernel.

    Same contract as trace_wide.wide_trace: origin/direction (3, N)
    world rays, t_in (N,) reach; returns (t, face, normal (3, N),
    uv (2, N), shape (N,)), face == -1 where nothing closer was found.
    Requires tables from scene/bvh8.py transpose_wide.
    """
    n = origin.shape[1]
    group = 8 * 128
    n_pad = -n % group
    if n_pad:
        # Padded rays sit far outside any scene and can never vote.
        origin = jnp.pad(origin, ((0, 0), (0, n_pad)),
                         constant_values=1.0e7)
        direction = jnp.pad(direction, ((0, 0), (0, n_pad)),
                            constant_values=1.0)
        t_in = jnp.pad(t_in, (0, n_pad))
    total = n + n_pad
    rows = total // 128
    grid = rows // 8

    def ray_block():
        return pl.BlockSpec((8, 128), lambda i: (i, 0),
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
        functools.partial(_kernel, stats=stats),
        out_shape=tuple(out_shapes),
        grid=(grid,),
        in_specs=[table_block(nodes), table_block(tris_t)]
        + [ray_block() for _ in range(7)],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.SMEM((SUBPACKETS, STACK_DEPTH), jnp.int32),
            pltpu.SMEM((SUBPACKETS,), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(nodes, tris_t,
      o[0], o[1], o[2], d[0], d[1], d[2], t_in.reshape(shape2))

    t, face, nx, ny, nz, tu, tv, shp = (x.reshape(total)[:n] for x in out[:8])
    normal = jnp.stack([nx, ny, nz], axis=0)
    uv = jnp.stack([tu, tv], axis=0)
    if stats:
        return t, face, normal, uv, shp, out[8][::8, :3]
    return t, face, normal, uv, shp
