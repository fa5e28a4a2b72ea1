"""v5 packet trace kernel: splat redistribution + geometry-only leaves.

Evolution of the v3 wide-BVH kernel (ops/trace_wide.py), driven by the
on-chip pop-cost ablation (tools/exp_pop_cost.py, cycles/pop at
940 MHz):

    loop skeleton            ~150     vector->scalar crossing   ~130
    K=1-contraction outer    ~350     8-child slab test          ~70
    static single-lane splats + slab  ~250 (vs ~420 via outer)
    scalar push loop          ~36

  * Redistribution by STATIC SINGLE-LANE SPLATS: each needed lane of a
    fetched row broadcasts with `broadcast_to(row[:, l:l+1], ...)` --
    measured ~170 cycles cheaper per interior pop than the K=1
    contraction (the matmul carries ~300 cycles of fixed machinery).
  * GEOMETRY-ONLY LEAVES: one 128-lane row holds all 8 leaf triangles
    (16-lane stride: p0 e1 e2; scene/bvh8.py pack_wide_geom), so a
    leaf ROW is ONE fetch and pure Moller-Trumbore; leaves span up to
    LEAF_MAX/8 rows, later rows predicated on the leaf count (a row
    costs far less than a fresh pop's fixed scalar overhead). The
    kernel returns (t, face slot, fu, fv); vertex attributes (normals,
    uvs, shape index) live in a cold HBM side table gathered once per
    trace for the winners (resolve_wide_attributes) instead of being
    redistributed on every leaf pop -- leaves are ~60% of bounce pops
    and previously paid two outers each.
  * Everything else matches v3: 1024-ray packets, exact per-ray slab
    tests with reach culling, one 8-bit mask crossing per interior pop,
    near-first push order flipped by the packet's mean direction sign,
    SMEM stacks. See trace_wide.py for the history of measured design
    facts (packet-interval tests, interleaving, precision).

Interleaving note: a minimal ablation showed a data-dependent pop
chain costs 1121 cy/pop vs 690 with an independent schedule, suggesting
~430 cy of hideable latency -- but round-robining 2 or 4 independent
packets per kernel instance left sorted-bounce time EXACTLY flat
(580 ms at interleave 1/2/4) while fixing a ~2x primary regression the
round-robin structure itself introduced at interleave=1. The real
kernel's instruction window already hides what the ablation exposed;
INTERLEAVE=2 is kept as the neutral default.

Negative result (measured, then retired -- the v4 kernel, in git
history as ops/trace_wide_t.py): 128-ray sub-packets with triangles/
children on the SUBLANE axis, so one (8, 128) op tests 8 children (or
8 leaf triangles) against 128 rays. Vector issues per pop drop ~7x on
interiors, but per-ray pop count grows 2.45x on real sorted bounce
rays and the fixed ~350-cycle pop overhead (scalar crossing + fetch
latency) dominates either way: net slower than v5 on every workload.

Negative result (measured, then reverted): a two-phase variant --
stack holds only interior nodes, leaf children queue in SMEM and drain
in branch-free bursts of 8 -- HALVED the loop iteration count but ran
~4% slower overall (bounce 606 vs 580 ms): leaf pops are not
skeleton-bound, and deferring leaves lagged the per-ray reach enough
to add ~5% more pops. The per-pop floor here is the splat tests plus
the ~130-cycle mask crossing, not loop overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh8 import (
    AXIS_LANE, BIG, GEOM5_STRIDE, LEAF_MAX, LEAF_ROW_LIMIT, META_LANE)

PACKET_ROWS = 8          # packet = 8 x 128 = 1024 rays
INTERLEAVE = 2           # independent packets per kernel instance
STACK_DEPTH = 96
PASS_LIMIT = 0.5 * BIG

# VMEM budget guard: only nodes + geometry rows live in VMEM now (the
# attribute side table stays in HBM), so the same budget covers ~2x the
# triangle count the v3 layout did.
VMEM_TABLE_LIMIT_BYTES = 64 * 1024 * 1024


def tables_fit_vmem(nodes, tris_g):
    return (nodes.size + tris_g.size) * 4 <= VMEM_TABLE_LIMIT_BYTES


def _kernel(nodes_hbm, tris_hbm,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_in_ref,
            t_ref, face_ref, fu_ref, fv_ref, *rest,
            interleave, stats, leaf_rows, leaf_fmt='mt'):
    if stats:
        stats_ref = rest[0]
        rest = rest[1:]
    stack_ref, sp_ref, ct_ref, nodes_ref, tris_ref, sems = rest

    # The tables arrive as HBM refs and are DMA'd into VMEM scratch ONCE
    # (scratch persists across the sequential TPU grid).
    @pl.when(pl.program_id(0) == 0)
    def _():
        cp = pltpu.make_async_copy(nodes_hbm, nodes_ref, sems.at[0])
        cp.start()
        ct = pltpu.make_async_copy(tris_hbm, tris_ref, sems.at[1])
        ct.start()
        cp.wait()
        ct.wait()

    bigf = jnp.float32(BIG)
    P = interleave

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-8,
                               jnp.where(d >= 0, 1e-8, -1e-8), d)

    # Per-packet cached ray registers. The packets are INDEPENDENT;
    # round-robining one pop per packet per loop iteration overlaps one
    # packet's vector->scalar crossing + dependent fetch latency with
    # another packet's vector work (measured: a data-dependent pop chain
    # costs 1121 cy/pop vs 690 for the same pop with an independent
    # schedule -- the ~430-cycle gap is hideable latency).
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

    pow2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    t_ref[:] = t_in_ref[:]
    face_ref[:] = jnp.full_like(face_ref, -1)
    zeros = jnp.zeros_like(t_in_ref[:])
    fu_ref[:] = zeros
    fv_ref[:] = zeros
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
        sl = pk[p]['sl']
        inv_x, inv_y, inv_z = pk[p]['inv']
        oinv_x, oinv_y, oinv_z = pk[p]['oinv']
        row = nodes_ref[pl.ds(v, 1), :]

        def bc(lane):
            # Two explicit stages: (1,1) -> (1,128) lane broadcast, then
            # a pltpu.repeat to (8,128). A plain broadcast_to(... (8,128))
            # canonicalizes into a single both-axes broadcast, which
            # Mosaic does not implement.
            r = jnp.broadcast_to(row[:, lane:lane + 1], (1, 128))
            return pltpu.repeat(r, 8, 0)

        t_cur = t_ref[sl, :]
        rows = []
        for ch in range(8):
            tx0 = bc(ch) * inv_x - oinv_x
            ty0 = bc(8 + ch) * inv_y - oinv_y
            tz0 = bc(16 + ch) * inv_z - oinv_z
            tx1 = bc(24 + ch) * inv_x - oinv_x
            ty1 = bc(32 + ch) * inv_y - oinv_y
            tz1 = bc(40 + ch) * inv_z - oinv_z
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
        hit = ents < PASS_LIMIT
        # The ONE vector->scalar crossing: an 8-bit child hit mask.
        mask = jnp.sum(jnp.where(hit, pow2, 0.0)).astype(jnp.int32)

        # Near-first push order (children pre-sorted along the node's
        # axis; pops are LIFO). Empty slots (meta == 0) are rejected on
        # the scalar unit -- their inverted boxes can geometrically pass
        # the symmetric slab test for negative inv_dir.
        fwd = pk[p]['fwd']
        ax = nodes_ref[v, AXIS_LANE]
        flip = jnp.where(ax == 0.0, fwd[0],
                         jnp.where(ax == 1.0, fwd[1], fwd[2]))
        for i in range(8):
            c_f, c_r = i, 7 - i
            take = jnp.where(flip, (mask >> c_r) & 1, (mask >> c_f) & 1)
            m = jnp.where(flip, nodes_ref[v, META_LANE + c_r],
                          nodes_ref[v, META_LANE + c_f])
            ok = (take != 0) & (m != 0.0) & (sp < STACK_DEPTH)

            @pl.when(ok)
            def _():
                stack_ref[p, sp] = m.astype(jnp.int32)

            sp = jnp.where(ok, sp + 1, sp)
        sp_ref[p] = sp

    def leaf(p, v):
        if stats:
            ct_ref[1] = ct_ref[1] + 1
        sl = pk[p]['sl']
        ox, oy, oz = pk[p]['o']
        dx, dy, dz = pk[p]['d']
        u = -v
        count = jax.lax.div(u, LEAF_ROW_LIMIT)
        leaf_row = jax.lax.rem(u, LEAF_ROW_LIMIT)

        def do_row(r):
            row = tris_ref[pl.ds(leaf_row + r, 1), :]

            def bc(lane):
                q = jnp.broadcast_to(row[:, lane:lane + 1], (1, 128))
                return pltpu.repeat(q, 8, 0)

            t = t_ref[sl, :]
            face = face_ref[sl, :]
            fu_best = fu_ref[sl, :]
            fv_best = fv_ref[sl, :]

            for k in range(8):
                b = GEOM5_STRIDE * k
                if leaf_fmt == 'woop':
                    # Unit-triangle transform rows (scene/bvh8.py
                    # LEAF_FMT); padded slots auto-miss via NaN ordered
                    # comparisons -- see ops/trace_inst.py leaf().
                    opx = bc(b) * ox + bc(b + 1) * oy + bc(b + 2) * oz \
                        + bc(b + 9)
                    opy = bc(b + 3) * ox + bc(b + 4) * oy + bc(b + 5) * oz \
                        + bc(b + 10)
                    opz = bc(b + 6) * ox + bc(b + 7) * oy + bc(b + 8) * oz \
                        + bc(b + 11)
                    dpx = bc(b) * dx + bc(b + 1) * dy + bc(b + 2) * dz
                    dpy = bc(b + 3) * dx + bc(b + 4) * dy + bc(b + 5) * dz
                    dpz = bc(b + 6) * dx + bc(b + 7) * dy + bc(b + 8) * dz
                    ft = -opz / dpz
                    fu = opx + ft * dpx
                    fv = opy + ft * dpy
                    ok = (fu >= 0.0) & (fv >= 0.0) & (fu + fv <= 1.0) \
                        & (ft >= 0.0) & (ft < t)
                elif leaf_fmt == 'bary':
                    # Plane + barycentric-gradient rows (scene/bvh8.py
                    # _bary_rows); padded slots auto-miss via NaN --
                    # see ops/trace_inst.py leaf() for the derivation.
                    nd = bc(b) * dx + bc(b + 1) * dy + bc(b + 2) * dz
                    no = bc(b) * ox + bc(b + 1) * oy + bc(b + 2) * oz
                    ft = (bc(b + 3) - no) / nd
                    hx = ox + ft * dx
                    hy = oy + ft * dy
                    hz = oz + ft * dz
                    fu = bc(b + 4) * hx + bc(b + 5) * hy \
                        + bc(b + 6) * hz + bc(b + 7)
                    fv = bc(b + 8) * hx + bc(b + 9) * hy \
                        + bc(b + 10) * hz + bc(b + 11)
                    ok = (fu >= 0.0) & (fv >= 0.0) & (fu + fv <= 1.0) \
                        & (ft >= 0.0) & (ft < t)
                else:
                    p0x, p0y, p0z = bc(b), bc(b + 1), bc(b + 2)
                    e1x, e1y, e1z = bc(b + 3), bc(b + 4), bc(b + 5)
                    e2x, e2y, e2z = bc(b + 6), bc(b + 7), bc(b + 8)

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
                    ok &= (fu >= 0.0) & (fu <= 1.0) & (fv >= 0.0) \
                        & (fu + fv <= 1.0)
                    ok &= (ft >= 0.0) & (ft < t) & (count > 8 * r + k)

                t = jnp.where(ok, ft, t)
                face = jnp.where(ok, (leaf_row + r) * 8 + k, face)
                fu_best = jnp.where(ok, fu, fu_best)
                fv_best = jnp.where(ok, fv, fv_best)

            t_ref[sl, :] = t
            face_ref[sl, :] = face
            fu_ref[sl, :] = fu_best
            fv_ref[sl, :] = fv_best

        do_row(0)
        # Rows past the first exist only for leaves whose count spills
        # over; predicated so short leaves pay one fetch+test block.
        for r in range(1, leaf_rows):
            @pl.when(count > 8 * r)
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

    def body(_):
        if stats:
            ct_ref[2] = ct_ref[2] + 1
        for p in range(P):
            pop_one(p)
        total = sp_ref[0]
        for p in range(1, P):
            total = total + sp_ref[p]
        return total

    jax.lax.while_loop(lambda t: t > 0, body, jnp.int32(P))
    if stats:

        li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        ri = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        vals = jnp.where(li == 0, ct_ref[0],
                         jnp.where(li == 1, ct_ref[1],
                                   jnp.where(li == 2, ct_ref[2], 0)))
        stats_ref[:, :] = jnp.where(ri == 0, vals, 0)


def wide_trace5(nodes, tris_g, origin, direction, t_in,
                interpret=False, stats=False, interleave=INTERLEAVE,
                leaf_rows=LEAF_MAX // 8, leaf_fmt=None):
    """Trace rays against the flattened world-space wide BVH (v5).

    origin/direction: (3, N) world rays; t_in: (N,) reach. Returns
    (t, face, fu, fv): face is the slot into the attribute side table
    (-1 where nothing closer was hit), (fu, fv) the winning
    barycentrics. Use resolve_wide_attributes for normals/uvs/shape.
    leaf_rows must be >= the max rows any leaf in `tris_g` spans
    (LEAF_MAX/8 for tables from the default build).

    leaf_fmt=None resolves the bvh8.LEAF_FMT global HERE, outside the
    jit, so the cache keys on the resolved format (see
    trace_inst.inst_trace for the stale-program failure this avoids).
    """
    if leaf_fmt is None:
        from ..scene.bvh8 import LEAF_FMT
        leaf_fmt = LEAF_FMT
    return _wide_trace5(nodes, tris_g, origin, direction, t_in,
                        interpret=interpret, stats=stats,
                        interleave=interleave, leaf_rows=leaf_rows,
                        leaf_fmt=leaf_fmt)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'stats', 'interleave',
                                    'leaf_rows', 'leaf_fmt'))
def _wide_trace5(nodes, tris_g, origin, direction, t_in,
                 interpret, stats, interleave, leaf_rows, leaf_fmt):
    n = origin.shape[1]
    group = interleave * PACKET_ROWS * 128
    n_pad = -n % group
    if n_pad:
        # Far-away padding rays can never vote for any node.
        origin = jnp.pad(origin, ((0, 0), (0, n_pad)), constant_values=1.0e7)
        direction = jnp.pad(direction, ((0, 0), (0, n_pad)),
                            constant_values=1.0)
        t_in = jnp.pad(t_in, (0, n_pad))
    total = n + n_pad
    rows = total // 128
    grid = rows // (interleave * PACKET_ROWS)

    def ray_block():
        return pl.BlockSpec((interleave * PACKET_ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def table_block():
        return pl.BlockSpec(memory_space=pl.ANY)

    shape2 = (rows, 128)
    o = origin.reshape(3, rows, 128)
    d = direction.reshape(3, rows, 128)

    out_shapes = [jax.ShapeDtypeStruct(shape2, dt) for dt in
                  (jnp.float32, jnp.int32, jnp.float32, jnp.float32)]
    out_specs = [ray_block() for _ in range(4)]
    if stats:
        out_shapes.append(jax.ShapeDtypeStruct((grid * 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((8, 128), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_kernel, interleave=interleave, stats=stats,
                          leaf_fmt=leaf_fmt,
                          leaf_rows=leaf_rows),
        out_shape=tuple(out_shapes),
        grid=(grid,),
        in_specs=[table_block(), table_block()]
        + [ray_block() for _ in range(7)],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.SMEM((interleave, STACK_DEPTH), jnp.int32),
            pltpu.SMEM((interleave,), jnp.int32),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.VMEM(nodes.shape, jnp.float32),
            pltpu.VMEM(tris_g.shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # The default scoped-VMEM budget is 16 MB; the resident tables
        # need up to VMEM_TABLE_LIMIT_BYTES plus ray blocks + headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nodes, tris_g,
      o[0], o[1], o[2], d[0], d[1], d[2], t_in.reshape(shape2))

    t, face, fu, fv = (x.reshape(total)[:n] for x in out[:4])
    if stats:
        return t, face, fu, fv, out[4][::8, :3]
    return t, face, fu, fv


def resolve_wide_attributes(attrs, face, fu, fv):
    """Barycentric-lerp normals/uvs + shape index for the winning faces.

    attrs: (slots, 16) cold side table; face (N,) slot or -1; fu/fv (N,).
    One row-gather for the whole wavefront replaces the per-leaf-pop
    attribute redistribution the v3 kernel paid (the shape index rides
    the same row -- slot 15 -- so the kernel does not splat it either).
    Returns (normal (3, N) unnormalized, uv (2, N), shape (N,) int32);
    zeros / -1 where face < 0.
    """
    safe = jnp.where(face < 0, 0, face)
    rows = jnp.take(attrs, safe, axis=0).T          # (16, N)
    fw = 1.0 - fu - fv
    normal = fw * rows[0:3] + fu * rows[3:6] + fv * rows[6:9]
    uv = fw * rows[9:11] + fu * rows[11:13] + fv * rows[13:15]
    ok = face >= 0
    shape = jnp.where(ok, rows[15].astype(jnp.int32), -1)
    return jnp.where(ok, normal, 0.0), jnp.where(ok, uv, 0.0), shape
