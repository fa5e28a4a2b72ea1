"""v6 two-level packet kernel: resident TLAS over object-space meshes.

The v5 kernel (ops/trace_packet.py) flattens every mesh instance's
triangles to world space at compile time: N instances of one mesh cost
N copies of its geometry against the VMEM table budget, and moving one
instance rebuilds the whole world BVH. This kernel restores the
reference's two-level scheme (TLAS over instances, object-space mesh
BVHs, scene.glsl.inc:468-520) in packet form:

  * The nodes table is [TLAS rows | rebased per-mesh wide-BVH rows].
    TLAS leaves carry INST_BASE+i metas; mesh tables are built ONCE per
    unique mesh in object space and shared by all of its instances.
  * An instance-tag pop splats the instance's object_from_world 3x4
    from a (I, 128) VMEM table, transforms the packet's cached ray
    registers into object space WITHOUT renormalizing the direction
    (so hit t stays world-parameterized and reach culling works across
    instances, the reference's trick at scene.glsl.inc:401-420), and
    pushes the mesh root.
  * Stack discipline makes per-instance registers sound with ONE
    register set per packet: an instance's mesh entries are pushed only
    after its tag pops and are fully drained (LIFO) before any other
    instance tag or TLAS node below them pops again. TLAS interior pops
    always use the WORLD registers; mesh interior/leaf pops always use
    the CURRENT object registers.
  * Leaves are v5's geometry-only multi-row leaves; the winning
    instance index is the only extra kernel output. Vertex attributes
    stay in the cold HBM side table in OBJECT space -- the caller
    rotates normals to world with the per-instance inverse-transpose
    (resolve_inst_attributes).

Cost vs v5 on single-instance scenes: one extra pop class and the
register re-derivation (~250 cycles per packet x instance-entry);
compile.py therefore keeps v5 for scenes where flattening is cheap and
switches to v6 when instancing duplicates geometry (SceneLayout
.packet_mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scene.bvh8 import (
    BIG, GEOM5_STRIDE, LEAF_MAX, LEAF_ROW_LIMIT, NODE_LAYOUT, PERM_LANE)

# Packet shape, swept on-chip on REAL sorted mid-flight rays
# (tools/exp_packet16.py, re-swept after oct_order in
# tools/exp_octorder2.py): rays/packet = PACKET_ROWS * 128. Taller
# packets amortize the fixed per-pop cost (loop skeleton + mask
# crossing + push) over more rays while the node/leaf union per packet
# grows only sublinearly. BOUNCE-only kernel time now knees at 16 rows
# (oct_order tightens t faster, shrinking unions: 8: 130 ms, 16: 113,
# 24: 122, 32: 148) -- but END-TO-END 24 still wins (11.66 vs 10.10
# Mrays/s viking): each production round is ~40% freshly respawned
# coherent camera rays, whose tiny unions favor the taller packet's
# amortization. Shape choices must be validated end-to-end.
PACKET_ROWS = 24
INTERLEAVE = 1
STACK_DEPTH = 128
PASS_LIMIT = 0.5 * BIG
INST_BASE = 1 << 22      # stack entries >= INST_BASE are instance tags
VMEM_TABLE_LIMIT_BYTES = 64 * 1024 * 1024
# Tables beyond the VMEM budget stream their cold rows from HBM with a
# per-pop DMA; beyond this oversubscription the miss rate makes the
# portable path competitive and the kernel declines the scene.
STREAM_LIMIT_FACTOR = 4
# Top-of-stack leaf-miss prefetch (overlaps the miss DMA with the other
# interleaved packet's pop). Module switch so the on-chip A/B tools can
# isolate it; jit treats it as static via the _kernel partial.
PREFETCH_TOS = True
# Octant-ordered traversal (width 8): push children in the precomputed
# per-octant far-first order stamped into node lanes PERM_LANE+o
# (scene/bvh8.py write_octant_perms) instead of the single split-axis
# flip. Measured on-chip (tools/exp_octorder.py, viking hall): +7.2%
# kernel-only on real octant-sorted bounce rays, neutral on coherent
# primaries, hit t identical (face ties 0.02%). Module switch for the
# A/B tools.
OCT_ORDER = True
# Pop-time reach culling: every push stores the child's packet-min
# entry distance in a parallel SMEM stack; a per-packet scalar t_max
# (max current hit t over the packet, refreshed after each leaf pop)
# lets a pop be skipped entirely when its stored entry can no longer
# beat ANY ray's current t (sound: entry_min >= t_max implies
# entry_ray >= t_ray for every ray). Measured NEGATIVE on-chip
# (tools/exp_popcull.py, viking steady-state rays): the aggregate test
# fires on only 0.08% of bounce pops / 2% of primary pops -- almost
# every 3072-ray packet contains a miss ray whose t stays at the
# horizon, pinning t_max, and the far-first octant ordering already
# minimizes staleness -- while the entry staging costs up to +15%
# kernel-only on bounce rays (the (8,1)->(8,128) broadcast-store +
# scalar reads do NOT hide under the vector-bound pop). Kept gated +
# equality-tested, default OFF.
POP_CULL = False
# Sign-preselected slab test: pick each axis's near/far bound column
# ONCE per pop from the packet's shared direction sign (a lane-masked
# roll of the (1, 128) node row) instead of computing both slab
# crossings and reducing with per-lane min/max -- drops 6 (R, 128)
# min/max ops per child (48 per pop). EXACT only for sign-pure packets;
# the octant-major sort makes packets octant-pure except the <= 7
# key-boundary packets per wavefront, so this A/B flag measures the
# upper bound (tools/exp_signsel.py). Production use requires the
# per-packet purity branch (see the experiment before wiring it).
SIGN_SEL = False
# bf16 pair-packed node bounds (tools/exp_quantnodes.py, VERDICT
# round-3 item 3): lane i < 24 of a packed node row holds
# (bf16(lo_i rounded down) << 16) | bf16(hi_i rounded up) as an f32
# bit pattern; the pop decodes the 48-lane f32 bounds row with
# bitcast/shift/roll/select on (1, 128). Conservative rounding keeps
# culls sound and leaf tests stay exact f32, so hits are EXACT and
# only pops can grow. This measures the decode + extra-pop cost with
# the real instruction mix; the byte-side benefit is bounded
# separately by the residency oracle (tools/exp_resid.py).
QUANT = False


def tables_fit_vmem(nodes, tris_g, inst_rows):
    return (nodes.size + tris_g.size
            + inst_rows.size) * 4 <= VMEM_TABLE_LIMIT_BYTES


# Fraction of the streaming residency budget that node rows claim
# before leaf rows get the remainder (A/B knob, tools/exp_resid.py;
# flip + _inst_trace.clear_cache() to re-specialize).
RES_NODES_FRAC = 0.75


def residency_split(nodes_shape, tris_shape, inst_shape):
    # Static (res_nodes, res_tris) rows kept VMEM-resident, or None if
    # the scene is too oversubscribed to stream profitably. Node rows
    # are hotter than leaf geometry rows (every traversal touches the
    # top of the tree; leaves are reached selectively), so nodes claim
    # the budget first; the remainder holds a prefix of the BFS-ordered
    # leaf rows (top-of-tree leaves resident, deep leaves streamed).
    budget_rows = VMEM_TABLE_LIMIT_BYTES // 512 - int(inst_shape[0])
    n_nodes, n_tris = int(nodes_shape[0]), int(tris_shape[0])
    if n_nodes + n_tris <= budget_rows:
        return n_nodes, n_tris
    if (n_nodes + n_tris) > STREAM_LIMIT_FACTOR * budget_rows:
        return None
    res_nodes = min(n_nodes, int(RES_NODES_FRAC * budget_rows))
    res_tris = max(budget_rows - res_nodes, 0)
    return res_nodes, min(res_tris, n_tris)


def _kernel(nodes_hbm, tris_hbm, inst_hbm,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, t_in_ref,
            t_ref, face_ref, fu_ref, fv_ref, inst_ref, *rest,
            interleave, leaf_rows, tlas_rows, res_nodes, res_tris,
            n_nodes, n_tris, prefetch, width=8, leaf_fmt='mt',
            packet_rows=PACKET_ROWS, oct_order=False, pop_cull=False,
            sign_sel=False, quant=False, stats=False):
    meta_lane = NODE_LAYOUT[width]['meta']
    if stats:
        # Stats mode appends a (rows, 128) int32 output: lane 0/1/2/3 of
        # sublane 0 of each packet-group block carry interior pops, leaf
        # pops, loop iterations and instance entries (diag tooling sums
        # them across the grid; tools/diag_inst.py).
        stats_ref = rest[0]
        rest = rest[1:]
    axis_lane = NODE_LAYOUT[width]['axis']
    stream_nodes = res_nodes < n_nodes
    stream_tris = res_tris < n_tris
    streaming = stream_nodes or stream_tris
    if streaming:
        (stack_ref, sp_ref, cur_ref, fwd_ref, meta_scr, ct_ref,
         stack_e_ref, tmax_ref, ent_scr, ents_vmem,
         rox, roy, roz, rdx, rdy, rdz, rix, riy, riz, rpx, rpy, rpz,
         wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz, wpx, wpy, wpz,
         nodes_ref, tris_ref, inst_tab_ref, nrow_scr,
         pref_ref, sems, *rest2) = rest
        # Per-PACKET leaf-miss scratch buffers and DMA-sem arrays: DMA
        # destinations at row offsets >= 2 of a shared scratch (and/or
        # sem indices >= 6 of one array) silently corrupt on real
        # hardware -- packet 1's streamed leaves read garbage while
        # packet 0's work (bisected on-chip, all-bad-lanes-in-half-1
        # histogram). Separate buffers keep every DMA at the proven
        # row-0/1 offsets with a small dedicated sem array each.
        trow_scrs = rest2[:interleave]
        lsems = rest2[interleave:]
    else:
        (stack_ref, sp_ref, cur_ref, fwd_ref, meta_scr, ct_ref,
         stack_e_ref, tmax_ref, ent_scr, ents_vmem,
         rox, roy, roz, rdx, rdy, rdz, rix, riy, riz, rpx, rpy, rpz,
         wox, woy, woz, wdx, wdy, wdz, wix, wiy, wiz, wpx, wpy, wpz,
         nodes_ref, tris_ref, inst_tab_ref, sems) = rest

    @pl.when(pl.program_id(0) == 0)
    def _():
        # Streaming-mode resident refs are padded up to a whole (8, 128)
        # tile (sub-tile VMEM refs fault on real hardware -- bisected
        # with /tmp-style micro repros: a (6,128) table ref crashes the
        # TPU worker, the same copy into a slice of an 8-row ref works),
        # so the partial copies target a slice of the padded ref.
        cp = pltpu.make_async_copy(
            nodes_hbm.at[pl.ds(0, res_nodes)] if stream_nodes else nodes_hbm,
            nodes_ref.at[pl.ds(0, res_nodes)] if stream_nodes else nodes_ref,
            sems.at[0])
        cp.start()
        ct = pltpu.make_async_copy(
            tris_hbm.at[pl.ds(0, res_tris)] if stream_tris else tris_hbm,
            tris_ref.at[pl.ds(0, res_tris)] if stream_tris else tris_ref,
            sems.at[1])
        ct.start()
        ci = pltpu.make_async_copy(inst_hbm, inst_tab_ref, sems.at[2])
        ci.start()
        cp.wait()
        ct.wait()
        ci.wait()

    bigf = jnp.float32(BIG)
    P = interleave
    R = packet_rows   # ray sublane-rows per packet (rays = R * 128)

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-8,
                               jnp.where(d >= 0, 1e-8, -1e-8), d)

    # World-space ray registers live in VMEM scratch like the object
    # registers: keeping them as loop-invariant SSA values was worth
    # another measured speedup to evict (the same register-pressure
    # relief that made v6 beat v5 by 26-37%). Only the per-packet fwd
    # scalars stay in SSA.
    pk = []
    for p in range(P):
        sl = slice(R * p, R * p + R)
        ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
        dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
        ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
        wox[sl, :] = ox
        woy[sl, :] = oy
        woz[sl, :] = oz
        wdx[sl, :] = dx
        wdy[sl, :] = dy
        wdz[sl, :] = dz
        wix[sl, :] = ivx
        wiy[sl, :] = ivy
        wiz[sl, :] = ivz
        wpx[sl, :] = ox * ivx
        wpy[sl, :] = oy * ivy
        wpz[sl, :] = oz * ivz
        fwd = (jnp.sum(dx) >= 0.0, jnp.sum(dy) >= 0.0, jnp.sum(dz) >= 0.0)
        pk.append(dict(sl=sl, fwd=fwd))

    pow2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(
        jnp.int32, (width, 1), 0)

    t_ref[:] = t_in_ref[:]
    face_ref[:] = jnp.full_like(face_ref, -1)
    zeros = jnp.zeros_like(t_in_ref[:])
    fu_ref[:] = zeros
    fv_ref[:] = zeros
    inst_ref[:] = jnp.full_like(inst_ref, -1)
    for p in range(P):
        stack_ref[p, 0] = jnp.int32(0)
        sp_ref[p] = jnp.int32(1)
        cur_ref[p] = jnp.int32(0)
        if pop_cull:
            stack_e_ref[p, 0] = -bigf
            tmax_ref[p] = jnp.max(t_in_ref[pk[p]['sl'], :])
        if stream_tris:
            pref_ref[p] = jnp.int32(-1)
    if stats:
        for c in range(5):
            ct_ref[c] = jnp.int32(0)

    def enter_instance(p, i, sp, tag_entry=None):
        """Splat the instance's object_from_world, refresh the object
        registers, push its mesh root (inheriting the tag's stored
        entry distance when pop culling is on -- the mesh root's reach
        is exactly the TLAS leaf's)."""
        if stats:
            ct_ref[3] = ct_ref[3] + 1
        sl = pk[p]['sl']
        row = inst_tab_ref[pl.ds(i, 1), :]

        def bc(lane):
            # Two explicit stages: lane broadcast then pltpu.repeat to
            # (8, 128). Letting the elementwise consumers broadcast the
            # (1, 128) across sublanes instead fails in Mosaic (HTTP
            # 500 from the compile relay -- the same lowering gap as
            # the fused (1,1)->(8,128) broadcast).
            r = jnp.broadcast_to(row[:, lane:lane + 1], (1, 128))
            return pltpu.repeat(r, R, 0)

        ox, oy, oz = wox[sl, :], woy[sl, :], woz[sl, :]
        dx, dy, dz = wdx[sl, :], wdy[sl, :], wdz[sl, :]
        # Rows of object_from_world: lanes 0..3 / 4..7 / 8..11.
        oox = bc(0) * ox + bc(1) * oy + bc(2) * oz + bc(3)
        ooy = bc(4) * ox + bc(5) * oy + bc(6) * oz + bc(7)
        ooz = bc(8) * ox + bc(9) * oy + bc(10) * oz + bc(11)
        odx = bc(0) * dx + bc(1) * dy + bc(2) * dz
        ody = bc(4) * dx + bc(5) * dy + bc(6) * dz
        odz = bc(8) * dx + bc(9) * dy + bc(10) * dz
        ivx, ivy, ivz = safe_inv(odx), safe_inv(ody), safe_inv(odz)
        rox[sl, :] = oox
        roy[sl, :] = ooy
        roz[sl, :] = ooz
        rdx[sl, :] = odx
        rdy[sl, :] = ody
        rdz[sl, :] = odz
        rix[sl, :] = ivx
        riy[sl, :] = ivy
        riz[sl, :] = ivz
        rpx[sl, :] = oox * ivx
        rpy[sl, :] = ooy * ivy
        rpz[sl, :] = ooz * ivz
        fwd_ref[p, 0] = (jnp.sum(odx) >= 0.0).astype(jnp.int32)
        fwd_ref[p, 1] = (jnp.sum(ody) >= 0.0).astype(jnp.int32)
        fwd_ref[p, 2] = (jnp.sum(odz) >= 0.0).astype(jnp.int32)
        cur_ref[p] = i
        root = inst_tab_ref[i, 12].astype(jnp.int32)

        @pl.when(sp < STACK_DEPTH)
        def _():
            stack_ref[p, sp] = root
            if pop_cull:
                stack_e_ref[p, sp] = tag_entry
        sp_ref[p] = jnp.where(sp < STACK_DEPTH, sp + 1, sp)

    def interior(p, v, sp, world):
        if stats:
            ct_ref[0] = ct_ref[0] + 1
        sl = pk[p]['sl']
        if world:
            inv_x, inv_y, inv_z = wix[sl, :], wiy[sl, :], wiz[sl, :]
            oinv_x, oinv_y, oinv_z = wpx[sl, :], wpy[sl, :], wpz[sl, :]
        else:
            inv_x, inv_y, inv_z = rix[sl, :], riy[sl, :], riz[sl, :]
            oinv_x, oinv_y, oinv_z = rpx[sl, :], rpy[sl, :], rpz[sl, :]
        if stream_nodes:
            # Cold node rows stream from HBM through a 1-row scratch
            # (a blocking ~512 B DMA); hot rows come from the resident
            # prefix. The scalar meta reads below go through the same
            # scratch so both paths share one code shape.
            @pl.when(v < res_nodes)
            def _():
                nrow_scr[pl.ds(0, 1), :] = nodes_ref[pl.ds(v, 1), :]

            @pl.when(v >= res_nodes)
            def _():
                cm = pltpu.make_async_copy(nodes_hbm.at[pl.ds(v, 1)],
                                           nrow_scr.at[pl.ds(0, 1)],
                                           sems.at[3])
                cm.start()
                cm.wait()
            row = nrow_scr[pl.ds(0, 1), :]
        else:
            row = nodes_ref[pl.ds(v, 1), :]

        if quant:
            # Decode bf16 pair-packed bounds (module doc at QUANT):
            # lanes 0..23 carry (bf16 lo << 16 | bf16 hi); rebuild the
            # f32 bounds at lanes 0..47, leave meta/axis/perm lanes
            # untouched.
            u = pltpu.bitcast(row, jnp.int32)
            lo_f = pltpu.bitcast(u & jnp.int32(-65536), jnp.float32)
            hi_f = pltpu.bitcast(jax.lax.shift_left(u, 16), jnp.float32)
            lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            dec = jnp.where(lane_q < 24, lo_f, pltpu.roll(hi_f, 24, 1))
            row = jnp.where(lane_q < 48, dec, row)

        # One pltpu.repeat of the whole row up front, then 48 column
        # broadcasts (8,1)->(8,128): measured 5% fewer cycles/pop than
        # 48x (lane broadcast + repeat) staging (tools/exp_splat.py;
        # jnp.repeat-spelled column broadcasts are 4x SLOWER -- the
        # spelling matters). The fused (1,1)->(8,128) broadcast and
        # implicit sublane broadcast still do not lower at all.
        if sign_sel:
            # Reorder the row's 48 bound lanes so lanes 0..23 hold each
            # axis's NEAR plane and 24..47 its FAR plane for this
            # packet's shared direction sign: per-axis, keep the
            # original lane when the direction is forward (lo is near),
            # else take the lane 24 away (hi). ~4 (1, 128) ops per pop
            # in exchange for dropping the 6 per-child (R, 128) min/max
            # below. Exact only for sign-pure packets.
            if world:
                fj = pk[p]['fwd']
                fx, fy, fz = (fj[0].astype(jnp.int32),
                              fj[1].astype(jnp.int32),
                              fj[2].astype(jnp.int32))
            else:
                fx, fy, fz = fwd_ref[p, 0], fwd_ref[p, 1], fwd_ref[p, 2]
            lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            ax_id = jax.lax.rem(lane_i, 24) // 8
            fwd_lane = jnp.where(ax_id == 0, fx,
                                 jnp.where(ax_id == 1, fy, fz))
            swapped = jnp.where(lane_i < 24,
                                pltpu.roll(row, 104, 1),  # -24 mod 128
                                pltpu.roll(row, 24, 1))
            row_nf = jnp.where((lane_i < 48) & (fwd_lane == 0),
                               swapped, row)
            tile8 = pltpu.repeat(row_nf, R, 0)
        else:
            tile8 = pltpu.repeat(row, R, 0)

        def bc(lane):
            return jnp.broadcast_to(tile8[:, lane:lane + 1], (R, 128))

        t_cur = t_ref[sl, :]
        rows = []
        for ch in range(width):
            if sign_sel:
                txn = bc(ch) * inv_x - oinv_x
                tyn = bc(width + ch) * inv_y - oinv_y
                tzn = bc(2 * width + ch) * inv_z - oinv_z
                txf = bc(3 * width + ch) * inv_x - oinv_x
                tyf = bc(4 * width + ch) * inv_y - oinv_y
                tzf = bc(5 * width + ch) * inv_z - oinv_z
                entry = jnp.maximum(jnp.maximum(txn, tyn), tzn)
                exit_ = jnp.minimum(jnp.minimum(txf, tyf), tzf)
            else:
                tx0 = bc(ch) * inv_x - oinv_x
                ty0 = bc(width + ch) * inv_y - oinv_y
                tz0 = bc(2 * width + ch) * inv_z - oinv_z
                tx1 = bc(3 * width + ch) * inv_x - oinv_x
                ty1 = bc(4 * width + ch) * inv_y - oinv_y
                tz1 = bc(5 * width + ch) * inv_z - oinv_z
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
        mask = jnp.sum(jnp.where(hit, pow2, 0.0)).astype(jnp.int32)

        if pop_cull:
            # Stage the per-child packet-min entries for the scalar
            # push sites: (width,1) vreg -> lane-broadcast VMEM store
            # -> static scalar loads -> SMEM (readable at a traced
            # child index, like meta_scr). One vector store; the rest
            # is scalar-unit work hidden under the vector-bound pop.
            ents_vmem[:, :] = jnp.broadcast_to(ents, (width, 128))
            for c in range(width):
                ent_scr[p, c] = ents_vmem[c, 0]

        if world:
            fwd = pk[p]['fwd']
            fwd = (jnp.asarray(fwd[0]), jnp.asarray(fwd[1]),
                   jnp.asarray(fwd[2]))
        else:
            fwd = (fwd_ref[p, 0] != 0, fwd_ref[p, 1] != 0,
                   fwd_ref[p, 2] != 0)
        if oct_order and width == 8:
            # Full 3-axis front-to-back ordering: the node row carries
            # 8 precomputed far-first push orders (one per direction
            # octant, scene/bvh8.py write_octant_perms); pick the
            # packet's by its dominant-direction octant and push along
            # it. Replaces the single split-axis flip: ordered pops
            # tighten the running t sooner, so more subtrees cull.
            # Mosaic cannot load a VMEM scalar at a traced LANE offset
            # (tools/probe_dynlane.py), so the 8 child metas are staged
            # into an SMEM row (static loads + stores) and read back at
            # the traced child index -- SMEM supports dynamic indices
            # (the stack relies on it). The octant's perm lane is
            # picked by a 7-select tree over the fwd sign scalars.
            src = (lambda lane: nrow_scr[0, lane]) if stream_nodes \
                else (lambda lane: nodes_ref[v, lane])
            for c in range(width):
                meta_scr[p, c] = src(meta_lane + c).astype(jnp.int32)
            pfs = [src(PERM_LANE + o) for o in range(8)]
            # Octant bit set <=> direction NEGATIVE <=> fwd False.
            byz = [jnp.where(fwd[2], pfs[o], pfs[o | 1])
                   for o in (0, 2, 4, 6)]
            byy = [jnp.where(fwd[1], byz[i], byz[i + 1]) for i in (0, 2)]
            perm = jnp.where(fwd[0], byy[0], byy[1]).astype(jnp.int32)
            for i in range(width):
                ch = jax.lax.shift_right_logical(perm, 3 * i) & 7
                take = jax.lax.shift_right_logical(mask, ch) & 1
                m = meta_scr[p, ch]
                ok = (take != 0) & (m != 0) & (sp < STACK_DEPTH)
                if pop_cull:
                    e_c = ent_scr[p, ch]

                @pl.when(ok)
                def _():
                    stack_ref[p, sp] = m
                    if pop_cull:
                        stack_e_ref[p, sp] = e_c

                sp = jnp.where(ok, sp + 1, sp)
            sp_ref[p] = sp
            return
        if stream_nodes:
            ax = nrow_scr[0, axis_lane]
        else:
            ax = nodes_ref[v, axis_lane]
        flip = jnp.where(ax == 0.0, fwd[0],
                         jnp.where(ax == 1.0, fwd[1], fwd[2]))
        for i in range(width):
            c_f, c_r = i, width - 1 - i
            take = jnp.where(flip, (mask >> c_r) & 1, (mask >> c_f) & 1)
            if stream_nodes:
                m = jnp.where(flip, nrow_scr[0, meta_lane + c_r],
                              nrow_scr[0, meta_lane + c_f])
            else:
                m = jnp.where(flip, nodes_ref[v, meta_lane + c_r],
                              nodes_ref[v, meta_lane + c_f])
            ok = (take != 0) & (m != 0.0) & (sp < STACK_DEPTH)
            if pop_cull:
                e_c = jnp.where(flip, ent_scr[p, c_r], ent_scr[p, c_f])

            @pl.when(ok)
            def _():
                stack_ref[p, sp] = m.astype(jnp.int32)
                if pop_cull:
                    stack_e_ref[p, sp] = e_c

            sp = jnp.where(ok, sp + 1, sp)
        sp_ref[p] = sp

    def leaf(p, v):
        if stats:
            ct_ref[1] = ct_ref[1] + 1
        sl = pk[p]['sl']
        ox, oy, oz = rox[sl, :], roy[sl, :], roz[sl, :]
        dx, dy, dz = rdx[sl, :], rdy[sl, :], rdz[sl, :]
        u = -v
        count = jax.lax.div(u, LEAF_ROW_LIMIT)
        leaf_row = jax.lax.rem(u, LEAF_ROW_LIMIT)
        cur = cur_ref[p]

        if stream_tris:
            # Fetch the leaf's rows one DMA each (multi-row dynamic
            # slices are unreliable in Mosaic); the tris table carries
            # leaf_rows-1 trailing pad rows so row leaf_row+r always
            # exists. The common case is that these DMAs were already
            # STARTED by the previous pop's top-of-stack prefetch
            # (pop_one: LIFO guarantees the armed leaf is this pop), so
            # the HBM latency overlapped a full pop of the other
            # interleaved packet; here we only wait. The un-prefetched
            # fallback starts all miss DMAs (each on its own semaphore)
            # before the resident copies, so a multi-miss leaf pays one
            # latency, not leaf_rows of them.
            tsc = trow_scrs[p]
            matched = pref_ref[p] == leaf_row
            for r in range(leaf_rows):
                @pl.when((leaf_row + r >= res_tris) & ~matched)
                def _(r=r):
                    pltpu.make_async_copy(
                        tris_hbm.at[pl.ds(leaf_row + r, 1)],
                        tsc.at[pl.ds(r, 1)], lsems[p].at[r]).start()
            for r in range(leaf_rows):
                @pl.when(leaf_row + r < res_tris)
                def _(r=r):
                    tsc[pl.ds(r, 1), :] = tris_ref[pl.ds(leaf_row + r, 1), :]
            for r in range(leaf_rows):
                @pl.when(leaf_row + r >= res_tris)
                def _(r=r):
                    pltpu.make_async_copy(
                        tris_hbm.at[pl.ds(leaf_row + r, 1)],
                        tsc.at[pl.ds(r, 1)], lsems[p].at[r]).wait()

        def do_row(r):
            if stream_tris:
                row = trow_scrs[p][pl.ds(r, 1), :]
            else:
                row = tris_ref[pl.ds(leaf_row + r, 1), :]

            tile8 = pltpu.repeat(row, R, 0)  # same 2-stage->colbc win

            def bc(lane):
                return jnp.broadcast_to(tile8[:, lane:lane + 1], (R, 128))

            t = t_ref[sl, :]
            face = face_ref[sl, :]
            fu_best = fu_ref[sl, :]
            fv_best = fv_ref[sl, :]
            inst = inst_ref[sl, :]

            for k in range(8):
                b = GEOM5_STRIDE * k
                if leaf_fmt == 'woop':
                    # Unit-triangle transform (scene/bvh8.py LEAF_FMT):
                    # lanes b..b+8 = M row-major, b+9..b+11 = c = -M p0.
                    # Padded/degenerate slots are all-zero: dpz == 0
                    # makes ft a NaN/inf whose ordered comparisons all
                    # fail, so no count test per triangle (rows past
                    # the first stay predicated on count).
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
                    # Plane + precomputed barycentric gradients
                    # (scene/bvh8.py _bary_rows): lanes b..b+2 hold
                    # n = e1 x e2, b+3 d0 = n.p0, b+4..b+7 gu | cu,
                    # b+8..b+11 gv | cv with fu = gu.h + cu at the hit
                    # point h = o + ft d. ~22% fewer vector issues than
                    # Moller-Trumbore and only ~5 simultaneously-live
                    # column broadcasts (woop's 12 live broadcasts were
                    # its downfall). Padded/degenerate slots are
                    # all-zero: ft = 0/0 = NaN fails every ordered
                    # comparison, so no per-slot count test.
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
                inst = jnp.where(ok, cur, inst)

            t_ref[sl, :] = t
            face_ref[sl, :] = face
            fu_ref[sl, :] = fu_best
            fv_ref[sl, :] = fv_best
            inst_ref[sl, :] = inst

        do_row(0)
        for r in range(1, leaf_rows):
            @pl.when(count > 8 * r)
            def _(r=r):
                do_row(r)
        if pop_cull:
            # Refresh the packet's conservative t ceiling; t only
            # tightens at leaf pops, and a stale-high t_max stays
            # sound.
            tmax_ref[p] = jnp.max(t_ref[sl, :])

    def pop_one(p):
        sp = sp_ref[p]

        @pl.when(sp > 0)
        def _():
            sp1 = sp - 1
            v = stack_ref[p, sp1]
            sp_ref[p] = sp1

            if pop_cull:
                # Skip the whole pop when its stored packet-min entry
                # can no longer beat any ray's current t (entry_min >=
                # t_max implies entry_ray >= t_ray for every ray).
                live = stack_e_ref[p, sp1] < tmax_ref[p]
                if stats:
                    ct_ref[4] = ct_ref[4] + jnp.where(live, 0, 1)
            else:
                live = True

            @pl.when((v >= INST_BASE) & live)
            def _():
                tag_e = stack_e_ref[p, sp1] if pop_cull else None
                enter_instance(p, v - INST_BASE, sp1, tag_e)

            @pl.when((v >= 0) & (v < INST_BASE) & live)
            def _():
                if tlas_rows > 0:
                    @pl.when(v < tlas_rows)
                    def _():
                        interior(p, v, sp1, world=True)

                    @pl.when(v >= tlas_rows)
                    def _():
                        interior(p, v, sp1, world=False)
                else:
                    interior(p, v, sp1, world=False)

            @pl.when((v < 0) & live)
            def _():
                leaf(p, v)

        if stream_tris and prefetch:
            # Top-of-stack prefetch: LIFO means whatever is on top NOW
            # is this packet's next pop. If it is a leaf with streamed
            # rows, start their DMAs here so the HBM latency overlaps
            # the other interleaved packet's pop (and this loop's
            # skeleton) instead of stalling the leaf pop. pref_ref
            # records the armed row; the leaf pop waits instead of
            # starting, and every pop re-arms/disarms so no semaphore
            # is ever left in flight (armed => consumed next pop).
            sp2 = sp_ref[p]
            top = stack_ref[p, jnp.maximum(sp2 - 1, 0)]
            armed = (sp2 > 0) & (top < 0)
            # Clamp so the predicated-off DMA never sees a negative
            # dynamic offset (top >= 0 decodes to a negative rem).
            lrow = jnp.maximum(jax.lax.rem(-top, LEAF_ROW_LIMIT), 0)
            pref_ref[p] = jnp.where(armed, lrow, -1)
            for r in range(leaf_rows):
                @pl.when(armed & (lrow + r >= res_tris))
                def _(r=r):
                    pltpu.make_async_copy(
                        tris_hbm.at[pl.ds(lrow + r, 1)],
                        trow_scrs[p].at[pl.ds(r, 1)],
                        lsems[p].at[r]).start()

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
        li = jax.lax.broadcasted_iota(jnp.int32, (P * R, 128), 1)
        ri = jax.lax.broadcasted_iota(jnp.int32, (P * R, 128), 0)
        vals = jnp.where(li == 0, ct_ref[0],
                         jnp.where(li == 1, ct_ref[1],
                                   jnp.where(li == 2, ct_ref[2],
                                             jnp.where(li == 3, ct_ref[3],
                                                       jnp.where(li == 4,
                                                                 ct_ref[4],
                                                                 0)))))
        stats_ref[:, :] = jnp.where(ri == 0, vals, 0)


def inst_trace(nodes, tris_g, inst_rows, origin, direction, t_in,
               tlas_rows, interpret=False, interleave=INTERLEAVE,
               leaf_rows=LEAF_MAX // 8, width=8, leaf_fmt=None,
               packet_rows=PACKET_ROWS, oct_order=None, pop_cull=None,
               sign_sel=None, quant=None, stats=False):
    """Trace world rays against the two-level instanced tables.

    nodes: (W, 128) [TLAS rows | rebased mesh rows] (row 0 = TLAS
    root); tris_g: (R, 128) concatenated object-space geometry rows
    (with LEAF_MAX/8-1 trailing pad rows, scene/compile.py); inst_rows:
    (I, 128) per-instance rows (lanes 0..11 object_from_world 3x4
    row-major, lane 12 mesh root node index); tlas_rows: static count
    of TLAS rows at the head of `nodes`.

    Tables larger than the VMEM budget keep a resident prefix
    (residency_split) and stream cold rows from HBM with per-pop DMAs;
    raises ValueError beyond STREAM_LIMIT_FACTOR oversubscription
    (callers gate on SceneLayout.inst_fit first).

    Returns (t, face, fu, fv, inst): face indexes the concatenated
    attribute side table; inst is the winning instance row (-1 miss).

    None defaults for leaf_fmt/oct_order/pop_cull resolve from the
    module globals HERE, outside the jit: the jitted inner keys its
    cache on the RESOLVED values, so flipping a global (e.g.
    bvh8.LEAF_FMT in an A/B harness) can never reuse a program
    compiled for the other setting (a leaf_fmt=None static key once
    served an 'mt'-compiled kernel to 'bary'-format tables).
    """
    if leaf_fmt is None:
        from ..scene.bvh8 import LEAF_FMT
        leaf_fmt = LEAF_FMT
    if oct_order is None:
        oct_order = OCT_ORDER
    if pop_cull is None:
        pop_cull = POP_CULL
    if sign_sel is None:
        sign_sel = SIGN_SEL
    if quant is None:
        quant = QUANT
    return _inst_trace(nodes, tris_g, inst_rows, origin, direction, t_in,
                       tlas_rows=tlas_rows, interpret=interpret,
                       interleave=interleave, leaf_rows=leaf_rows,
                       width=width, leaf_fmt=leaf_fmt,
                       packet_rows=packet_rows, oct_order=oct_order,
                       pop_cull=pop_cull, sign_sel=sign_sel, quant=quant,
                       stats=stats)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'interleave', 'leaf_rows',
                                    'tlas_rows', 'width', 'leaf_fmt',
                                    'packet_rows', 'oct_order', 'pop_cull',
                                    'sign_sel', 'quant', 'stats'))
def _inst_trace(nodes, tris_g, inst_rows, origin, direction, t_in,
                tlas_rows, interpret, interleave, leaf_rows, width,
                leaf_fmt, packet_rows, oct_order, pop_cull, sign_sel,
                quant, stats):
    split = residency_split(nodes.shape, tris_g.shape, inst_rows.shape)
    if split is None:
        raise ValueError('tables exceed the streamable VMEM budget')
    res_nodes, res_tris = split
    streaming = res_nodes < nodes.shape[0] or res_tris < tris_g.shape[0]
    if (streaming and packet_rows == PACKET_ROWS
            and interleave == INTERLEAVE):
        # Streaming scenes need a SECOND in-flight packet: the
        # top-of-stack leaf-miss prefetch only pays when the other
        # interleaved packet's pop covers the HBM latency. Measured on
        # the 1.62M-tri terrain (real sorted rays): 16x128/il2 1882 ms
        # vs 24x128/il1 2284 vs the old 8x128/il2 2134.
        packet_rows, interleave = 16, 2
    if res_tris < tris_g.shape[0] and leaf_rows > 2:
        # Per-packet leaf-miss DMAs are proven on hardware only at the
        # row-0/1 offsets of their dedicated scratch (offsets >= 2 of a
        # shared buffer corrupted silently); widen only with an on-chip
        # A/B (tools/exp_stream.py).
        raise ValueError('streaming path supports leaf_rows <= 2')
    n = origin.shape[1]
    group = interleave * packet_rows * 128
    n_pad = -n % group
    if n_pad:
        origin = jnp.pad(origin, ((0, 0), (0, n_pad)), constant_values=1.0e7)
        direction = jnp.pad(direction, ((0, 0), (0, n_pad)),
                            constant_values=1.0)
        t_in = jnp.pad(t_in, (0, n_pad))
    total = n + n_pad
    rows = total // 128
    grid = rows // (interleave * packet_rows)

    def ray_block():
        return pl.BlockSpec((interleave * packet_rows, 128),
                            lambda i: (i, 0), memory_space=pltpu.VMEM)

    def table_block():
        return pl.BlockSpec(memory_space=pl.ANY)

    shape2 = (rows, 128)
    o = origin.reshape(3, rows, 128)
    d = direction.reshape(3, rows, 128)

    out_shapes = [jax.ShapeDtypeStruct(shape2, dt) for dt in
                  (jnp.float32, jnp.int32, jnp.float32, jnp.float32,
                   jnp.int32)]
    out_specs = [ray_block() for _ in range(5)]
    if stats:
        out_shapes.append(jax.ShapeDtypeStruct(shape2, jnp.int32))
        out_specs.append(ray_block())
    reg = lambda: pltpu.VMEM((interleave * packet_rows, 128), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, interleave=interleave,
                          leaf_rows=leaf_rows, tlas_rows=tlas_rows,
                          res_nodes=res_nodes, res_tris=res_tris,
                          n_nodes=int(nodes.shape[0]),
                          n_tris=int(tris_g.shape[0]),
                          prefetch=PREFETCH_TOS, width=width,
                          leaf_fmt=leaf_fmt, packet_rows=packet_rows,
                          oct_order=oct_order, pop_cull=pop_cull,
                          sign_sel=sign_sel, quant=quant, stats=stats),
        out_shape=tuple(out_shapes),
        grid=(grid,),
        in_specs=[table_block(), table_block(), table_block()]
        + [ray_block() for _ in range(7)],
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.SMEM((interleave, STACK_DEPTH), jnp.int32),
            pltpu.SMEM((interleave,), jnp.int32),      # sp
            pltpu.SMEM((interleave,), jnp.int32),      # current instance
            pltpu.SMEM((interleave, 3), jnp.int32),    # object fwd flags
            pltpu.SMEM((interleave, 8), jnp.int32),    # oct-order metas
            pltpu.SMEM((5,), jnp.int32),               # stats counters
            # Pop-cull bookkeeping (allocated unconditionally to keep
            # one scratch shape; a few KB of SMEM + one VMEM tile):
            pltpu.SMEM((interleave, STACK_DEPTH), jnp.float32),  # entries
            pltpu.SMEM((interleave,), jnp.float32),    # packet t_max
            pltpu.SMEM((interleave, width), jnp.float32),  # staged ents
            pltpu.VMEM((width, 128), jnp.float32),     # ents staging tile
        ] + [reg() for _ in range(24)] + [
            # Resident tables: full table shape when fully resident;
            # when streaming, the prefix padded up to a whole (8, 128)
            # tile -- sub-tile VMEM refs fault on real hardware.
            pltpu.VMEM((nodes.shape[0] if res_nodes == nodes.shape[0]
                        else -(-res_nodes // 8) * 8, 128), jnp.float32),
            pltpu.VMEM((tris_g.shape[0] if res_tris == tris_g.shape[0]
                        else -(-res_tris // 8) * 8, 128), jnp.float32),
            pltpu.VMEM(inst_rows.shape, jnp.float32),
        ] + ([
            # Miss-row scratch, padded to the (8, 128) f32 tile floor.
            # Leaf-miss buffers and sem arrays are PER PACKET (not rows
            # of one shared scratch): DMAs at row offsets >= 2 of a
            # shared buffer / sem indices >= 6 of one array silently
            # corrupt on real hardware, so each packet gets a dedicated
            # buffer whose DMAs stay at the proven row-0/1 offsets,
            # and the top-of-stack prefetch of one interleaved packet
            # survives the other packet's leaf pop.
            pltpu.VMEM((8, 128), jnp.float32),         # node miss row
            pltpu.SMEM((interleave,), jnp.int32),      # prefetched row
            pltpu.SemaphoreType.DMA((4,)),  # 0..2 table loads, 3 node miss
        ] + [pltpu.VMEM((8, 128), jnp.float32)         # leaf miss rows
             for _ in range(interleave)]
          + [pltpu.SemaphoreType.DMA((leaf_rows,))     # leaf-miss sems
             for _ in range(interleave)]
            if (res_nodes < nodes.shape[0] or res_tris < tris_g.shape[0])
            else [pltpu.SemaphoreType.DMA((3,))]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(100 * 1024 * 1024,
                                 VMEM_TABLE_LIMIT_BYTES
                                 + 16 * 1024 * 1024)),
        interpret=interpret,
    )(nodes, tris_g, inst_rows,
      o[0], o[1], o[2], d[0], d[1], d[2], t_in.reshape(shape2))

    t, face, fu, fv, inst = (x.reshape(total)[:n] for x in out[:5])
    if stats:
        # Per packet-group counters live at sublane 0, lanes 0..3 of
        # each block. stats=True sums them across the grid (diag
        # tooling); stats='lanes' broadcasts each packet's counters to
        # its lanes instead -- (N, 5) int32 -- which IS the per-ray
        # traversal cost on this architecture (every lane of a packet
        # rides every pop), feeding the preview complexity heatmaps
        # (viewer/preview.py; reference counts per-thread node visits,
        # preview_render.glsl:154-163).
        st = out[5].reshape(grid, interleave * packet_rows, 128)
        counters = st[:, 0, :5]
        if stats == 'lanes':
            per_lane = jnp.repeat(counters, interleave * packet_rows * 128,
                                  axis=0, total_repeat_length=total)[:n]
            return t, face, fu, fv, inst, per_lane
        return t, face, fu, fv, inst, jnp.sum(counters, axis=0)
    return t, face, fu, fv, inst


def resolve_inst_attributes(attrs, inst_aux, face, fu, fv, inst,
                            n_instances=None):
    """Object-space attribute lerp + world rotation for the winners.

    attrs: (slots, 16) object-space side table; inst_aux: (I, 16) rows
    [inverse-world 3x3 row-major (9), shape index (1), pad]; face/inst:
    winners from inst_trace. Normals rotate to world by the row-vector
    inverse-world product (n_w = n_o @ W^-1[:3,:3], the inverse-
    transpose action; gather_world_tris uses the same form). Returns
    (normal (3, N) unnormalized world, uv (2, N), shape (N,) int32).

    n_instances (static): when 1, the per-lane inst_aux row-gather
    (~23 ms at 2M lanes -- gathers pay per index) collapses to a
    broadcast of the single row.
    """
    ok = face >= 0
    safe = jnp.where(ok, face, 0)
    rows = jnp.take(attrs, safe, axis=0).T          # (16, N)
    fw = 1.0 - fu - fv
    n_obj = fw * rows[0:3] + fu * rows[3:6] + fv * rows[6:9]
    uv = fw * rows[9:11] + fu * rows[11:13] + fv * rows[13:15]
    if n_instances == 1:
        irows = inst_aux[0][:, None]                # (16, 1) broadcast
    else:
        isafe = jnp.where(ok, inst, 0)
        irows = jnp.take(inst_aux, isafe, axis=0).T  # (16, N)
    normal = jnp.stack([
        n_obj[0] * irows[0] + n_obj[1] * irows[3] + n_obj[2] * irows[6],
        n_obj[0] * irows[1] + n_obj[1] * irows[4] + n_obj[2] * irows[7],
        n_obj[0] * irows[2] + n_obj[1] * irows[5] + n_obj[2] * irows[8],
    ])
    shape = jnp.where(ok, irows[9].astype(jnp.int32) * jnp.ones_like(face),
                      -1)
    return (jnp.where(ok, normal, 0.0), jnp.where(ok, uv, 0.0), shape)
