"""Ablation microbenchmark: what does one interior pop actually cost?

Runs a fixed-length traversal-shaped loop (scalar LCG walks the real
viking node table; the visit schedule is data-INdependent so every
ablation does identical work) and times variants with parts removed:

  full      fetch + outer + 8-child slab test + mask crossing +
            8 predicated SMEM pushes w/ scalar meta loads (v3's pop)
  no_push   crossing result consumed by a scalar accumulator instead
            of the push loop (no VMEM scalar meta loads, no SMEM stores)
  no_cross  vector test accumulated on the VPU; mask derived from the
            scalar LCG (removes the vector->scalar sync)
  no_vec    no outer/slab at all; mask from LCG (scalar skeleton only)
  empty     bare loop + LCG (loop overhead)

cycles/iteration at 940 MHz tells where the ~719 cy/pop goes.
Run alone on the axon TPU.
"""

import json
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

ITERS = 200_000
CLOCK_HZ = 940e6


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from path_tracer_tpu import compile_scene
    from path_tracer_tpu.scene.bvh8 import AXIS_LANE, META_LANE
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    packed = compile_scene(make_viking_hall_scene(detail=1),
                           aspect_ratio=16 / 9)
    nodes = packed.wide_nodes
    w = int(nodes.shape[0])
    print(f'# nodes {nodes.shape}', file=sys.stderr)

    def _outer(row):
        ones = jnp.ones((1, 128), jnp.float32)
        return jax.lax.dot_general(row, ones, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    def make_kernel(variant):
        def kernel(nodes_ref, ox_ref, out_ref, stack_ref, sp_ref):
            pow2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0)
            ox = ox_ref[:]          # (8, 128) fake ray data
            inv = 1.0 / (ox + 2.0)
            oinv = ox * inv
            sp_ref[0] = jnp.int32(0)

            def body(carry):
                i, v, acc, vacc = carry
                # scalar LCG over interior nodes (data-independent walk)
                v2 = jax.lax.rem(v * 1664525 + 1013904223, w)
                v2 = jnp.where(v2 < 0, v2 + w, v2)

                mask = (v2 & 255)
                vacc2 = vacc
                if variant == 'outer_only':
                    o_node = _outer(nodes_ref[pl.ds(v2, 1), :])
                    vacc2 = vacc + jnp.sum(o_node[0:8, 0:1] + o_node[40:48, 0:1],
                                           axis=1, keepdims=True)
                if variant == 'outer64':
                    row = nodes_ref[pl.ds(v2, 1), :][:, :64]
                    ones = jnp.ones((1, 128), jnp.float32)
                    o_node = jax.lax.dot_general(
                        row, ones, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    vacc2 = vacc + jnp.sum(o_node[0:8, 0:1] + o_node[40:48, 0:1],
                                           axis=1, keepdims=True)
                if variant == 'splat48':
                    # Redistribution via 48 static single-lane broadcasts
                    # instead of the K=1 contraction.
                    row = nodes_ref[pl.ds(v2, 1), :]
                    acc_t = vacc
                    ents = None
                    for ch in range(8):
                        def bc(lane):
                            return jnp.broadcast_to(row[:, lane:lane + 1],
                                                    (1, 128))
                        tx0 = bc(ch) * inv[0:1] - oinv[0:1]
                        ty0 = bc(8 + ch) * inv[0:1] - oinv[0:1]
                        tz0 = bc(16 + ch) * inv[0:1] - oinv[0:1]
                        tx1 = bc(24 + ch) * inv[0:1] - oinv[0:1]
                        ty1 = bc(32 + ch) * inv[0:1] - oinv[0:1]
                        tz1 = bc(40 + ch) * inv[0:1] - oinv[0:1]
                        entry = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1))
                        exit_ = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
                        ok = (exit_ >= entry) & (exit_ > 0.0)
                        e = jnp.where(ok, entry, 1e9)
                        ents = e if ents is None else jnp.concatenate(
                            [ents, e], axis=0)
                    vacc2 = vacc + jnp.min(ents, axis=1, keepdims=True)
                if variant == 'v5_leaf':
                    # Single-outer geometry-only leaf: one row, 8 tris at
                    # 16-lane stride (p0, e1, e2, shape), MT only.
                    o_tri = _outer(nodes_ref[pl.ds(v2, 1), :])
                    acc_t = vacc
                    for k in range(8):
                        b = 16 * k
                        p0x = o_tri[b:b + 1]
                        p0y = o_tri[b + 1:b + 2]
                        p0z = o_tri[b + 2:b + 3]
                        e1x = o_tri[b + 3:b + 4]
                        e1y = o_tri[b + 4:b + 5]
                        e1z = o_tri[b + 5:b + 6]
                        e2x = o_tri[b + 6:b + 7]
                        e2y = o_tri[b + 7:b + 8]
                        e2z = o_tri[b + 8:b + 9]
                        dx = dy = dz = inv
                        pvx = dy * e2z - dz * e2y
                        pvy = dz * e2x - dx * e2z
                        pvz = dx * e2y - dy * e2x
                        det = e1x * pvx + e1y * pvy + e1z * pvz
                        ok = jnp.abs(det) >= 1e-9
                        idet = 1.0 / jnp.where(ok, det, 1.0)
                        sx, sy, sz = ox - p0x, ox - p0y, ox - p0z
                        fu = idet * (sx * pvx + sy * pvy + sz * pvz)
                        qx = sy * e1z - sz * e1y
                        qy = sz * e1x - sx * e1z
                        qz = sx * e1y - sy * e1x
                        fv = idet * (dx * qx + dy * qy + dz * qz)
                        ft = idet * (e2x * qx + e2y * qy + e2z * qz)
                        ok &= (fu >= 0) & (fu <= 1) & (fv >= 0) & (fu + fv <= 1)
                        acc_t = acc_t + jnp.sum(
                            jnp.where(ok, ft, 0.0), axis=1, keepdims=True)
                    vacc2 = acc_t
                if variant in ('splat8', 'splat8_dep'):
                    # v5-style interior: splat redistribution + full
                    # (8,128) slab + mask crossing. The _dep variant
                    # feeds the mask back into the next node index, so
                    # the crossing latency serializes the pop chain the
                    # way the real traversal does.
                    from jax.experimental.pallas import tpu as _pltpu
                    row = nodes_ref[pl.ds(v2, 1), :]

                    def bcf(lane):
                        r = jnp.broadcast_to(row[:, lane:lane + 1],
                                             (1, 128))
                        return _pltpu.repeat(r, 8, 0)

                    t_cur = ox + 1e6
                    rows8 = []
                    for ch in range(8):
                        tx0 = bcf(ch) * inv - oinv
                        ty0 = bcf(8 + ch) * inv - oinv
                        tz0 = bcf(16 + ch) * inv - oinv
                        tx1 = bcf(24 + ch) * inv - oinv
                        ty1 = bcf(32 + ch) * inv - oinv
                        tz1 = bcf(40 + ch) * inv - oinv
                        entry = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1))
                        exit_ = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
                        ok = (exit_ >= entry) & (exit_ > 0.0) & (entry < t_cur)
                        rows8.append(jnp.min(jnp.where(ok, entry, 1e9),
                                             axis=0, keepdims=True))
                    ents = jnp.min(jnp.concatenate(rows8, axis=0), axis=1,
                                   keepdims=True)
                    hit8 = ents < 0.5e9
                    mask = jnp.sum(jnp.where(hit8, pow2, 0.0)).astype(jnp.int32)
                    if variant == 'splat8_dep':
                        v2 = jax.lax.rem(v2 + mask, w)
                        v2 = jnp.where(v2 < 0, v2 + w, v2)
                    acc2m = acc + mask
                if variant == 'v3_leaf':
                    # Leaf-shaped pop: two row fetches + 8 Moller-Trumbore
                    # on (8,128) rays + best-hit updates (v3's leaf body,
                    # attr lerp omitted -> lower bound).
                    acc_t = vacc
                    for r in range(2):
                        o_tri = _outer(nodes_ref[pl.ds(v2 + r, 1), :])
                        for k in range(4):
                            b = 25 * k
                            p0x = o_tri[b:b + 1]
                            p0y = o_tri[b + 1:b + 2]
                            p0z = o_tri[b + 2:b + 3]
                            e1x = o_tri[b + 3:b + 4] - p0x
                            e1y = o_tri[b + 4:b + 5] - p0y
                            e1z = o_tri[b + 5:b + 6] - p0z
                            e2x = o_tri[b + 6:b + 7] - p0x
                            e2y = o_tri[b + 7:b + 8] - p0y
                            e2z = o_tri[b + 8:b + 9] - p0z
                            dx = dy = dz = inv
                            pvx = dy * e2z - dz * e2y
                            pvy = dz * e2x - dx * e2z
                            pvz = dx * e2y - dy * e2x
                            det = e1x * pvx + e1y * pvy + e1z * pvz
                            ok = jnp.abs(det) >= 1e-9
                            idet = 1.0 / jnp.where(ok, det, 1.0)
                            sx, sy, sz = ox - p0x, ox - p0y, ox - p0z
                            fu = idet * (sx * pvx + sy * pvy + sz * pvz)
                            qx = sy * e1z - sz * e1y
                            qy = sz * e1x - sx * e1z
                            qz = sx * e1y - sy * e1x
                            fv = idet * (dx * qx + dy * qy + dz * qz)
                            ft = idet * (e2x * qx + e2y * qy + e2z * qz)
                            ok &= (fu >= 0) & (fu <= 1) & (fv >= 0) & (fu + fv <= 1)
                            acc_t = acc_t + jnp.sum(
                                jnp.where(ok, ft, 0.0), axis=1, keepdims=True)[0:8]
                    vacc2 = acc_t
                if variant not in ('no_vec', 'empty', 'outer_only', 'outer64',
                                   'v3_leaf', 'v5_leaf', 'splat48'):
                    o_node = _outer(nodes_ref[pl.ds(v2, 1), :])
                    rows = []
                    for ch in range(8):
                        lo0 = o_node[ch:ch + 1, :]
                        lo1 = o_node[8 + ch:9 + ch, :]
                        lo2 = o_node[16 + ch:17 + ch, :]
                        hi0 = o_node[24 + ch:25 + ch, :]
                        hi1 = o_node[32 + ch:33 + ch, :]
                        hi2 = o_node[40 + ch:41 + ch, :]
                        tx0 = lo0 * inv - oinv
                        tx1 = hi0 * inv - oinv
                        ty0 = lo1 * inv - oinv
                        ty1 = hi1 * inv - oinv
                        tz0 = lo2 * inv - oinv
                        tz1 = hi2 * inv - oinv
                        entry = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1))
                        exit_ = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
                        ok = (exit_ >= entry) & (exit_ > 0.0)
                        rows.append(jnp.min(jnp.where(ok, entry, 1e9),
                                            axis=0, keepdims=True))
                    ents = jnp.min(jnp.concatenate(rows, axis=0), axis=1,
                                   keepdims=True)
                    hit = ents < 0.5e9
                    if variant == 'no_cross':
                        # Consume the test on the VPU; no sync to scalar.
                        vacc2 = vacc + jnp.sum(
                            jnp.where(hit, pow2, 0.0), axis=1, keepdims=True)
                    else:
                        mask = jnp.sum(
                            jnp.where(hit, pow2, 0.0)).astype(jnp.int32)

                acc2 = acc
                if variant in ('splat8', 'splat8_dep'):
                    acc2 = acc + mask
                if variant in ('full',):
                    ax = nodes_ref[v2, AXIS_LANE]
                    flip = ax >= 1.0
                    sp = jnp.int32(0)
                    for i8 in range(8):
                        c_f, c_r = i8, 7 - i8
                        take = jnp.where(flip, (mask >> c_r) & 1,
                                         (mask >> c_f) & 1)
                        m = jnp.where(flip,
                                      nodes_ref[v2, META_LANE + c_r],
                                      nodes_ref[v2, META_LANE + c_f])
                        okp = take != 0

                        @pl.when(okp)
                        def _():
                            stack_ref[sp] = m.astype(jnp.int32)

                        sp = jnp.where(okp, sp + 1, sp)
                    acc2 = acc + sp
                elif variant in ('no_push', 'no_vec'):
                    acc2 = acc + mask
                return (i + 1, v2, acc2, vacc2)

            init = (jnp.int32(0), jnp.int32(1), jnp.int32(0),
                    jnp.zeros((8, 1), jnp.float32))
            i, v, acc, vacc = jax.lax.while_loop(
                lambda c: c[0] < ITERS, body, init)
            li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            out_ref[:, :] = (jnp.where(li == 0, acc + v, 0).astype(jnp.float32)
                             + vacc)
        return kernel

    fake = jnp.zeros((8, 128), jnp.float32)
    results = {}
    for variant in ('splat8', 'splat8_dep', 'v5_leaf', 'full'):
        f = jax.jit(functools.partial(
            pl.pallas_call,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(nodes.shape, lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((96,), jnp.int32),
                            pltpu.SMEM((1,), jnp.int32)],
        )(make_kernel(variant)))
        t0 = time.time()
        r = f(nodes, fake)
        float(jnp.sum(r))
        compile_s = time.time() - t0
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = f(nodes, fake)
            float(jnp.sum(r))
        dt = (time.time() - t0) / reps
        cyc = dt * CLOCK_HZ / ITERS
        results[variant] = round(cyc, 1)
        print(f'# {variant:10s} {dt*1e3:8.1f} ms  {cyc:7.1f} cycles/pop '
              f'(compile {compile_s:.0f}s)', file=sys.stderr)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
