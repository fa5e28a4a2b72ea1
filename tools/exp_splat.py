"""Splat-redistribution ablation: can the 48-value node broadcast get
cheaper than 2 ops/value?

The v6 kernel's interior pop is dominated by redistributing the node
row's 48 AABB lanes to (8, 128) ray tiles: 48 x (single-lane broadcast
(1,1)->(1,128) + pltpu.repeat to (8,128)) = 96 vector ops ~ 350 cy
(tools/exp_pop_cost.py). Variants:

  staged  : the production 2-op staging (baseline)
  colbc   : ONE pltpu.repeat of the row to (8,128), then 48 column
            broadcasts (8,1)->(8,128) -- 49 ops if Mosaic lowers the
            minor-dim broadcast as one vreg op
  colbc_v : like colbc but broadcast_to replaced by jnp.repeat along
            axis 1 (alternative lowering spelling)

Each variant runs the same data-independent LCG node walk with the
full 8-child slab test + mask crossing so the measurement sits in the
real pop context. cycles/pop at 940 MHz. Run alone on the axon TPU.
"""

import functools
import json
import os
import sys
import time

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
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    packed = compile_scene(make_viking_hall_scene(detail=1),
                           aspect_ratio=16 / 9)
    nodes = packed.inst_nodes
    w = int(nodes.shape[0])
    print(f'# nodes {nodes.shape}', file=sys.stderr)

    def make_kernel(variant):
        def kernel(nodes_ref, ox_ref, out_ref):
            pow2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(
                jnp.int32, (8, 1), 0)
            ox = ox_ref[:]
            inv = 1.0 / (ox + 2.0)
            oinv = ox * inv

            def body(carry):
                i, v, acc, vacc = carry
                v2 = jax.lax.rem(v * 1664525 + 1013904223, w)
                v2 = jnp.where(v2 < 0, v2 + w, v2)

                row = nodes_ref[pl.ds(v2, 1), :]
                if variant == 'staged':
                    def bc(lane):
                        r = jnp.broadcast_to(row[:, lane:lane + 1], (1, 128))
                        return pltpu.repeat(r, 8, 0)
                elif variant == 'colbc':
                    tile8 = pltpu.repeat(row, 8, 0)

                    def bc(lane):
                        return jnp.broadcast_to(tile8[:, lane:lane + 1],
                                                (8, 128))
                elif variant == 'colbc_v':
                    tile8 = pltpu.repeat(row, 8, 0)

                    def bc(lane):
                        return pltpu.repeat(tile8[:, lane:lane + 1], 128, 1)

                t_cur = ox + 1e6
                rows = []
                for ch in range(8):
                    tx0 = bc(ch) * inv - oinv
                    ty0 = bc(8 + ch) * inv - oinv
                    tz0 = bc(16 + ch) * inv - oinv
                    tx1 = bc(24 + ch) * inv - oinv
                    ty1 = bc(32 + ch) * inv - oinv
                    tz1 = bc(40 + ch) * inv - oinv
                    entry = jnp.maximum(
                        jnp.maximum(jnp.minimum(tx0, tx1),
                                    jnp.minimum(ty0, ty1)),
                        jnp.minimum(tz0, tz1))
                    exit_ = jnp.minimum(
                        jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
                    ok = (exit_ >= entry) & (exit_ > 0.0) & (entry < t_cur)
                    rows.append(jnp.min(jnp.where(ok, entry, 1e9), axis=0,
                                        keepdims=True))
                ents = jnp.min(jnp.concatenate(rows, axis=0), axis=1,
                               keepdims=True)
                hit8 = ents < 0.5e9
                mask = jnp.sum(jnp.where(hit8, pow2, 0.0)).astype(jnp.int32)
                return i + 1, v2, acc + mask, vacc

            _, _, acc, _ = jax.lax.while_loop(
                lambda c: c[0] < ITERS, body,
                (jnp.int32(0), jnp.int32(1), jnp.int32(0),
                 jnp.zeros((8, 1), jnp.float32)))
            out_ref[0, 0] = acc
        return kernel

    ox = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (8, 128)).astype(np.float32))

    results = {}
    for variant in ('staged', 'colbc', 'colbc_v'):
        try:
            fn = pl.pallas_call(
                make_kernel(variant),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
                grid=(1,),
                in_specs=[pl.BlockSpec(nodes.shape,
                                       lambda i: (0, 0)),
                          pl.BlockSpec((8, 128), lambda i: (0, 0))],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            f = jax.jit(functools.partial(fn))
            r = f(nodes, ox)
            float(jnp.sum(r))  # force (deferred dispatch)
            t0 = time.time()
            for _ in range(3):
                r = f(nodes, ox)
                float(jnp.sum(r))
            dt = (time.time() - t0) / 3
            cyc = dt * CLOCK_HZ / ITERS
            results[variant] = cyc
            print(f'{variant:10s} {dt*1e3:7.1f} ms  {cyc:6.0f} cy/pop',
                  file=sys.stderr)
        except Exception as e:  # lowering gap -> record and move on
            results[variant] = None
            print(f'{variant:10s} FAILED: {str(e)[:200]}', file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
