"""Measure node-pop union vs effective packet size on real bounce rays.

The wide kernel traces 1024-ray packets; its per-pop vector cost is the
same for (1,128) and (8,128) operands, so a transposed kernel working
on 128-ray sub-packets would pay the SAME vector issues per ray per pop
but visit only the sub-packet's smaller node union. Whether that is a
win depends on how the union shrinks: this tool fills each 1024-ray
packet with k real rays (k = 128..1024, contiguous after the octant
sort) and 1024-k far-away no-op rays, then reads the kernel's pop
counters. pops(k)/k vs pops(1024)/1024 is the upper bound on the
transposed kernel's pop-side win.

Run alone on the axon TPU (one python process at a time).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from path_tracer_tpu import SceneLayout, compile_scene
    from path_tracer_tpu.integrator.wavefront import _ray_sort_key
    from path_tracer_tpu.ops.trace_wide import wide_trace
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    t0 = time.time()
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    print(f'# compiled in {time.time()-t0:.1f}s '
          f'nodes={packed.wide_nodes.shape}', file=sys.stderr)

    n = 1 << 20  # 1M bounce rays
    rng = np.random.default_rng(0)
    o = rng.uniform(-4, 4, (3, n)).astype(np.float32)
    o[2] = np.abs(o[2]) * 0.5 + 0.2
    d = rng.normal(size=(3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    key = np.asarray(jax.jit(_ray_sort_key)(
        packed, jnp.asarray(o), jnp.asarray(d)))
    order = np.argsort(key)
    o, d = o[:, order], d[:, order]

    results = {}
    for k in (1024, 512, 256, 128):
        reps = 1024 // k
        # Spread each sorted k-run into its own 1024 packet: real rays
        # first, then far-away rays that can never vote for any node.
        ko = o.reshape(3, -1, k)
        kd = d.reshape(3, -1, k)
        po = np.full((3, ko.shape[1], 1024), 1.0e7, np.float32)
        pd = np.zeros((3, ko.shape[1], 1024), np.float32)
        pd[0] = 1.0  # pointing away from the scene at 1e7
        po[:, :, :k] = ko
        pd[:, :, :k] = kd
        po = po.reshape(3, -1)[:, :n]
        pd = pd.reshape(3, -1)[:, :n]

        t_in = jnp.full((po.shape[1],), 1e30, jnp.float32)
        t0 = time.time()
        out = wide_trace(packed.wide_nodes, packed.wide_tris,
                         jnp.asarray(po), jnp.asarray(pd), t_in, stats=True)
        st = np.asarray(out[5])  # (grid, 3): interior, leaf, iters
        dt = time.time() - t0
        interior = float(st[:, 0].sum())
        leaf = float(st[:, 1].sum())
        packets = st.shape[0]
        real = packets * k // reps if False else n  # all real rays total
        res = dict(k=k, packets=packets,
                   interior_per_packet=round(interior / packets, 1),
                   leaf_per_packet=round(leaf / packets, 1),
                   pops_per_real_ray=round((interior + leaf) * reps
                                           / (packets * k) * (k / 1024) * 1024
                                           / 1024, 4))
        # pops per real ray: total pops happen across `packets` packets,
        # each holding k real rays -> (interior+leaf)/(packets*k).
        res['pops_per_real_ray'] = round((interior + leaf) / (packets * k), 4)
        results[str(k)] = res
        print(f'# k={k:5d}: {res["interior_per_packet"]:8.1f} interior '
              f'+ {res["leaf_per_packet"]:7.1f} leaf pops/packet, '
              f'{res["pops_per_real_ray"]:.3f} pops/ray ({dt:.1f}s)',
              file=sys.stderr)

    base = results['1024']['pops_per_real_ray']
    for k, r in results.items():
        r['vs_1024'] = round(r['pops_per_real_ray'] / base, 3)

    # --- sort microbenchmarks: where do the ~130 ms/round go? ---------
    from path_tracer_tpu.integrator.wavefront import (
        _sort_state, _sort_jit, render, RenderConfig)
    config = RenderConfig(width=1920, height=1080)
    state = render(packed, config, 2, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    key = jax.jit(_ray_sort_key)(packed, state['origin'], state['direction'])

    def timeit(label, fn, reps=6):
        r = fn()
        leaf = jax.tree_util.tree_leaves(r)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(reps):
            r = fn()
            leaf = jax.tree_util.tree_leaves(r)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.time() - t0) / reps
        print(f'#   {label:28s} {dt*1e3:7.1f} ms', file=sys.stderr)
        return round(dt * 1e3, 1)

    sortjit = jax.jit(lambda k: jnp.argsort(k))
    perm = sortjit(key)
    gatherjit = jax.jit(lambda m, p: jnp.take(m.T, p, axis=0).T)
    matrix = jnp.stack([state['origin'][0]] * 32, axis=0)
    sb = {}
    sb['argsort_ms'] = timeit('argsort 2M int32', lambda: sortjit(key))
    sb['gather32_ms'] = timeit('T+rowgather+T 32 rows',
                               lambda: gatherjit(matrix, perm))
    m6 = jnp.stack([state['origin'][0]] * 6, axis=0)
    g6 = jax.jit(lambda m, p: jnp.take(m.T, p, axis=0).T)
    sb['gather6_ms'] = timeit('T+rowgather+T 6 rows', lambda: g6(m6, perm))
    sb['full_sort_ms'] = timeit('full _sort_state',
                                lambda: _sort_jit(packed, state))
    results['sort_micro'] = sb
    print(json.dumps(results))


if __name__ == '__main__':
    main()
