"""On-chip diagnostic for the wide-BVH packet kernel.

Checks (a) hit agreement between the packet kernel and the portable
XLA traversal on real hardware (interpret-mode tests cannot catch
Mosaic lowering bugs like the bf16 matmul truncation), (b) per-packet
pop counts to separate "too many pops" from "too many cycles per pop",
and (c) the effect of octant-major vs Morton-major ray sorting.

Prints a JSON summary to stdout, commentary to stderr.
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
    from path_tracer_tpu.ops import trace_wide
    from path_tracer_tpu.ops.intersect import trace
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    w_nodes, w_tris = packed.wide_nodes, packed.wide_tris
    print(f'# nodes {w_nodes.shape} tris {w_tris.shape} '
          f'interleave={trace_wide.INTERLEAVE}', file=sys.stderr)

    n = 1920 * 1080
    rng = np.random.default_rng(0)

    o = np.tile(np.array([0.0, -6.5, 2.4], np.float32)[:, None], (1, n))
    px = np.arange(n, dtype=np.int64)
    x = (px % 1920) / 1920.0 - 0.5
    y = (px // 1920) / 1080.0 - 0.5
    d = np.stack([x, np.ones(n, np.float32) * 0.9, y - 0.2]).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)

    ob = rng.uniform(-4, 4, (3, n)).astype(np.float32)
    ob[2] = np.abs(ob[2]) * 0.5 + 0.2
    db = rng.normal(size=(3, n)).astype(np.float32)
    db /= np.linalg.norm(db, axis=0, keepdims=True)

    def morton_key(oo, dd):
        lo = oo.min(axis=1)
        hi = oo.max(axis=1)
        span = np.maximum(hi - lo, 1e-6)
        q = np.clip((oo - lo[:, None]) / span[:, None], 0.0, 1.0)
        cells = (q * 31.0).astype(np.int64)
        m = np.zeros(n, np.int64)
        for b in range(5):
            m |= (((cells[0] >> b) & 1) << (3 * b + 2)) \
                | (((cells[1] >> b) & 1) << (3 * b + 1)) \
                | (((cells[2] >> b) & 1) << (3 * b))
        octant = ((dd[0] < 0).astype(np.int64) << 2) \
            | ((dd[1] < 0).astype(np.int64) << 1) | (dd[2] < 0).astype(np.int64)
        return m, octant

    t_in = jnp.full((n,), 1e5, jnp.float32)
    results = {}

    def run(tag, oo, dd, interleave):
        oo_j, dd_j = jnp.asarray(oo), jnp.asarray(dd)
        out = trace_wide.wide_trace(w_nodes, w_tris, oo_j, dd_j, t_in,
                                    stats=True, interleave=interleave)
        st = np.asarray(out[5])
        hits = int(jnp.sum(out[1] >= 0))
        # Warm the timed (stats-free) program before timing.
        r = trace_wide.wide_trace(w_nodes, w_tris, oo_j, dd_j, t_in,
                                  interleave=interleave)
        float(jnp.sum(r[0]))
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            r = trace_wide.wide_trace(w_nodes, w_tris, oo_j, dd_j, t_in,
                                      interleave=interleave)
            float(jnp.sum(r[0]))
        dt = (time.time() - t0) / reps
        mrays = n / dt / 1e6
        pops = st[:, 0] + st[:, 1]
        iters = st[:, 2]
        results[tag] = dict(
            mrays=round(mrays, 2), hits=hits,
            interior=int(st[:, 0].sum()), leaf=int(st[:, 1].sum()),
            iters=int(iters.sum()),
            cyc_per_pop=round(940e6 * dt / max(pops.sum(), 1), 1),
            cyc_per_iter=round(940e6 * dt / max(iters.sum(), 1), 1),
        )
        print(f'# {tag:24s}: {mrays:7.2f} Mrays/s hits={hits} '
              f'pops={pops.sum()} iters={iters.sum()} '
              f'cyc/pop={results[tag]["cyc_per_pop"]} '
              f'cyc/iter={results[tag]["cyc_per_iter"]}', file=sys.stderr)

    for name, oo, dd in (('primary', o, d), ('bounce', ob, db)):
        m, oct_ = morton_key(oo, dd)
        order_o = np.argsort((oct_ << 15) | m, kind='stable')
        for il in (1, 2, 4, 8):
            run(f'{name}_octant_il{il}', oo[:, order_o], dd[:, order_o], il)

    # Agreement with the portable XLA traversal on a small ray set
    # (the portable path gathers per lane -- slow, so keep it small).
    ns = 16 * 1024
    m, oct_ = morton_key(ob, db)
    order = np.argsort((oct_ << 15) | m, kind='stable')[:ns]
    oo, dd = jnp.asarray(ob[:, order]), jnp.asarray(db[:, order])
    hp = trace(packed, layout, oo, dd, use_packet=True)
    hq = trace(packed, layout, oo, dd, use_packet=False)
    same = int(jnp.sum(hp['shape'] == hq['shape']))
    max_dt = float(jnp.max(jnp.abs(hp['time'] - hq['time'])))
    results['portable_agreement'] = dict(same_shape=same, of=ns,
                                         max_dt=round(max_dt, 6))
    print(f'# packet vs portable: {same}/{ns} shapes, max |dt|={max_dt}',
          file=sys.stderr)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
