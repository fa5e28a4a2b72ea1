"""On-chip diagnostic for the wide-BVH packet kernel.

Checks (a) hit-set agreement between node modes on real hardware (the
interpret-mode tests cannot catch Mosaic lowering bugs like the bf16
matmul truncation), (b) per-packet pop counts to separate "too many
pops" from "too many cycles per pop", and (c) the effect of
octant-major vs Morton-major ray sorting on both.

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
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    w_nodes, w_tris = packed.wide_nodes, packed.wide_tris
    print(f'# nodes {w_nodes.shape} tris {w_tris.shape}', file=sys.stderr)

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

    def run(tag, oo, dd, mode):
        oo_j, dd_j = jnp.asarray(oo), jnp.asarray(dd)
        out = trace_wide.wide_trace(w_nodes, w_tris, oo_j, dd_j, t_in,
                                    node_mode=mode, stats=True)
        st = np.asarray(out[5])
        hits = int(jnp.sum(out[1] >= 0))
        tsum = float(jnp.sum(jnp.where(out[1] >= 0, out[0], 0.0)))
        # timed reps without stats
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            r = trace_wide.wide_trace(w_nodes, w_tris, oo_j, dd_j, t_in,
                                      node_mode=mode)
            float(jnp.sum(r[0]))
        dt = (time.time() - t0) / reps
        mrays = n / dt / 1e6
        pops = st[:, 0] + st[:, 1]
        results[tag] = dict(
            mrays=round(mrays, 2), hits=hits, tsum=round(tsum, 1),
            interior=int(st[:, 0].sum()), leaf=int(st[:, 1].sum()),
            pops_mean=round(float(pops.mean()), 1),
            pops_max=int(pops.max()),
            cyc_per_pop=round(940e6 * dt / max(pops.sum(), 1), 1),
        )
        print(f'# {tag:28s}: {mrays:7.2f} Mrays/s hits={hits} '
              f'pops mean={pops.mean():.0f} max={pops.max()} '
              f'cyc/pop={results[tag]["cyc_per_pop"]}', file=sys.stderr)

    for name, oo, dd in (('primary', o, d), ('bounce', ob, db)):
        m, oct_ = morton_key(oo, dd)
        order_m = np.argsort((m << 3) | oct_, kind='stable')
        order_o = np.argsort((oct_ << 15) | m, kind='stable')
        for sort_name, order in (('morton', order_m), ('octant', order_o)):
            for mode in ('exact', 'interval'):
                run(f'{mode}_{name}_{sort_name}', oo[:, order], dd[:, order],
                    mode)

    # hit-set agreement between modes (same sorted rays).
    m, oct_ = morton_key(ob, db)
    order = np.argsort((oct_ << 15) | m, kind='stable')
    oo, dd = jnp.asarray(ob[:, order]), jnp.asarray(db[:, order])
    te = trace_wide.wide_trace(w_nodes, w_tris, oo, dd, t_in, node_mode='exact')
    ti = trace_wide.wide_trace(w_nodes, w_tris, oo, dd, t_in,
                               node_mode='interval')
    agree_face = int(jnp.sum(te[1] == ti[1]))
    agree_t = float(jnp.max(jnp.abs(te[0] - ti[0])))
    results['agreement'] = dict(same_face=agree_face, of=n,
                                max_dt=round(agree_t, 6))
    print(f'# mode agreement: {agree_face}/{n} faces, max |dt|={agree_t}',
          file=sys.stderr)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
