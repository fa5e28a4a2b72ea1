"""Per-ray-class kernel shapes (VERDICT round-3 item #6).

Each production round's trace input is a measured ~40/60 mix of
freshly respawned camera rays (coherent, ~32 pops/packet) and sorted
bounce rays (~238 pops/packet); the best packet shape differs (bounce
kernel knees at 16 rows, end-to-end winner is 24 --
tools/exp_octorder2.py). Fresh-vs-bounce is known at respawn time, so
the round could (a) add the class as the top sort-key bit so packets
are class-pure, and/or (b) trace each class through its own-shaped
kernel invocation.

This measures, on a real mid-flight viking-hall state (textured
production scene, 1080p):

  mix24 / mix16      production global sort, one kernel at 24/16 rows
  ck24 / ck16        class-keyed sort (fresh bit above octant), one
                     kernel at 24/16 rows
  split F@24+B@16    two invocations: fresh subset at 24 rows + bounce
                     subset at 16 rows (each padded to a packet
                     multiple by replicating its last ray; throughput
                     counts real rays only)
  split F@24+B@24    control: splitting alone, same shape both

plus pops/ray per arm from the stats counters. Adopt per VERDICT if
>= 10% end-to-end; note the production key already clusters fresh
rays (shared camera-origin morton cell per octant), so class-keying
may be a no-op -- that's a finding either way.

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax.numpy as jnp
import numpy as np

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.ops.intersect import permute_rows, ray_sort_key
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
BIG = 1.0e7
REPS = 5


def kernel_arm(label, packed, layout, o, d, rows, n_real):
    """Time inst_trace at `rows` packet rows; report pops from stats."""
    big = jnp.full((o.shape[1],), BIG, jnp.float32)
    args = (packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            o, d, big)
    st = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows,
                               packet_rows=rows, stats=True)
    counters = np.asarray(st[5])
    out = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows,
                                packet_rows=rows)
    float(jnp.sum(out[0]))
    t0 = time.time()
    for _ in range(REPS):
        out = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows,
                                    packet_rows=rows)
        float(jnp.sum(out[0]))
    dt = (time.time() - t0) / REPS
    n = o.shape[1]
    pops = (int(counters[0]) + int(counters[1])) / n
    print(f'#   {label:16s} rows={rows:2d}  lanes {n:8d} (real {n_real:8d})'
          f'  pops/ray {pops:.4f}  {dt * 1e3:7.1f} ms'
          f'  {n_real / dt / 1e6:6.2f} Mrays/s(real)', flush=True)
    return dt, pops


def pad_to(o, d, group):
    """Pad (3, N) ray arrays to a multiple of `group` lanes by
    replicating the final ray (coherent, cheap padding)."""
    n = o.shape[1]
    pad = (-n) % group
    if pad == 0:
        return o, d
    return (np.concatenate([o, np.repeat(o[:, -1:], pad, 1)], 1),
            np.concatenate([d, np.repeat(d[:, -1:], pad, 1)], 1))


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)

    st = wf.render(packed, config, 4, seed=0, layout=layout)
    o = np.asarray(st['origin'])
    d = np.asarray(st['direction'])
    n = o.shape[1]

    cam = np.asarray(scene.find_camera_entities()[0].transform.position,
                     np.float32)
    fresh = np.all(np.abs(o - cam[:, None]) < 1e-5, axis=0)
    n_f = int(fresh.sum())
    print(f'# lanes {n}  fresh {n_f} ({n_f / n:.1%})  '
          f'bounce {n - n_f}', flush=True)

    key = np.asarray(ray_sort_key(packed, jnp.asarray(o), jnp.asarray(d)))

    def sorted_rays(k):
        perm = np.argsort(k, kind='stable')
        return (jnp.asarray(o[:, perm]), jnp.asarray(d[:, perm]))

    so, sd = sorted_rays(key)
    kernel_arm('mix', packed, layout, so, sd, 24, n)
    kernel_arm('mix', packed, layout, so, sd, 16, n)

    ck = key.astype(np.int64) | (fresh.astype(np.int64) << 20)
    cko, ckd = sorted_rays(ck)
    kernel_arm('classkey', packed, layout, cko, ckd, 24, n)
    kernel_arm('classkey', packed, layout, cko, ckd, 16, n)

    # Split invocations: each class sorted by the production key.
    pf = np.argsort(key[fresh], kind='stable')
    pb = np.argsort(key[~fresh], kind='stable')
    of, df = o[:, fresh][:, pf], d[:, fresh][:, pf]
    ob, db = o[:, ~fresh][:, pb], d[:, ~fresh][:, pb]
    results = {}
    for rows_f in (24,):
        ofp, dfp = pad_to(of, df, rows_f * 128)
        tf, _ = kernel_arm('fresh-only', packed, layout,
                           jnp.asarray(ofp), jnp.asarray(dfp), rows_f, n_f)
        results[('f', rows_f)] = tf
    for rows_b in (16, 24):
        obp, dbp = pad_to(ob, db, rows_b * 128)
        tb, _ = kernel_arm('bounce-only', packed, layout,
                           jnp.asarray(obp), jnp.asarray(dbp), rows_b,
                           n - n_f)
        results[('b', rows_b)] = tb
    for rows_b in (16, 24):
        tot = results[('f', 24)] + results[('b', rows_b)]
        print(f'#   split F@24+B@{rows_b}: {tot * 1e3:7.1f} ms  '
              f'{n / tot / 1e6:6.2f} Mrays/s', flush=True)


if __name__ == '__main__':
    main()
