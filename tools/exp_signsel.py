"""Sign-preselected slab test (trace_inst.SIGN_SEL): upper-bound A/B.

The interior child test computes both slab crossings per axis and
reduces with per-lane min/max -- 6 (R, 128) ops per child, 48 per pop.
After the octant-major sort, packets are direction-sign-pure except
the <= 7 octant-boundary packets per wavefront, and for a sign-pure
packet the near/far planes are KNOWN per axis: a lane-masked roll of
the (1, 128) node row moves each axis's near bound into the lo lanes
once per pop, and the per-child min/max disappears.

This measures the unsafe everywhere-on variant (wrong only for
sign-mixed packets) on real mid-flight textured-viking rays:

  base / signsel     kernel time + pops, mixed sorted state
  base-b / signsel-b same on the bounce-only subset (the 86%-of-time
                     class, exp_classshape.py)
  agreement          fraction of lanes whose (t, face, inst) match the
                     exact kernel, and how many packets are octant-pure

If the time win is real, production wiring needs the per-packet purity
branch (fast path when pure, exact path otherwise); if the win is
within noise, document the negative and stop.

RESULT (2026-08-19, v5e, textured viking hall, 2.07M mid-flight rays):
REFUTED -- the unsafe upper bound already loses.

  mixed (purity 0.9896):  base 103.8 ms / 19.98 Mrays/s,
                          signsel 106.5 ms / 19.47 (agreement 0.9977)
  bounce (purity 0.9485): base 91.8 ms / 4.55,
                          signsel 95.1 ms / 4.39 (agreement 0.9941)

The removed (R, 128) min/max ops were hidden under the pop's
broadcast/FMA stream; the (1, 128) roll+select reorder is new serial
critical-path work. SIGN_SEL stays False; no purity branch is worth
building on a negative upper bound.

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
from path_tracer_tpu.ops.intersect import ray_sort_key
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
BIG = 1.0e7
REPS = 5


def run(label, packed, layout, o, d, sign_sel):
    big = jnp.full((o.shape[1],), BIG, jnp.float32)
    args = (packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            o, d, big)
    st = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows,
                               sign_sel=sign_sel, stats=True)
    counters = np.asarray(st[5])
    out = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows,
                                sign_sel=sign_sel)
    float(jnp.sum(out[0]))
    t0 = time.time()
    for _ in range(REPS):
        out = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows,
                                    sign_sel=sign_sel)
        float(jnp.sum(out[0]))
    dt = (time.time() - t0) / REPS
    n = o.shape[1]
    pops = (int(counters[0]) + int(counters[1])) / n
    print(f'#   {label:12s} pops/ray {pops:.4f}  {dt * 1e3:7.1f} ms'
          f'  {n / dt / 1e6:6.2f} Mrays/s', flush=True)
    return out


def agreement(a, b):
    t_ok = np.isclose(np.asarray(a[0]), np.asarray(b[0]),
                      rtol=1e-5, atol=1e-4)
    f_ok = np.asarray(a[1]) == np.asarray(b[1])
    return float(t_ok.mean()), float(f_ok.mean())


def octant_purity(d, rows=24):
    oct_ = ((np.asarray(d[0]) < 0).astype(np.int32) * 4
            + (np.asarray(d[1]) < 0) * 2 + (np.asarray(d[2]) < 0))
    n = oct_.shape[0] // (rows * 128) * (rows * 128)
    pk = oct_[:n].reshape(-1, rows * 128)
    return float((pk == pk[:, :1]).all(axis=1).mean())


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)

    st = wf.render(packed, config, 4, seed=0, layout=layout)
    o = np.asarray(st['origin'])
    d = np.asarray(st['direction'])

    cam = np.asarray(scene.find_camera_entities()[0].transform.position,
                     np.float32)
    fresh = np.all(np.abs(o - cam[:, None]) < 1e-5, axis=0)

    key = np.asarray(ray_sort_key(packed, jnp.asarray(o), jnp.asarray(d)))
    perm = np.argsort(key, kind='stable')
    so, sd = jnp.asarray(o[:, perm]), jnp.asarray(d[:, perm])
    print(f'# mixed state: {o.shape[1]} lanes, packet octant purity '
          f'{octant_purity(sd):.4f}', flush=True)

    base = run('base', packed, layout, so, sd, False)
    fast = run('signsel', packed, layout, so, sd, True)
    t_ok, f_ok = agreement(base, fast)
    print(f'#   agreement: t {t_ok:.6f}  face {f_ok:.6f}', flush=True)

    pb = np.argsort(key[~fresh], kind='stable')
    ob = o[:, ~fresh][:, pb]
    db = d[:, ~fresh][:, pb]
    pad = (-ob.shape[1]) % (24 * 128)
    ob = np.concatenate([ob, np.repeat(ob[:, -1:], pad, 1)], 1)
    db = np.concatenate([db, np.repeat(db[:, -1:], pad, 1)], 1)
    job, jdb = jnp.asarray(ob), jnp.asarray(db)
    print(f'# bounce-only: {ob.shape[1]} lanes, packet octant purity '
          f'{octant_purity(jdb):.4f}', flush=True)
    base_b = run('base-b', packed, layout, job, jdb, False)
    fast_b = run('signsel-b', packed, layout, job, jdb, True)
    t_ok, f_ok = agreement(base_b, fast_b)
    print(f'#   agreement: t {t_ok:.6f}  face {f_ok:.6f}', flush=True)


if __name__ == '__main__':
    main()
