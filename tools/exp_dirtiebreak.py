"""Direction-morton TIE-BREAK bits under the production sort key.

The production key is octant<<15 | origin-morton15 (ops/intersect
.ray_sort_key). Every key variant in exp_sortkeys.py TRADED origin
bits for direction bits (oct12dir, dir6_m12, ...) and lost. This
tests the untested pure refinement: keep the production key exactly
as the high bits and append a 12-bit direction morton as LOW-order
tie-break -- no information is removed, orderings only change WITHIN
a (octant, origin-cell) tie group.

Why it could matter: freshly respawned camera rays all share the
camera's origin cell, so the production key leaves them in lane
(raster) order -- a 3072-ray packet is a 1920 x 1.6 PIXEL STRIP whose
frustum sweeps a long thin wall of geometry. Direction tie-break
turns fresh packets into compact direction blocks (~square pixel
tiles for a pinhole camera). Bounce rays tie within a 1/32-span
origin cell where directions still span everything; the tie-break
tightens those frusta too. Viking fresh rays are already nearly free
(0.0124 pops/ray, exp_classshape.py), so the test scenes are the
ones with fine tessellation under the camera: the streamed terrain
and the multi-mesh scene at 4K (3072 rays = 0.8 raster rows).

Arms per scene (real mid-flight rays, kernel-only, REPS averaged):
  prod        octant<<15 | morton15 (production)
  dirtb       (production key) << 12 | dirmorton12
  fresh-prod / fresh-dirtb   the fresh-ray subset alone

RESULT (2026-08-19, v5e): ADOPTED -- positive on every scene, fresh
pops -32-40% (the raster-strip hypothesis confirmed).

  terrain mixed:  0.3876 -> 0.3526 pops/ray, 445.2 -> 409.7 ms (+8.6%)
    fresh-only:   0.1653 -> 0.0999 pops/ray, 8.87 -> 11.26 Mrays/s
  viking mixed:   0.0775 -> 0.0734, 105.7 -> 100.9 ms (+4.7%)
    fresh-only:   0.0124 -> 0.0074, 36.1 -> 33.4 ms
  multi-mesh 4k:  0.0727 -> 0.0703, 318.0 -> 308.2 ms (+3.2%)
    fresh-only:   0.0077 -> 0.0052, 53.6 -> 44.3 ms (+21%)

End-to-end (cached programs): viking 12.05 -> 12.42 Mrays/s, terrain
4.16 at 24-round chunks. Production: ray_sort_key now appends the
12-bit direction morton (ops/intersect.py); full suite green. Note
vs exp_oracle_key: this does NOT contradict the redistribution
ceiling -- the oracle bounded keys that aim at destination purity;
the tie-break shrinks the packet's swept frustum, which is exactly
the quantity the oracle experiment identified as what matters.

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
from path_tracer_tpu.scene.procedural import (
    make_multi_mesh_scene, make_terrain_scene, make_viking_hall_scene)

BIG = 1.0e7
REPS = 5


def dir_morton12(d):
    q = np.clip(((d + 1.0) * 0.5 * 15.0), 0, 15).astype(np.int64)
    m = np.zeros_like(q[0])
    for b in range(4):
        m = (m
             | (((q[0] >> b) & 1) << (3 * b + 2))
             | (((q[1] >> b) & 1) << (3 * b + 1))
             | (((q[2] >> b) & 1) << (3 * b)))
    return m


def run(label, packed, layout, o, d, key):
    perm = np.argsort(key, kind='stable')
    so, sd = jnp.asarray(o[:, perm]), jnp.asarray(d[:, perm])
    big = jnp.full((o.shape[1],), BIG, jnp.float32)
    args = (packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            so, sd, big)
    st = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows,
                               stats=True)
    counters = np.asarray(st[5])
    out = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows)
    float(jnp.sum(out[0]))
    t0 = time.time()
    for _ in range(REPS):
        out = trace_inst.inst_trace(*args, tlas_rows=layout.tlas_rows)
        float(jnp.sum(out[0]))
    dt = (time.time() - t0) / REPS
    n = o.shape[1]
    pops = (int(counters[0]) + int(counters[1])) / n
    print(f'#   {label:14s} pops/ray {pops:.4f}  {dt * 1e3:7.1f} ms'
          f'  {n / dt / 1e6:6.2f} Mrays/s', flush=True)


def scene_arms(name, scene, width, height, rounds=4):
    packed = compile_scene(scene, aspect_ratio=width / height)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=width, height=height)
    st = wf.render(packed, config, rounds, seed=0, layout=layout)
    o = np.asarray(st['origin'])
    d = np.asarray(st['direction'])
    kp = np.asarray(ray_sort_key(packed, jnp.asarray(o),
                                 jnp.asarray(d))).astype(np.int64)
    kd = (kp << 12) | dir_morton12(d)
    print(f'# {name}: {o.shape[1]} lanes mid-flight', flush=True)
    run('prod', packed, layout, o, d, kp)
    run('dirtb', packed, layout, o, d, kd)

    cam = np.asarray(scene.find_camera_entities()[0].transform.position,
                     np.float32)
    fresh = np.all(np.abs(o - cam[:, None]) < 1e-5, axis=0)
    of, df = o[:, fresh], d[:, fresh]
    pad = (-of.shape[1]) % (24 * 128)
    of = np.concatenate([of, np.repeat(of[:, -1:], pad, 1)], 1)
    df = np.concatenate([df, np.repeat(df[:, -1:], pad, 1)], 1)
    kpf = kp[fresh]
    kdf = kd[fresh]
    kpf = np.concatenate([kpf, np.repeat(kpf[-1:], pad)])
    kdf = np.concatenate([kdf, np.repeat(kdf[-1:], pad)])
    print(f'#   fresh subset: {int(fresh.sum())} lanes', flush=True)
    run('fresh-prod', packed, layout, of, df, kpf)
    run('fresh-dirtb', packed, layout, of, df, kdf)


def main():
    scene_arms('terrain 1080p', make_terrain_scene(side=900), 1920, 1080,
               rounds=6)
    scene_arms('viking 1080p', make_viking_hall_scene(detail=1), 1920, 1080)
    scene_arms('multi-mesh 4k', make_multi_mesh_scene(detail=1), 3840, 2160)


if __name__ == '__main__':
    main()
