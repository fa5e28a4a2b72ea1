"""Bounce-key resolution sweep: does a finer sort key (int64) cut
bounce pops?

The production key is int32: octant<<27 | origin-morton15 << 12 |
direction-morton12 (5 origin bits + 4 direction bits per axis).
Bounce rays -- 86% of viking kernel time -- tie at 1/32-of-scene
origin cells, inside which the 4-bit/axis direction morton is the
only order. Finer keys need int64. Sweep origin/direction bit depths
on the bounce-only subsets of viking + terrain (host-sorted,
kernel-only time + pops), then price adoption with an on-chip
argsort int32-vs-int64 timing at production lane counts.

Arms (obits/dbits per axis): prod = o5 d4; o6 d4; o7 d4; o5 d6;
o6 d6; o8 d8 (the fineness oracle).

RESULT (2026-08-19, v5e): FLAT -- the ordering axis is saturated.

  viking bounce:  pops/ray 0.2915 (prod) ... 0.2904 (o8 d8), times
                  103.4-110.7 ms, all within relay noise
  terrain bounce: 0.6403 (prod) ... 0.6322 (o7 d4), 346.6-352.1 ms

Even the 8+8-bit fineness oracle moves pops < 1.3%: at 5 origin
bits/axis the tie groups are already smaller than a packet, so finer
keys only reorder WITHIN packets. The bounce leaf union is inherent
direction divergence among genuinely-nearby rays -- consistent with
exp_oracle_key (destination binning worse) and exp_tseed (not
t-staleness). The sort key is done; production stays int32 o5 d4.
Side fact: argsort int64 costs the same as int32 on-chip (27.9 vs
29.1 ms at 2M, 41.1 vs 41.2 at 8.3M) -- key width is free if ever
needed.

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.scene.procedural import (
    make_terrain_scene, make_viking_hall_scene)

BIG = 1.0e7
REPS = 5
ARMS = [('o5 d4 (prod)', 5, 4), ('o6 d4', 6, 4), ('o7 d4', 7, 4),
        ('o5 d6', 5, 6), ('o6 d6', 6, 6), ('o8 d8', 8, 8)]


def morton3(cells, bits):
    m = np.zeros_like(cells[0], np.int64)
    for b in range(bits):
        m = (m
             | (((cells[0] >> b) & 1) << (3 * b + 2))
             | (((cells[1] >> b) & 1) << (3 * b + 1))
             | (((cells[2] >> b) & 1) << (3 * b)))
    return m


def key_bits(packed, o, d, obits, dbits):
    lo = np.asarray(packed.scene_bounds)[:, 0:1]
    hi = np.asarray(packed.scene_bounds)[:, 1:2]
    span = np.maximum(hi - lo, 1e-6)
    q = np.clip((o - lo) / span, 0.0, 1.0)
    cells = (q * (2 ** obits - 1)).astype(np.int64)
    morton = morton3(cells, obits)
    octant = (((d[0] < 0).astype(np.int64) << 2)
              | ((d[1] < 0).astype(np.int64) << 1)
              | (d[2] < 0).astype(np.int64))
    dq = np.clip((d + 1.0) * 0.5 * (2 ** dbits - 1), 0,
                 2 ** dbits - 1).astype(np.int64)
    dmorton = morton3(dq, dbits)
    return (((octant << (3 * obits)) | morton) << (3 * dbits)) | dmorton


def run(label, packed, layout, o, d, key):
    order = np.argsort(key, kind='stable')
    of, df = o[:, order], d[:, order]
    pad = (-of.shape[1]) % (24 * 128)
    of = np.concatenate([of, np.repeat(of[:, -1:], pad, 1)], 1)
    df = np.concatenate([df, np.repeat(df[:, -1:], pad, 1)], 1)
    so, sd = jnp.asarray(of), jnp.asarray(df)
    big = jnp.full((so.shape[1],), BIG, jnp.float32)
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
    n = so.shape[1]
    pops = (int(counters[0]) + int(counters[1])) / n
    print(f'#   {label:14s} pops/ray {pops:.4f}  {dt * 1e3:7.1f} ms'
          f'  {n / dt / 1e6:6.2f} Mrays/s', flush=True)


def scene_arms(name, scene, rounds):
    packed = compile_scene(scene, aspect_ratio=1920 / 1080)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=1920, height=1080)
    st = wf.render(packed, config, rounds, seed=0, layout=layout)
    o = np.asarray(st['origin'])
    d = np.asarray(st['direction'])
    cam = np.asarray(scene.find_camera_entities()[0].transform.position,
                     np.float32)
    bounce = ~np.all(np.abs(o - cam[:, None]) < 1e-5, axis=0)
    ob, db = o[:, bounce], d[:, bounce]
    print(f'# {name}: {int(bounce.sum())} bounce lanes of {o.shape[1]}',
          flush=True)
    for label, obits, dbits in ARMS:
        run(label, packed, layout, ob, db,
            key_bits(packed, ob, db, obits, dbits))


def main():
    scene_arms('viking 1080p', make_viking_hall_scene(detail=1), rounds=24)
    scene_arms('terrain 1080p', make_terrain_scene(side=900), rounds=6)

    # Adoption price: on-chip argsort of int32 vs int64 keys.
    rng = np.random.default_rng(0)
    for n in (2073600, 8294400):
        k32 = jnp.asarray(rng.integers(0, 2**30, n).astype(np.int32))
        k64 = jnp.asarray(rng.integers(0, 2**60, n).astype(np.int64))
        for label, k in (('int32', k32), ('int64', k64)):
            f = jax.jit(jnp.argsort)
            float(jnp.sum(f(k)))
            t0 = time.time()
            for _ in range(REPS):
                float(jnp.sum(f(k)))
            dt = (time.time() - t0) / REPS * 1e3
            print(f'#   argsort {label} @ {n}: {dt:6.1f} ms', flush=True)


if __name__ == '__main__':
    main()
