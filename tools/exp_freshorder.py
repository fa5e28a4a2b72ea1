"""Fresh-ray ordering headroom: is there more than the direction
tie-break already captured?

Production fresh-ray order after exp_dirtiebreak.py: the 32x8 tile
swizzle (state.py TILE_W/H) sorted stably by a 12-bit direction
morton, whose cells at a typical FOV are ~240x135-pixel regions --
inside a cell the tile-raster strip order persists. The question:
how far from the OPTIMAL fresh packet footprint is that? Arms on the
terrain + multi-mesh-4k fresh subsets (kernel-only, pops + ms):

  prod      production order (tile swizzle + dirtb sort key)
  raster    pure raster order (the round-1 baseline, for scale)
  lanes     tile-swizzle layout order, no sort
  tile128   arithmetic 128x24 packet tiles (one 3072-ray packet = a
            128x24 pixel block; divides 1080p and 4k)
  morton    full pixel-morton order (the footprint oracle: compact
            ~64x48 blocks, needs a host permutation table)

If morton ~= prod there is no headroom and the tie-break closed the
fresh-ray axis; if morton is clearly better, the follow-ups are
either a finer direction key (int64 sort keys) or packet-tile
respawn layout.

RESULT (2026-08-19, v5e): the tie-break already captured the fresh
axis -- no follow-up justified.

  terrain fresh: raster 0.3369 pops/ray (the strip catastrophe),
    lanes (32x8 swizzle) 0.1717, tile128 0.1176, prod (tie-break)
    0.0998 / 85.5 ms, morton oracle 0.0931 / 79.2 ms -- the full
    permutation-table oracle is only +7% over prod on the FRESH
    subset (~2-3% mixed), not worth a (N,) table gather per round.
  multi-mesh 4k fresh: prod 0.0052 BEATS morton 0.0071 -- direction
    blocks align better with the scene than pixel blocks; tile128
    0.0050 is within noise of prod.

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
from path_tracer_tpu.integrator.state import lane_to_pixel
from path_tracer_tpu.ops import trace_inst
from path_tracer_tpu.ops.intersect import ray_sort_key
from path_tracer_tpu.scene.procedural import (
    make_multi_mesh_scene, make_terrain_scene)

BIG = 1.0e7
REPS = 5


def morton2(x, y, bits=11):
    m = np.zeros_like(x, np.int64)
    for b in range(bits):
        m |= (((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))
    return m


def run(label, packed, layout, o, d, order):
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
    print(f'#   {label:10s} pops/ray {pops:.4f}  {dt * 1e3:7.1f} ms'
          f'  {n / dt / 1e6:6.2f} Mrays/s', flush=True)


def scene_arms(name, scene, width, height, rounds):
    packed = compile_scene(scene, aspect_ratio=width / height)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=width, height=height)
    st = wf.render(packed, config, rounds, seed=0, layout=layout)
    o = np.asarray(st['origin'])
    d = np.asarray(st['direction'])
    cam = np.asarray(scene.find_camera_entities()[0].transform.position,
                     np.float32)
    fresh = np.all(np.abs(o - cam[:, None]) < 1e-5, axis=0)
    of, df = o[:, fresh], d[:, fresh]
    lanes = np.asarray(st['lane'])[fresh]
    key = np.asarray(ray_sort_key(packed, jnp.asarray(of),
                                  jnp.asarray(df)))
    px, py = lane_to_pixel(jnp.asarray(lanes), width, height)
    px, py = np.asarray(px).astype(np.int64), np.asarray(py).astype(np.int64)
    print(f'# {name}: {int(fresh.sum())} fresh lanes of {o.shape[1]}',
          flush=True)
    run('prod', packed, layout, of, df, np.argsort(key, kind='stable'))
    run('raster', packed, layout, of, df, np.argsort(py * width + px,
                                                     kind='stable'))
    run('lanes', packed, layout, of, df, np.argsort(lanes, kind='stable'))
    tile = (py // 24) * (width // 128) + px // 128
    within = (py % 24) * 128 + px % 128
    run('tile128', packed, layout, of, df,
        np.argsort(tile * (128 * 24) + within, kind='stable'))
    run('morton', packed, layout, of, df,
        np.argsort(morton2(px, py), kind='stable'))


def main():
    scene_arms('terrain 1080p', make_terrain_scene(side=900),
               1920, 1080, rounds=6)
    scene_arms('multi-mesh 4k', make_multi_mesh_scene(detail=1),
               3840, 2160, rounds=4)


if __name__ == '__main__':
    main()
