"""Occluder t-seed pre-pass: does a dense top-K-triangle pass collapse
the packet kernel's leaf unions?

Hypothesis: the per-packet leaf union (~320 of 5448 leaves per
3072-ray packet, README "Next levers") survives because packets enter
the tree with t_in = BIG, so the per-ray `entry < t_cur` cull in the
slab test has nothing to cut until late in the DFS.  Indoor scenes are
mostly big occluders (walls/floor): intersecting every ray against the
K largest-area world triangles is a DENSE, divergence-free XLA pass
(~2M x K Moller-Trumbore, a few ms), and feeding the result back as
t_in (inflated by 1e-5 so the kernel re-finds the winning triangle
with its own arithmetic -- no merge logic, output semantics unchanged)
should let the slab cull kill most of the union.

Measures, on REAL mid-flight viking-hall rays (sorted bounce + sorted
primaries): seed-pass wall time, kernel pops and wall time for
t_in = BIG vs t_in = seed at K in {32, 128, 512}, and the hit-t
equality rate of the seeded vs unseeded kernel.

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
from path_tracer_tpu.ops.intersect import permute_rows, ray_sort_key
from path_tracer_tpu.scene.compile import (
    _ENTITY_TO_SHAPE_TYPE, gather_world_tris)
from path_tracer_tpu.scene.model import ENTITY_TYPE_MESH_INSTANCE
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
BIG = 1.0e7


def top_k_world_tris(scene, k):
    instances = []
    index = 0
    for entity, world in scene.walk_entities_with_transform():
        if entity.type not in _ENTITY_TO_SHAPE_TYPE:
            continue
        if entity.type == ENTITY_TYPE_MESH_INSTANCE and entity.mesh is None:
            continue
        if entity.type == ENTITY_TYPE_MESH_INSTANCE:
            inv = np.linalg.inv(world.astype(np.float64)).astype(np.float32)
            instances.append((index, entity, world, inv))
        index += 1
    pos, _, _, _ = gather_world_tris(instances)
    p0 = pos[:, 0]
    e1 = pos[:, 1] - pos[:, 0]
    e2 = pos[:, 2] - pos[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1)
    order = np.argsort(-area)[:k]
    frac = area[order].sum() / max(area.sum(), 1e-9)
    print(f'# top {k} of {len(area)} tris carry {frac*100:.1f}% of area',
          file=sys.stderr)
    return (jnp.asarray(p0[order]), jnp.asarray(e1[order]),
            jnp.asarray(e2[order]))


import functools


@functools.partial(jax.jit, static_argnames=())
def seed_pass(p0, e1, e2, origin, direction, t0):
    """Min hit t over the seed triangles: chunked MT, (3, N) rays."""
    k = p0.shape[0]
    chunk = 8
    tris = jnp.concatenate([p0, e1, e2], axis=1)       # (K, 9)
    tris = tris.reshape(k // chunk, chunk, 9)

    ox, oy, oz = origin[0], origin[1], origin[2]
    dx, dy, dz = direction[0], direction[1], direction[2]

    def step(t, block):                                 # block: (chunk, 9)
        for i in range(chunk):
            p0x, p0y, p0z, e1x, e1y, e1z, e2x, e2y, e2z = (
                block[i, j] for j in range(9))
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            ok = jnp.abs(det) >= 1e-9
            inv_det = 1.0 / jnp.where(ok, det, 1.0)
            sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
            fu = inv_det * (sx * pvx + sy * pvy + sz * pvz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            fv = inv_det * (dx * qx + dy * qy + dz * qz)
            ft = inv_det * (e2x * qx + e2y * qy + e2z * qz)
            ok &= (fu >= 0.0) & (fv >= 0.0) & (fu + fv <= 1.0) & (ft >= 0.0)
            t = jnp.where(ok & (ft < t), ft, t)
        return t, None

    t, _ = jax.lax.scan(step, t0, tris)
    return t


def run(packed, layout, o, d, t_in, label):
    st = trace_inst.inst_trace(
        packed.inst_nodes, packed.inst_tris, packed.inst_rows,
        o, d, t_in, tlas_rows=layout.tlas_rows, stats=True)
    t = st[0]
    float(jnp.sum(t))
    counters = np.asarray(st[5])
    n = o.shape[1]
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = trace_inst.inst_trace(
            packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            o, d, t_in, tlas_rows=layout.tlas_rows)
        float(jnp.sum(out[0]))
    dt = (time.time() - t0) / reps
    interior, leafp = int(counters[0]), int(counters[1])
    print(f'  {label:22s} interior {interior:8d}  leaf {leafp:8d}  '
          f'{dt*1e3:7.1f} ms  {n/dt/1e6:6.2f} Mrays/s')
    return out[0], out[1]


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)

    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    origin, direction = state['origin'], state['direction']
    n = origin.shape[1]
    big = jnp.full((n,), BIG, jnp.float32)

    seeds = {k: top_k_world_tris(scene, k) for k in (32, 128, 512)}

    for name, (o_raw, d_raw) in (
            ('bounce', (origin, direction)),
            ('primary', (wf.reset(packed, config, seed=1)['origin'],
                         wf.reset(packed, config, seed=1)['direction']))):
        perm = jnp.argsort(ray_sort_key(packed, o_raw, d_raw))
        rows = permute_rows([o_raw[0], o_raw[1], o_raw[2],
                             d_raw[0], d_raw[1], d_raw[2]], perm)
        so = jnp.stack(rows[0:3], axis=0)
        sd = jnp.stack(rows[3:6], axis=0)
        print(f'# viking sorted {name} rays ({n} lanes):')
        t_base, f_base = run(packed, layout, so, sd, big, 't_in=BIG')
        for k, (p0, e1, e2) in seeds.items():
            ts = seed_pass(p0, e1, e2, so, sd, big)
            float(jnp.sum(ts))
            t0 = time.time()
            reps = 5
            for _ in range(reps):
                ts = seed_pass(p0, e1, e2, so, sd, big)
                float(jnp.sum(ts))
            dt_seed = (time.time() - t0) / reps
            covered = float(jnp.mean((ts < BIG).astype(jnp.float32)))
            t_s, f_s = run(packed, layout, so, sd,
                           ts * jnp.float32(1.0 + 1e-5),
                           f'seed K={k}')
            same_t = float(jnp.mean(
                (jnp.abs(t_s - t_base)
                 <= 1e-4 * jnp.maximum(t_base, 1.0)).astype(jnp.float32)))
            same_f = float(jnp.mean((f_s == f_base).astype(jnp.float32)))
            print(f'    seed pass {dt_seed*1e3:6.2f} ms, coverage '
                  f'{covered*100:5.1f}%, t match {same_t*100:6.2f}%, '
                  f'face match {same_f*100:6.2f}%')


if __name__ == '__main__':
    main()
