"""Interleave sweep on NON-streaming scenes: can a second in-flight
packet hide the pop's serial scalar section?

Two measured facts motivate this:
  * Removing ~46 vector slab ops/pop (SIGN_SEL) changed kernel time by
    0 to -3% (tools/exp_signsel.py) -- the pop is NOT bound by its
    vector arithmetic. The remaining per-pop cost is the serial scalar
    section: mask reduce -> perm select tree -> 8-iteration scalar push
    loop through SMEM -- none of which overlaps anything at
    interleave=1.
  * On the STREAMING terrain, 16x128/il2 beat 24x128/il1 by 21%
    (trace_inst.py:797-804) -- motivated there by DMA hiding, but the
    same alternation lets packet 0's scalar section issue under
    packet 1's vector slab work.

Interleave was never swept for resident-table scenes (the production
shape is 24x128/il1). Smaller interleaved packets also shrink the
per-packet leaf union (the measured structural floor), changing the
economics of the exp_packet16 row sweep.

Sweeps (il, rows) on real mid-flight textured-viking rays, mixed
sorted state AND the bounce-only subset; prints pops/ray, kernel ms,
Mrays/s, and hit agreement vs the production shape.

RESULT (2026-08-19, v5e, textured viking, 2.07M mid-flight rays):
REFUTED -- interleave is exactly neutral at equal packet size, and
smaller interleaved packets always lose on total pops.

  mixed:  il1r24 103.0 ms / il2r24 103.2 / il2r16 111.9 (+15.6% pops)
          il2r8 139.0 / il4r8 138.2 / il2r12 168.1 / il4r12 168.1
  bounce: il1r24 91.5 ms / il2r24 91.8 / il2r16 101.0 / il2r8 122.4

Conclusions: (a) kernel time is a pure function of (pops, rows) --
il2/il4 at identical rows match il1 within 0.3%, so NOTHING serial in
the pop hides under another packet's vector work (Mosaic does not
software-pipeline across pop_one calls); the streaming il2 win is DMA
hiding only. (b) The per-packet union keeps total pops monotonically
falling with packet size, so taller stays better (consistent with
exp_packet16/exp_octorder2). (c) rows=12 is pathological (168 ms, worse
than rows=8): 12-row registers are 1.5 VMEM tiles and the layout falls
off the fast path -- keep packet_rows a multiple of 8. Production
stays il1 rows=24.

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

SHAPES = [(1, 24), (2, 8), (2, 12), (2, 16), (2, 24), (4, 8), (4, 12)]


def run(label, packed, layout, o, d, il, rows, ref=None):
    big = jnp.full((o.shape[1],), BIG, jnp.float32)
    args = (packed.inst_nodes, packed.inst_tris, packed.inst_rows,
            o, d, big)
    kw = dict(tlas_rows=layout.tlas_rows, interleave=il, packet_rows=rows)
    st = trace_inst.inst_trace(*args, stats=True, **kw)
    counters = np.asarray(st[5])
    out = trace_inst.inst_trace(*args, **kw)
    float(jnp.sum(out[0]))
    t0 = time.time()
    for _ in range(REPS):
        out = trace_inst.inst_trace(*args, **kw)
        float(jnp.sum(out[0]))
    dt = (time.time() - t0) / REPS
    n = o.shape[1]
    pops = (int(counters[0]) + int(counters[1])) / n
    agree = ''
    if ref is not None:
        t_ok = np.isclose(np.asarray(ref[0]), np.asarray(out[0]),
                          rtol=1e-5, atol=1e-4).mean()
        agree = f'  t-agree {t_ok:.6f}'
    print(f'#   {label:14s} il{il} rows={rows:2d}  pops/ray {pops:.4f}'
          f'  {dt * 1e3:7.1f} ms  {n / dt / 1e6:6.2f} Mrays/s{agree}',
          flush=True)
    return out


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
    print(f'# mixed state: {o.shape[1]} lanes', flush=True)
    ref = None
    for il, rows in SHAPES:
        out = run('mixed', packed, layout, so, sd, il, rows, ref)
        if ref is None:
            ref = out

    pb = np.argsort(key[~fresh], kind='stable')
    ob = o[:, ~fresh][:, pb]
    db = d[:, ~fresh][:, pb]
    pad = (-ob.shape[1]) % (4 * 24 * 128)
    ob = np.concatenate([ob, np.repeat(ob[:, -1:], pad, 1)], 1)
    db = np.concatenate([db, np.repeat(db[:, -1:], pad, 1)], 1)
    job, jdb = jnp.asarray(ob), jnp.asarray(db)
    print(f'# bounce-only: {ob.shape[1]} lanes', flush=True)
    ref = None
    for il, rows in SHAPES:
        out = run('bounce', packed, layout, job, jdb, il, rows, ref)
        if ref is None:
            ref = out


if __name__ == '__main__':
    main()
