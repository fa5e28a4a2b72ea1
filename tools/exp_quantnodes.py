"""Quantized node bounds A/B (VERDICT round-3 item 3): bf16
pair-packed child AABBs, decoded per pop.

The claim to test: uint8/bf16 child AABBs halve node-table bytes
(raising the streaming resident fraction) and shrink the per-pop
broadcast volume. The two benefit axes are bounded by measurements
already in the tree:

  * Byte axis (tools/exp_resid.py, terrain, kernel-only): raising
    resident leaf rows 90k -> 155k -> 188k of 327k (the 112 MB arm is
    a ~1.75:1-compression oracle at the 64 MB budget) moved kernel
    time 454.0 -> 451.0 -> 448.4 ms -- +1.2% total. The top-of-stack
    prefetch already hides the miss DMAs, so ANY compression's byte
    benefit is capped at ~1%.
  * Pop axis (tools/exp_signsel.py): REMOVING 46 vector slab ops/pop
    changed nothing (pops are not slab-arithmetic-bound), while the
    4-op (1, 128) row preprocess it added cost 2.5-3.5%.

This measures the remaining unknowns for real: the decode cost with
the real instruction mix AND the extra pops from conservatively
rounded (looser) boxes. Node rows are packed offline -- lane i < 24
holds (bf16(lo_i rounded toward -inf) << 16) | bf16(hi_i rounded
toward +inf) -- and trace_inst.QUANT decodes per pop with
bitcast/shift/roll/select on (1, 128). Culls stay sound (boxes only
grow), leaf tests stay exact f32, so hit t/face must agree exactly;
only pops and time can move.

Arms (real mid-flight rays, kernel-only):
  viking mixed / bounce-only   resident tables, decode cost dominates
  terrain mixed                streaming, decode + byte axes together

Adopt if the quant arms win anywhere; otherwise QUANT stays False and
the negative is documented with the measured decode cost and pop
inflation (t agreement must print 1.000000 -- the scheme is exact).

RESULT (2026-08-19, v5e): REFUTED everywhere, hits exact.

  viking mixed:  base 104.0 ms 19.94 Mrays/s / 0.0775 pops per ray
                 quant 110.5 ms 18.77 (-5.9%) / 0.0810 (+4.5% pops)
  viking bounce: base 93.3 ms / quant 98.4 (-5.2%), pops +4.6%
  terrain:       base 445.4 ms 4.66 / quant 523.0 3.96 (-14.8%),
                 pops 0.3876 -> 0.4409 (+13.8%)
  t-agree 1.000000 on all three pairs (the conservative scheme is
  exact, as designed).

The decode costs ~2-3% (consistent with exp_signsel's (1, 128)
preprocess pricing) and bf16-loosened boxes inflate pops 4.5%
resident / 13.8% on the finely-tessellated streamed terrain -- where
each extra leaf pop also pays a miss DMA, compounding to -14.8%.
Against this, the byte-axis upside is bounded at +1.2% by the
residency oracle above. Node/leaf quantization is the wrong trade on
this architecture: VMEM residency is not the bottleneck (the prefetch
hides misses), and the pop pays per LANE-OP, not per byte. QUANT
stays False, equality-tested (tests/test_trace_inst.py
test_quant_nodes_equality).

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
    make_terrain_scene, make_viking_hall_scene)

WIDTH, HEIGHT = 1920, 1080
BIG = 1.0e7
REPS = 5


def _bf16_dir(x, up):
    """Bit pattern of the nearest bf16 at-or-beyond x in one direction
    (up=True: toward +inf; else toward -inf), as uint32 with a zero
    low half. Stepping the bit pattern by one bf16 ulp (0x10000) moves
    away from zero for both signs, which is what the non-exact cases
    need when truncation (toward zero) went the wrong way."""
    b = x.view(np.uint32)
    t = b & np.uint32(0xffff0000)
    exact = t == b
    neg = (b & np.uint32(0x80000000)) != 0
    need_step = ~exact & (neg if not up else ~neg)
    return t + need_step.astype(np.uint32) * np.uint32(0x10000)


def pack_quant_nodes(nodes):
    """bf16 pair-packed copy of a node table: lanes 0..23 hold
    (bf16 lo rounded down << 16) | (bf16 hi rounded up), lanes 24..47
    zero, meta/axis/perm lanes unchanged."""
    nodes = np.asarray(nodes, np.float32).copy()
    lo = nodes[:, 0:24].copy()
    hi = nodes[:, 24:48].copy()
    packed = _bf16_dir(lo, up=False) | (_bf16_dir(hi, up=True) >> 16)
    nodes[:, 0:24] = packed.view(np.float32)
    nodes[:, 24:48] = 0.0
    return jnp.asarray(nodes)


def run(label, nodes, packed, layout, o, d, quant, ref=None):
    big = jnp.full((o.shape[1],), BIG, jnp.float32)
    args = (nodes, packed.inst_tris, packed.inst_rows, o, d, big)
    kw = dict(tlas_rows=layout.tlas_rows, quant=quant)
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
                          rtol=1e-6, atol=1e-6).mean()
        agree = f'  t-agree {t_ok:.6f}'
    print(f'#   {label:16s} pops/ray {pops:.4f}  {dt * 1e3:7.1f} ms'
          f'  {n / dt / 1e6:6.2f} Mrays/s{agree}', flush=True)
    return out


def sorted_state(scene, packed, layout, rounds=4):
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    st = wf.render(packed, config, rounds, seed=0, layout=layout)
    o = np.asarray(st['origin'])
    d = np.asarray(st['direction'])
    key = np.asarray(ray_sort_key(packed, jnp.asarray(o), jnp.asarray(d)))
    perm = np.argsort(key, kind='stable')
    return jnp.asarray(o[:, perm]), jnp.asarray(d[:, perm]), o, d, key


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    so, sd, o, d, key = sorted_state(scene, packed, layout)
    qnodes = pack_quant_nodes(packed.inst_nodes)
    cam = np.asarray(scene.find_camera_entities()[0].transform.position,
                     np.float32)
    fresh = np.all(np.abs(o - cam[:, None]) < 1e-5, axis=0)

    print(f'# viking mixed: {o.shape[1]} lanes, '
          f'{packed.inst_nodes.shape[0]} node rows', flush=True)
    base = run('base', packed.inst_nodes, packed, layout, so, sd, False)
    run('quant', qnodes, packed, layout, so, sd, True, base)

    pb = np.argsort(key[~fresh], kind='stable')
    ob = o[:, ~fresh][:, pb]
    db = d[:, ~fresh][:, pb]
    pad = (-ob.shape[1]) % (24 * 128)
    ob = np.concatenate([ob, np.repeat(ob[:, -1:], pad, 1)], 1)
    db = np.concatenate([db, np.repeat(db[:, -1:], pad, 1)], 1)
    job, jdb = jnp.asarray(ob), jnp.asarray(db)
    print(f'# viking bounce-only: {ob.shape[1]} lanes', flush=True)
    base = run('base-b', packed.inst_nodes, packed, layout, job, jdb, False)
    run('quant-b', qnodes, packed, layout, job, jdb, True, base)

    scene = make_terrain_scene(side=900)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    so, sd, o, d, key = sorted_state(scene, packed, layout, rounds=6)
    qnodes = pack_quant_nodes(packed.inst_nodes)
    print(f'# terrain mixed (streaming): {o.shape[1]} lanes, '
          f'{packed.inst_nodes.shape[0]} node rows + '
          f'{packed.inst_tris.shape[0]} leaf rows', flush=True)
    base = run('base-t', packed.inst_nodes, packed, layout, so, sd, False)
    run('quant-t', qnodes, packed, layout, so, sd, True, base)


if __name__ == '__main__':
    main()
