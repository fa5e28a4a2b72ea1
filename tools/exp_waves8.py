"""Fused-boundary decomposition of the waves=2 e2e regression.

exp_waves7 timed the sort/kernel PIECES standalone: per-ray they all
get CHEAPER at waves=2 (kernel 52.6 -> 40.3 ns/ray), yet the fused
round is 96 ns/ray vs 81 at waves=1 (exp_waves_e2e: 10.4 vs 12.34
Mrays/s). Standalone stage timings mislead in both directions
(tools/exp_fusedround.py), so this probe splits the FUSED program at
one materialization boundary only:

  A  = jit(trace(..., sort_packets=True, sort_waves=W))
       -- key + per-wave argsorts + fwd permute + kernel + inv
       permute + attribute resolve, all in ONE fused program
  B  = jit(render_rounds(..., rounds=1, sort_each_round=True))
       -- the production fused round
  B - A = scatter + deposit + respawn + RNG, fused

If (B - A) scales ~2x from W=1 to W=2, the scatter side is linear and
the regression lives in A (sort machinery / barrier materialization);
if (B - A) blows up, something elementwise-looking on the scatter side
has a lane-count cliff.

Also times A with sort_waves=1 at W=2 (global sort straight through
the gather cliff) for contrast.

Run alone on the axon TPU.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.ops.intersect import trace
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
REPS = 5


def timed(label, fn, *args):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, 'dtype')]
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, 'dtype')]
        float(jnp.sum(leaves[0].astype(jnp.float32)))
    dt = (time.time() - t0) / REPS * 1e3
    print(f'#   {label:12s} {dt:8.1f} ms', file=sys.stderr, flush=True)
    return round(dt, 1)


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    out = {}
    for waves in (1, 2):
        config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves)
        state = wf.render(packed, config, 24, seed=0, layout=layout)
        float(jnp.sum(state['accum']['count']))
        n = state['origin'].shape[1]
        print(f'# waves={waves} ({n} lanes)', file=sys.stderr, flush=True)
        res = {}

        trace_w = jax.jit(lambda p, o, d: trace(
            p, layout, o, d, sort_packets=True, sort_waves=waves))
        res['A_trace'] = timed('A_trace', trace_w, packed,
                               state['origin'], state['direction'])

        if waves > 1:
            trace_gl = jax.jit(lambda p, o, d: trace(
                p, layout, o, d, sort_packets=True, sort_waves=1))
            res['A_global'] = timed('A_global', trace_gl, packed,
                                    state['origin'], state['direction'])

        round_fn = jax.jit(lambda p, s, t: wf.render_rounds(
            p, layout, config, s, t, rounds=1, sort_each_round=True))
        res['B_round'] = timed('B_round', round_fn, packed, state,
                               jnp.float32(0.05))
        res['scatter_side'] = round(res['B_round'] - res['A_trace'], 1)
        out[f'waves{waves}'] = res
        del state
    print(json.dumps(out))


if __name__ == '__main__':
    main()
