"""End-to-end waves A/B on the textured flagship: does the per-wave
sort + quantile interleave (ops/intersect.permute_rows_waves) carry
the density win through the FULL fused round?

History: the kernel-side density win is established (bounce kernel
18.8 -> 25.7 Mrays/s at D=2, tools/exp_density.py) and at W=2 the
interleave's packet pops MATCH a global sort (0.0718 vs 0.0716/ray,
tools/exp_waves5.py) while every gather operand stays one wave wide,
under the ~64 MB fast-gather cliff (tools/exp_waves3.py). The only
e2e waves number on record (11.3 vs 15.2 Mrays/s, README) predates
permute_rows_waves AND the direction-morton tie-break -- it used the
global sort straight into the cliff. This measures the production
path as it ships: wf.render with RenderConfig.waves in (1, 2), same
chunked timing discipline as bench.py.

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator.wavefront import render
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
TIMED_ROUNDS = 24
CHUNK = 24


def bench_waves(packed, layout, waves, timed_rounds=TIMED_ROUNDS,
                chunk=CHUNK):
    config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves)
    chunk = min(chunk, timed_rounds)
    t0 = time.time()
    # Warm up with one chunk-round call: the timed region below runs
    # chunk-round programs, and the `rounds` static arg is part of the
    # jit cache key, so warming with any OTHER round count leaves the
    # timed program uncompiled and its (possibly minutes-long) compile
    # lands inside the clock -- this exact bug shipped as a round-5
    # advisor "fix" and read 12.4 -> 2.2 Mrays/s as a phantom 5.6x chip
    # regression (artifacts/rounds_probe2: every warmed program runs
    # 167-169 ms/round). The chunk warmup also establishes the
    # steady-state bounce mix (>= ~6 rounds needed).
    state = render(packed, config, chunk, seed=0, layout=layout)
    warm_count = float(jnp.sum(state['accum']['count']))
    print(f'# [waves={waves}] compile+warmup ({chunk} rounds): '
          f'{time.time()-t0:.1f}s', file=sys.stderr)

    t0 = time.time()
    rounds_done = (timed_rounds // chunk) * chunk
    for _ in range(timed_rounds // chunk):
        state = render(packed, config, chunk, layout=layout, state=state)
        jax.block_until_ready(state['accum']['xyz'])
    count = float(jnp.sum(state['accum']['count']))
    elapsed = time.time() - t0

    lanes = waves * WIDTH * HEIGHT
    mrays = lanes * rounds_done / elapsed / 1e6
    samples_s = (count - warm_count) / elapsed
    print(f'# [waves={waves}] {rounds_done} rounds ({lanes} lanes) in '
          f'{elapsed:.2f}s: {mrays:.2f} Mrays/s, '
          f'{samples_s/1e6:.2f} Msamples/s', file=sys.stderr)
    return dict(mrays=round(mrays, 2), samples_per_s=round(samples_s, 0),
                elapsed_s=round(elapsed, 2))


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    out = {}
    for waves in (1, 2):
        out[f'waves{waves}'] = bench_waves(packed, layout, waves)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
