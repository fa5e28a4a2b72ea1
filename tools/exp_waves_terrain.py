"""Waves on the STREAMING terrain config: does sample-wave density pay
where the round is kernel-bound?

On viking the W=2 density win (~7% pops through the per-wave
interleave, tools/exp_waves5.py) is consumed by the scatter-side
residue (12.31 vs 11.67 Mrays/s, tools/exp_waves_e2e.py) -- viking's
round is ~50% sort+scatter machinery. Terrain is the opposite shape:
~90% of the round is the streaming trace kernel (454 of ~496 ms at
2.07M lanes, tools/exp_quantnodes.py / BENCH_r04), it is pops-bound
(full-residency oracle 4.62 Mrays/s kernel-only), and denser packets
cut BOTH pops and the HBM leaf-miss rate. If waves ever pays
end-to-end, it pays here.

Same production path + chunked timing discipline as exp_waves_e2e.
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
from path_tracer_tpu.scene.procedural import make_terrain_scene

WIDTH, HEIGHT = 1920, 1080
TIMED_ROUNDS = 6
CHUNK = 6


def bench_waves(packed, layout, waves, timed_rounds=TIMED_ROUNDS,
                chunk=CHUNK):
    config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves)
    chunk = min(chunk, timed_rounds)
    t0 = time.time()
    # Warm with the exact chunk-round program the timed loop runs (the
    # `rounds` static arg keys the jit cache; see exp_waves_e2e).
    state = render(packed, config, chunk, seed=0, layout=layout)
    warm_count = float(jnp.sum(state['accum']['count']))
    print(f'# [waves={waves}] compile+warmup ({chunk} rounds): '
          f'{time.time()-t0:.1f}s', file=sys.stderr, flush=True)

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
          f'{samples_s/1e6:.2f} Msamples/s', file=sys.stderr, flush=True)
    return dict(mrays=round(mrays, 2), samples_per_s=round(samples_s, 0),
                elapsed_s=round(elapsed, 2))


def main():
    t0 = time.time()
    scene = make_terrain_scene(side=900)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    print(f'# terrain compiled in {time.time()-t0:.1f}s', file=sys.stderr,
          flush=True)
    out = {}
    for waves in (1, 2):
        out[f'waves{waves}'] = bench_waves(packed, layout, waves)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
