"""Block-quantized coherence sort: sweep the permutation granularity.

The per-round sort tax is dominated by the two packed row gathers
around the trace kernel (~2/3 of ~30-35 ms on viking), and gather cost
is per INDEX, sublinear in row width (ops/intersect.permute_rows).
Quantizing the permutation to blocks of G consecutive lanes divides
the index count by G at G-times-wider rows -- the cheap direction --
in exchange for packet coherence: within a block, respawned camera
lanes are adjacent pixels (still coherent) but bounce lanes mix
direction octants, fattening per-packet unions and confusing the
dominant-octant push order.

This sweeps G end-to-end on the viking hall (the headline config).

MEASURED 2026-08-18 (v5e, 1080p, 24 rounds, chunk 12) -- a decisive
NEGATIVE:

    G=  1: 13.43 Mrays/s (1.000x)
    G=  8:  4.94         (0.368x)
    G= 32:  4.93         (0.368x)
    G=128:  4.85         (0.361x)
    G=512:  4.85         (0.361x)

Even G=8 lands AT the unsorted rate: within a block of 8 adjacent
pixels the bounce directions already span octants, so packets lose
octant purity and the kernel gives back the entire 2.7x sort win. The
gather savings (<= ~20 ms/round) are noise against that. Conclusion:
the coherence sort's value is per-LANE octant purity; the two packed
(N,8) row gathers around the kernel (~30 ms/round at 2M lanes) are a
structural floor for it, not a tunable. sort_block stays 1.

Runtime rules: memory/tpu-runtime-rules (one process, readback to time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
CHUNK = 12
TIMED = 24


def measure(label, packed, layout, config):
    state = None
    for _ in range(2):
        state = wavefront.render(packed, config, CHUNK, seed=0,
                                 layout=layout, state=state)
    float(jnp.sum(state['accum']['count']))  # readback: force warm exec
    t0 = time.time()
    for _ in range(TIMED // CHUNK):
        state = wavefront.render(packed, config, CHUNK, layout=layout,
                                 state=state)
        jax.block_until_ready(state['accum']['xyz'])
    float(jnp.sum(state['accum']['count']))
    dt = time.time() - t0
    mrays = WIDTH * HEIGHT * TIMED / dt / 1e6
    print(f'{label}: {TIMED} rounds in {dt:.2f}s = {mrays:.2f} Mrays/s',
          flush=True)
    return mrays


def main():
    blocks = [int(s) for s in sys.argv[1:]] or [1, 8, 32, 128, 512]
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)

    measure('session warmup (G=1)', packed, layout,
            RenderConfig(width=WIDTH, height=HEIGHT))

    results = {}
    for g in blocks:
        config = RenderConfig(width=WIDTH, height=HEIGHT, sort_block=g)
        results[g] = measure(f'viking G={g:4d}', packed, layout, config)

    base = results.get(1)
    for g, m in results.items():
        rel = f' ({m / base:.3f}x)' if base else ''
        print(f'G={g:4d}: {m:.2f} Mrays/s{rel}')


if __name__ == '__main__':
    main()
