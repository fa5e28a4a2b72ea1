"""Why does a round cost ~14 ms more inside the 24-round loop?

profile_round measures a single fused sorted round at ~138.5 ms net of
call overhead (state warmed 4 rounds), while the bench's 24-round
fori_loop program runs at ~152.5 ms/round net. Two hypotheses:

  (a) ray-mix drift: 4 warm rounds under-represent the steady-state
      bounce fraction; later rounds trace slower rays.
  (b) loop overhead: the fori_loop carry forces buffer copies or worse
      scheduling than the single-round program.

Discriminates by timing single-round calls against states warmed K
rounds (K = 4, 12, 24, 48), then timing 12-round loop calls from the
same states. If (a), single-round cost climbs with K toward the loop
rate and the loop rate is flat. If (b), single-round cost is flat
below the loop rate.

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
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
REPS = 5


def readback(state):
    return float(jnp.sum(state['accum']['count']))


def timed_call(fn, *args, reps=REPS):
    out = fn(*args)
    readback(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        readback(out)
    return (time.time() - t0) / reps


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    term = jnp.float32(0.05)

    render_nodonate = jax.jit(
        wf.render_rounds,
        static_argnames=('layout', 'config', 'rounds', 'sort_each_round'))

    one = lambda s: render_nodonate(packed, layout, config, s, term,
                                    rounds=1, sort_each_round=True)
    loop12 = lambda s: render_nodonate(packed, layout, config, s, term,
                                       rounds=12, sort_each_round=True)

    # Null call overhead for netting.
    null = jax.jit(lambda s: jax.tree_util.tree_map(lambda x: x, s))

    state = wf.reset(packed, config, seed=0)
    readback(state)
    overhead = timed_call(null, state)
    print(f'# call overhead {overhead*1e3:.1f} ms', flush=True)

    warmed = 0
    for k in (4, 12, 24, 48):
        state = wf.render(packed, config, k - warmed, layout=layout,
                          state=state)
        warmed = k
        readback(state)
        t1 = timed_call(one, state)
        t12 = timed_call(loop12, state, reps=2)
        print(f'warm {k:3d}: single round {1e3*(t1-overhead):7.1f} ms net | '
              f'12-round loop {1e3*(t12-overhead)/12:7.1f} ms/round net',
              flush=True)


if __name__ == '__main__':
    main()
