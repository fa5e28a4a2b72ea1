"""Does the packed row gather's stack/transpose pair cost anything in
the FUSED round program?

permute_rows stacks k rows channels-first, transposes to (N, k),
gathers, transposes back. tools/exp_skytap3.py showed a standalone
(N, 16) transpose costs ~15 ms at 2M lanes -- but also that the fused
round often fuses such shuffles away (the texture-tap restructure was
production-neutral). This A/Bs the full production sorted round on
viking with permute_rows vs a stack(axis=1) variant that never forms
the channels-first intermediate. Values are bit-identical (same
gather, same elements).

Run alone on the axon TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.ops import intersect
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=16 / 9)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=1920, height=1080)
    state = wf.render(packed, config, 24, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))

    prod_permute = intersect.permute_rows

    def stack1_permute(rows, perm, block=1):
        k = len(rows)
        width = -(-k // 8) * 8
        n = rows[0].shape[0]
        cast = [r if r.dtype == jnp.float32
                else jax.lax.bitcast_convert_type(r, jnp.float32)
                for r in rows]
        cast += [jnp.zeros(n, jnp.float32)] * (width - k)
        flat = jnp.stack(cast, axis=1)            # (n, width) directly
        if block > 1:
            flat = flat.reshape(n // block, block * width)
        out = jnp.take(flat, perm, axis=0)
        if block > 1:
            out = out.reshape(n, width)
        return [out[:, i] if rows[i].dtype == jnp.float32
                else jax.lax.bitcast_convert_type(out[:, i], rows[i].dtype)
                for i in range(k)]

    def make_round():
        # Fresh lambda per arm: the permute variant is a global read at
        # trace time, invisible to the jit cache key.
        return jax.jit(
            lambda p, s, t: wf.render_rounds(p, layout, config, s, t,
                                             rounds=1,
                                             sort_each_round=True))

    def timeit(label, fn):
        out = fn(packed, state, jnp.float32(0.05))
        float(jnp.sum(out['accum']['count']))
        t0 = time.time()
        for _ in range(REPS):
            out = fn(packed, state, jnp.float32(0.05))
            float(jnp.sum(out['accum']['count']))
        dt = (time.time() - t0) / REPS
        print(f'# {label:10s} {dt*1e3:7.1f} ms/round', file=sys.stderr)
        return round(dt * 1e3, 1)

    results = {}
    for rnd in range(2):
        intersect.permute_rows = prod_permute
        results[f'prod{rnd}'] = timeit(f'prod{rnd}', make_round())
        intersect.permute_rows = stack1_permute
        results[f'stack1_{rnd}'] = timeit(f'stack1_{rnd}', make_round())
    intersect.permute_rows = prod_permute
    print(json.dumps(results))


if __name__ == '__main__':
    main()
