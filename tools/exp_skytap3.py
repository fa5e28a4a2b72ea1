"""A/B: quad-tap transpose placement in the skybox radiance path.

The quad bilinear tap gathers (N, 16) rows and immediately transposes
to (16, N) for the channels-first combine -- a full 128 MB layout
change at 2M lanes. The 'late_t' variant does the bilinear combine in
(N, 4) orientation and transposes only the final 4 channels (4x less
data through the lane/sublane shuffle). Same values bit-for-bit (same
adds/mults, different layout). Timed inside the full production
scatter+respawn step on real viking state.

Run alone on the axon TPU.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

WIDTH, HEIGHT = 1920, 1080
REPS = 10


def main():
    import jax
    import jax.numpy as jnp
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.core.constants import PI, TAU
    from path_tracer_tpu.core.sampling import Rng
    from path_tracer_tpu.core.spectrum import sample_parametric_spectrum_scaled
    from path_tracer_tpu.integrator import scatter as sc
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.integrator.state import merge_paths, new_paths
    from path_tracer_tpu.ops.intersect import trace
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    state = wf.render(packed, config, 4, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    hit = jax.jit(partial(trace, layout=layout))(
        packed, origin=state['origin'], direction=state['direction'])
    float(jnp.sum(hit['time']))

    real_tap = sc.sample_skybox_radiance
    size = layout.atlas_size

    def tap_late_t(packed_, direction, lam, has_texture=True,
                   atlas_size=8, filter_modes=(True, True),
                   use_quad=False):
        phi = jnp.arctan2(direction[1], direction[0])
        theta = jnp.arcsin(jnp.clip(direction[2], -1.0, 1.0))
        u_ = 0.5 + phi / TAU
        v_ = 0.5 + theta / PI
        meta = jax.lax.dynamic_slice_in_dim(
            packed_.texture_meta, packed_.skybox_texture_index,
            1, 0)[0]
        pmin0, pmin1, pmax0, pmax1, layer = (meta[0], meta[1], meta[2],
                                             meta[3],
                                             meta[4].astype(jnp.int32))
        fu = u_ - jnp.floor(u_)
        fv = v_ - jnp.floor(v_)
        x = (pmin0 + (pmax0 - pmin0) * fu) * size - 0.5
        y = (pmin1 + (pmax1 - pmin1) * fv) * size - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = jnp.where(x0 < 0, 0.0, x - x0)[:, None]       # (N, 1)
        fy = jnp.where(y0 < 0, 0.0, y - y0)[:, None]
        x0c = jnp.clip(x0, 0, size - 1)
        y0c = jnp.clip(y0, 0, size - 1)
        idx = (layer * size + y0c) * size + x0c
        q = jnp.take(packed_.atlas_quad, idx, axis=0)      # (N, 16)
        c00, c10, c01, c11 = q[:, 0:4], q[:, 4:8], q[:, 8:12], q[:, 12:16]
        lin = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
               + (c01 * (1 - fx) + c11 * fx) * fy)         # (N, 4)
        spec = lin.T                                       # (4, N)
        return (sample_parametric_spectrum_scaled(spec, lam)
                * packed_.skybox_brightness)

    def make_step():
        @jax.jit
        def step(path, origin, direction, hit, rng_state, lane, accum):
            rng = Rng(rng_state)
            term = jnp.float32(0.05)
            path, origin, direction, alive = sc.scatter(
                packed, path, origin, direction, hit, rng, term, layout)
            dead = ~alive
            xyz = accum['xyz'] + jnp.where(dead, path['sample'], 0.0)
            count = accum['count'] + dead.astype(jnp.float32)
            fresh, co, cd = new_paths(packed, config.camera_index,
                                      config.camera_model, config.width,
                                      config.height, rng, config.flags, lane)
            path = merge_paths(path, fresh, dead)
            origin = jnp.where(dead, co, origin)
            direction = jnp.where(dead, cd, direction)
            return path, origin, direction, dict(xyz=xyz, count=count)
        return step

    def timeit(label, fn, *args):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.time() - t0) / REPS
        print(f'# {label:10s} {dt*1e3:7.1f} ms', file=sys.stderr)
        return round(dt * 1e3, 1)

    args = (state['path'], state['origin'], state['direction'], hit,
            state['rng_state'], state['lane'], state['accum'])
    results = {}
    # Interleave A/B/A/B to cancel relay drift.
    for rnd in range(2):
        for name, tap in (('prod', real_tap), ('late_t', tap_late_t)):
            sc.sample_skybox_radiance = tap
            results[f'{name}{rnd}'] = timeit(f'{name}{rnd}', make_step(),
                                             *args)
    # Value check: identical emission?
    sc.sample_skybox_radiance = real_tap
    from path_tracer_tpu.core.spectrum import hero_wavelength_cluster
    lam = jax.jit(hero_wavelength_cluster)(state['path']['lambda0'])
    kw = dict(atlas_size=layout.atlas_size,
              filter_modes=layout.texture_filter_modes,
              use_quad=layout.atlas_quad_fit)
    a = jax.jit(lambda d, l: real_tap(packed, d, l, True, **kw))(
        state['direction'], lam)
    b = jax.jit(lambda d, l: tap_late_t(packed, d, l, True, **kw))(
        state['direction'], lam)
    import numpy as np
    diff = float(jnp.max(jnp.abs(a - b)))
    results['max_abs_diff'] = diff
    print(f'# max |a-b| = {diff}', file=sys.stderr)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
