"""Bisect the waves=2 scatter-side cliff (exp_waves8 follow-up).

exp_waves8 localized the waves=2 e2e regression to the NON-trace side
of the fused round: B_round - A_trace is 52.4 ms at 2.07M lanes but
144.9 at 4.15M (+40 ms super-linear) while the trace+sort side scales
per-ray FLAT. Everything on that side is elementwise or gathers from
small fixed tables, so something has a lane-count cliff. This probe
times the pieces standalone at both lane counts, with the same fixed
mid-flight hit so each arm is the identical computation at 1x and 2x
lanes:

  scatter       jit(scatter) alone (incl. sky + material atlas taps)
  scatter_notex sample_texture patched to a constant -> tap term
  deposit       the round tail: accumulate + new_paths + merge/selects
  newpaths      jit(new_paths) alone (camera ray gen)
  resolve_attr  resolve_hit_attributes alone (runs inside A_trace, but
                its (N, 16) gather is the one index-linear suspect
                exp_waves3 only swept to 8M INDICES on a fixed-size
                operand)

Run alone on the axon TPU.
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
from path_tracer_tpu.core.constants import RENDER_FLAG_ACCUMULATE
from path_tracer_tpu.core.sampling import Rng
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.integrator.scatter import scatter
from path_tracer_tpu.integrator.state import merge_paths, new_paths
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
    print(f'#   {label:14s} {dt:8.1f} ms', file=sys.stderr, flush=True)
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

        hit = jax.jit(lambda p, o, d: trace(
            p, layout, o, d, sort_packets=True, sort_waves=waves))(
                packed, state['origin'], state['direction'])
        hit = jax.block_until_ready(hit)
        term = jnp.float32(0.05)

        def scatter_fn(p, st, h):
            rng = Rng(st['rng_state'])
            return scatter(p, st['path'], st['origin'], st['direction'],
                           h, rng, term, layout)

        res['scatter'] = timed('scatter', jax.jit(scatter_fn),
                               packed, state, hit)

        import path_tracer_tpu.models.common as mc
        real_tex = mc.sample_texture

        def const_tex(packed_, texture_index, uv, atlas_size, *a, **kw):
            n_ = uv.shape[1]
            return jnp.broadcast_to(
                jnp.asarray([0.3, 0.2, 0.6, 1.0])[:, None], (4, n_))

        # Every module that imported sample_texture by value holds its
        # own binding; patch them all (scatter.py, models/common.py,
        # any model module).
        mcmods = [m for m in list(sys.modules.values())
                  if getattr(m, 'sample_texture', None) is real_tex]
        try:
            for m in mcmods:
                m.sample_texture = const_tex
            res['scatter_notex'] = timed('scatter_notex',
                                         jax.jit(scatter_fn),
                                         packed, state, hit)
        finally:
            for m in mcmods:
                m.sample_texture = real_tex

        def deposit_fn(p, st, h):
            rng = Rng(st['rng_state'])
            path, origin, direction, alive = scatter(
                p, st['path'], st['origin'], st['direction'], h, rng,
                term, layout)
            dead = ~alive
            accum = st['accum']
            xyz = accum['xyz'] + jnp.where(dead, path['sample'], 0.0)
            count = accum['count'] + dead.astype(jnp.float32)
            fresh, cam_o, cam_d = new_paths(
                p, config.camera_index, config.camera_model,
                config.width, config.height, rng, config.flags,
                st['lane'])
            path = merge_paths(path, fresh, dead)
            origin = jnp.where(dead, cam_o, origin)
            direction = jnp.where(dead, cam_d, direction)
            return dict(path=path, origin=origin, direction=direction,
                        accum=dict(xyz=xyz, count=count),
                        rng_state=rng.state, lane=st['lane'])

        res['scatter_deposit'] = timed('scatter_deposit',
                                       jax.jit(deposit_fn),
                                       packed, state, hit)

        def newpaths_fn(p, st):
            rng = Rng(st['rng_state'])
            return new_paths(p, config.camera_index, config.camera_model,
                             config.width, config.height, rng,
                             config.flags, st['lane'])

        res['newpaths'] = timed('newpaths', jax.jit(newpaths_fn),
                                packed, state)
        out[f'waves{waves}'] = res
        del state, hit
    print(json.dumps(out))


if __name__ == '__main__':
    main()
