"""Does per-wave chunking of the scatter side fix the waves=2 fusion
regression?

exp_waves9 showed the STANDALONE scatter side scales perfectly
linearly (87.6 -> 171.3 ms at 2.07 -> 4.15M lanes) while the FUSED
round's scatter side goes super-linear (B - A: 52.4 -> 144.9 ms,
exp_waves8): at 2.07M lanes XLA fuses scatter + deposit into the round
at ~60% of its standalone cost, and at 4.15M that fusion quality is
lost. If the fusion degradation is a function of buffer/loop sizes,
re-chunking JUST the scatter side to one-wave slices inside the same
jit program should restore it: each chunk is the exact 2.07M-lane
computation that fused well, and per-lane independence makes the
split semantically free (RNG state, path state, hit and accumulator
are all per-lane along the trailing axis).

Arms (all non-donating jits, REPS reps, readback-terminated):
  prod_round    wf.render_rounds(..., rounds=1) fused round (baseline)
  chunk_round   same round with scatter+deposit computed per wave
                slice and concatenated

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
    print(f'#   {label:12s} {dt:8.1f} ms', file=sys.stderr, flush=True)
    return round(dt, 1)


def chunked_round(packed, layout, config, rs, term, chunks):
    """One production round with the scatter side computed per wave
    slice (replicates wavefront.one_round; trace stays whole-state so
    the per-wave sort + packet density are untouched)."""
    n = rs['origin'].shape[1]
    n1 = n // chunks
    hit = trace(packed, layout, rs['origin'], rs['direction'],
                sort_packets=True, sort_waves=config.waves)

    def sl(x):
        return [jax.lax.slice_in_dim(x, w * n1, (w + 1) * n1, axis=-1)
                for w in range(chunks)]

    hit_w = [dict() for _ in range(chunks)]
    for k, v in hit.items():
        for w, piece in enumerate(sl(v)):
            hit_w[w][k] = piece
    path_w = [dict() for _ in range(chunks)]
    for k, v in rs['path'].items():
        for w, piece in enumerate(sl(v)):
            path_w[w][k] = piece
    o_w, d_w = sl(rs['origin']), sl(rs['direction'])
    rngs = sl(rs['rng_state'])
    lanes = sl(rs['lane'])
    ax_w, ac_w = sl(rs['accum']['xyz']), sl(rs['accum']['count'])

    outs = []
    for w in range(chunks):
        rng = Rng(rngs[w])
        path, origin, direction, alive = scatter(
            packed, path_w[w], o_w[w], d_w[w], hit_w[w], rng, term,
            layout)
        dead = ~alive
        if config.flags & RENDER_FLAG_ACCUMULATE:
            xyz = ax_w[w] + jnp.where(dead, path['sample'], 0.0)
            count = ac_w[w] + dead.astype(jnp.float32)
        else:
            xyz = jnp.where(dead, path['sample'], ax_w[w])
            count = jnp.where(dead, 1.0, ac_w[w])
        fresh, cam_o, cam_d = new_paths(
            packed, config.camera_index, config.camera_model,
            config.width, config.height, rng, config.flags, lanes[w])
        path = merge_paths(path, fresh, dead)
        origin = jnp.where(dead, cam_o, origin)
        direction = jnp.where(dead, cam_d, direction)
        outs.append(dict(path=path, origin=origin, direction=direction,
                         accum=dict(xyz=xyz, count=count),
                         rng_state=rng.state, lane=lanes[w]))

    def cat(pieces):
        return jnp.concatenate(pieces, axis=-1)

    return dict(
        path={k: cat([o['path'][k] for o in outs]) for k in outs[0]['path']},
        origin=cat([o['origin'] for o in outs]),
        direction=cat([o['direction'] for o in outs]),
        accum=dict(xyz=cat([o['accum']['xyz'] for o in outs]),
                   count=cat([o['accum']['count'] for o in outs])),
        rng_state=cat([o['rng_state'] for o in outs]),
        lane=cat([o['lane'] for o in outs]))


def main():
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    out = {}
    for waves in (2, 1):
        config = RenderConfig(width=WIDTH, height=HEIGHT, waves=waves)
        state = wf.render(packed, config, 24, seed=0, layout=layout)
        float(jnp.sum(state['accum']['count']))
        n = state['origin'].shape[1]
        print(f'# waves={waves} ({n} lanes)', file=sys.stderr, flush=True)
        res = {}
        term = jnp.float32(0.05)

        prod = jax.jit(lambda p, s, t: wf.render_rounds(
            p, layout, config, s, t, rounds=1, sort_each_round=True))
        res['prod_round'] = timed('prod_round', prod, packed, state, term)

        for chunks in ((2,) if waves == 1 else (2, 4)):
            ck = jax.jit(lambda p, s, t, c=chunks: chunked_round(
                p, layout, config, s, t, c))
            res[f'chunk{chunks}'] = timed(f'chunk{chunks}', ck, packed,
                                          state, term)

        # Equality: one chunked round == one production round bitwise
        # (same RNG stream per lane, same math, different fusion only).
        a = prod(packed, state, term)
        b = jax.jit(lambda p, s, t: chunked_round(
            p, layout, config, s, t, 2))(packed, state, term)
        import numpy as np
        same = all(bool(jnp.all(x == y)) for x, y in
                   zip(jax.tree_util.tree_leaves(a),
                       jax.tree_util.tree_leaves(b)))
        res['chunk2_bitwise_equal'] = bool(same)
        print(f'#   bitwise equal: {same}', file=sys.stderr, flush=True)
        out[f'waves{waves}'] = res
        del state
    print(json.dumps(out))


if __name__ == '__main__':
    main()
