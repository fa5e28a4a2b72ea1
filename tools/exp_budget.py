"""The round time budget: where do 168 ms at 2.07M lanes actually go?

VERDICT round-4 weak-item 3: kernel-only mixed viking is ~104 ms but
the e2e round is ~168 ms -- ~64 ms/round outside the trace kernel --
while the round-4 ablations said patching individual stages moves the
round by less than noise. Both can be true under fusion only if the
64 ms hides in stages those ablations never patched (the argsort pair,
the permutation gathers). This harness pins every term by FUSED
ablation (the exp_fusedround.py method: patch at trace time, fresh
non-donating jit per arm, so each arm is the real program minus one
stage):

  prod        the production fused sorted round
  no_inv      kernel outputs consumed WITHOUT the inverse permutation
              (wrong image, right cost shape) -> inverse-gather term
  no_sortperm rays traced in lane order: no key, no argsorts, no
              gathers (pops explode, so the KERNEL term differs; the
              delta is reported only for the motion side by also
              patching the kernel to trace the same sorted rays)
  no_kernel   trace replaced by a constant-miss hit (keeps scatter,
              deposit, respawn, RNG, accumulation) -> scatter-side term
  iota_perm   argsorts replaced by an iota permutation (gathers and
              kernel keep their cost shape on sorted-in-lane-order
              rays; key still computed) -> argsort-pair term

plus standalone 1-D argsort / scatter-inverse / (N,8) gather timings
for the cross-check table.

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
import numpy as np

WIDTH, HEIGHT = 1920, 1080
REPS = 6


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
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.ops import intersect as ix
    from path_tracer_tpu.scene.procedural import make_viking_hall_scene

    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT)
    state = wf.render(packed, config, 24, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))
    n = state['origin'].shape[1]
    print(f'# {n} lanes (steady 24-round state)', file=sys.stderr)
    res = {}

    def fused(tag):
        f = jax.jit(lambda p, s, t: wf.render_rounds(
            p, layout, config, s, t, rounds=1, sort_each_round=True))
        return timed(tag, f, packed, state, jnp.float32(0.05))

    res['prod'] = fused('prod')

    # --- argsort-pair term: a FIXED random permutation stands in for
    # both argsorts (identity/iota would let XLA elide the gathers; a
    # constant random perm keeps both gathers' real cost while removing
    # only the sorts). Kernel pops differ (rays unsorted) -- this arm
    # is read TOGETHER with no_gathers, which shares that pops shape.
    real_argsort = jnp.argsort
    fixed_perm = jnp.asarray(np.random.default_rng(0).permutation(n)
                             .astype(np.int32))

    def const_sort(x, axis=-1, **kw):
        return fixed_perm.reshape(x.shape)

    jnp.argsort = const_sort
    try:
        res['const_perm'] = fused('const_perm')
    finally:
        jnp.argsort = real_argsort

    # --- inverse-gather term: permute_rows with the inverse patched to
    # return its rows untouched (forward gather + kernel keep cost).
    real_permute = ix.permute_rows

    def fwd_only_permute(rows, perm, block=1):
        # The inverse call carries the kernel's 5 outputs; the forward
        # carries 7 ray rows.
        if len(rows) == 5:
            return rows
        return real_permute(rows, perm, block=block)

    ix.permute_rows = fwd_only_permute
    try:
        res['no_inv'] = fused('no_inv')
    finally:
        ix.permute_rows = real_permute

    # --- both gathers out (argsorts + key + kernel on lane order).
    def no_permute(rows, perm, block=1):
        return rows

    ix.permute_rows = no_permute
    try:
        res['no_gathers'] = fused('no_gathers')
    finally:
        ix.permute_rows = real_permute

    # --- scatter-side term: trace replaced by a constant miss.
    real_trace = ix.trace

    def miss_trace(packed_, layout_, origin, direction, duration=1.0e7,
                   **kw):
        n_ = origin.shape[1]
        hit = ix.make_hit(n_, 1.0e7)
        return ix.resolve_hit_attributes(packed_, layout_, origin,
                                         direction, hit)

    ix.trace = miss_trace
    wf.trace = miss_trace
    try:
        res['no_kernel'] = fused('no_kernel')
    finally:
        ix.trace = real_trace
        wf.trace = real_trace

    # --- standalone cross-checks --------------------------------------
    key = ix.ray_sort_key(packed, state['origin'], state['direction'])
    key = jax.block_until_ready(key)
    res['sa_key'] = timed('sa_key', jax.jit(
        lambda o, d: ix.ray_sort_key(packed, o, d)),
        state['origin'], state['direction'])
    res['sa_argsort1d'] = timed('sa_argsort1d', jax.jit(jnp.argsort), key)
    perm = jnp.argsort(key)
    perm = jax.block_until_ready(perm)
    res['sa_argsort_inv'] = timed('sa_argsort_inv',
                                  jax.jit(jnp.argsort), perm)

    def scatter_inverse(p):
        return jnp.zeros_like(p).at[p].set(
            jnp.arange(p.shape[0], dtype=p.dtype))

    res['sa_scatter_inv'] = timed('sa_scatter_inv',
                                  jax.jit(scatter_inverse), perm)

    @jax.jit
    def pair(o, d):
        k = ix.ray_sort_key(packed, o, d)
        p = jnp.argsort(k)
        return p, jnp.argsort(p)

    res['sa_pair'] = timed('sa_pair', pair, state['origin'],
                           state['direction'])

    @jax.jit
    def fwd7(o, d, t, p):
        return ix.permute_rows([o[0], o[1], o[2], d[0], d[1], d[2], t], p)

    t_in = jnp.full((n,), 1.0e7)
    res['sa_fwd7'] = timed('sa_fwd7', fwd7, state['origin'],
                           state['direction'], t_in, perm)

    print(json.dumps(res))


if __name__ == '__main__':
    main()
