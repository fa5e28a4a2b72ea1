"""Per-stage breakdown of one wavefront round on real TPU hardware.

Times sort / trace / scatter(+respawn) separately, plus the fused full
round, for a set of scenes (default: cornell = the analytic floor, and
viking hall = the flagship mesh scene). This is the tool that says
where the next millisecond must come from.

Runtime rules (see memory/tpu-runtime-rules): one python process at a
time on the axon tunnel; every timed region must end with a device->
host READBACK (not block_until_ready) because the runtime defers
Pallas execution until the first readback.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

WIDTH, HEIGHT = 1920, 1080
REPS = 6


def timed(label, fn, *args, **kwargs):
    """Run fn REPS times, forcing execution with a readback; return s/iter."""
    import jax.numpy as jnp

    out = fn(*args, **kwargs)  # compile + warm
    leaves = [x for x in __import__('jax').tree_util.tree_leaves(out)
              if hasattr(x, 'dtype')]
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args, **kwargs)
        float(jnp.sum(leaves[0].astype(jnp.float32)))
        leaves = [x for x in __import__('jax').tree_util.tree_leaves(out)
                  if hasattr(x, 'dtype')]
    dt = (time.time() - t0) / REPS
    print(f'#   {label:26s} {dt*1e3:8.1f} ms', file=sys.stderr)
    return dt


def profile_scene(name, scene, camera_model=0):
    import jax
    import jax.numpy as jnp
    from functools import partial
    from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
    from path_tracer_tpu.core.sampling import Rng
    from path_tracer_tpu.integrator import wavefront as wf
    from path_tracer_tpu.integrator.scatter import scatter
    from path_tracer_tpu.integrator.state import merge_paths, new_paths
    from path_tracer_tpu.ops.intersect import trace

    t0 = time.time()
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=WIDTH, height=HEIGHT,
                          camera_model=camera_model)
    print(f'# [{name}] compiled in {time.time()-t0:.1f}s: '
          f'{int(packed.face_positions.shape[2])} tris', file=sys.stderr)

    # Warm state to the STEADY-STATE ray mix: the bounce fraction keeps
    # climbing for ~24 rounds and the kernel is ~10% slower on the
    # stationary mix than after 4 rounds (139.7 vs 152.9 ms/round,
    # tools/exp_loopgap.py) -- under-warmed profiles flatter the trace
    # stage. The 24-round fori_loop itself adds nothing (loop rate ==
    # steady single-round rate).
    state = wf.render(packed, config, 24, seed=0, layout=layout)
    float(jnp.sum(state['accum']['count']))

    # Per-call dispatch/readback overhead on this runtime is large
    # (~100 ms); measure it with a null program and subtract mentally
    # when reading the per-stage rows below.
    @jax.jit
    def _null(s):
        return jax.tree_util.tree_map(lambda x: x, s)

    res = {}
    res['call_overhead'] = timed('null program (call overhead)',
                                 _null, state)
    res['sort'] = timed('sort (argsort+row gather)', wf._sort_jit,
                        packed, state)

    # Split the sort: argsort of the key vs the packed row gather.
    @jax.jit
    def _argsort_only(s):
        key = wf._ray_sort_key(packed, s['origin'], s['direction'])
        return jnp.argsort(key)

    perm = _argsort_only(state)
    res['sort_argsort'] = timed('  argsort only', _argsort_only, state)

    @jax.jit
    def _permute_rows(s, perm):
        leaves = jax.tree_util.tree_leaves(s)
        rows = []
        for leaf in leaves:
            planes = ([leaf] if leaf.ndim == 1
                      else [leaf[i] for i in range(leaf.shape[0])])
            for p in planes:
                if p.dtype != jnp.float32:
                    p = jax.lax.bitcast_convert_type(p, jnp.float32)
                rows.append(p)
        width = -(-len(rows) // 8) * 8
        rows += [jnp.zeros_like(rows[0])] * (width - len(rows))
        m = jnp.stack(rows, axis=0)
        return jnp.take(m.T, perm, axis=0).T

    res['sort_gather'] = timed('  row gather only (N,32)',
                               _permute_rows, state, perm)

    trace_jit = jax.jit(partial(trace, layout=layout))
    res['trace'] = timed(
        'trace', lambda: trace_jit(packed, origin=state['origin'],
                                   direction=state['direction']))
    trace_sorted_jit = jax.jit(partial(trace, layout=layout,
                                       sort_packets=True))
    res['trace_sorted'] = timed(
        'trace (in-trace sort)',
        lambda: trace_sorted_jit(packed, origin=state['origin'],
                                 direction=state['direction']))

    hit = trace_jit(packed, origin=state['origin'],
                    direction=state['direction'])

    @jax.jit
    def scatter_respawn(path, origin, direction, hit, rng_state, lane, accum):
        rng = Rng(rng_state)
        term = jnp.float32(0.05)
        path, origin, direction, alive = scatter(
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

    res['scatter'] = timed(
        'scatter+respawn',
        lambda: scatter_respawn(state['path'], state['origin'],
                                state['direction'], hit,
                                state['rng_state'], state['lane'],
                                state['accum']))

    # _render_jit / _render_sorted_jit DONATE the state; repeated timing
    # over one state needs a local non-donating jit (wavefront.py:236).
    render_nodonate = jax.jit(
        wf.render_rounds,
        static_argnames=('layout', 'config', 'rounds', 'sort_each_round'))
    res['round_fused'] = timed(
        'full round (no sort)', render_nodonate, packed, layout, config,
        state, jnp.float32(0.05), rounds=1)
    if wf.wants_sort(config, layout):
        res['round_fused_sorted'] = timed(
            'full round (fused sort)', render_nodonate, packed, layout,
            config, state, jnp.float32(0.05), rounds=1,
            sort_each_round=True)
        res['round_total'] = res['round_fused_sorted']
    else:
        res['round_total'] = res['round_fused']
    lanes = WIDTH * HEIGHT
    res['mrays'] = round(lanes / res['round_total'] / 1e6, 2)
    print(f'# [{name}] round total {res["round_total"]*1e3:.1f} ms '
          f'-> {res["mrays"]} Mrays/s', file=sys.stderr)
    return {k: (round(v * 1e3, 1) if k != 'mrays' else v)
            for k, v in res.items()}


def main():
    from path_tracer_tpu.scene.procedural import (
        make_360_scene, make_cornell_scene, make_multi_mesh_scene,
        make_viking_hall_scene)

    names = sys.argv[1:] or ['cornell', 'viking']
    out = {}
    if 'cornell' in names:
        out['cornell'] = profile_scene('cornell', make_cornell_scene())
    if 'viking' in names:
        out['viking'] = profile_scene('viking',
                                      make_viking_hall_scene(detail=1))
    if '360' in names:
        out['360'] = profile_scene('360', make_360_scene(), camera_model=2)
    if 'multimesh' in names:
        # The bench times this config at 4K; profile at 1080p (same
        # per-lane structure, 4x fewer lanes) unless 'multimesh4k'.
        out['multimesh'] = profile_scene('multimesh',
                                         make_multi_mesh_scene(detail=1))
    print(json.dumps(out))


if __name__ == '__main__':
    main()
