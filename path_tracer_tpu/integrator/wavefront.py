"""Wavefront render loop: rounds of trace + scatter under one jit.

TPU equivalent of RunBasicRenderer / ResetBasicRenderer
(/root/reference/src/integrator/basic.cpp:285-332): the reference
dispatches one trace and one scatter compute pass per round with buffer
barriers; here a round is one iteration of a lax.fori_loop over the pure
(trace, scatter, accumulate, respawn) step -- XLA owns scheduling and
the "barrier" is dataflow.

The accumulator is (3, N) XYZ + (N,) counts, one slot per state lane;
slots map to pixels many-to-one when RenderConfig.waves > 1 and are
folded per pixel by integrator.resolve.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..core.constants import (
    RENDER_FLAG_ACCUMULATE,
    RENDER_FLAG_SAMPLE_JITTER,
)
from ..core.sampling import Rng
from ..ops.intersect import SceneLayout, ray_sort_key as _ray_sort_key, trace
from ..utils import log
from .scatter import scatter
from .state import merge_paths, new_paths


def _sort_state(rs, key):
    """Co-sort every per-lane array in the render state by `key`.

    TPU gathers cost per *index*, not per byte (a 16-float row gather
    costs the same as a scalar gather), so the entire state -- ~30 (N,)
    rows, ints bitcast to f32 -- is packed into one (N, 32) matrix and
    permuted with a single row gather, then unpacked. This is ~13x
    faster than per-row gathers (measured 90 ms vs 1.2 s at 2M lanes).
    Direct multi-operand lax.sort is not an option: its TPU compilation
    explodes (>10 min).

    No longer on the render path (kept for tools/ A-B measurement):
    the production sort lives inside ops.intersect.trace
    (sort_packets=True), which permutes only the 7 kernel-input and 5
    kernel-output rows instead of the whole state.
    """
    perm = jnp.argsort(key)
    leaves, treedef = jax.tree_util.tree_flatten(rs)

    rows = []
    for leaf in leaves:
        planes = [leaf] if leaf.ndim == 1 else [leaf[i] for i in range(leaf.shape[0])]
        for plane in planes:
            if plane.dtype != jnp.float32:
                plane = jax.lax.bitcast_convert_type(plane, jnp.float32)
            rows.append(plane)
    r = len(rows)
    width = -(-r // 8) * 8  # pad row count to a sublane multiple
    n = key.shape[0]
    matrix = jnp.stack(rows + [jnp.zeros(n, jnp.float32)] * (width - r), axis=0)
    permuted = jnp.take(matrix.T, perm, axis=0).T  # ONE row gather

    rebuilt = []
    cursor = 0
    for leaf in leaves:
        c = 1 if leaf.ndim == 1 else leaf.shape[0]
        planes = [permuted[cursor + i] for i in range(c)]
        cursor += c
        if leaf.dtype != jnp.float32:
            planes = [jax.lax.bitcast_convert_type(p, leaf.dtype) for p in planes]
        rebuilt.append(planes[0] if leaf.ndim == 1 else jnp.stack(planes, axis=0))
    return jax.tree_util.tree_unflatten(treedef, rebuilt)


@dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (hashable; changes retrace the jit).

    The traced knobs (seed, termination probability) are passed as
    arguments to `render_rounds` instead.
    """

    width: int = 2048
    height: int = 1024
    camera_index: int = 0
    camera_model: int = 0
    flags: int = RENDER_FLAG_ACCUMULATE | RENDER_FLAG_SAMPLE_JITTER
    rounds_per_call: int = 1
    # Feed the packet kernel rays sorted by (direction octant, origin
    # Morton cell) every round: two argsorts plus two packed row
    # gathers around the kernel (ops.intersect.trace sort_packets,
    # ~45 ms at 2M lanes; the state itself stays in lane order).
    # Coherent packets are what make the Pallas trace kernel fast on
    # bounce rays; wants_sort() gates it to scenes where it pays.
    sort_rays: bool = True
    # Sort permutation granularity: lanes move in blocks of this many
    # consecutive lanes (must divide the lane count; silently degrades
    # to gcd). Measured NEGATIVE above 1 (tools/exp_blocksort.py):
    # even 8-lane blocks lose octant purity and the whole 2.7x sort
    # win with it; kept as a measurement knob only.
    sort_block: int = 1
    # Independent sample waves held in flight: the render state carries
    # waves * width * height lanes (slot = wave * n_pixels + lane, each
    # slot an independent RNG stream of the same pixel grid) and every
    # round advances ALL of them. The per-round coherence sort then
    # packs rays `waves`-fold denser in (octant, origin-morton) key
    # space, so each 3072-ray packet spans a tighter frustum and its
    # leaf union falls toward the per-ray need -- measured on viking
    # hall bounce rays (tools/exp_density.py): leaf-unions/packet
    # 172.7 -> 101.2 and kernel Mrays/s 18.8 -> 39.5 from waves 1 -> 8.
    # Costs waves x state memory (~250 MB per wave at 1080p); resolve
    # folds the waves per pixel.
    #
    # When to raise it (round-5 e2e rule, tools/exp_waves_e2e.py +
    # exp_waves_terrain.py): waves pay iff the round is KERNEL-bound
    # AND one wave stays under the ~64 MB fast-gather cliff. Streaming
    # terrain at 1080p: 4.18/4.41/4.87/4.91 Mrays/s at W=1/2/4/8 --
    # waves=4 adopted for that bench config. Machinery-bound viking:
    # 12.31 -> 11.67 at W=2 (the ~7%-pops win is consumed by the
    # scatter-side residue). 4K: one 8.3M-lane wave is already past
    # the cliff, W=2 loses 12.5%. Default stays 1.
    waves: int = 1
    # TEST knob: run the Pallas packet kernel in interpret mode (pure
    # JAX, any backend) so CPU tests can exercise the packet + in-trace
    # coherence-sort path end-to-end -- e.g. the sharded mesh-scene
    # equality tests, where the production path only exists on TPU.
    packet_interpret: bool = False


# Minimum world triangle SLOTS (wide-leaf rows x 8, counting padding --
# SceneLayout.wide_face_slots) below which the coherence sort is
# skipped. ZERO since the sort moved inside trace(): the old whole-
# state sort (~90 ms/round) only paid above ~24k slots, but the
# in-trace permutation (7 forward + 5 inverse rows, ~45 ms cheaper)
# pays on EVERY packet scene measured -- +48% on a 5.8k-slot
# heightfield, +119% at 17.7k slots, +6% on the analytic-heavy 360 mix
# (tools/exp_sort360.py). Kept as a knob for future re-calibration.
SORT_MIN_FACES = 0


def wants_sort(config: RenderConfig, layout) -> bool:
    """The per-round coherence sort runs whenever the packet trace
    kernel does (mesh scenes whose tables fit or stream within the
    kernel's budget): measured 2026-08-18, sorted packets win on every
    such scene (tools/exp_sort360.py), so the old small-mesh opt-out is
    gone. Analytic-only scenes never sort (no packet kernel to feed).
    Streamed over-VMEM scenes benefit doubly: packet coherence is what
    keeps the HBM leaf-miss rate down."""
    if not (config.sort_rays and layout is not None
            and layout.instance_slots):
        return False
    packet_runs = (layout.inst_fit if layout.packet_mode == 'inst'
                   else layout.wide_fit)
    return bool(packet_runs
                and layout.wide_face_slots >= SORT_MIN_FACES)


def reset(packed, config: RenderConfig, seed, slot=None):
    """ResetBasicRenderer: fresh paths + camera rays + cleared accumulator.

    `slot` optionally restricts this state to a slice of the global
    slot space (for pixel-sharded rendering); defaults to all
    config.waves * width * height slots. A slot's pixel lane is
    slot % (width * height) and its RNG stream id is the slot itself,
    so wave copies of the same pixel draw independent streams and a
    sharded reset over any partition of the slot space reproduces the
    single-device state slot-for-slot.

    Jitted as ONE program: built eagerly this is ~2700 individual op
    dispatches at 2M lanes, which on the deferred-dispatch axon runtime
    cost 75 s of per-op relay compiles plus 130 s of deferred execution
    at the first readback (tools/profile_compile.py) -- the round-2
    bench's "550 s Cornell compile" in its entirety. The seed is traced,
    so per-restart reseeds reuse the compiled program.
    """
    if slot is None:
        return _reset_jit(packed, config, jnp.uint32(seed))
    return _reset_impl(packed, config, jnp.uint32(seed), slot)


def _reset_impl(packed, config, seed, slot):
    n = slot.shape[0]
    lane = slot % jnp.int32(config.width * config.height)
    rng = Rng.seed(slot.astype(jnp.uint32), seed)
    state, origin, direction = new_paths(
        packed, config.camera_index, config.camera_model,
        config.width, config.height, rng, config.flags, lane)
    accum = dict(
        xyz=jnp.zeros((3, n), jnp.float32),
        count=jnp.zeros((n,), jnp.float32),
    )
    return dict(path=state, origin=origin, direction=direction,
                accum=accum, rng_state=rng.state, lane=lane)


@partial(jax.jit, static_argnames=('config',))
def _reset_jit(packed, config, seed):
    slot = jnp.arange(config.waves * config.width * config.height,
                      dtype=jnp.int32)
    return _reset_impl(packed, config, seed, slot)


# The scatter side of the fused round (scatter + accumulate + respawn)
# is elementwise per lane, but XLA's fusion quality degrades with lane
# count: at 2.07M lanes it fuses into the round at ~60% of its
# standalone cost, while at 4.15M it costs MORE than standalone
# (B_round - A_trace: 52.4 -> 144.9 ms, tools/exp_waves8.py) -- the
# +40 ms that previously killed waves=2 end-to-end. Slicing the scatter
# side into ~2M-lane chunks inside the same jit restores the 2M-lane
# fusion shape; per-lane independence makes the split bitwise-free
# (asserted in tools/exp_waves10.py: chunked == whole, 423.9 -> 384.2
# ms at 4.15M lanes). Chunks of ~1M lanes regress (414.0 ms) and
# chunking a 2.07M round also regresses (196.7 -> 209.1), so the chunk
# target IS one 1080p wave and small states never chunk.
SCATTER_CHUNK_LANES = 2_600_000


def _scatter_chunks(n_lanes):
    return -(-n_lanes // SCATTER_CHUNK_LANES)


def render_rounds(packed, layout: SceneLayout, config: RenderConfig,
                  render_state, termination_probability, rounds=None,
                  sort_each_round=False):
    """Run `rounds` trace+scatter rounds, returning the new render state.

    Pure function of (packed, render_state); jit with layout/config
    static. One round advances every path by one vertex; terminated
    paths deposit their sample and respawn at their pixel
    (basic_scatter.glsl:344-359).

    sort_each_round feeds the packet kernel coherence-sorted rays each
    round (trace's sort_packets path: the state stays in lane order;
    only kernel inputs/outputs ride the permutation), fused with trace
    + scatter into ONE compiled program per call. Both drivers use it:
    render() below picks _render_sorted_jit whenever wants_sort() says
    the sort pays; the sharded driver sets it so sorting composes with
    shard_map (the sort is shard-local).
    """
    rounds = config.rounds_per_call if rounds is None else rounds

    n_lanes = render_state['origin'].shape[1]
    # The per-wave quantile-interleave sort needs the state to be whole
    # wave-major waves of the full pixel grid (ops/intersect
    # .permute_rows_waves); sharded states are wave FRAGMENTS and keep
    # the single global in-shard sort.
    sort_waves = (config.waves if n_lanes == config.waves * config.width
                  * config.height else 1)

    def scatter_deposit(rs, hit):
        """The non-trace side of one round: scatter + accumulate +
        respawn, all elementwise per lane (chunkable)."""
        rng = Rng(rs['rng_state'])
        path, origin, direction, alive = scatter(
            packed, rs['path'], rs['origin'], rs['direction'], hit, rng,
            termination_probability, layout)

        dead = ~alive
        accum = rs['accum']
        if config.flags & RENDER_FLAG_ACCUMULATE:
            xyz = accum['xyz'] + jnp.where(dead, path['sample'], 0.0)
            count = accum['count'] + dead.astype(jnp.float32)
        else:
            xyz = jnp.where(dead, path['sample'], accum['xyz'])
            count = jnp.where(dead, 1.0, accum['count'])
        accum = dict(xyz=xyz, count=count)

        fresh, cam_origin, cam_direction = new_paths(
            packed, config.camera_index, config.camera_model,
            config.width, config.height, rng, config.flags, rs['lane'])
        path = merge_paths(path, fresh, dead)
        origin = jnp.where(dead, cam_origin, origin)
        direction = jnp.where(dead, cam_direction, direction)

        return dict(path=path, origin=origin, direction=direction,
                    accum=accum, rng_state=rng.state, lane=rs['lane'])

    chunks = _scatter_chunks(n_lanes)

    def one_round(_, rs):
        hit = trace(packed, layout, rs['origin'], rs['direction'],
                    sort_packets=sort_each_round,
                    sort_block=config.sort_block, sort_waves=sort_waves,
                    use_packet=True if config.packet_interpret else None,
                    interpret=config.packet_interpret)
        if chunks <= 1:
            return scatter_deposit(rs, hit)

        # Chunked scatter side (see SCATTER_CHUNK_LANES): bitwise equal
        # to the whole-state call -- every array is per-lane along the
        # trailing axis, including the RNG state.
        bounds = [(n_lanes * c // chunks) // 128 * 128
                  for c in range(chunks)] + [n_lanes]

        def sl(x, c):
            return jax.lax.slice_in_dim(x, bounds[c], bounds[c + 1],
                                        axis=-1)

        outs = []
        for c in range(chunks):
            rs_c = dict(
                path={k: sl(v, c) for k, v in rs['path'].items()},
                origin=sl(rs['origin'], c),
                direction=sl(rs['direction'], c),
                accum={k: sl(v, c) for k, v in rs['accum'].items()},
                rng_state=sl(rs['rng_state'], c),
                lane=sl(rs['lane'], c))
            outs.append(scatter_deposit(
                rs_c, {k: sl(v, c) for k, v in hit.items()}))

        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=-1), *outs)

    return jax.lax.fori_loop(0, rounds, one_round, render_state)


# The render state (~0.5 GB at 1080p, ~2 GB at 4K: 30+ (N,) rows plus
# the XYZ accumulator) is DONATED: every production caller immediately
# rebinds to the returned state, and donation lets XLA alias the output
# over the input instead of holding both live across the call. Tools
# that time the same state repeatedly build a local non-donating jit of
# render_rounds instead.
@partial(jax.jit, static_argnames=('layout', 'config', 'rounds'),
         donate_argnums=(3,))
def _render_jit(packed, layout, config, render_state, termination_probability,
                rounds):
    return render_rounds(packed, layout, config, render_state,
                         termination_probability, rounds)


@partial(jax.jit, static_argnames=('layout', 'config', 'rounds'),
         donate_argnums=(3,))
def _render_sorted_jit(packed, layout, config, render_state,
                       termination_probability, rounds):
    return render_rounds(packed, layout, config, render_state,
                         termination_probability, rounds,
                         sort_each_round=True)


@jax.jit
def _sort_jit(packed, render_state):
    key = _ray_sort_key(packed, render_state['origin'],
                        render_state['direction'])
    return _sort_state(render_state, key)


def render(packed, config: RenderConfig, spp_rounds, seed=0,
           termination_probability=0.05, layout=None, state=None):
    """Convenience driver: reset (unless resuming) + N rounds.

    spp_rounds is the number of wavefront rounds; expected samples per
    pixel is roughly rounds * config.waves / E[path length]. Returns the
    render state (pass back via `state=` to continue progressive
    accumulation).
    """
    layout = layout or SceneLayout.from_packed(packed)
    if state is None:
        state = reset(packed, config, seed)
    term = jnp.float32(termination_probability)
    # One fused program for all rounds either way: program dispatch on
    # this runtime costs ~100 ms, which used to dominate analytic scenes
    # (Cornell went 9.5 -> 64 Mrays/s when the per-round sort+render
    # program pair collapsed into one fori_loop program).
    sorted_ = wants_sort(config, layout)
    with log.timer('render.dispatch', rounds=int(spp_rounds),
                   lanes=config.width * config.height, sorted=sorted_):
        if sorted_:
            state = _render_sorted_jit(packed, layout, config, state, term,
                                       int(spp_rounds))
        else:
            state = _render_jit(packed, layout, config, state, term,
                                int(spp_rounds))
    return state
