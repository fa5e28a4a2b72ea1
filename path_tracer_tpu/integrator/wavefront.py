"""Wavefront render loop: rounds of trace + scatter under one jit.

TPU equivalent of RunBasicRenderer / ResetBasicRenderer
(/root/reference/src/integrator/basic.cpp:285-332): the reference
dispatches one trace and one scatter compute pass per round with buffer
barriers; here a round is one iteration of a lax.fori_loop over the pure
(trace, scatter, accumulate, respawn) step -- XLA owns scheduling and
the "barrier" is dataflow.

The accumulator is (N, 3) XYZ + (N,) counts (lane == pixel), merged into
an image by integrator.resolve.
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
from ..ops.intersect import SceneLayout, trace
from .scatter import scatter
from .state import merge_paths, new_paths


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


def reset(packed, config: RenderConfig, seed, lane=None):
    """ResetBasicRenderer: fresh paths + camera rays + cleared accumulator.

    `lane` optionally restricts this state to a slice of the image's
    pixels (for pixel-sharded rendering); defaults to all pixels.
    """
    if lane is None:
        lane = jnp.arange(config.width * config.height, dtype=jnp.int32)
    n = lane.shape[0]
    rng = Rng.seed(lane.astype(jnp.uint32), seed)
    state, origin, direction = new_paths(
        packed, config.camera_index, config.camera_model,
        config.width, config.height, rng, config.flags, lane)
    accum = dict(
        xyz=jnp.zeros((3, n), jnp.float32),
        count=jnp.zeros((n,), jnp.float32),
    )
    return dict(path=state, origin=origin, direction=direction,
                accum=accum, rng_state=rng.state, lane=lane)


def render_rounds(packed, layout: SceneLayout, config: RenderConfig,
                  render_state, termination_probability, rounds=None):
    """Run `rounds` trace+scatter rounds, returning the new render state.

    Pure function of (packed, render_state); jit with layout/config
    static. One round advances every path by one vertex; terminated
    paths deposit their sample and respawn at their pixel
    (basic_scatter.glsl:344-359).
    """
    rounds = config.rounds_per_call if rounds is None else rounds

    def one_round(_, rs):
        rng = Rng(rs['rng_state'])
        hit = trace(packed, layout, rs['origin'], rs['direction'])
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

    return jax.lax.fori_loop(0, rounds, one_round, render_state)


@partial(jax.jit, static_argnames=('layout', 'config', 'rounds'))
def _render_jit(packed, layout, config, render_state, termination_probability,
                rounds):
    return render_rounds(packed, layout, config, render_state,
                         termination_probability, rounds)


def render(packed, config: RenderConfig, spp_rounds, seed=0,
           termination_probability=0.05, layout=None, state=None):
    """Convenience driver: reset (unless resuming) + N rounds.

    spp_rounds is the number of wavefront rounds; expected samples per
    pixel is roughly rounds / E[path length]. Returns the render state
    (pass back via `state=` to continue progressive accumulation).
    """
    layout = layout or SceneLayout.from_packed(packed)
    if state is None:
        state = reset(packed, config, seed)
    state = _render_jit(packed, layout, config, state,
                        jnp.float32(termination_probability), int(spp_rounds))
    return state
