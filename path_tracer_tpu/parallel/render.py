"""Multi-chip progressive rendering over a TPU device mesh.

The reference is single-GPU; its only "communication" is Vulkan
semaphores between queues (SURVEY.md section 2.3). The TPU-native
scaling axes are:

  * `pixels`: the framebuffer's path lanes are sharded across devices
    (each device owns a contiguous slice of the slot space -- the
    analogue of tiling the wavefront SSBOs). No collectives in the hot
    loop; the image is assembled from shards at resolve.
  * `batch`: every device renders the full image with an independent
    sample stream; per-device accumulators are merged with a psum.
    This is BASELINE.json's "progressive accumulation sharded across a
    TPU pod" configuration.

Both compose on a 2D ('batch', 'pixels') mesh: lanes shard over the
pixel axis, seeds decorrelate over the batch axis, and the accumulator
psum rides the batch axis only.

The render state itself lives SHARDED on-device between calls: the
global state pytree stacks every (batch, pixel-shard) state along the
lane axis (n_batch * config.waves * W * H lanes total), so a sharded
render is progressive and resumable exactly like the single-chip path
-- pass the returned state back via `state=`, or through
integrator.checkpoint save/load (the state is one pytree of arrays).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..integrator.wavefront import (
    RenderConfig, render_rounds, reset, wants_sort)
from ..ops.intersect import SceneLayout


def make_mesh(devices=None, batch=1, pixels=None):
    """Build a ('batch', 'pixels') mesh over the given (or all) devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if pixels is None:
        pixels = n // batch
    if batch * pixels != n or pixels < 1:
        raise ValueError(
            f'mesh wants batch*pixels = {batch}*{pixels} devices but the '
            f'runtime exposes {n}; for virtual multi-device testing run '
            f'under JAX_PLATFORMS=cpu with '
            f'XLA_FLAGS=--xla_force_host_platform_device_count=<n>')
    arr = np.asarray(devices).reshape(batch, pixels)
    return Mesh(arr, ('batch', 'pixels'))


def _lane_specs(tree):
    """PartitionSpec pytree: every state leaf is lane-sharded on its
    LAST axis over both mesh axes (batch-major: the global state
    concatenates batch replicas, each wave-major over slots)."""
    return jax.tree_util.tree_map(
        lambda x: P(*([None] * (x.ndim - 1) + [('batch', 'pixels')])), tree)


def reset_sharded(packed, config: RenderConfig, mesh: Mesh, seed=0):
    """Fresh sharded render state: n_batch independent sample streams of
    the config.waves * W * H slot space, lane-sharded over 'pixels'."""
    n = config.waves * config.width * config.height
    n_batch = mesh.shape['batch']
    assert n % mesh.shape['pixels'] == 0, (n, mesh.shape)
    slot = jnp.arange(n, dtype=jnp.int32)
    seeds = (jnp.asarray(seed, jnp.uint32)
             + jnp.arange(n_batch, dtype=jnp.uint32))

    template = jax.eval_shape(
        lambda s: reset(packed, config, jnp.uint32(0), s),
        jax.ShapeDtypeStruct((n // mesh.shape['pixels'],), jnp.int32))
    out_specs = _lane_specs(template)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P('pixels'), P('batch')),
             out_specs=out_specs, check_vma=False)
    def run(packed_rep, slot_shard, seed_shard):
        return reset(packed_rep, config, seed_shard[0], slot_shard)

    return jax.jit(run)(packed, slot, seeds)


def render_sharded_state(packed, config: RenderConfig, rounds, mesh: Mesh,
                         state, termination_probability=0.05, layout=None):
    """Advance a sharded render state by `rounds` wavefront rounds.

    Pure and resumable: feed the result back in to continue progressive
    accumulation (the multi-chip analogue of wavefront.render(state=)).
    The per-round coherence sort runs shard-locally (a shard's own
    lanes only, so it composes with shard_map; results are identical
    because trace un-permutes its outputs internally)."""
    layout = layout or SceneLayout.from_packed(packed)
    specs = _lane_specs(state)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), specs, P()),
             out_specs=specs, check_vma=False)
    def run(packed_rep, state_shard, term):
        return render_rounds(packed_rep, layout, config, state_shard, term,
                             rounds, sort_each_round=wants_sort(config,
                                                                layout))

    return jax.jit(run)(packed, state, jnp.float32(termination_probability))


def merge_accumulator(mesh: Mesh, state):
    """Global accumulator from a sharded state: psum over the batch
    replicas, lane-aligned (each batch row's slots are reordered to
    slot order first -- the state is never permuted by the render loop,
    so this is a safety net, not a hot path)."""
    specs = _lane_specs(state)

    @partial(shard_map, mesh=mesh,
             in_specs=(specs,),
             out_specs=(P(None, 'pixels'), P('pixels'), P('pixels')),
             check_vma=False)
    def run(state_shard):
        order = jnp.argsort(state_shard['lane'], stable=True)
        xyz = jax.lax.psum(state_shard['accum']['xyz'][:, order], 'batch')
        count = jax.lax.psum(state_shard['accum']['count'][order], 'batch')
        return xyz, count, state_shard['lane'][order]

    xyz, count, lane = jax.jit(run)(state)
    return dict(xyz=xyz, count=count, lane=lane)


def render_sharded(packed, config: RenderConfig, rounds, mesh: Mesh,
                   seed=0, termination_probability=0.05, layout=None,
                   state=None, return_state=False):
    """Render `rounds` wavefront rounds sharded over `mesh`.

    Returns the merged global accumulator dict (xyz (3, N), count (N,),
    lane (N,)) -- psum-merged over the batch axis and resolvable by
    integrator.resolve. With return_state=True, returns
    (accumulator, state); pass the state back via `state=` to continue
    progressive accumulation mid-flight (checkpointable between calls
    with integrator.checkpoint save/load like the single-chip state)."""
    layout = layout or SceneLayout.from_packed(packed)
    if state is None:
        state = reset_sharded(packed, config, mesh, seed)
    state = render_sharded_state(packed, config, rounds, mesh, state,
                                 termination_probability, layout)
    accum = merge_accumulator(mesh, state)
    if return_state:
        return accum, state
    return accum
