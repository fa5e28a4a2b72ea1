"""Multi-chip progressive rendering over a TPU device mesh.

The reference is single-GPU; its only "communication" is Vulkan
semaphores between queues (SURVEY.md section 2.3). The TPU-native
scaling axes are:

  * `pixels`: the framebuffer's path lanes are sharded across devices
    (each device owns a contiguous pixel slice -- the analogue of tiling
    the wavefront SSBOs). No collectives in the hot loop; the image is
    assembled from shards at resolve.
  * `batch`: every device renders the full image with an independent
    sample stream; per-device accumulators are merged with a psum.
    This is BASELINE.json's "progressive accumulation sharded across a
    TPU pod" configuration.

Both compose on a 2D ('batch', 'pixels') mesh: lanes shard over the
pixel axis, seeds decorrelate over the batch axis, and the accumulator
psum rides the batch axis only.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core.sampling import Rng
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


def render_sharded(packed, config: RenderConfig, rounds, mesh: Mesh,
                   seed=0, termination_probability=0.05, layout=None):
    """Render `rounds` wavefront rounds sharded over `mesh`.

    Returns a global accumulator dict (xyz (N,3), count (N,)) for the
    full image, already psum-merged over the batch axis. The scene is
    replicated; path state lives sharded on-device for the whole loop.
    """
    layout = layout or SceneLayout.from_packed(packed)
    # The sharded axis is the SLOT space: config.waves independent
    # sample waves of the pixel grid (slot = wave * n_pixels + lane;
    # wavefront.reset derives lane and RNG stream from the slot, so any
    # partition reproduces the single-device state slot-for-slot).
    n = config.waves * config.width * config.height
    n_pixel_shards = mesh.shape['pixels']
    n_batch = mesh.shape['batch']
    assert n % n_pixel_shards == 0, (n, n_pixel_shards)

    slot = jnp.arange(n, dtype=jnp.int32)
    # Per-batch-row seeds decorrelate sample streams.
    seeds = jnp.asarray(seed, jnp.uint32) + jnp.arange(n_batch, dtype=jnp.uint32)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P('pixels'), P('batch')),
        out_specs=(P(None, 'pixels'), P('pixels'), P('pixels')),
        check_vma=False,
    )
    def run(packed_rep, slot_shard, seed_shard):
        state = reset(packed_rep, config, seed_shard[0], slot_shard)
        # Same driver semantics as the single-chip path: the coherence
        # sort runs every round, shard-locally (it permutes a shard's
        # own lanes only, so it composes with shard_map; the psum merge
        # below re-aligns by lane id anyway).
        state = render_rounds(packed_rep, layout, config, state,
                              jnp.float32(termination_probability), rounds,
                              sort_each_round=wants_sort(config, layout))
        # Batch rows sort identically (same lanes, same seeds per row?
        # no -- rows have different streams), so slots can differ per
        # row; psum merging therefore requires slot-aligned lanes.
        # Un-permute each shard back to lane order before the psum.
        order = jnp.argsort(state['lane'])
        xyz = state['accum']['xyz'][:, order]
        count = state['accum']['count'][order]
        lane_sorted = state['lane'][order]
        xyz = jax.lax.psum(xyz, 'batch')
        count = jax.lax.psum(count, 'batch')
        return xyz, count, lane_sorted

    xyz, count, lane = jax.jit(run)(packed, slot, seeds)
    return dict(xyz=xyz, count=count, lane=lane)
