"""RenderConfig.waves: multi-sample-wave state, per-pixel resolve fold,
and sharded-slot-space equality.

The waves design (integrator/wavefront.py): the state holds
waves * width * height slots, slot -> pixel is slot % n_pixels, and the
RNG stream id is the slot itself, so wave copies of one pixel draw
independent streams and any sharded partition of the slot space
reproduces the single-device state slot-for-slot. resolve scatter-adds
XYZ/count per pixel before the divide.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from path_tracer_tpu import RenderConfig, compile_scene, resolve
from path_tracer_tpu.integrator.wavefront import render, reset
from path_tracer_tpu.parallel.render import make_mesh, render_sharded
from path_tracer_tpu.scene.procedural import make_cornell_scene

W, H = 32, 16


@pytest.fixture(scope='module')
def packed():
    return compile_scene(make_cornell_scene(), aspect_ratio=W / H)


def test_reset_waves_slots_and_streams(packed):
    config = RenderConfig(width=W, height=H, waves=3)
    state = reset(packed, config, seed=7)
    n_pix = W * H
    lane = np.asarray(state['lane'])
    assert lane.shape == (3 * n_pix,)
    # Each wave covers the full pixel grid.
    np.testing.assert_array_equal(lane, np.tile(np.arange(n_pix), 3))
    # Every slot gets a distinct RNG stream (seeded by slot, not lane).
    rng = np.asarray(state['rng_state'])
    assert len(np.unique(rng)) == 3 * n_pix
    # Wave 0 is bitwise the waves=1 state (same slots, same streams).
    base = reset(packed, RenderConfig(width=W, height=H), seed=7)
    np.testing.assert_array_equal(
        np.asarray(state['origin'])[:, :n_pix], np.asarray(base['origin']))
    np.testing.assert_array_equal(
        rng[:n_pix], np.asarray(base['rng_state']))


def test_resolve_folds_repeated_lanes_exactly():
    # Two slots of the same pixel: the fold must be sum(xyz)/sum(count).
    n_pix = W * H
    lane = jnp.concatenate([jnp.arange(n_pix, dtype=jnp.int32)] * 2)
    xyz = jnp.concatenate(
        [jnp.full((3, n_pix), 0.2), jnp.full((3, n_pix), 0.6)], axis=1)
    count = jnp.concatenate(
        [jnp.full((n_pix,), 1.0), jnp.full((n_pix,), 3.0)])
    img = np.asarray(resolve(dict(xyz=xyz, count=count), W, H, lane=lane))
    # Per pixel: (0.2 + 0.6) / (1 + 3) = 0.2 in XYZ, through the same
    # srgb transform a single slot with xyz=0.2/count=1 would take.
    ref = np.asarray(resolve(dict(xyz=jnp.full((3, n_pix), 0.2),
                                  count=jnp.ones((n_pix,))), W, H))
    np.testing.assert_allclose(img, ref, atol=1e-6)


@pytest.mark.slow
def test_waves_render_accumulates_and_agrees(packed):
    rounds = 24
    base = render(packed, RenderConfig(width=W, height=H), rounds, seed=3)
    multi = render(packed, RenderConfig(width=W, height=H, waves=4),
                   rounds, seed=3)
    c1 = float(jnp.sum(base['accum']['count']))
    c4 = float(jnp.sum(multi['accum']['count']))
    assert 3.5 < c4 / c1 < 4.5, (c1, c4)
    img1 = np.asarray(resolve(base['accum'], W, H, lane=base['lane']))
    img4 = np.asarray(resolve(multi['accum'], W, H, lane=multi['lane']))
    assert np.isfinite(img4).all()
    # Independent MC estimates of the same integral: agree within noise.
    assert np.abs(img4.mean() - img1.mean()) / (img1.mean() + 1e-3) < 0.1
    # ... but not bitwise (wave >= 1 streams actually contributed).
    assert np.abs(img4 - img1).max() > 1e-4


@pytest.mark.slow
def test_waves_sharded_matches_single_device(packed):
    """Pixel-sharding the waves slot space is a pure partition: bitwise
    equal to the single-device waves render."""
    rounds = 16
    config = RenderConfig(width=W, height=H, waves=2)
    single = render(packed, config, rounds, seed=5)
    img_single = np.asarray(
        resolve(single['accum'], W, H, lane=single['lane']))

    mesh = make_mesh(jax.devices()[:8], batch=1, pixels=8)
    accum = render_sharded(packed, config, rounds, mesh, seed=5)
    img_sharded = np.asarray(resolve(accum, W, H, lane=accum['lane']))
    np.testing.assert_allclose(img_sharded, img_single, atol=1e-6)


def test_permute_rows_waves_roundtrip():
    """Forward interleave then inverse must be the identity, and the
    forward output must equal the brute-force row-granular definition:
    output 128-lane row q * W + w holds wave w's sorted ranks
    [q*128, (q+1)*128)."""
    import jax.numpy as jnp
    from path_tracer_tpu.ops.intersect import permute_rows_waves

    rng = np.random.default_rng(3)
    W_, rows1 = 4, 3
    n1 = rows1 * 128
    n = W_ * n1
    rows = [jnp.asarray(rng.normal(0, 1, n).astype(np.float32)),
            jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32)),
            jnp.asarray(rng.normal(0, 1, n).astype(np.float32))]
    key = rng.integers(0, 999, n)
    perm_w = jnp.asarray(
        np.argsort(key.reshape(W_, n1), axis=1).astype(np.int32))
    inv_w = jnp.argsort(perm_w, axis=1)

    fwd = permute_rows_waves(rows, perm_w)
    pw = np.asarray(perm_w)
    for r, f in zip(rows, fwd):
        r, f = np.asarray(r), np.asarray(f)
        sorted_w = np.stack([r[w * n1 + pw[w]] for w in range(W_)])
        expect = (sorted_w.reshape(W_, rows1, 128)
                  .swapaxes(0, 1).reshape(n))
        np.testing.assert_array_equal(f, expect)

    back = permute_rows_waves(fwd, inv_w, inverse=True)
    for r, b in zip(rows, back):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(b))


@pytest.mark.slow
def test_interleaved_sort_trace_matches_unsorted():
    """trace(sort_packets=True, sort_waves=W) in interpret mode must
    reproduce the unsorted kernel's hits lane for lane (the interleave
    is a pure performance permutation)."""
    import jax.numpy as jnp
    from path_tracer_tpu.ops.intersect import SceneLayout, trace
    from path_tracer_tpu.scene import compile as compile_mod
    from path_tracer_tpu.scene.model import (
        ENTITY_TYPE_CAMERA, ENTITY_TYPE_MESH_INSTANCE, Scene)

    rng = np.random.default_rng(11)
    scene = Scene()
    pos = rng.normal(0, 1, (40, 3)).astype(np.float32)
    f = rng.integers(0, 40, (48, 3)).astype(np.int32)
    nrm = rng.normal(0, 1, (40, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    uv = rng.uniform(0, 1, (40, 2)).astype(np.float32)
    mesh = scene.create_mesh(name='blob', positions=pos, normals=nrm,
                             uvs=uv, faces=f)
    scene.create_entity(ENTITY_TYPE_CAMERA)
    mat = scene.create_material(1)
    e = scene.create_entity(ENTITY_TYPE_MESH_INSTANCE, mesh=mesh,
                            material=mat)
    e.transform.scale = np.float32(2.0) * np.ones(3, np.float32)
    packed = compile_mod.compile_scene(scene)
    layout = SceneLayout.from_packed(packed)
    assert layout.packet_mode == 'inst' and layout.inst_fit

    n = 4 * 512
    o = jnp.asarray(rng.uniform(-4, 4, (3, n)).astype(np.float32))
    d = rng.normal(0, 1, (3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    d = jnp.asarray(d)

    plain = trace(packed, layout, o, d, use_packet=True, interpret=True)
    inter = trace(packed, layout, o, d, use_packet=True, interpret=True,
                  sort_packets=True, sort_waves=4)
    for key in ('time', 'shape', 'primitive'):
        np.testing.assert_array_equal(np.asarray(plain[key]),
                                      np.asarray(inter[key]))


def test_chunked_scatter_side_bitwise_equal(packed):
    """The SCATTER_CHUNK_LANES chunking of the round's scatter side
    (integrator/wavefront.py) must be a pure fusion-shape change:
    forcing chunks at CPU scale renders bit-for-bit the same state as
    the whole-state path (on-chip A/B: tools/exp_waves10.py)."""
    import path_tracer_tpu.integrator.wavefront as wf

    config = RenderConfig(width=32, height=16, waves=2)
    a = render(packed, config, 4, seed=5)
    old = wf.SCATTER_CHUNK_LANES
    wf.SCATTER_CHUNK_LANES = 256     # 1024 lanes -> 4 chunks
    try:
        b = render(packed, config, 4, seed=5)
    finally:
        wf.SCATTER_CHUNK_LANES = old
    for va, vb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
