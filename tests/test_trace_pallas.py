"""Packet-trace kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from path_tracer_tpu.core.constants import HIT_TIME_LIMIT
from path_tracer_tpu.ops import trace_pallas
from path_tracer_tpu.scene.compile import compile_scene
from path_tracer_tpu.scene.model import Scene
from path_tracer_tpu.scene.procedural import torus
from tests.test_trace import _brute_force_t, _mesh_scene, _random_rays


def test_packet_trace_matches_brute_force():
    scene = _mesh_scene(torus(6, 4))
    packed = compile_scene(scene)
    n = 1024  # one packet
    origin, direction = _random_rays(n, seed=3)
    t_in = jnp.full((n,), HIT_TIME_LIMIT, jnp.float32)
    t, face, normal, uv = trace_pallas.packet_trace(
        packed.trace_nodes, packed.trace_meta, packed.trace_tris,
        origin, direction, t_in, root=0, interpret=True)
    t_ref = _brute_force_t(packed, origin, direction)
    t_got = np.where(np.asarray(face) >= 0, np.asarray(t), np.inf)
    np.testing.assert_allclose(t_got, t_ref, rtol=1e-4, atol=1e-5)
    # Interpolated normals are unit-ish and face the rays on hits.
    hits = np.asarray(face) >= 0
    assert hits.any()
    nn = np.asarray(normal)[:, hits]
    lens = np.linalg.norm(nn, axis=0)
    assert (lens > 0.5).all() and (lens < 1.5).all()
    # UVs within [0, 1] for the torus parameterization.
    uvs = np.asarray(uv)[:, hits]
    assert (uvs >= -1e-3).all() and (uvs <= 1 + 1e-3).all()


def test_packet_trace_respects_t_in():
    scene = _mesh_scene(torus(6, 4))
    packed = compile_scene(scene)
    n = 256
    origin, direction = _random_rays(n, seed=4)
    # Zero reach: nothing may be hit.
    t_in = jnp.zeros((n,), jnp.float32)
    t, face, normal, uv = trace_pallas.packet_trace(
        packed.trace_nodes, packed.trace_meta, packed.trace_tris,
        origin, direction, t_in, root=0, interpret=True)
    assert (np.asarray(face) == -1).all()


def test_packet_trace_padding():
    scene = _mesh_scene(torus(6, 4))
    packed = compile_scene(scene)
    n = 300  # not a packet multiple
    origin, direction = _random_rays(n, seed=5)
    t_in = jnp.full((n,), HIT_TIME_LIMIT, jnp.float32)
    t, face, normal, uv = trace_pallas.packet_trace(
        packed.trace_nodes, packed.trace_meta, packed.trace_tris,
        origin, direction, t_in, root=0, interpret=True)
    assert t.shape == (n,)
    t_ref = _brute_force_t(packed, origin, direction)
    t_got = np.where(np.asarray(face) >= 0, np.asarray(t), np.inf)
    np.testing.assert_allclose(t_got, t_ref, rtol=1e-4, atol=1e-5)
