"""Checkpoint/resume and the CLI entry point."""

import os

import numpy as np

from path_tracer_tpu import RenderConfig, compile_scene, SceneLayout
from path_tracer_tpu.integrator.checkpoint import load_render_state, save_render_state
from path_tracer_tpu.integrator.wavefront import render, reset
from path_tracer_tpu.scene.procedural import make_cornell_scene


def test_checkpoint_resume_bitwise(tmp_path):
    scene = make_cornell_scene()
    packed = compile_scene(scene, aspect_ratio=2.0)
    layout = SceneLayout.from_packed(packed)
    config = RenderConfig(width=16, height=8)

    st = render(packed, config, 10, seed=2, layout=layout)
    path = os.path.join(tmp_path, 'ckpt.npz')
    save_render_state(path, st)

    # Continue 10 more rounds directly...
    st_direct = render(packed, config, 10, layout=layout, state=st)

    # ...vs reload from disk and continue.
    fresh = reset(packed, config, 0)
    st_loaded = load_render_state(path, fresh)
    st_resumed = render(packed, config, 10, layout=layout, state=st_loaded)

    np.testing.assert_array_equal(np.asarray(st_direct['accum']['xyz']),
                                  np.asarray(st_resumed['accum']['xyz']))


def test_cli_demo_render(tmp_path):
    from path_tracer_tpu.__main__ import main
    out = os.path.join(tmp_path, 'demo.png')
    code = main(['demo', 'cornell', out, '--width', '32', '--height', '16',
                 '--rounds', '8', '--tonemap', 'aces'])
    assert code == 0
    assert os.path.getsize(out) > 100


def test_cli_scene_file_render(tmp_path):
    from path_tracer_tpu.__main__ import main
    from path_tracer_tpu.scene.serializer import save_scene
    scene_path = os.path.join(tmp_path, 's', 'scene.json')
    save_scene(scene_path, make_cornell_scene())
    out = os.path.join(tmp_path, 'render.png')
    code = main(['render', scene_path, out, '--width', '32', '--height', '16',
                 '--rounds', '4'])
    assert code == 0
    assert os.path.exists(out)
