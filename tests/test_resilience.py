"""Failure detection/recovery (utils/resilience.py) and structured
logging (utils/log.py)."""

import json
import os

import numpy as np
import pytest

from path_tracer_tpu.scene.procedural import make_cornell_scene
from path_tracer_tpu.utils import log
from path_tracer_tpu.utils.resilience import RenderFailure, render_resilient

W, H = 16, 8


def test_recovery_matches_uninterrupted(tmp_path):
    """A device failure mid-render recovers from the checkpoint and
    produces bitwise the same accumulator as an uninterrupted run."""
    scene = make_cornell_scene()
    ckpt = os.path.join(tmp_path, 'r.npz')

    clean = render_resilient(scene, W, H, 12, seed=3,
                             checkpoint_path=None, checkpoint_every=4)

    boom = {'armed': True}

    def inject(done):
        if done == 8 and boom['armed']:
            boom['armed'] = False
            raise RuntimeError('TPU worker process crashed or restarted')

    scene2 = make_cornell_scene()
    recovered = render_resilient(scene2, W, H, 12, seed=3,
                                 checkpoint_path=ckpt, checkpoint_every=4,
                                 _inject_failure=inject)
    assert not boom['armed']  # the failure really fired
    np.testing.assert_array_equal(
        np.asarray(clean['accum']['xyz']),
        np.asarray(recovered['accum']['xyz']))
    # Final checkpoint exists and records full progress.
    assert os.path.exists(ckpt)
    with open(ckpt + '.rounds') as f:
        assert int(f.read()) == 12


def test_resume_across_processes(tmp_path):
    """resume=True continues a checkpointed render identically to one
    uninterrupted run (the elastic/new-process path)."""
    scene = make_cornell_scene()
    ckpt = os.path.join(tmp_path, 'r.npz')
    clean = render_resilient(make_cornell_scene(), W, H, 12, seed=3,
                             checkpoint_every=4)

    render_resilient(scene, W, H, 8, seed=3, checkpoint_path=ckpt,
                     checkpoint_every=4)
    resumed = render_resilient(make_cornell_scene(), W, H, 12, seed=3,
                               checkpoint_path=ckpt, checkpoint_every=4,
                               resume=True)
    np.testing.assert_array_equal(
        np.asarray(clean['accum']['xyz']),
        np.asarray(resumed['accum']['xyz']))


def test_persistent_failure_raises(tmp_path):
    def always_fail(done):
        raise RuntimeError('device gone')

    with pytest.raises(RenderFailure):
        render_resilient(make_cornell_scene(), W, H, 8, seed=0,
                         checkpoint_path=os.path.join(tmp_path, 'c.npz'),
                         checkpoint_every=4, max_retries=1,
                         _inject_failure=always_fail)


def test_structured_log_events(tmp_path):
    path = os.path.join(tmp_path, 'events.jsonl')
    log.enable(path)
    try:
        render_resilient(make_cornell_scene(), W, H, 4, seed=0,
                         checkpoint_path=os.path.join(tmp_path, 'c.npz'),
                         checkpoint_every=2)
    finally:
        log.disable()
    with open(path) as f:
        events = [json.loads(line) for line in f]
    kinds = {e['kind'] for e in events}
    assert 'compile.pack' in kinds
    assert 'render.dispatch' in kinds
    assert 'checkpoint.save' in kinds
    assert 'resilience.progress' in kinds
    # Events are well-formed: monotonic-ish timestamps, numeric fields.
    assert all(isinstance(e['ts'], (int, float)) for e in events)
    disp = [e for e in events if e['kind'] == 'render.dispatch']
    assert disp[0]['lanes'] == W * H and disp[0]['rounds'] == 2
