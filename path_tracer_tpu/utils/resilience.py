"""Failure detection and recovery for long renders.

The reference has no failure story at all: a lost Vulkan device kills
the process and the accumulated image with it (SURVEY.md section 5). On
TPU the analogous failure is a crashed/restarted device worker, which
invalidates every live device buffer in the process. This module makes
long renders survive that:

* the HOST scene document plus a periodic render-state checkpoint
  (integrator/checkpoint.py, a single npz) are the durable truth;
* everything device-side (the PackedScene pytree, the render state) is
  rebuilt from them on failure;
* progress monotonically advances in checkpoint units, so a failure
  costs at most `checkpoint_every` rounds of work.

`render_resilient` drives chunked rendering with retry-and-resume.
Recovery is attempted in-process first (on CPU and healthy backends a
transient error just retries); if the backend itself is poisoned -- on
this runtime a dead TPU worker can leave the client unusable -- the
rendered checkpoint still lets the *next* process resume, which is what
the `--resume` CLI flag does.
"""

from __future__ import annotations

import os
import time

from . import log


class RenderFailure(RuntimeError):
    """Raised when a render chunk keeps failing after recovery retries."""


def _atomic_save(path, state):
    from ..integrator.checkpoint import save_render_state

    # np.savez appends '.npz' unless the name already ends with it.
    tmp = f'{path}.tmp.npz'
    save_render_state(tmp, state)
    os.replace(tmp, path)


def render_resilient(scene, width, height, total_rounds, *, seed=0,
                     camera_index=0, termination_probability=0.05,
                     checkpoint_path=None, checkpoint_every=64,
                     resume=False, max_retries=2, _inject_failure=None):
    """Render `total_rounds` wavefront rounds with checkpoint/recovery.

    Returns the final render state. `checkpoint_path` enables
    durability: progress is saved every `checkpoint_every` rounds and on
    completion; `resume=True` restarts from an existing checkpoint (the
    file records how many rounds it contains in a sidecar field via the
    accumulator's sample counts -- rounds themselves are re-derived from
    the caller's bookkeeping file `<path>.rounds`).

    `_inject_failure` (tests only): (round_index -> None) callback run
    before each chunk; raising from it exercises the recovery path.
    """
    from .. import RenderConfig, SceneLayout, compile_scene
    from ..integrator.checkpoint import load_render_state
    from ..integrator.wavefront import render, reset

    def build():
        packed = compile_scene(scene, aspect_ratio=width / height)
        layout = SceneLayout.from_packed(packed)
        camera_model = getattr(packed, 'host_camera_models',
                               (0,))[camera_index]
        config = RenderConfig(width=width, height=height,
                              camera_index=camera_index,
                              camera_model=camera_model)
        return packed, layout, config

    packed, layout, config = build()
    done = 0
    state = None
    rounds_file = f'{checkpoint_path}.rounds' if checkpoint_path else None
    if resume and checkpoint_path and os.path.exists(checkpoint_path):
        state = load_render_state(checkpoint_path,
                                  reset(packed, config, seed))
        if rounds_file and os.path.exists(rounds_file):
            with open(rounds_file) as f:
                done = int(f.read().strip() or 0)
        log.event('resilience.resume', path=checkpoint_path, rounds=done)
    if state is None:
        state = reset(packed, config, seed)

    retries = 0
    while done < total_rounds:
        chunk = min(checkpoint_every, total_rounds - done)
        try:
            if _inject_failure is not None:
                _inject_failure(done)
            state = render(packed, config, chunk, layout=layout,
                           state=state,
                           termination_probability=termination_probability)
            if checkpoint_path:
                _atomic_save(checkpoint_path, state)
                with open(rounds_file, 'w') as f:
                    f.write(str(done + chunk))
        except Exception as e:  # device loss, worker crash, injected
            retries += 1
            log.event('resilience.failure', at_round=done, retry=retries,
                      error=f'{type(e).__name__}: {e}')
            if retries > max_retries:
                raise RenderFailure(
                    f'render failed {retries} times at round {done}; '
                    f'last checkpoint: {checkpoint_path or "none"}') from e
            # Rebuild EVERYTHING device-side from host truth: the old
            # packed/state buffers may live on a dead device.
            time.sleep(min(2.0 ** retries, 10.0))
            packed, layout, config = build()
            if checkpoint_path and os.path.exists(checkpoint_path):
                state = load_render_state(checkpoint_path,
                                          reset(packed, config, seed))
                if rounds_file and os.path.exists(rounds_file):
                    with open(rounds_file) as f:
                        done = int(f.read().strip() or 0)
            else:
                state = reset(packed, config, seed)
                done = 0
            continue
        retries = 0
        done += chunk
        log.event('resilience.progress', rounds=done, total=total_rounds)
    return state
