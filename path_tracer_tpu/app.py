"""Interactive application session: the reference's editor loop as a library.

Headless equivalent of /root/reference/src/application/application.cpp:
the reference runs a GLFW window whose per-frame Update() applies camera
fly-controls, incrementally recompiles the scene (PackSceneData +
UpdateVulkanScene), restarts accumulation when anything changed, then
advances the path tracer by one or two rounds and resolves for display.

`Session` exposes exactly that loop for notebooks/scripts/a viewer
front-end: mutate the scene (or move the camera), call frame(), get a
resolved image; accumulation restarts automatically on changes
(application.cpp:86-124) and refines progressively otherwise.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .core.constants import TONE_MAPPING_MODE_CLAMP
from .utils import log
from .integrator.resolve import resolve
from .integrator.wavefront import RenderConfig, render, reset
from .ops.intersect import SceneLayout
from .scene.compile import compile_scene
from .scene.model import ENTITY_TYPE_CAMERA, make_transform_matrix
from .viewer import preview as preview_mod


class Session:
    """Progressive interactive render session over an editable scene."""

    def __init__(self, scene, width=960, height=540, camera_index=0,
                 termination_probability=0.05, generic_programs=True):
        self.scene = scene
        self.width = width
        self.height = height
        self.camera_index = camera_index
        self.termination_probability = termination_probability
        # Interactive sessions default to GENERIC programs: every
        # analytic shape type and material model is compiled in up
        # front (empty bucket groups; conservative scatter flags), so
        # no entity/material edit can change the program structure and
        # stall the editor on a relay recompile (measured 20 s for the
        # first entity of a new type, tools/measure_editor.py). Batch
        # renderers keep the faster specialized programs
        # (generic_programs=False, or the render() path which never
        # sets scene.compile_generic).
        self.generic_programs = generic_programs
        scene.compile_generic = generic_programs
        self.packed = None
        self.layout = None
        self.state = None
        self.frame_index = 0
        self._seed = 0
        self._recompile(full=True)

    # -- scene/camera mutation ------------------------------------------

    def set_scene(self, scene):
        """Replace the scene document (the editor's New/Open), full
        recompile + restart."""
        self.scene = scene
        scene.compile_generic = self.generic_programs
        self.packed = None
        self._recompile(full=True)

    def camera(self):
        cams = [e for e in self.scene.walk_entities()
                if e.type == ENTITY_TYPE_CAMERA]
        return cams[self.camera_index]

    def move_camera(self, delta=(0, 0, 0), rotate=(0, 0, 0)):
        """Fly-control analog (application.cpp:19-69): translate in the
        camera frame, rotate by euler deltas; restarts accumulation."""
        cam = self.camera()
        world = make_transform_matrix(cam.transform.position,
                                      cam.transform.rotation)
        local = np.asarray(delta, np.float32)
        cam.transform.position = (cam.transform.position
                                  + world[:3, :3] @ local)
        cam.transform.rotation = cam.transform.rotation + np.asarray(
            rotate, np.float32)
        from .scene.model import SCENE_DIRTY_CAMERAS
        self.scene.mark_dirty(SCENE_DIRTY_CAMERAS)

    # -- the frame loop --------------------------------------------------

    def _recompile(self, full=False):
        if full:
            self.scene.dirty_flags = 0xFFFFFFFF
        self.packed = compile_scene(self.scene, prev=self.packed,
                                    aspect_ratio=self.width / self.height)
        self.layout = SceneLayout.from_packed(self.packed)
        camera_model = getattr(self.packed, 'host_camera_models',
                               (0,))[self.camera_index]
        self.config = RenderConfig(width=self.width, height=self.height,
                                   camera_index=self.camera_index,
                                   camera_model=camera_model)
        self._restart()

    def _restart(self):
        self._seed += 1
        log.event('session.restart', seed=self._seed,
                  frame=self.frame_index)
        self.state = reset(self.packed, self.config, self._seed)

    def frame(self, rounds=None, tonemap_mode=TONE_MAPPING_MODE_CLAMP,
              brightness=1.0):
        """One Update(): recompile if dirty (restarting accumulation),
        advance the renderer, return the resolved (H, W, 3) image.

        Like the reference, a restart frame runs 2 rounds, a steady frame
        1 round (application.cpp:110-114), unless `rounds` overrides.
        """
        restarted = False
        if self.scene.dirty_flags:
            self._recompile()
            restarted = True
        n_rounds = rounds if rounds is not None else (2 if restarted else 1)
        # Issue small round counts as repeated 1-round calls: `rounds`
        # is a STATIC of the fused render program, so a restart frame's
        # rounds=2 would compile a second whole program through the
        # relay -- measured as an 18 s stall on the FIRST edit of a
        # session (tools/measure_editor.py). Re-dispatching the warm
        # 1-round program costs ~28 ms per extra round instead. Large
        # explicit overrides keep the fused single program (its compile
        # amortizes over repeated calls).
        if n_rounds <= 2:
            for _ in range(n_rounds):
                self.state = render(
                    self.packed, self.config, 1,
                    layout=self.layout, state=self.state,
                    termination_probability=self.termination_probability)
        else:
            self.state = render(
                self.packed, self.config, n_rounds,
                layout=self.layout, state=self.state,
                termination_probability=self.termination_probability)
        self.frame_index += 1
        return resolve(self.state['accum'], self.width, self.height,
                       brightness=brightness, mode=tonemap_mode,
                       lane=self.state['lane'])

    # -- editor services --------------------------------------------------

    def preview(self, mode=preview_mod.PREVIEW_RENDER_MODE_BASE_COLOR_SHADED,
                selected_shape=-1, brightness=1.0):
        """Real-time false-color preview through the session camera."""
        if self.scene.dirty_flags:
            self._recompile()
        cam = self.camera()
        world = jnp.asarray(make_transform_matrix(
            cam.transform.position, cam.transform.rotation))
        return preview_mod.render_preview(
            self.packed, self.layout, self.width, self.height, world,
            mode=mode, selected_shape=selected_shape, brightness=brightness)

    def pick(self, x, y):
        """Shape index under pixel (x, y), or -1 (mouse picking)."""
        if self.scene.dirty_flags:
            self._recompile()
        cam = self.camera()
        world = jnp.asarray(make_transform_matrix(
            cam.transform.position, cam.transform.rotation))
        return preview_mod.pick(self.packed, self.layout, self.width,
                                self.height, world, x, y)

    def samples_per_pixel(self):
        """Mean accumulated spp (reads back; call sparingly)."""
        return float(jnp.mean(self.state['accum']['count']))
