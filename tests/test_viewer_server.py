"""Interactive HTTP viewer: page, progressive frames, move, pick."""

import json
import urllib.request

import numpy as np

from path_tracer_tpu.app import Session
from path_tracer_tpu.scene.procedural import make_default_scene
from path_tracer_tpu.viewer.server import ViewerServer


def test_viewer_server_end_to_end():
    session = Session(make_default_scene(), width=64, height=36)
    server = ViewerServer(session, port=0)  # ephemeral port
    server.serve_background()
    base = f'http://127.0.0.1:{server.port}'
    try:
        page = urllib.request.urlopen(base + '/').read().decode()
        assert 'path_tracer_tpu' in page and '/frame.png' in page

        png = urllib.request.urlopen(base + '/frame.png?mode=render').read()
        assert png[:8] == b'\x89PNG\r\n\x1a\n'
        frame0 = session.frame_index
        png2 = urllib.request.urlopen(
            base + '/frame.png?mode=render&tonemap=3').read()
        assert png2[:8] == b'\x89PNG\r\n\x1a\n'
        assert session.frame_index == frame0 + 1  # progressive advance

        # Preview mode does not advance accumulation.
        png3 = urllib.request.urlopen(base + '/frame.png?mode=2').read()
        assert png3[:8] == b'\x89PNG\r\n\x1a\n'
        assert session.frame_index == frame0 + 1

        status = json.loads(urllib.request.urlopen(base + '/status').read())
        assert status['frame'] == session.frame_index
        assert status['spp'] > 0

        # Camera move restarts accumulation on the next frame.
        pos0 = np.array(session.camera().transform.position, np.float32)
        req = urllib.request.Request(
            base + '/move', data=json.dumps({'delta': [0, 0, -1]}).encode(),
            method='POST')
        urllib.request.urlopen(req).read()
        assert not np.allclose(session.camera().transform.position, pos0)

        # Picking the plane at the bottom of the default scene.
        req = urllib.request.Request(
            base + '/pick', data=json.dumps({'x': 32, 'y': 33}).encode(),
            method='POST')
        res = json.loads(urllib.request.urlopen(req).read())
        assert res['shape'] >= 0
        assert res['name'] == 'Plane'
    finally:
        server.shutdown()
