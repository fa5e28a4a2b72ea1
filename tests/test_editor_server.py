"""Editor loop over HTTP: inspect, mutate, create/delete, save/reload.

The reference's editor semantics (imgui_main.cpp browsers + inspectors
+ New/Open/Save) driven end-to-end through the web server: every edit
must flow through the scene dirty flags into an incremental recompile
and accumulation restart on the next frame.
"""

import json
import os
import urllib.request

import numpy as np

from path_tracer_tpu.app import Session
from path_tracer_tpu.scene.procedural import make_default_scene
from path_tracer_tpu.viewer.server import ViewerServer


def _get(base, path):
    return json.loads(urllib.request.urlopen(base + path).read())


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(), method='POST')
    return json.loads(urllib.request.urlopen(req).read())


def _png(base):
    return urllib.request.urlopen(base + '/frame.png?mode=render').read()


def test_editor_end_to_end(tmp_path):
    session = Session(make_default_scene(), width=48, height=27)
    server = ViewerServer(session, port=0)
    server.serve_background()
    base = f'http://127.0.0.1:{server.port}'
    try:
        doc = _get(base, '/scene')
        assert doc['entities'][0]['type'] == 'root'
        names = [e['name'] for e in doc['entities']]
        assert 'Plane' in names

        # --- material edit changes the next frame -----------------------
        plane = next(e for e in doc['entities'] if e['name'] == 'Plane')
        mat = plane['material']
        assert mat is not None
        before = _png(base)
        _post(base, '/material/update',
              {'index': mat, 'field': 'base_color',
               'value': [0.9, 0.05, 0.05]})
        assert session.scene.dirty_flags != 0
        after = _png(base)          # triggers recompile + restart
        assert session.scene.dirty_flags == 0
        assert after != before
        doc = _get(base, '/scene')
        got = doc['materials'][mat]['params']['base_color']['value']
        np.testing.assert_allclose(got, [0.9, 0.05, 0.05], atol=1e-6)

        # Unknown fields are rejected, not silently dropped.
        try:
            _post(base, '/material/update',
                  {'index': mat, 'field': 'nope', 'value': 1})
            raise AssertionError('expected 400')
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # --- transform edit through the inspector -----------------------
        eid = plane['id']
        _post(base, '/entity/update',
              {'id': eid, 'transform': {'position': [0.0, 0.0, -0.25]}})
        _png(base)
        doc = _get(base, '/scene')
        plane = next(e for e in doc['entities'] if e['id'] == eid)
        np.testing.assert_allclose(plane['transform']['position'],
                                   [0, 0, -0.25], atol=1e-6)

        # --- entity create + delete ------------------------------------
        created = _post(base, '/entity/create',
                        {'type': 'sphere', 'name': 'EditSphere'})
        _post(base, '/entity/update',
              {'id': created['id'], 'material': mat,
               'transform': {'position': [0.0, 0.0, 1.0]}})
        _png(base)
        doc = _get(base, '/scene')
        assert any(e['name'] == 'EditSphere' for e in doc['entities'])
        n_before = len(doc['entities'])
        _post(base, '/entity/delete', {'id': created['id']})
        doc = _get(base, '/scene')
        assert len(doc['entities']) == n_before - 1

        # --- new material ------------------------------------------------
        res = _post(base, '/material/create', {'type': 'metal'})
        doc = _get(base, '/scene')
        assert doc['materials'][res['index']]['type'] == 'BasicMetal'

        # --- save -> open round-trips the edit --------------------------
        path = os.path.join(tmp_path, 'edited', 'scene.json')
        _post(base, '/scene/save', {'path': path})
        _post(base, '/scene/open', {'path': path})
        doc = _get(base, '/scene')
        mats = {m['name']: m for m in doc['materials']}
        reloaded = [m for m in doc['materials']
                    if m['params'].get('base_color', {}).get('value')
                    and np.allclose(m['params']['base_color']['value'],
                                    [0.9, 0.05, 0.05], atol=1e-5)]
        assert reloaded, f'edited color lost after reload: {list(mats)}'
        assert _png(base)[:8] == b'\x89PNG\r\n\x1a\n'

        # --- picking returns the entity id for hierarchy selection ------
        res = _post(base, '/pick', {'x': 24, 'y': 25})
        if res['shape'] >= 0:
            assert res['entity'] >= 0
    finally:
        server.shutdown()
