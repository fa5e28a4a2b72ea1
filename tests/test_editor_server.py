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


def test_editor_assets_and_cameras(tmp_path):
    """The reference's asset browsers + camera inspector
    (imgui_main.cpp:212-302, 550-763): texture/prefab import, skybox
    assignment, prefab instantiation, material clone/delete, camera
    projection + render-camera selection."""
    from path_tracer_tpu.utils.image import save_hdr, save_png

    session = Session(make_default_scene(), width=48, height=27)
    server = ViewerServer(session, port=0)
    server.serve_background()
    base = f'http://127.0.0.1:{server.port}'
    try:
        # --- texture import (PNG reflectance + HDR radiance) ------------
        png_path = os.path.join(tmp_path, 'check.png')
        save_png(png_path, np.tile(np.asarray(
            [[[0.8, 0.2, 0.2, 1.0]]], np.float32), (8, 8, 1)))
        hdr_path = os.path.join(tmp_path, 'sky.hdr')
        save_hdr(hdr_path, np.full((8, 16, 3), 0.5, np.float32))
        t_png = _post(base, '/texture/import', {'path': png_path})
        t_hdr = _post(base, '/texture/import', {'path': hdr_path})
        doc = _get(base, '/scene')
        assert doc['textures'][t_png['index']] == 'check.png'
        assert session.scene.textures[t_hdr['index']].type == 2  # radiance

        # --- skybox set/clear flows through the dirty flags -------------
        _post(base, '/skybox/set', {'index': t_hdr['index']})
        assert session.scene.dirty_flags != 0
        _png(base)
        doc = _get(base, '/scene')
        assert doc['skybox'] == t_hdr['index']

        # --- material texture assignment + clone/delete -----------------
        plane = next(e for e in _get(base, '/scene')['entities']
                     if e['name'] == 'Plane')
        mat = plane['material']
        _post(base, '/material/update',
              {'index': mat, 'field': 'base_texture',
               'value': t_png['index']})
        doc = _get(base, '/scene')
        got = doc['materials'][mat]['params']['base_texture']['value']
        assert got == t_png['index']
        clone = _post(base, '/material/clone', {'index': mat})
        doc = _get(base, '/scene')
        assert doc['materials'][clone['index']]['name'].endswith('(copy)')
        n = len(doc['materials'])
        _post(base, '/material/delete', {'index': clone['index']})
        assert len(_get(base, '/scene')['materials']) == n - 1

        # --- OBJ prefab import + instantiation ---------------------------
        obj_path = os.path.join(tmp_path, 'tri.obj')
        with open(obj_path, 'w') as f:
            f.write('v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\n'
                    'f 1//1 2//1 3//1\n')
        pf = _post(base, '/prefab/import', {'path': obj_path})
        doc = _get(base, '/scene')
        assert len(doc['prefabs']) == pf['index'] + 1
        n_ent = len(doc['entities'])
        inst = _post(base, '/prefab/instantiate', {'index': pf['index']})
        doc = _get(base, '/scene')
        assert len(doc['entities']) > n_ent
        assert any(e['id'] == inst['id'] for e in doc['entities'])
        _png(base)  # recompiles with the new mesh instance

        # --- second camera: thin-lens params + render-camera switch -----
        cam = _post(base, '/entity/create', {'type': 'camera'})
        _post(base, '/entity/update',
              {'id': cam['id'], 'camera_model': 1,
               'aperture_diameter_in_mm': 4.0, 'focus_distance': 2.5,
               'transform': {'position': [0.0, -3.0, 1.0]}})
        doc = _get(base, '/scene')
        c = next(e for e in doc['entities'] if e['id'] == cam['id'])
        assert c['camera']['model'] == 1
        assert abs(c['camera']['focus_distance'] - 2.5) < 1e-6
        assert doc['render_camera'] != cam['id']
        _post(base, '/entity/update',
              {'id': cam['id'], 'render_camera': True})
        _png(base)  # recompile picks up the new camera + model
        doc = _get(base, '/scene')
        assert doc['render_camera'] == cam['id']
        assert session.config.camera_model == 1
    finally:
        server.shutdown()
