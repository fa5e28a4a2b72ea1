"""Editor robustness: every endpoint returns a clean error on bad
input and the session stays renderable (VERDICT round-3 weak item 5).

The sweep drives the REAL HTTP server (not handle_post directly) so
the error envelope in do_POST -- including body parsing -- is what is
under test. After every failed request the scene document and a frame
render must still work, and the scene must be unchanged where the
request was rejected.
"""

import json
import urllib.error
import urllib.request

import pytest

from path_tracer_tpu.app import Session
from path_tracer_tpu.scene.procedural import make_default_scene
from path_tracer_tpu.viewer.server import ViewerServer


@pytest.fixture(scope='module')
def server():
    session = Session(make_default_scene(), width=32, height=16)
    srv = ViewerServer(session, port=0)
    srv.serve_background()
    yield srv
    srv._server.shutdown()


def _post_raw(srv, path, data):
    req = urllib.request.Request(
        f'http://127.0.0.1:{srv.port}{path}', data=data, method='POST')
    try:
        resp = urllib.request.urlopen(req)
        return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b'{}')


def _post(srv, path, body):
    return _post_raw(srv, path, json.dumps(body).encode())


def _alive(srv):
    """The session must still serve the scene doc and a rendered frame."""
    base = f'http://127.0.0.1:{srv.port}'
    doc = json.loads(urllib.request.urlopen(base + '/scene').read())
    assert doc['entities']
    png = urllib.request.urlopen(base + '/frame.png?mode=render').read()
    assert png[:4] == b'\x89PNG'


BAD_REQUESTS = [
    # (endpoint, body) -> every one must come back 400 with an error
    # message, never a 500 or a broken connection.
    ('/pick', {}),                                   # missing x/y
    ('/pick', {'x': 'left', 'y': 0}),                # wrong type
    ('/entity/update', {'id': 99999}),               # unknown entity
    ('/entity/update', {'id': 'root'}),              # non-int id
    ('/entity/create', {'type': 'tetrahedron'}),     # unknown type
    ('/entity/create', {'type': 'mesh', 'mesh': 'no-such-mesh'}),
    ('/entity/create', {}),                          # missing type
    ('/entity/delete', {'id': 99999}),
    ('/material/update', {'index': 0, 'field': 'no_such_field',
                          'value': 1}),
    ('/material/update', {'index': 99, 'field': 'base_color',
                          'value': [1, 0, 0]}),      # out of range
    ('/material/update', {'index': -1, 'field': 'base_color',
                          'value': [1, 0, 0]}),      # negative wrap
    ('/material/update', {'index': 0, 'field': 'base_color',
                          'value': 'red'}),          # unparseable value
    ('/material/create', {'type': 'unobtainium'}),
    ('/material/clone', {'index': 42}),
    ('/material/delete', {'index': -2}),
    ('/texture/import', {'path': '/no/such/file.png'}),
    ('/texture/import', {}),                         # missing path
    ('/texture/delete', {'index': 7}),
    ('/skybox/set', {'index': 12}),
    ('/prefab/import', {'path': '/no/such/model.obj'}),
    ('/prefab/instantiate', {'index': 0}),           # no prefabs exist
    ('/mesh/delete', {'index': 0}),                  # no meshes exist
    ('/scene/open', {'path': '/no/such/scene.json'}),
    # save_scene creates missing directories by design; an unwritable
    # path is one whose "directory" is an existing file.
    ('/scene/save', {'path': '/dev/null/x/scene.json'}),
]


@pytest.mark.parametrize('endpoint,body', BAD_REQUESTS,
                         ids=[f'{e}#{i}' for i, (e, _) in
                              enumerate(BAD_REQUESTS)])
def test_bad_request_clean_400(server, endpoint, body):
    status, payload = _post(server, endpoint, body)
    assert status == 400, (endpoint, status, payload)
    assert payload.get('error'), (endpoint, payload)
    _alive(server)


def test_malformed_json_body(server):
    status, payload = _post_raw(server, '/material/update',
                                b'{"index": 0, "field": ')
    assert status == 400
    assert 'error' in payload
    _alive(server)


def test_non_object_json_body(server):
    status, payload = _post_raw(server, '/entity/update', b'[1, 2, 3]')
    assert status == 400
    assert 'error' in payload
    _alive(server)


def test_unknown_endpoint_404(server):
    status, _ = _post(server, '/entity/explode', {'id': 0})
    assert status == 404
    _alive(server)


def test_rejected_edit_left_scene_unchanged(server):
    base = f'http://127.0.0.1:{server.port}'
    before = json.loads(urllib.request.urlopen(base + '/scene').read())
    _post(server, '/material/update',
          {'index': -1, 'field': 'base_color', 'value': [9, 9, 9]})
    _post(server, '/entity/delete', {'id': 424242})
    after = json.loads(urllib.request.urlopen(base + '/scene').read())
    assert before == after


def test_good_edit_still_works_after_failures(server):
    """After the whole failure sweep, a legitimate edit must still flow
    through dirty flags into the next frame."""
    base = f'http://127.0.0.1:{server.port}'
    doc = json.loads(urllib.request.urlopen(base + '/scene').read())
    plane = next(e for e in doc['entities'] if e['name'] == 'Plane')
    status, _ = _post(server, '/material/update',
                      {'index': plane['material'], 'field': 'base_color',
                       'value': [0.2, 0.8, 0.2]})
    assert status == 200
    _alive(server)
