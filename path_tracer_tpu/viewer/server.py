"""Minimal interactive viewer: a progressive render streamed over HTTP.

The reference is an ImGui/GLFW editor window
(/root/reference/src/application/imgui_main.cpp); this container has no
display, so the interactive front-end is a single-file web app served by
the Python stdlib HTTP server over an `app.Session`:

  * the page polls /frame.png -- each poll advances the wavefront by one
    round (two after a restart) and returns the resolved image, so the
    render refines progressively exactly like the reference's frame loop
    (application.cpp:110-124);
  * WASD/QE + arrow keys drive the camera fly-controls (-> /move, which
    restarts accumulation like application.cpp:86-89);
  * clicking the image mouse-picks the shape under the cursor (-> /pick,
    the preview_render.cpp:96-116 query protocol) and shows its entity
    name and material;
  * a mode selector switches between the path-traced view and the
    false-color preview modes (base color / shaded / normal / material /
    primitive / complexity heatmaps, preview_render.glsl:96-178);
  * tone-map and brightness controls mirror the reference's render
    settings panel (imgui_main.cpp:846-899).

The HTTP server is single-threaded on purpose: requests serialize, so at
most one JAX computation runs at a time.

Usage: python -m path_tracer_tpu view scene.json [--port 8000]
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

from ..utils.image import encode_png

_PAGE = """<!DOCTYPE html>
<html><head><title>path_tracer_tpu</title><style>
body { background:#14161a; color:#d8dce2; font:13px system-ui; margin:0 }
#bar { padding:8px 12px; display:flex; gap:12px; align-items:center }
#view { display:block; margin:0 auto; image-rendering:pixelated;
        outline:1px solid #2a2e35 }
select,input,button { background:#1e2127; color:#d8dce2;
        border:1px solid #2a2e35; border-radius:4px; padding:2px 6px }
#status { margin-left:auto; opacity:.75 }
</style></head><body>
<div id="bar">
  <b>path_tracer_tpu</b>
  <label>mode <select id="mode">
    <option value="render">path traced</option>
    <option value="0">preview: base color</option>
    <option value="1">preview: shaded</option>
    <option value="2">preview: normal</option>
    <option value="3">preview: material id</option>
    <option value="4">preview: primitive id</option>
    <option value="5">preview: mesh complexity</option>
    <option value="6">preview: scene complexity</option>
  </select></label>
  <label>tonemap <select id="tonemap">
    <option value="0">clamp</option><option value="1">reinhard</option>
    <option value="2">hable</option><option value="3" selected>aces</option>
  </select></label>
  <label>brightness <input id="bright" type="range" min="-2" max="2"
    step="0.1" value="0"></label>
  <span id="picked"></span>
  <span id="status"></span>
</div>
<img id="view" width="WIDTH" height="HEIGHT">
<script>
const img = document.getElementById('view');
let inflight = false, gen = 0;
async function tick() {
  if (inflight) return;
  inflight = true;
  const mode = document.getElementById('mode').value;
  const tm = document.getElementById('tonemap').value;
  const br = Math.pow(10, parseFloat(document.getElementById('bright').value));
  try {
    const r = await fetch(`/frame.png?mode=${mode}&tonemap=${tm}&brightness=${br}&g=${gen++}`);
    const blob = await r.blob();
    const url = URL.createObjectURL(blob);
    img.onload = () => URL.revokeObjectURL(url);
    img.src = url;
    const s = await (await fetch('/status')).json();
    document.getElementById('status').textContent =
      `frame ${s.frame} | ${s.spp.toFixed(1)} spp`;
  } finally { inflight = false; }
}
setInterval(tick, 120);
const KEYS = {
  w:[0,0,-1], s:[0,0,1], a:[-1,0,0], d:[1,0,0], q:[0,-1,0], e:[0,1,0]};
const ROT = {ArrowLeft:[0,0,1], ArrowRight:[0,0,-1],
             ArrowUp:[-1,0,0], ArrowDown:[1,0,0]};
document.addEventListener('keydown', async ev => {
  const step = ev.shiftKey ? 1.0 : 0.25;
  if (KEYS[ev.key]) {
    await fetch('/move', {method:'POST', body:JSON.stringify(
      {delta: KEYS[ev.key].map(v => v*step)})});
  } else if (ROT[ev.key]) {
    await fetch('/move', {method:'POST', body:JSON.stringify(
      {rotate: ROT[ev.key].map(v => v*0.1)})});
  }
});
img.addEventListener('click', async ev => {
  const r = img.getBoundingClientRect();
  const x = Math.floor((ev.clientX - r.left) * img.width / r.width);
  const y = Math.floor((ev.clientY - r.top) * img.height / r.height);
  const res = await (await fetch('/pick', {method:'POST',
    body:JSON.stringify({x, y})})).json();
  document.getElementById('picked').textContent =
    res.shape < 0 ? 'picked: (none)'
                  : `picked: ${res.name} [shape ${res.shape}]`;
});
</script></body></html>
"""


class ViewerServer:
    """Serve an interactive progressive render of a Session."""

    def __init__(self, session, host='127.0.0.1', port=8000):
        self.session = session
        self.host = host
        self.port = port
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body, ctype='application/json'):
                self.send_response(code)
                self.send_header('Content-Type', ctype)
                self.send_header('Content-Length', str(len(body)))
                self.send_header('Cache-Control', 'no-store')
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                path, _, query = self.path.partition('?')
                params = dict(kv.split('=', 1) for kv in query.split('&')
                              if '=' in kv)
                if path == '/':
                    page = (_PAGE.replace('WIDTH', str(outer.session.width))
                                 .replace('HEIGHT', str(outer.session.height)))
                    self._send(200, page.encode(), 'text/html')
                elif path == '/frame.png':
                    self._send(200, outer.frame_png(params), 'image/png')
                elif path == '/status':
                    s = outer.session
                    self._send(200, json.dumps(dict(
                        frame=s.frame_index,
                        spp=s.samples_per_pixel())).encode())
                else:
                    self._send(404, b'{}')

            def do_POST(self):
                length = int(self.headers.get('Content-Length', 0))
                body = json.loads(self.rfile.read(length) or b'{}')
                if self.path == '/move':
                    outer.session.move_camera(
                        delta=body.get('delta', (0, 0, 0)),
                        rotate=body.get('rotate', (0, 0, 0)))
                    self._send(200, b'{}')
                elif self.path == '/pick':
                    shape = int(outer.session.pick(int(body['x']),
                                                   int(body['y'])))
                    name, mat = outer.shape_info(shape)
                    self._send(200, json.dumps(dict(
                        shape=shape, name=name, material=mat)).encode())
                else:
                    self._send(404, b'{}')

        self._server = HTTPServer((host, port), Handler)
        self.port = self._server.server_address[1]

    def frame_png(self, params):
        mode = params.get('mode', 'render')
        brightness = float(params.get('brightness', 1.0))
        if mode == 'render':
            image = self.session.frame(
                tonemap_mode=int(params.get('tonemap', 0)),
                brightness=brightness)
        else:
            image = self.session.preview(mode=int(mode),
                                         brightness=brightness)
        return encode_png(np.asarray(image), compress_level=1)

    def shape_info(self, shape):
        """Entity name + material name for a picked shape index."""
        if shape < 0:
            return '', ''
        index = 0
        from .preview import shape_entities
        for entity in shape_entities(self.session.scene):
            if index == shape:
                mat = entity.material.name if entity.material else ''
                return entity.name, mat
            index += 1
        return '', ''

    def serve_forever(self):
        print(f'viewer: http://{self.host}:{self.port}/  '
              f'(WASD/QE move, arrows rotate, click to pick)')
        self._server.serve_forever()

    def serve_background(self):
        thread = threading.Thread(target=self._server.serve_forever,
                                  daemon=True)
        thread.start()
        return thread

    def shutdown(self):
        self._server.shutdown()
        self._server.server_close()
