import os, sys, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')
import jax, jax.numpy as jnp
from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.scene.procedural import make_viking_hall_scene
W, H = 1920, 1080
scene = make_viking_hall_scene(detail=1)
packed = compile_scene(scene, aspect_ratio=W / H)
layout = SceneLayout.from_packed(packed)
config = RenderConfig(width=W, height=H)

nd = jax.jit(lambda p, s, t, r: wf.render_rounds(p, layout, config, s, t,
             rounds=r, sort_each_round=True), static_argnames=('r',))
state = wf.render(packed, config, 6, seed=0, layout=layout)
float(jnp.sum(state['accum']['count']))
for r in (16, 24):
    out = nd(packed, state, jnp.float32(0.05), r)
    float(jnp.sum(out['accum']['count']))
    t0 = time.time()
    out = nd(packed, state, jnp.float32(0.05), r)
    float(jnp.sum(out['accum']['count']))
    dt = time.time() - t0
    print(f'nondonate rounds={r}: {dt*1e3:.0f} ms ({dt/r*1e3:.0f} ms/round)', flush=True)
del state, out

for r in (8, 24):
    # fresh warmed state per arm; donation consumes it
    st = wf.render(packed, config, 6, seed=1 + r, layout=layout)
    float(jnp.sum(st['accum']['count']))
    # warm-compile the r-round donating program on a throwaway state
    st = wf.render(packed, config, r, layout=layout, state=st)
    float(jnp.sum(st['accum']['count']))
    t0 = time.time()
    st = wf.render(packed, config, r, layout=layout, state=st)
    float(jnp.sum(st['accum']['count']))
    dt = time.time() - t0
    print(f'donate rounds={r}: {dt*1e3:.0f} ms ({dt/r*1e3:.0f} ms/round)', flush=True)
