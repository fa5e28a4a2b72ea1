"""Dense MXU leaf intersection: primitive-rate A/B vs the VPU bary row.

VERDICT round-4 item 1 proposes re-balancing the tree over fat leaves
(128-512 tris) and testing each packet against its fat leaf as a dense
MXU block: the bary leaf format is affine in (origin, direction), so
the 6 per-(tri, ray) quantities

    nd  = n.d        num = d0 - n.o       (ft = num / nd)
    gud = gu.d       guo = gu.o + cu      (fu = guo + ft gud)
    gvd = gv.d       gvo = gv.o + cv      (fv = gvo + ft gvd)

are one matmul of the (6T, 8) triangle matrix against the (8, 128)
homogeneous ray row [dx dy dz ox oy oz 1 0] -- per 128-lane ray row, so
a 3072-ray packet x 128-tri leaf block is 24 MXU matmuls plus a VPU
epilogue (divide, two FMAs, validity tests, min-reduce over tris).

The counter-arithmetic this experiment tests: the MXU streams ONE
M-row per cycle regardless of K, so at K = 8 (the homogeneous
coordinate dimension -- every dense reformulation of ray-primitive
intersection contracts over it) a leaf block costs

    6 quantities x T tris x 24 ray rows   MXU row-cycles
  = 6 x 24 / 3072 = 0.047 cy/pair on one MXU (0.012 if Mosaic spreads
    the M dim across the chip's 4 MXUs)

while the measured VPU bary row already runs ~0.011-0.014 cy/pair
(~45 lane-ops/pair at the VPU's ~4 vector issues/cycle) -- i.e. the
MXU's 128x128 array is 8/128 utilized in K and delivers AT BEST the
VPU's useful rate, before paying the epilogue (which runs on the VPU
either way and is itself ~half the full VPU test). If that holds, fat
MXU leaves are strictly worse than the production VPU rows: the
fat-leaf shape also grows the per-packet tested-pair count (unions
shrink slower than leaf size grows; the leaf-size sweep knee was 16,
tools/exp_collapse.py/README), so the per-pair rate must IMPROVE to
pay for it.

Measures, on-chip, per variant (REAL viking-hall leaf rows + REAL
sorted mid-flight bounce rays for register-pressure realism):

  vpu_full     production-style bary rows (16 rows x 8 tris per block)
  mxu_full     dot((6T,8),(8,128)) per ray row + epilogue, f32 HIGHEST
  mxu_bf16     same, single-pass bf16 inputs (the conservative-cull
               stage's upper bound; output NOT hit-exact). Mosaic has
               no Precision.HIGH lowering, so the 3-pass point cannot
               be measured; bf16 brackets the dot cost from below.
  mxu_dotonly  the matmuls alone (epilogue replaced by a running sum)
               -- isolates the MXU rate from the epilogue

Each variant tests P packets x V 128-tri blocks x 3072 rays and
reports ms, ns/pair, and cy/pair at the v5e's ~0.94 GHz effective
issue clock used by tools/exp_pop_cost.py.

Reference seam this would replace: the Moller-Trumbore leaf test at
/root/reference/src/scene/scene.glsl.inc:304-334.

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu import RenderConfig, SceneLayout, compile_scene
from path_tracer_tpu.integrator import wavefront as wf
from path_tracer_tpu.scene.bvh8 import GEOM5_STRIDE
from path_tracer_tpu.scene.procedural import make_viking_hall_scene

WIDTH, HEIGHT = 1920, 1080
R_ROWS = 24          # ray sublane rows per packet (3072 rays)
T_BLOCK = 128        # triangles per fat-leaf block
V_BLOCKS = 32        # fat-leaf blocks visited per packet
P_PACKETS = 128      # packets per timed call
REPS = 3
CLOCK_GHZ = 0.94
BIG = 1.0e9


def _extract_tris(inst_tris, n_tris):
    """Real bary-format triangles from the packed leaf rows -> (T, 12).

    Leaf rows hold 8 triangles at GEOM5_STRIDE-lane bases, lanes
    b..b+11 = [n d0 gu cu gv cv] (scene/bvh8.py LEAF_FMT 'bary').
    Degenerate/padding slots are all-zero; keep only live ones.
    """
    rows = np.asarray(inst_tris)
    out = []
    for r in range(rows.shape[0]):
        for k in range(8):
            b = GEOM5_STRIDE * k
            tri = rows[r, b:b + 12]
            if np.any(tri != 0.0):
                out.append(tri)
            if len(out) >= n_tris:
                return np.asarray(out, np.float32)
    reps = -(-n_tris // max(len(out), 1))
    return np.asarray((out * reps)[:n_tris], np.float32)


def _tri_matrix(tris12):
    """(T, 12) bary rows -> (6T, 8) MXU matrix, quantity-major blocks.

    Rows [qT + j] dot the homogeneous ray row [dx dy dz ox oy oz 1 0]:
      q=0 nd: [n 0 0 0]        q=1 num: [0 0 0 -n d0 0]
      q=2 gud: [gu 0..]        q=3 guo: [0 0 0 gu cu 0]
      q=4 gvd: [gv 0..]        q=5 gvo: [0 0 0 gv cv 0]
    """
    t = tris12.shape[0]
    n, d0 = tris12[:, 0:3], tris12[:, 3]
    gu, cu = tris12[:, 4:7], tris12[:, 7]
    gv, cv = tris12[:, 8:11], tris12[:, 11]
    m = np.zeros((6, t, 8), np.float32)
    m[0, :, 0:3] = n
    m[1, :, 3:6] = -n
    m[1, :, 6] = d0
    m[2, :, 0:3] = gu
    m[3, :, 3:6] = gu
    m[3, :, 6] = cu
    m[4, :, 0:3] = gv
    m[5, :, 3:6] = gv
    m[5, :, 6] = cv
    return m.reshape(6 * t, 8)


def _vpu_rows(tris12):
    """(T, 12) -> (T/8, 128) production-format leaf rows."""
    t = tris12.shape[0]
    rows = np.zeros((t // 8, 128), np.float32)
    for j in range(t):
        rows[j // 8, GEOM5_STRIDE * (j % 8):GEOM5_STRIDE * (j % 8) + 12] = \
            tris12[j]
    return rows


def _mxu_kernel(tris_ref, ox, oy, oz, dx, dy, dz, tin,
                t_out, face_out, rv, prod, *, v_blocks, precision,
                dot_only, bf16):
    for r in range(R_ROWS):
        rv[pl.ds(8 * r + 0, 1), :] = dx[pl.ds(r, 1), :]
        rv[pl.ds(8 * r + 1, 1), :] = dy[pl.ds(r, 1), :]
        rv[pl.ds(8 * r + 2, 1), :] = dz[pl.ds(r, 1), :]
        rv[pl.ds(8 * r + 3, 1), :] = ox[pl.ds(r, 1), :]
        rv[pl.ds(8 * r + 4, 1), :] = oy[pl.ds(r, 1), :]
        rv[pl.ds(8 * r + 5, 1), :] = oz[pl.ds(r, 1), :]
        rv[pl.ds(8 * r + 6, 1), :] = jnp.ones((1, 128), jnp.float32)
        rv[pl.ds(8 * r + 7, 1), :] = jnp.zeros((1, 128), jnp.float32)
    t_out[:] = tin[:]
    face_out[:] = jnp.full((R_ROWS, 128), -1, jnp.int32)
    tri_ids = jax.lax.broadcasted_iota(jnp.int32, (T_BLOCK, 128), 0)

    def visit(v, acc):
        lhs = tris_ref[pl.ds(v * 6 * T_BLOCK, 6 * T_BLOCK), :]
        if bf16:
            lhs = lhs.astype(jnp.bfloat16)
        for r in range(R_ROWS):
            rhs = rv[pl.ds(8 * r, 8), :]
            if bf16:
                rhs = rhs.astype(jnp.bfloat16)
            prod[:] = jax.lax.dot_general(
                lhs, rhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
            if dot_only:
                acc = acc + jnp.sum(prod[pl.ds(0, 8), :])
                continue
            nd = prod[pl.ds(0 * T_BLOCK, T_BLOCK), :]
            num = prod[pl.ds(1 * T_BLOCK, T_BLOCK), :]
            gud = prod[pl.ds(2 * T_BLOCK, T_BLOCK), :]
            guo = prod[pl.ds(3 * T_BLOCK, T_BLOCK), :]
            gvd = prod[pl.ds(4 * T_BLOCK, T_BLOCK), :]
            gvo = prod[pl.ds(5 * T_BLOCK, T_BLOCK), :]
            ft = num / nd
            fu = guo + ft * gud
            fv = gvo + ft * gvd
            t_cur = pltpu.repeat(t_out[pl.ds(r, 1), :], T_BLOCK, 0)
            ok = (fu >= 0.0) & (fv >= 0.0) & (fu + fv <= 1.0) \
                & (ft >= 0.0) & (ft < t_cur)
            cand = jnp.where(ok, ft, BIG)
            best = jnp.min(cand, axis=0, keepdims=True)       # (1, 128)
            bestb = pltpu.repeat(best, T_BLOCK, 0)
            fid = jnp.where(ok & (cand <= bestb), tri_ids, 1 << 30)
            bface = jnp.min(fid, axis=0, keepdims=True)
            live = best < t_out[pl.ds(r, 1), :]
            t_out[pl.ds(r, 1), :] = jnp.where(live, best,
                                              t_out[pl.ds(r, 1), :])
            face_out[pl.ds(r, 1), :] = jnp.where(
                live, v * T_BLOCK + bface, face_out[pl.ds(r, 1), :])
        return acc

    acc = jax.lax.fori_loop(0, v_blocks, visit, jnp.float32(0.0))
    if dot_only:
        # Keep the dots alive through a data dependence.
        t_out[pl.ds(0, 1), :] = t_out[pl.ds(0, 1), :] + 0.0 * acc


def _vpu_kernel(tris_ref, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r, tin,
                t_out, face_out, *, v_blocks):
    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]
    t_out[:] = tin[:]
    face_out[:] = jnp.full((R_ROWS, 128), -1, jnp.int32)
    rows_per_block = T_BLOCK // 8

    def visit(v, _):
        for ri in range(rows_per_block):
            row = tris_ref[pl.ds(v * rows_per_block + ri, 1), :]
            tile = pltpu.repeat(row, R_ROWS, 0)

            def bc(lane):
                return jnp.broadcast_to(tile[:, lane:lane + 1],
                                        (R_ROWS, 128))

            t = t_out[:]
            face = face_out[:]
            for k in range(8):
                b = GEOM5_STRIDE * k
                nd = bc(b) * dx + bc(b + 1) * dy + bc(b + 2) * dz
                no = bc(b) * ox + bc(b + 1) * oy + bc(b + 2) * oz
                ft = (bc(b + 3) - no) / nd
                hx = ox + ft * dx
                hy = oy + ft * dy
                hz = oz + ft * dz
                fu = bc(b + 4) * hx + bc(b + 5) * hy \
                    + bc(b + 6) * hz + bc(b + 7)
                fv = bc(b + 8) * hx + bc(b + 9) * hy \
                    + bc(b + 10) * hz + bc(b + 11)
                ok = (fu >= 0.0) & (fv >= 0.0) & (fu + fv <= 1.0) \
                    & (ft >= 0.0) & (ft < t)
                t = jnp.where(ok, ft, t)
                face = jnp.where(ok, v * T_BLOCK + ri * 8 + k, face)
            t_out[:] = t
            face_out[:] = face
        return 0

    jax.lax.fori_loop(0, v_blocks, visit, 0)


def run_variant(name, kernel_fn, tris, rays, scratch):
    grid = rays[0].shape[0] // R_ROWS

    def ray_block():
        return pl.BlockSpec((R_ROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    interpret = os.environ.get('PT_INTERPRET', '') == '1'
    f = jax.jit(lambda *a: pl.pallas_call(
        kernel_fn,
        out_shape=(jax.ShapeDtypeStruct((grid * R_ROWS, 128), jnp.float32),
                   jax.ShapeDtypeStruct((grid * R_ROWS, 128), jnp.int32)),
        grid=(grid,),
        in_specs=[pl.BlockSpec(tris.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM)]
        + [ray_block() for _ in range(7)],
        out_specs=(ray_block(), ray_block()),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*a))
    args = (tris,) + rays
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / REPS
    pairs = grid * V_BLOCKS * T_BLOCK * R_ROWS * 128
    cyc = dt * CLOCK_GHZ * 1e9 / pairs
    print(f'  {name:12s} {dt*1e3:8.1f} ms  {dt*1e9/pairs:7.3f} ns/pair  '
          f'{cyc:7.4f} cy/pair', file=sys.stderr, flush=True)
    return out, dt


def main():
    global P_PACKETS, V_BLOCKS, REPS
    smoke = os.environ.get('PT_SMOKE', '') == '1'
    if smoke:
        P_PACKETS, V_BLOCKS, REPS = 2, 2, 1
    scene = make_viking_hall_scene(detail=1)
    packed = compile_scene(scene, aspect_ratio=WIDTH / HEIGHT)
    n = P_PACKETS * R_ROWS * 128
    if smoke:
        rng = np.random.default_rng(0)
        o = rng.uniform(-4, 4, (3, n)).astype(np.float32)
        d = rng.normal(size=(3, n)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
    else:
        layout = SceneLayout.from_packed(packed)
        config = RenderConfig(width=WIDTH, height=HEIGHT)
        state = wf.render(packed, config, 8, seed=0, layout=layout)
        o = np.asarray(state['origin'])
        d = np.asarray(state['direction'])
        o, d = o[:, :n], d[:, :n]
    print(f'# {n} rays, {V_BLOCKS} x {T_BLOCK}-tri blocks/packet, '
          f'{P_PACKETS} packets', file=sys.stderr)

    tris12 = _extract_tris(packed.inst_tris, V_BLOCKS * T_BLOCK)
    mxu_tris = jnp.asarray(
        np.concatenate([_tri_matrix(tris12[v * T_BLOCK:(v + 1) * T_BLOCK])
                        for v in range(V_BLOCKS)], axis=0))
    vpu_tris = jnp.asarray(_vpu_rows(tris12))

    shape2 = (P_PACKETS * R_ROWS, 128)
    rays = tuple(jnp.asarray(x.reshape(shape2)) for x in
                 (o[0], o[1], o[2], d[0], d[1], d[2]))
    rays = rays + (jnp.full(shape2, 1.0e7, jnp.float32),)

    import functools
    vpu_out, _ = run_variant(
        'vpu_full', functools.partial(_vpu_kernel, v_blocks=V_BLOCKS),
        vpu_tris, rays, [])

    mxu_scratch = [pltpu.VMEM((8 * R_ROWS, 128), jnp.float32),
                   pltpu.VMEM((6 * T_BLOCK, 128), jnp.float32)]
    for name, precision, dot_only, bf16 in (
            ('mxu_full', jax.lax.Precision.HIGHEST, False, False),
            ('mxu_bf16', jax.lax.Precision.DEFAULT, False, True),
            ('mxu_dotonly', jax.lax.Precision.HIGHEST, True, False),
            ('mxu_dot_bf16', jax.lax.Precision.DEFAULT, True, True)):
        out, _ = run_variant(
            name, functools.partial(_mxu_kernel, v_blocks=V_BLOCKS,
                                    precision=precision, dot_only=dot_only,
                                    bf16=bf16),
            mxu_tris, rays, mxu_scratch)
        if name == 'mxu_full':
            vt, vf = np.asarray(vpu_out[0]), np.asarray(vpu_out[1])
            mt, mf = np.asarray(out[0]), np.asarray(out[1])
            hits = vf >= 0
            agree = float(np.mean(vf == mf))
            terr = float(np.max(np.abs(vt[hits] - mt[hits])
                                / np.maximum(vt[hits], 1e-6))) \
                if hits.any() else 0.0
            print(f'#   mxu_full vs vpu_full: face agree {agree:.5f}, '
                  f'max rel t err {terr:.2e}, hits {hits.mean():.4f}',
                  file=sys.stderr)


if __name__ == '__main__':
    main()
