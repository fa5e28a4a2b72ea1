"""Mosaic probe: does a scalar VMEM load at a TRACED lane index lower?

The octant-ordered traversal (ops/trace_inst.py oct_order) wants
`nodes_ref[v, base + ch]` where BOTH the row v and the lane offset ch
are traced scalars. The existing kernels only ever use a traced row
with STATIC lanes (meta reads) or traced indices into SMEM-style small
refs (stack_ref[p, sp]). This probe compiles + runs a minimal kernel
with (a) traced-row/traced-lane load and (b) a shift by a traced
amount, and checks the value round-trips.

Result (2026-08-18, v5e via axon relay): FAILED -- Mosaic rejects the
dynamic-lane VMEM load ("cannot statically prove that index in
dimension 1 is a multiple of 128"; vector.load wants lane-aligned
indices). Traced shifts are fine. The ordered kernel therefore stages
the 8 child metas into an SMEM scratch row (static scalar stores) and
reads back at the traced child index -- SMEM scalar refs DO support
dynamic indices (the traversal stack relies on it).

Runtime rules: memory/tpu-runtime-rules.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(tab_ref, idx_ref, out_ref):
    # Traced row AND traced lane, both read from SMEM scalars.
    row = idx_ref[0]
    lane = idx_ref[1]
    val = tab_ref[row, lane]             # <- the probed load
    sh = idx_ref[2]
    packed = idx_ref[3]
    ch = jax.lax.shift_right_logical(packed, 3 * sh) & 7  # traced shift
    out_ref[...] = jnp.full((8, 128), val + ch.astype(jnp.float32),
                            jnp.float32)


def main():
    tab = np.arange(16 * 128, dtype=np.float32).reshape(16, 128)
    idx = np.array([5, 77, 2, 0o1234567], np.int32)  # row 5 lane 77
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(tab, idx)
    got = float(out[0, 0])
    want = 5 * 128 + 77 + ((0o1234567 >> 6) & 7)
    print(f'got {got}, want {want}: {"OK" if got == want else "MISMATCH"}')


if __name__ == '__main__':
    main()
