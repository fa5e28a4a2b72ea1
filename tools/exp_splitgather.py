"""Can narrow-split gathers beat the ~64 MB fast-gather cliff?

tools/exp_waves3.py measured the packed (N, 8) permutation gather at
10 / 83 / 165 ms for 2 / 4 / 8M lanes: super-linear once the operand
passes ~64 MB, while gathers from SMALL operands stay ~linear in index
count. If the cliff is operand-size driven, splitting the one (N, 8)
gather into k gathers of (N, 8/k) keeps each operand under the cliff at
the cost of k-fold index visits. At 2M lanes the (N, 8) gather costs
about the same as a scalar gather (per-index, not per-byte,
tools/exp_permute.py), so k splits should cost ~k * 10 ms * (N / 2M)
if the fast path holds -- vs 83 / 165 ms through the cliff.

Sweeps lanes in (2M, 4M, 8M) x split widths (8, 4, 2, 1) on real
permutations, plus a row-chunked variant (gather all 8 columns but
N/2M lanes at a time against the FULL operand -- control: should stay
on the slow path if operand size is what matters).

Run alone on the axon TPU (memory/tpu-runtime-rules).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

REPS = 5


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0] if isinstance(out, (list, tuple)) else out))
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, (list, tuple)) else out))
    return (time.time() - t0) / REPS * 1e3


def main():
    rng = np.random.default_rng(0)
    out = {}
    for n in (2 * 1024 * 1024, 4 * 1024 * 1024, 8 * 1024 * 1024):
        rows = jnp.asarray(rng.standard_normal((n, 8), dtype=np.float32))
        perm = jnp.asarray(rng.permutation(n).astype(np.int32))
        res = {}

        for width in (8, 4, 2, 1):
            k = 8 // width

            @jax.jit
            def split_gather(rows, perm, width=width, k=k):
                parts = []
                for i in range(k):
                    chunk = jax.lax.slice_in_dim(rows, i * width,
                                                 (i + 1) * width, axis=1)
                    # optimization_barrier: stop XLA fusing the slice
                    # back into one big-operand gather (the trap
                    # measured in tools/exp_waves5.py variant A).
                    chunk = jax.lax.optimization_barrier(chunk)
                    parts.append(jnp.take(chunk, perm, axis=0))
                return jnp.concatenate(parts, axis=1)

            res[f'split{width}'] = round(timed(split_gather, rows, perm), 1)
            print(f'#   {n // (1024*1024)}M split{width}: '
                  f'{res[f"split{width}"]} ms', file=sys.stderr, flush=True)

        @jax.jit
        def chunked_rows(rows, perm, n=n):
            k = n // (2 * 1024 * 1024)
            if k <= 1:
                return jnp.take(rows, perm, axis=0)
            parts = [jnp.take(rows, p, axis=0)
                     for p in jnp.split(perm, k)]
            return jnp.concatenate(parts, axis=0)

        res['chunkidx'] = round(timed(chunked_rows, rows, perm), 1)
        out[f'lanes{n // (1024 * 1024)}M'] = res
        print(f'# {n // (1024*1024)}M lanes: {res}', file=sys.stderr)
        del rows, perm
    print(json.dumps(out))


if __name__ == '__main__':
    main()
