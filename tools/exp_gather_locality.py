"""Is the per-index row-gather cost sensitive to index LOCALITY?

The in-trace sort's two packed (N, 8) row gathers are ~28 ms of the
~35 ms sort tax, measured with production permutations. This probes
whether that cost is an HBM random-access floor or improves with
locality: identity / windowed shuffle (every index within +-W of its
position) / fully random, at 2M lanes. If locality pays, permutation
smoothness (stable keys, coarser Morton cells) is a remaining lever;
if flat, the tax is structural.

Runtime rules: memory/tpu-runtime-rules.

Result (2026-08-18, v5e, (2073600, 8) f32, 6 reps, readback-timed,
~29 ms call overhead included in every row):
    identity                 35.3 ms
    window    1024           35.8 ms
    window   32768           35.7 ms
    random                   35.5 ms
The gather is completely INSENSITIVE to index locality -- even the
identity permutation costs the same, so the cost is the per-index
issue rate of the gather unit itself, not HBM access pattern.
Locality/smoothness of the sort key buys nothing; the ~28 ms/round
permutation tax is structural at this lane count.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')

import jax
import jax.numpy as jnp
import numpy as np

N = 1920 * 1080


def timed(label, perm, mat):
    g = jax.jit(lambda m, p: jnp.take(m, p, axis=0))
    out = g(mat, perm)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(6):
        out = g(mat, perm)
        float(jnp.sum(out))
    print(f'  {label:24s} {(time.time() - t0) / 6 * 1e3:6.1f} ms')


def main():
    rng = np.random.default_rng(0)
    mat = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    idx = np.arange(N)

    timed('identity', jnp.asarray(idx, jnp.int32), mat)
    for w in (1024, 32768):
        p = np.argsort(idx + rng.uniform(-w, w, N))
        timed(f'window {w:7d}', jnp.asarray(p, jnp.int32), mat)
    timed('random', jnp.asarray(rng.permutation(N), jnp.int32), mat)


if __name__ == '__main__':
    main()
