"""Cost model of per-round state permutation at 2M lanes.

The fused sorted round spends ~110 ms in ONE packed (N, 32) row gather
(tools/profile_round.py). If gather cost scales with row WIDTH (bytes),
permuting only the trace kernel's I/O -- 6 ray rows forward, 5 hit rows
inverse -- beats permuting the whole state. If it scales with index
count only, it doesn't. This measures the actual scaling plus the cost
of building the inverse permutation.

Run in the default (axon) env; one python process at a time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/.jax_cache')


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = 1920 * 1080
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 18, n, dtype=np.int32))
    perm = jnp.argsort(key)
    results = {}

    def bench(label, fn, *args):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            out = fn(*args)
            float(jnp.sum(
                jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        dt = (time.time() - t0) / reps
        print(f'# {label:28s} {dt*1e3:8.1f} ms', file=sys.stderr)
        results[label] = round(dt * 1e3, 1)
        return out

    @jax.jit
    def null(x):
        return x

    bench('null (call overhead)', null, perm)

    for w in (1, 4, 8, 16, 32):
        m = jnp.asarray(rng.normal(size=(w, n)).astype(np.float32))

        @jax.jit
        def gather_w(m, perm):
            return jnp.take(m.T, perm, axis=0).T

        bench(f'row gather (N,{w})', gather_w, m, perm)

    @jax.jit
    def inv_scatter(perm):
        return jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))

    bench('inverse perm (scatter iota)', inv_scatter, perm)

    @jax.jit
    def inv_argsort(perm):
        return jnp.argsort(perm)

    bench('inverse perm (argsort)', inv_argsort, perm)

    # Scatter rows instead of gathering by the inverse: m.at[perm].set
    for w in (8,):
        m = jnp.asarray(rng.normal(size=(w, n)).astype(np.float32))

        @jax.jit
        def scatter_w(m, perm):
            return jnp.zeros_like(m.T).at[perm].set(m.T).T

        bench(f'row scatter (N,{w})', scatter_w, m, perm)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
