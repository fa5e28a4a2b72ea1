"""Cost model of per-round state permutation at 2M lanes.

The fused sorted round spends ~110 ms in ONE packed (N, 32) row gather
(tools/profile_round.py). If gather cost scales with row WIDTH (bytes),
permuting only the trace kernel's I/O -- 6 ray rows forward, 5 hit rows
inverse -- beats permuting the whole state. If it scales with index
count only, it doesn't. This measures the actual scaling plus the cost
of building the inverse permutation.

MEASURED CONCLUSION (negative result; keep the single (N, 32) gather):
standalone small gathers look cheap (a lone (N, 8) gather is ~10 ms vs
~80 ms for (N, 32)), but additional 2M-index gathers in the SAME
program cost ~30 ms marginal each regardless of width -- 4x(N, 8) in
one program is ~103 ms, 2x(N, 16) ~96 ms, both LOSING to the single
(N, 32) at ~80-90 ms. Row scatters are 2x worse than gathers, so
forward-permute + inverse-scatter splits lose too. The per-round state
permutation is index-issue-bound, already at its measured floor.

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

    # The production question: one (N, 32) gather vs the same 32 rows
    # gathered in chunks, all inside ONE program (so per-call overhead
    # is paid once). Row width <= 8 hits the fast gather path above.
    m32 = jnp.asarray(rng.normal(size=(32, n)).astype(np.float32))
    for chunk in (4, 8, 16):
        @jax.jit
        def gather_chunked(m, perm, chunk=chunk):
            outs = []
            for c in range(0, 32, chunk):
                outs.append(jnp.take(m[c:c + chunk].T, perm, axis=0).T)
            return jnp.concatenate(outs, axis=0)

        bench(f'chunked gather 32 as {32 // chunk}x(N,{chunk})',
              gather_chunked, m32, perm)

    @jax.jit
    def gather_full(m, perm):
        return jnp.take(m.T, perm, axis=0).T

    bench('single gather (N,32) again', gather_full, m32, perm)

    # Isolate WHY chunking inside one program lost: (a) the concat, (b)
    # the slice-of-(32,N) operand, (c) program fusion of the 4 gathers.
    @jax.jit
    def gather_chunk_tuple(m, perm):
        return tuple(jnp.take(m[c:c + 8].T, perm, axis=0).T
                     for c in range(0, 32, 8))

    bench('4x(N,8) tuple out (slices)', gather_chunk_tuple, m32, perm)

    parts = tuple(m32[c:c + 8] + 0.0 for c in range(0, 32, 8))

    @jax.jit
    def gather_parts(parts, perm):
        return tuple(jnp.take(p.T, perm, axis=0).T for p in parts)

    bench('4x(N,8) tuple out (4 inputs)', gather_parts, parts, perm)

    @jax.jit
    def gather_two(parts, perm):
        return tuple(jnp.take(p.T, perm, axis=0).T for p in parts[:2])

    bench('2x(N,8) tuple out (2 inputs)', gather_two, parts, perm)

    @jax.jit
    def gather_one_of(parts, perm):
        return jnp.take(parts[0].T, perm, axis=0).T

    bench('1x(N,8) (same input shape)', gather_one_of, parts, perm)

    print(json.dumps(results))


if __name__ == '__main__':
    main()
