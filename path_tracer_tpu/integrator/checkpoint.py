"""Render-state checkpoint/resume.

The reference cannot checkpoint accumulation (any edit restarts it;
SURVEY.md section 5). Here the whole progressive render state -- the
accumulator, live path state, RNG streams, and lane map -- is one pytree
of arrays, so checkpointing is a single npz (and trivially resumable on
a different process or chip count via re-reset + accumulator merge).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import log


def save_render_state(path, state):
    """Write the render state (wavefront.reset/render output) to npz."""
    import jax

    with log.timer('checkpoint.save', path=str(path)):
        leaves, treedef = jax.tree_util.tree_flatten(state)
        arrays = {f'leaf_{i}': np.asarray(leaf)
                  for i, leaf in enumerate(leaves)}
        np.savez_compressed(path, treedef=repr(treedef), **arrays)


def load_render_state(path, like_state):
    """Load a checkpoint into the structure of `like_state`.

    `like_state` (e.g. a fresh wavefront.reset output with the same
    config) provides the pytree structure and dtypes.
    """
    import jax

    z = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(like_state)
    loaded = []
    for i, leaf in enumerate(leaves):
        arr = z[f'leaf_{i}']
        if arr.shape != leaf.shape:
            raise ValueError(
                f'checkpoint leaf {i} shape {arr.shape} != expected {leaf.shape}')
        loaded.append(jnp.asarray(arr.astype(np.asarray(leaf).dtype)))
    return jax.tree_util.tree_unflatten(treedef, loaded)
