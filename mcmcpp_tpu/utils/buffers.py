"""Shared streaming-buffer helpers for the online engines (IBIS, SMC²).

One compiled program per buffer CAPACITY, not per length: padding the
absorbed stream to power-of-two capacities means a whole stream compiles
O(log T) stage programs. Padding rows repeat the last real row and are
masked out of every reduction by the callers (their masks are bounded by
the real row count), so they never influence a result.
"""

import numpy as np
import jax
import jax.numpy as jnp


def pad_to_capacity(tree, n_rows, min_capacity=8):
    """Pad every leaf of ``tree`` (leading axis = ``n_rows``) to the next
    power-of-two capacity ≥ ``min_capacity`` by repeating its last row.

    Returns ``(padded_tree, capacity)``; leaves already at capacity are
    returned as-is.
    """
    capacity = 1 << max(
        int(np.ceil(np.log2(max(int(n_rows), 1)))),
        int(np.log2(min_capacity)),
    )
    padded = jax.tree.map(
        lambda x: jnp.concatenate(
            [x, jnp.repeat(x[-1:], capacity - x.shape[0], axis=0)],
            axis=0,
        ) if x.shape[0] < capacity else x,
        tree,
    )
    return padded, capacity


def chunked_stage_scan(stage_fn, key, state, n_stages):
    """Fuse ``n_stages`` sequential stage applications into ONE
    ``lax.scan`` while replaying the host driver's per-stage
    ``key, k = split(key)`` chain EXACTLY — so fused and per-stage
    execution are bitwise identical and chunking is a pure perf knob
    (one dispatch + one host sync per chunk). This is the single copy
    of the determinism-critical replay logic shared by the online
    engines (IBIS, SMC²).

    stage_fn(k, state, r) -> (state, aux_pytree), r = 0..n_stages−1.
    Returns (advanced key, final state, stacked aux).
    """
    def body(carry, r):
        key, state = carry
        key, k = jax.random.split(key)
        state, aux = stage_fn(k, state, r)
        return (key, state), aux

    (key, state), aux = jax.lax.scan(
        body, (key, state), jnp.arange(n_stages, dtype=jnp.int32)
    )
    return key, state, aux
