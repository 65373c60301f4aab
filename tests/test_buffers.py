"""Unit coverage for the shared online-engine infrastructure
(utils/buffers.py): the capacity-padding contract and the bitwise
key-chain replay both IBIS and SMC² build on. The engine suites cover
them end-to-end; these pin the primitives down in isolation so a drift
shows up at the source, not two engines later.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mcmcpp_tpu.utils.buffers import chunked_stage_scan, pad_to_capacity


@pytest.mark.parametrize("n_rows,expect", [
    (1, 8), (7, 8), (8, 8), (9, 16), (100, 128), (128, 128), (129, 256),
])
def test_pad_to_capacity_sizes(n_rows, expect):
    x = jnp.arange(n_rows, dtype=jnp.float32)[:, None]
    padded, cap = pad_to_capacity(x, n_rows)
    assert cap == expect
    assert padded.shape == (expect, 1)
    np.testing.assert_array_equal(np.asarray(padded[:n_rows]),
                                  np.asarray(x))
    # padding repeats the LAST row (never introduces new values)
    np.testing.assert_array_equal(
        np.asarray(padded[n_rows:]),
        np.full((expect - n_rows, 1), float(n_rows - 1)),
    )


def test_pad_to_capacity_pytree_and_noop():
    tree = {"a": jnp.ones((10, 2)), "b": jnp.zeros((10,))}
    padded, cap = pad_to_capacity(tree, 10)
    assert cap == 16
    assert padded["a"].shape == (16, 2) and padded["b"].shape == (16,)
    same, cap2 = pad_to_capacity(jnp.ones((16, 3)), 16)
    assert cap2 == 16 and same.shape == (16, 3)


def test_chunked_stage_scan_replays_host_key_chain_bitwise():
    """The contract the online engines rely on: fusing N stages must
    consume keys EXACTLY like the host loop ``key, k = split(key)`` —
    same final key, same per-stage subkeys, same state trajectory."""
    def stage(k, state, r):
        # state update uses both the subkey and the stage index
        draw = jax.random.normal(k, (3,))
        return state + draw * (1.0 + r), (jnp.sum(draw), r)

    key0 = jax.random.key(42)
    state0 = jnp.zeros(3)

    # host-loop reference: per-stage JITTED program, like the engines'
    # stage caches (an eager reference can differ by 1 ULP through
    # fusion — the engines' bitwise contract is jitted-vs-jitted)
    jstage = jax.jit(stage)
    key, state = key0, state0
    host_aux = []
    for r in range(5):
        key, k = jax.random.split(key)
        state, aux = jstage(k, state, jnp.int32(r))
        host_aux.append(float(aux[0]))

    key_f, state_f, (sums, rs) = jax.jit(
        lambda k0, s0: chunked_stage_scan(stage, k0, s0, 5)
    )(key0, state0)
    np.testing.assert_array_equal(
        jax.random.key_data(key), jax.random.key_data(key_f)
    )
    np.testing.assert_array_equal(np.asarray(state), np.asarray(state_f))
    np.testing.assert_allclose(np.asarray(sums), host_aux, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(rs), np.arange(5))
