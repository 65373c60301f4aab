"""Parametrized fuzz grids for chain slicing and IO round-trips.

Round-1 VERDICT item 10: property-style coverage of (S, W, P, burn, thin,
cap) against a pure-NumPy oracle (concatenate + ``[burn::thin]``), across
all three chain backends (numpy blocks, native C++ arena, disk-spooled).
Hypothesis is not installed, so cases are drawn from a seeded RNG at
collection time — every failure prints its full case tuple, which IS the
reproducer (re-run with ``-k case<N>``).

Oracle semantics match the reference chain (``MCMCpp/Chain/Chain.h:230-305``):
byte-capped append (partial take, False past capacity), burn+thin views,
in-place compaction.
"""

import numpy as np
import pytest

from mcmcpp_tpu import native
from mcmcpp_tpu.chain import Chain
from mcmcpp_tpu.chain_disk import DiskChain

N_CASES = 40


def _draw_cases(seed, n):
    rng = np.random.default_rng(seed)
    cases = []
    for i in range(n):
        w = int(rng.integers(1, 8))
        p = int(rng.integers(1, 6))
        n_blocks = int(rng.integers(0, 7))
        blocks = [int(rng.integers(0, 12)) for _ in range(n_blocks)]
        s_total = sum(blocks)
        burn = int(rng.integers(-s_total - 2, s_total + 3))
        thin = int(rng.integers(1, 6))
        # cap: unlimited half the time, else somewhere in [0, S+2] rows
        cap_rows = (
            None if rng.uniform() < 0.5 else int(rng.integers(0, s_total + 3))
        )
        cases.append((i, w, p, tuple(blocks), burn, thin, cap_rows))
    return cases


CASES = _draw_cases(0xC0FFEE, N_CASES)
IDS = [f"case{c[0]}" for c in CASES]

BACKENDS = ["numpy"] + (["native"] if native.available() else [])


def _fill(case_id, blocks, w, p):
    """Deterministic per-case data: one (S_i, W, P) float32 array per block
    plus matching logps."""
    rng = np.random.default_rng(case_id + 1000)
    pos = [rng.normal(size=(s, w, p)).astype(np.float32) for s in blocks]
    logp = [rng.normal(size=(s, w)).astype(np.float32) for s in blocks]
    return pos, logp


def _oracle(pos, logp, cap_rows, w, p):
    """Reference behavior: rows land until the cap, then stop."""
    all_pos = (
        np.concatenate(pos, axis=0) if pos else np.zeros((0, w, p), np.float32)
    )
    all_logp = (
        np.concatenate(logp, axis=0) if logp else np.zeros((0, w), np.float32)
    )
    if cap_rows is not None:
        all_pos, all_logp = all_pos[:cap_rows], all_logp[:cap_rows]
    return all_pos, all_logp


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("case", CASES, ids=IDS)
def test_chain_append_slice_compact(case, backend):
    case_id, w, p, blocks, burn, thin, cap_rows = case
    pos, logp = _fill(case_id, blocks, w, p)
    row_bytes = w * (p + 1) * 4
    max_bytes = (2 << 30) if cap_rows is None else cap_rows * row_bytes
    chain = Chain(w, p, max_bytes=max_bytes, backend=backend)
    assert chain.backend == backend

    kept = 0
    for blk_pos, blk_logp in zip(pos, logp):
        ok = chain.append(blk_pos, blk_logp)
        room = blk_pos.shape[0] if cap_rows is None else max(
            0, min(blk_pos.shape[0], cap_rows - kept)
        )
        kept += room
        assert ok == (room == blk_pos.shape[0]), (case, kept)

    opos, ologp = _oracle(pos, logp, cap_rows, w, p)
    assert chain.n_steps == opos.shape[0], case
    np.testing.assert_array_equal(chain.get(), opos, err_msg=str(case))
    np.testing.assert_array_equal(chain.get_logp(), ologp, err_msg=str(case))

    # burn+thin views (negative burn = keep-last slice semantics)
    view = chain.get(burn_in=burn, thin=thin)
    np.testing.assert_array_equal(view, opos[burn::thin], err_msg=str(case))
    np.testing.assert_array_equal(
        chain.get_logp(burn_in=burn, thin=thin), ologp[burn::thin],
        err_msg=str(case),
    )
    flat = chain.get(burn_in=burn, thin=thin, flat=True)
    np.testing.assert_array_equal(
        flat, opos[burn::thin].reshape(-1, p), err_msg=str(case)
    )
    # pset iteration order: step-major, walker-minor
    psets = list(chain.iter_psets(burn_in=burn, thin=thin))
    assert len(psets) == flat.shape[0]
    if psets:
        np.testing.assert_array_equal(np.stack(psets), flat)

    # in-place compaction == the view it replaces
    chain.compact(burn_in=burn, thin=thin)
    np.testing.assert_array_equal(
        chain.get(), opos[burn::thin], err_msg=str(case)
    )
    np.testing.assert_array_equal(
        chain.get_logp(), ologp[burn::thin], err_msg=str(case)
    )
    assert chain.n_steps == opos[burn::thin].shape[0]

    # a second compact with fresh parameters composes
    chain.compact(burn_in=1, thin=2)
    np.testing.assert_array_equal(
        chain.get(), opos[burn::thin][1::2], err_msg=str(case)
    )


@pytest.mark.parametrize("case", CASES[::4], ids=IDS[::4])
def test_disk_chain_matches_oracle(case, tmp_path):
    """DiskChain streams blocks through files + a manifest; its
    ``_block_slice`` arithmetic must agree with the NumPy oracle."""
    case_id, w, p, blocks, burn, thin, _ = case
    if burn < 0:
        burn = max(0, sum(blocks) + burn)  # DiskChain documents burn >= 0
    pos, logp = _fill(case_id, blocks, w, p)
    dc = DiskChain(tmp_path / f"dc{case_id}", w, p)
    for blk_pos, blk_logp in zip(pos, logp):
        dc.append(blk_pos, blk_logp)
    opos, ologp = _oracle(pos, logp, None, w, p)
    assert dc.n_steps == opos.shape[0]
    np.testing.assert_array_equal(
        dc.get(burn_in=burn, thin=thin), opos[burn::thin], err_msg=str(case)
    )
    np.testing.assert_array_equal(
        dc.get_logp(burn_in=burn, thin=thin), ologp[burn::thin],
        err_msg=str(case),
    )
    # reopen from the manifest: same contents
    dc2 = DiskChain.open(tmp_path / f"dc{case_id}")
    np.testing.assert_array_equal(dc2.get(), opos, err_msg=str(case))
    dc2.compact(burn_in=burn, thin=thin)
    np.testing.assert_array_equal(
        dc2.get(), opos[burn::thin], err_msg=str(case)
    )


_IO_DTYPES = [np.float32, np.float64, np.int32, np.int64]


@pytest.mark.parametrize("seed", range(12))
def test_npz_io_round_trip_fuzz(seed, tmp_path):
    """Random array bags (shapes incl. scalars and empties, mixed dtypes,
    non-finite values) through NpzEngine -> read_npz bitwise."""
    from mcmcpp_tpu.io.engines import NpzEngine, read_npz

    rng = np.random.default_rng(seed)
    arrays = {}
    meta = {}
    for j in range(int(rng.integers(1, 6))):
        ndim = int(rng.integers(0, 4))
        shape = tuple(int(rng.integers(0, 5)) for _ in range(ndim))
        dt = _IO_DTYPES[int(rng.integers(0, len(_IO_DTYPES)))]
        if np.issubdtype(dt, np.floating):
            a = rng.normal(size=shape).astype(dt)
            if a.size and rng.uniform() < 0.3:
                a.flat[0] = np.inf
                a.flat[-1] = np.nan
        else:
            a = rng.integers(-(2**31), 2**31 - 1, size=shape).astype(dt)
        arrays[f"arr{j}"] = a
        if rng.uniform() < 0.5:
            meta[f"arr{j}"] = {"k": float(j), "s": f"case{seed}"}
    path = tmp_path / f"fuzz{seed}.npz"
    with NpzEngine(path) as eng:
        for name, a in arrays.items():
            eng.write(name, a, meta=meta.get(name))
    back, back_meta = read_npz(path)
    assert set(back) == set(arrays)
    for name, a in arrays.items():
        assert back[name].dtype == a.dtype, (seed, name)
        np.testing.assert_array_equal(back[name], a, err_msg=f"{seed}:{name}")
    for name, m in meta.items():
        assert back_meta.get(name) == m


@pytest.mark.parametrize("seed", range(6))
def test_checkpoint_round_trip_fuzz(seed, tmp_path):
    """Ensemble checkpoints with random (W, P, stored-steps) restore to a
    bitwise-identical continuation."""
    import jax.numpy as jnp

    from mcmcpp_tpu import EnsembleSampler
    from mcmcpp_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    rng = np.random.default_rng(seed + 77)
    w = 2 * int(rng.integers(4, 17))
    p = int(rng.integers(1, 5))
    steps = int(rng.integers(1, 9))

    def logp(t):
        return -0.5 * jnp.sum(t * t)

    s = EnsembleSampler(logp, n_walkers=w, n_params=p, seed=seed)
    s.init_ball(np.zeros(p), scale=0.4, seed=seed + 1)
    s.run_mcmc(steps)
    save_checkpoint(s, tmp_path / "ck.npz")

    s2 = EnsembleSampler(logp, n_walkers=w, n_params=p, seed=seed)
    load_checkpoint(s2, tmp_path / "ck.npz")
    np.testing.assert_array_equal(s.get_samples(), s2.get_samples())

    s.run_mcmc(3)
    s2.run_mcmc(3)
    np.testing.assert_array_equal(
        s.get_samples(), s2.get_samples(), err_msg=str((seed, w, p, steps))
    )
    np.testing.assert_array_equal(
        np.asarray(s.per_walker_accepted), np.asarray(s2.per_walker_accepted)
    )
