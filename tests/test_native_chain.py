"""Native C++ chain store vs pure-NumPy backend: identical semantics."""

import numpy as np
import pytest

from mcmcpp_tpu.chain import Chain
from mcmcpp_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native chain store not built"
)


def _fill(chain, rng, chunks=(3, 5, 2)):
    for s in chunks:
        pos = rng.standard_normal((s, chain.n_walkers, chain.n_params)).astype(
            chain.dtype
        )
        logp = rng.standard_normal((s, chain.n_walkers)).astype(chain.dtype)
        chain.append(pos, logp)


def _pair(**kw):
    a = Chain(n_walkers=6, n_params=3, backend="native", **kw)
    b = Chain(n_walkers=6, n_params=3, backend="numpy", **kw)
    return a, b


def test_backend_selected():
    assert Chain(4, 2, backend="native").backend == "native"
    assert Chain(4, 2, backend="numpy").backend == "numpy"
    assert Chain(4, 2, backend="auto").backend == "native"


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_parity_append_read(dtype):
    a, b = _pair(dtype=dtype)
    rng1, rng2 = np.random.default_rng(0), np.random.default_rng(0)
    _fill(a, rng1)
    _fill(b, rng2)
    assert a.n_steps == b.n_steps == 10
    np.testing.assert_array_equal(a.get(), b.get())
    np.testing.assert_array_equal(a.get_logp(), b.get_logp())
    np.testing.assert_array_equal(
        a.get(burn_in=2, thin=3, flat=True), b.get(burn_in=2, thin=3, flat=True)
    )


def test_parity_compact_and_clear():
    a, b = _pair()
    rng1, rng2 = np.random.default_rng(1), np.random.default_rng(1)
    _fill(a, rng1, chunks=(20, 15))
    _fill(b, rng2, chunks=(20, 15))
    a.compact(burn_in=5, thin=4)
    b.compact(burn_in=5, thin=4)
    assert a.n_steps == b.n_steps
    np.testing.assert_array_equal(a.get(), b.get())
    np.testing.assert_array_equal(a.get_logp(), b.get_logp())
    a.clear(), b.clear()
    assert a.n_steps == b.n_steps == 0
    assert a.get().shape == b.get().shape == (0, 6, 3)


def test_byte_cap_end_of_chain():
    row = 6 * 4 * np.dtype(np.float32).itemsize  # W*(P+1)*itemsize
    a = Chain(n_walkers=6, n_params=3, max_bytes=7 * row, backend="native")
    pos = np.zeros((5, 6, 3), np.float32)
    logp = np.zeros((5, 6), np.float32)
    assert a.append(pos, logp) is True  # 5 of 7 used
    assert a.append(pos, logp) is False  # only 2 more fit
    assert a.n_steps == 7


@pytest.mark.slow
def test_block_boundary_crossing():
    """Appends larger than one native block must still round-trip."""
    a = Chain(n_walkers=64, n_params=128, backend="native")
    # block cap is 64 MiB / row -> force multiple blocks
    steps = (64 << 20) // (64 * 129 * 4) + 10
    rng = np.random.default_rng(2)
    pos = rng.standard_normal((steps, 64, 128)).astype(np.float32)
    logp = rng.standard_normal((steps, 64)).astype(np.float32)
    assert a.append(pos, logp)
    got, got_lp = a.get(), a.get_logp()
    np.testing.assert_array_equal(got, pos)
    np.testing.assert_array_equal(got_lp, logp)


def test_iterators_match_views():
    a = Chain(n_walkers=4, n_params=2, backend="numpy")
    rng = np.random.default_rng(3)
    _fill(a, rng)
    steps = list(a.iter_steps(burn_in=1, thin=2))
    np.testing.assert_array_equal(np.stack(steps), a.get(burn_in=1, thin=2))
    psets = list(a.iter_psets())
    assert len(psets) == a.n_steps * 4
    np.testing.assert_array_equal(psets[5], a.get(flat=True)[5])


def test_asan_harness():
    """Build + run the C++ store under AddressSanitizer/UBSan."""
    import subprocess, shutil
    from pathlib import Path

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    native = Path(__file__).resolve().parents[1] / "mcmcpp_tpu" / "native"
    r = subprocess.run(["make", "-s", "-C", str(native), "test"],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "ASAN tests passed" in r.stdout
