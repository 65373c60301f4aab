"""ctypes binding for the native C++ block chain store.

Builds with ``make -C mcmcpp_tpu/native`` (g++, no external deps). If the
shared library is absent the package transparently falls back to the
pure-NumPy Chain (mcmcpp_tpu/chain.py) — identical semantics, slower
appends at large chain sizes.
"""

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libmcmcpp_chain.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64 = ctypes.c_int64
    ptr = ctypes.c_void_p
    lib.mc_chain_create.restype = ptr
    lib.mc_chain_create.argtypes = [i64, i64, i64, i64]
    lib.mc_chain_append.restype = i64
    lib.mc_chain_append.argtypes = [ptr, i64, ptr, ptr]
    lib.mc_chain_steps.restype = i64
    lib.mc_chain_steps.argtypes = [ptr]
    lib.mc_chain_bytes.restype = i64
    lib.mc_chain_bytes.argtypes = [ptr]
    lib.mc_chain_read_count.restype = i64
    lib.mc_chain_read_count.argtypes = [ptr, i64, i64]
    lib.mc_chain_read.restype = None
    lib.mc_chain_read.argtypes = [ptr, ptr, ptr, i64, i64]
    lib.mc_chain_compact.restype = None
    lib.mc_chain_compact.argtypes = [ptr, i64, i64]
    lib.mc_chain_clear.restype = None
    lib.mc_chain_clear.argtypes = [ptr]
    lib.mc_chain_destroy.restype = None
    lib.mc_chain_destroy.argtypes = [ptr]
    _LIB = lib
    return lib


def available():
    return _load() is not None


class NativeChainStore:
    """Thin RAII wrapper over the C chain-store handle."""

    def __init__(self, n_walkers, n_params, max_bytes, dtype):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native chain store not built; run `make -C mcmcpp_tpu/native`"
            )
        self._lib = lib
        self.n_walkers = int(n_walkers)
        self.n_params = int(n_params)
        self.dtype = np.dtype(dtype)
        self._h = lib.mc_chain_create(
            self.n_walkers, self.n_params, int(max_bytes), self.dtype.itemsize
        )
        if not self._h:
            raise MemoryError("mc_chain_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.mc_chain_destroy(h)
            self._h = None

    @staticmethod
    def _cptr(arr):
        return arr.ctypes.data_as(ctypes.c_void_p)

    def append(self, positions, logps):
        positions = np.ascontiguousarray(positions, self.dtype)
        logps = np.ascontiguousarray(logps, self.dtype)
        steps = positions.shape[0]
        taken = self._lib.mc_chain_append(
            self._h, steps, self._cptr(positions), self._cptr(logps)
        )
        return taken == steps

    @property
    def n_steps(self):
        return self._lib.mc_chain_steps(self._h)

    @property
    def nbytes(self):
        return self._lib.mc_chain_bytes(self._h)

    def read(self, burn_in=0, thin=1):
        n = self._lib.mc_chain_read_count(self._h, burn_in, thin)
        pos = np.empty((n, self.n_walkers, self.n_params), self.dtype)
        logp = np.empty((n, self.n_walkers), self.dtype)
        self._lib.mc_chain_read(
            self._h, self._cptr(pos), self._cptr(logp), burn_in, thin
        )
        return pos, logp

    def compact(self, burn_in=0, thin=1):
        self._lib.mc_chain_compact(self._h, burn_in, thin)

    def clear(self):
        self._lib.mc_chain_clear(self._h)
