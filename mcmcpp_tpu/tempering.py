"""Parallel tempering (replica exchange) over a temperature × walker grid.

Beyond-reference capability (ROADMAP item, natural TPU fit): K tempered
replicas of the full red/black walker ensemble run as ONE ``(K, W/2, P)``
batch — the temperature axis is just another vmapped (and shardable)
dimension. Each replica targets π^β_k with a shared mover (acceptance
tempered via ``Mover.update_half(beta=...)``, log-probs stored RAW); every
``swap_every`` steps adjacent-temperature replicas propose per-walker state
swaps with the standard exchange rule

    log α = (β_k − β_{k+1}) · (logp_{k+1} − logp_k)

in alternating even/odd pair phases (the red/black idea applied to the
ladder). Samples are read from the β = 1 replica.
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from mcmcpp_tpu.chain import Chain, append_device_chunk, default_chunk_steps
from mcmcpp_tpu.movers.stretch import StretchMove


class PTState(NamedTuple):
    red: jax.Array  # (K, H, P)
    black: jax.Array  # (K, H, P)
    logp_red: jax.Array  # (K, H) raw logp
    logp_black: jax.Array  # (K, H)
    step: jax.Array
    swaps_accepted: jax.Array  # (K-1,) int32
    swaps_proposed: jax.Array  # (K-1,) int32


def geometric_ladder(n_temps, beta_min=0.01):
    """β ladder 1 → beta_min, geometric spacing (standard default)."""
    return jnp.asarray(
        np.geomspace(1.0, beta_min, n_temps), jnp.float32
    )


def _swap_phase(key, pos_r, pos_b, lp_r, lp_b, betas, parity):
    """Propose swaps between ladder pairs (k, k+1) with k ≡ parity (mod 2).

    Swaps act on the FULL replica state (both halves) per walker.
    """
    k_dim = pos_r.shape[0]
    dbeta = betas[:-1] - betas[1:]  # (K-1,)
    # per-walker exchange decisions for every adjacent pair; only pairs of
    # the current parity act, so active pairs touch disjoint replica rows
    log_alpha_r = dbeta[:, None] * (lp_r[1:] - lp_r[:-1])  # (K-1, H)
    log_alpha_b = dbeta[:, None] * (lp_b[1:] - lp_b[:-1])
    kr, kb = jax.random.split(key)
    u_r = -jax.random.exponential(kr, log_alpha_r.shape, log_alpha_r.dtype)
    u_b = -jax.random.exponential(kb, log_alpha_b.shape, log_alpha_b.dtype)
    pair_idx = jnp.arange(k_dim - 1)
    active_pair = (pair_idx % 2) == parity  # (K-1,)
    acc_r = (u_r < log_alpha_r) & active_pair[:, None]  # (K-1, H)
    acc_b = (u_b < log_alpha_b) & active_pair[:, None]

    def apply(pos, lp, acc):
        # build swapped copies: row k takes from k+1 where acc[k], and
        # row k+1 takes from k where acc[k]
        take_upper = jnp.zeros(pos.shape[:2], bool)  # row k <- k+1
        take_upper = take_upper.at[:-1].set(acc)
        take_lower = jnp.zeros(pos.shape[:2], bool)  # row k+1 <- k
        take_lower = take_lower.at[1:].set(acc)
        up = jnp.roll(pos, -1, axis=0)  # row k holds pos[k+1]
        down = jnp.roll(pos, 1, axis=0)
        new_pos = jnp.where(take_upper[..., None], up, pos)
        new_pos = jnp.where(take_lower[..., None], down, new_pos)
        lp_up = jnp.roll(lp, -1, axis=0)
        lp_down = jnp.roll(lp, 1, axis=0)
        new_lp = jnp.where(take_upper, lp_up, lp)
        new_lp = jnp.where(take_lower, lp_down, new_lp)
        return new_pos, new_lp

    pos_r, lp_r = apply(pos_r, lp_r, acc_r)
    pos_b, lp_b = apply(pos_b, lp_b, acc_b)
    n_acc = jnp.sum(acc_r, axis=1) + jnp.sum(acc_b, axis=1)  # (K-1,)
    h = pos_r.shape[1]
    n_prop = active_pair.astype(jnp.int32) * (2 * h)
    return pos_r, pos_b, lp_r, lp_b, n_acc.astype(jnp.int32), n_prop


class ParallelTemperingSampler:
    """Replica-exchange ensemble sampler.

    logp_fn: (P,) -> scalar raw log-posterior (JAX-traceable).
    n_temps/betas: ladder size or explicit β vector (β[0] must be 1).
    swap_every: steps between exchange phases.
    Samples/statistics are exposed for the cold (β=1) replica; swap
    acceptance rates per ladder pair via ``swap_acceptance``.
    """

    def __init__(self, logp_fn, n_walkers, n_params, n_temps=8, betas=None,
                 mover=None, seed=0, dtype=jnp.float32, swap_every=1,
                 max_chain_bytes=2 << 30, batched=False, mesh=None,
                 chain=None):
        if n_walkers % 2:
            raise ValueError("n_walkers must be even")
        self.n_walkers = int(n_walkers)
        self.n_params = int(n_params)
        self.dtype = dtype
        self.swap_every = int(swap_every)
        self.betas = (jnp.asarray(betas, dtype) if betas is not None
                      else geometric_ladder(n_temps))
        if float(self.betas[0]) != 1.0:
            raise ValueError("betas[0] must be 1.0 (the cold chain)")
        self.n_temps = int(self.betas.shape[0])
        self.mover = mover if mover is not None else StretchMove()
        self._mover_state = self.mover.init_state(self.n_params, dtype)
        self._batched_logp = logp_fn if batched else jax.vmap(logp_fn)
        self._key = jax.random.key(seed)
        self._step_key, self._aux_key = jax.random.split(self._key)
        self._step_epoch = 0
        self._epoch_key = jax.random.fold_in(self._step_key, 0)
        self.state = None
        if chain is not None:
            if (chain.n_walkers, chain.n_params) != (
                self.n_walkers, self.n_params,
            ):
                raise ValueError("injected chain store geometry mismatch")
            self.chain = chain
        else:
            self.chain = Chain(
                n_walkers=self.n_walkers, n_params=self.n_params,
                max_bytes=max_chain_bytes,
                dtype=np.dtype(jax.dtypes.canonicalize_dtype(dtype)),
            )
        self._run_cache = {}
        self._swaps_acc_host = np.zeros(self.n_temps - 1, np.int64)
        self._swaps_prop_host = np.zeros(self.n_temps - 1, np.int64)
        # optional mesh sharding, two layouts picked by the mesh axis names:
        # - walker mesh (parallel/mesh.make_walker_mesh): the (K, H, P) grid
        #   shards its WALKER axis over the whole mesh (ladder replicated) —
        #   exchange phases are per-walker elementwise, so swaps need no
        #   collectives; only the mover's partner roll crosses devices.
        # - ladder mesh (parallel/mesh.make_ladder_mesh, for K > device
        #   count): K shards over the "ladder" axis, H over "walkers"; the
        #   K-axis rolls in the swap phase become neighbor
        #   collective-permutes over the ladder axis.
        self.mesh = mesh
        self._grid_sh = self._gridvec_sh = self._rep_sh = None
        if mesh is not None:
            from mcmcpp_tpu.parallel.mesh import (
                grid_sharding,
                ladder_grid_sharding,
                replicated,
            )

            if "ladder" in mesh.axis_names:
                kd = mesh.shape["ladder"]
                wd = mesh.shape["walkers"]
                if self.n_temps % kd != 0:
                    raise ValueError(
                        f"ladder size {self.n_temps} not divisible by the "
                        f"mesh's {kd} ladder shards"
                    )
                if (self.n_walkers // 2) % wd != 0:
                    raise ValueError(
                        f"half-ensemble size {self.n_walkers // 2} not "
                        f"divisible by {wd} walker shards"
                    )
                self._grid_sh = ladder_grid_sharding(mesh, ndim=3)
                self._gridvec_sh = ladder_grid_sharding(mesh, ndim=2)
            else:
                if (self.n_walkers // 2) % mesh.size != 0:
                    raise ValueError(
                        f"half-ensemble size {self.n_walkers // 2} not "
                        f"divisible by mesh size {mesh.size}"
                    )
                self._grid_sh = grid_sharding(mesh, ndim=3)
                self._gridvec_sh = grid_sharding(mesh, ndim=2)
            self._rep_sh = replicated(mesh)

    def init_ball(self, center, scale=1e-2, seed=None):
        key = self._aux_key if seed is None else jax.random.key(seed)
        center = jnp.asarray(center, self.dtype)
        z = jax.random.normal(
            key, (self.n_temps, self.n_walkers, self.n_params), self.dtype
        )
        pos = center[None, None, :] + scale * z
        h = self.n_walkers // 2
        red, black = pos[:, :h], pos[:, h:]
        if self._grid_sh is not None:
            red = jax.device_put(red, self._grid_sh)
            black = jax.device_put(black, self._grid_sh)
        lp = lambda x: jax.vmap(self._batched_logp)(x)
        self.state = PTState(
            red=red, black=black,
            logp_red=lp(red), logp_black=lp(black),
            step=jnp.zeros((), jnp.int32),
            swaps_accepted=jnp.zeros((self.n_temps - 1,), jnp.int32),
            swaps_proposed=jnp.zeros((self.n_temps - 1,), jnp.int32),
        )
        return self

    def _constrain(self, state: PTState) -> PTState:
        if self._grid_sh is None:
            return state
        c = lambda x: jax.lax.with_sharding_constraint(x, self._grid_sh)
        v = lambda x: jax.lax.with_sharding_constraint(x, self._gridvec_sh)
        r = lambda x: jax.lax.with_sharding_constraint(x, self._rep_sh)
        return state._replace(
            red=c(state.red), black=c(state.black),
            logp_red=v(state.logp_red), logp_black=v(state.logp_black),
            # swap counters are global statistics: pin them replicated so
            # every host can read them directly (multi-host safe)
            swaps_accepted=r(state.swaps_accepted),
            swaps_proposed=r(state.swaps_proposed),
        )

    def _step(self, state: PTState) -> PTState:
        state = self._constrain(state)
        key = jax.random.fold_in(self._epoch_key, state.step)
        k_red, k_black, k_swap = jax.random.split(key, 3)

        def half_update(key, active, lp, other, beta):
            return self.mover.update_half(
                key, active, lp, other, self._batched_logp,
                self._mover_state, beta=beta,
            )

        keys_r = jax.random.split(k_red, self.n_temps)
        red, lp_red, _ = jax.vmap(half_update)(
            keys_r, state.red, state.logp_red, state.black, self.betas
        )
        keys_b = jax.random.split(k_black, self.n_temps)
        black, lp_black, _ = jax.vmap(half_update)(
            keys_b, state.black, state.logp_black, red, self.betas
        )
        swaps_acc, swaps_prop = state.swaps_accepted, state.swaps_proposed

        def do_swap(args):
            red, black, lp_red, lp_black, sa, sp = args
            parity = (state.step // self.swap_every) % 2
            r, b, lr, lb, n_acc, n_prop = _swap_phase(
                k_swap, red, black, lp_red, lp_black, self.betas, parity
            )
            return r, b, lr, lb, sa + n_acc, sp + n_prop

        red, black, lp_red, lp_black, swaps_acc, swaps_prop = jax.lax.cond(
            (state.step + 1) % self.swap_every == 0,
            do_swap,
            lambda args: args,
            (red, black, lp_red, lp_black, swaps_acc, swaps_prop),
        )
        return PTState(red, black, lp_red, lp_black, state.step + 1,
                       swaps_acc, swaps_prop)

    def _scan_fn(self, n_store, thin):
        fn = self._run_cache.get((n_store, thin))
        if fn is None:

            def scan_run(state):
                def body(carry, _):
                    carry = jax.lax.fori_loop(
                        0, thin, lambda i, s: self._step(s), carry
                    )
                    pos = jnp.concatenate([carry.red[0], carry.black[0]], 0)
                    lp = jnp.concatenate(
                        [carry.logp_red[0], carry.logp_black[0]], 0
                    )
                    return carry, (pos, lp)

                return jax.lax.scan(body, state, length=n_store)

            fn = jax.jit(scan_run)
            self._run_cache[(n_store, thin)] = fn
        return fn

    def _harvest_swaps(self):
        """Move int32 device swap counters into host ints (overflow-safe)."""
        self._swaps_acc_host += np.asarray(self.state.swaps_accepted, np.int64)
        self._swaps_prop_host += np.asarray(self.state.swaps_proposed, np.int64)
        zero = jnp.zeros((self.n_temps - 1,), jnp.int32)
        self.state = self.state._replace(
            swaps_accepted=zero, swaps_proposed=zero
        )

    def run_mcmc(self, n_steps, thin=1):
        """Advance all replicas; store the cold chain every ``thin`` steps.

        Returns False if the cold chain hit its byte capacity (further
        stores are skipped, ≙ EndOfChain), else True. Leftover
        ``n_steps % thin`` steps still advance the replicas unstored.
        """
        if self.state is None:
            raise RuntimeError("call init_ball first")
        if int(n_steps) > (1 << 30):
            raise ValueError("split runs over 2^30 steps into multiple calls")
        thin = int(thin)
        n_store = int(n_steps) // thin
        leftover = int(n_steps) - n_store * thin
        # bound the scan's device output to ~64 MiB per chunk
        chunk = default_chunk_steps(self.n_walkers, self.n_params, self.dtype)
        done = 0
        ok = True
        pending = None  # pipelined store: launch chunk k, fetch chunk k-1
        while done < n_store or pending is not None:
            if done < n_store:
                take = min(chunk, n_store - done)
                self.state, launched = self._scan_fn(take, thin)(self.state)
                done += take
            else:
                launched = None
            if pending is not None:
                self.chain, appended = append_device_chunk(
                    self.chain, pending[0], pending[1]
                )
                if not appended:
                    ok = False
                    pending = None
                    break
            pending = launched
        if ok and leftover:
            fn = self._run_cache.get(("leftover", leftover))
            if fn is None:
                fn = jax.jit(
                    lambda s, t=leftover: jax.lax.fori_loop(
                        0, t, lambda i, x: self._step(x), s
                    )
                )
                self._run_cache[("leftover", leftover)] = fn
            self.state = fn(self.state)
        self._harvest_swaps()
        # rotate the key epoch before the int32 step counter can wrap
        if int(self.state.step) >= (1 << 30):
            self._step_epoch += 1
            self._epoch_key = jax.random.fold_in(
                self._step_key, self._step_epoch
            )
            self.state = self.state._replace(step=jnp.zeros((), jnp.int32))
            self._run_cache.clear()  # cached scans captured the old key
        return ok

    def tune_ladder(self, n_blocks=10, block_steps=100, target=0.4,
                    eta=0.6, min_rate=0.02):
        """Adapt the β ladder toward uniform swap acceptance ≈ ``target``.

        Multiplicative log-spacing updates per block (a simplified
        Vousden-et-al.-style scheme): pairs swapping too often move apart,
        pairs swapping too rarely move together; β[0] stays 1. Call before
        production sampling (the chain is cleared afterwards). Returns self.
        """
        if self.state is None:
            raise RuntimeError("call init_ball first")
        log_gaps = -np.diff(np.log(np.asarray(self.betas, np.float64)))
        for _ in range(int(n_blocks)):
            before_acc = self._swaps_acc_host.copy()
            before_prop = self._swaps_prop_host.copy()
            self.run_mcmc(int(block_steps), thin=int(block_steps))
            d_acc = self._swaps_acc_host - before_acc
            d_prop = np.maximum(self._swaps_prop_host - before_prop, 1)
            rates = np.maximum(d_acc / d_prop, min_rate)
            # too-frequent swaps -> widen the gap; too-rare -> shrink it
            log_gaps = log_gaps * (rates / target) ** eta
            log_gaps = np.clip(log_gaps, 1e-3, 10.0)
            self.betas = jnp.asarray(
                np.exp(-np.concatenate([[0.0], np.cumsum(log_gaps)])),
                self.dtype,
            )
            self._run_cache.clear()  # cached scans captured the old ladder
        self.chain.clear()
        self._swaps_acc_host[:] = 0
        self._swaps_prop_host[:] = 0
        return self

    @property
    def swap_acceptance(self):
        """Per-ladder-pair swap acceptance rates, (K-1,)."""
        prop = (self._swaps_prop_host
                + np.asarray(self.state.swaps_proposed, np.int64)).astype(
                    np.float64)
        acc = (self._swaps_acc_host
               + np.asarray(self.state.swaps_accepted, np.int64)).astype(
                   np.float64)
        return np.where(prop > 0, acc / np.maximum(prop, 1), 0.0)

    def get_samples(self, burn_in=0, thin=1, flat=False):
        """Cold-chain (β=1) samples."""
        return self.chain.get(burn_in=burn_in, thin=thin, flat=flat)

    def get_log_probs(self, burn_in=0, thin=1, flat=False):
        """Cold-chain RAW log-posteriors (stored untempered)."""
        return self.chain.get_logp(burn_in=burn_in, thin=thin, flat=flat)
