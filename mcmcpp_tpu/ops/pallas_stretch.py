"""Pallas fused stretch-move half-step (EXPERIMENTAL alternative path).

One VMEM-resident pass fuses everything the XLA path does (partner roll
materialization, three threefry streams, proposal, log-prob, accept-select —
cf. ``MCMCpp/Movers/StretchMove.h:100-117``).

**Measured status (v5e, 2026-08)**: the default XLA path is FASTER — 2.2e9
updates/s vs 0.15e9 at P=10/W=2^21 (lane padding: (tile, 10) blocks waste
122/128 lanes per DMA) and 188M vs 118M at P=128/W=2^18 (scratch staging +
sequential-grid overhead). Kept as a correct, tested foundation for fused
large-P targets and as the in-tree example of scalar-prefetch block
routing + in-kernel hardware PRNG; the speed-of-light design for small P
is a transposed (P, W) layout, not this kernel. Mechanics:

- per-tile hardware PRNG (``pltpu.prng_random_bits``) replaces threefry,
- the shared-shift partner (ops/partner.py) is decomposed into a
  *coarse* block shift (routed through the BlockSpec index_map via scalar
  prefetch — partner tiles are DMA'd directly from the right offset, the
  rolled copy of ``other`` is never materialized) and a *fine* in-tile
  shift applied to a two-block window in VMEM,
- the user's batched logp is traced INTO the kernel per tile,
- accept/reject is a branchless select; the accept mask is emitted as an
  int32 vector (summed by the caller).

Requires n (half-ensemble size) divisible by the tile. Randomness is
deterministic given (seed, grid), but is a different stream from the
threefry path and changes with tile size — the fused mover trades the
bitwise any-topology reproducibility of the default path for speed.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bits_to_unit(bits):
    """random bits -> float32 uniform in [2^-25, 1): top 24 bits, zero-guarded.

    prng_random_bits can surface as int32 — bitcast to uint32 BEFORE the
    shift or Mosaic emits an arithmetic (sign-propagating) shift.
    """
    u = pltpu.bitcast(bits, jnp.uint32) >> 8
    # Mosaic lacks uint32->f32; the top-24-bit value fits in int32 exactly
    u = pltpu.bitcast(u, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.maximum(u, 1.0 / (1 << 25))


def _kernel(r_coarse_ref, seed_ref, r_fine_ref,  # scalar prefetch
            act_ref, lp_ref, oth0_ref, oth1_ref,  # inputs
            *rest,  # logp closure-constant refs, then outputs
            a, logp_fn, tile, n_consts, const_shapes):
    const_refs = rest[:n_consts]
    out_act_ref, out_lp_ref, acc_ref, win_ref = rest[n_consts:]
    consts = [
        ref[:].reshape(shape) for ref, shape in zip(const_refs, const_shapes)
    ]
    logp_fn = functools.partial(logp_fn, consts)
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + i)
    p_dim = act_ref.shape[1]

    # partner tile: rows [r_fine, r_fine + tile) of the 2-block window,
    # staged through VMEM scratch (ref-indexed dynamic slice; Mosaic has no
    # dynamic_slice on values)
    win_ref[0:tile, :] = oth0_ref[:]
    win_ref[tile:2 * tile, :] = oth1_ref[:]
    partner = win_ref[pl.ds(r_fine_ref[0], tile), :]

    u = _bits_to_unit(pltpu.prng_random_bits((tile, 1)))
    ue = _bits_to_unit(pltpu.prng_random_bits((tile, 1)))
    sqrt_a = jnp.sqrt(jnp.float32(a))
    z = jnp.square((sqrt_a - 1.0 / sqrt_a) * u + 1.0 / sqrt_a)  # (tile, 1)

    act = act_ref[:]
    prop = partner + z * (act - partner)
    lp_new = logp_fn(prop)  # user code traced into the kernel, (tile,)
    lp_new = lp_new.reshape((tile,))
    # the logp/accept planes travel as (n, 1) 2-D arrays: current Pallas
    # TPU lowering requires rank-1 blocks to be full-length or multiples
    # of 128, which small tiles violate; (tile, 1) 2-D blocks are always
    # legal (observed lowering failure on real v5e, 2026-08-20)
    lp_old = lp_ref[:, 0]
    log_ratio = (p_dim - 1) * jnp.log(z[:, 0]) + lp_new - lp_old
    accept = jnp.log(ue[:, 0]) < log_ratio
    out_act_ref[:] = jnp.where(accept[:, None], prop, act)
    out_lp_ref[:] = jnp.where(accept, lp_new, lp_old)[:, None]
    acc_ref[:] = accept.astype(jnp.int32)[:, None]


@functools.partial(
    jax.jit, static_argnames=("a", "logp_fn", "tile", "interpret")
)
def fused_stretch_half(key, active, active_logp, other, *, a=2.0,
                       logp_fn, tile=1024, interpret=False):
    """One fused stretch half-step. Returns (new_active, new_logp, accepted).

    active/other: (n, P) with n == m (red/black halves); logp_fn must map
    (tile, P) -> (tile,) and be traceable inside a Pallas kernel.
    """
    n, p_dim = active.shape
    if other.shape != (n, p_dim):
        raise ValueError("fused stretch requires equal halves")
    tile = min(tile, n)
    if n % tile != 0:
        raise ValueError(f"half size {n} not divisible by tile {tile}")
    grid = n // tile

    k_seed, k_shift = jax.random.split(key)
    seed = jax.random.randint(k_seed, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    shift = jax.random.randint(k_shift, (), 0, n, dtype=jnp.int32)
    r_coarse = (shift // tile).reshape(1)
    r_fine = (shift % tile).reshape(1)

    # pallas kernels cannot capture closure constants — trace the user logp
    # to a jaxpr, hoist its constants, and pass them as (replicated) kernel
    # inputs re-bound inside the kernel
    closed = jax.make_jaxpr(lambda x: logp_fn(x))(
        jax.ShapeDtypeStruct((tile, p_dim), active.dtype)
    )
    consts = closed.consts
    const_shapes = tuple(jnp.shape(c) for c in consts)
    consts_in = [jnp.atleast_2d(jnp.asarray(c)) for c in consts]

    def kernel_logp(consts, x):
        (out,) = jax.core.eval_jaxpr(closed.jaxpr, consts, x)
        return out

    const_specs = [
        pl.BlockSpec(c.shape, lambda i, rc, s, rf, nd=c.ndim: (0,) * nd)
        for c in consts_in
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, p_dim), lambda i, rc, s, rf: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, rc, s, rf: (i, 0)),
            # partner window: blocks (i+rc) and (i+rc+1), wrapped
            pl.BlockSpec(
                (tile, p_dim),
                lambda i, rc, s, rf, g=grid: ((i + rc[0]) % g, 0),
            ),
            pl.BlockSpec(
                (tile, p_dim),
                lambda i, rc, s, rf, g=grid: ((i + rc[0] + 1) % g, 0),
            ),
            *const_specs,
        ],
        out_specs=[
            pl.BlockSpec((tile, p_dim), lambda i, rc, s, rf: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, rc, s, rf: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i, rc, s, rf: (i, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((2 * tile, p_dim), active.dtype)],
    )
    kernel = functools.partial(
        _kernel, a=a, logp_fn=kernel_logp, tile=tile,
        n_consts=len(consts), const_shapes=const_shapes,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, p_dim), active.dtype),
            jax.ShapeDtypeStruct((n, 1), active_logp.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        # TPU-specific primitives (prng_seed etc.) need the TPU interpreter
        # (InterpretParams), not the generic interpret=True path
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    new_act, new_lp, accepted = call(
        r_coarse, seed, r_fine, active, active_logp.reshape(n, 1),
        other, other, *consts_in
    )
    return new_act, new_lp[:, 0], accepted[:, 0]
