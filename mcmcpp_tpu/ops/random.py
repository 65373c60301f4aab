"""Counter-based PRNG key plumbing.

Replaces the reference's pcg64 seed+stream multiplexer
(``MCMCpp/Utility/MultiSampler.h:54``, per-thread streams at
``MCMCpp/Threading/RedBlkUpdater.h:86``) with JAX threefry key folding:
``fold_in(key, step)`` then splitting per phase gives every (step, phase)
an independent stream — deterministic regardless of device count, which
the pthread reference explicitly gives up
(``MCMCpp/ParallelEnsembleSampler.h:71-76``).
"""

import jax


def split_for_step(base_key, step_index, num=2):
    """Derive ``num`` independent keys for one sampler step.

    Deterministic in (base_key, step_index); safe to call inside lax.scan
    with a traced step index.
    """
    k = jax.random.fold_in(base_key, step_index)
    return jax.random.split(k, num)
