"""Complementary-walker selection: shared-shift (roll) vs iid gather.

The reference picks each walker's complementary partner(s) with per-walker
uniform draws (``MCMCpp/Movers/StretchMove.h:102``). The literal TPU
translation — ``jnp.take(other, randint(...))`` — lowers to a per-row HBM
gather that measures ~18x slower than the rest of the step at large W
(262k walkers: 7.4 ms/step vs 0.45 ms with rolls; see bench notes).

The TPU-native selection is a **shared random shift**: draw r uniform in
[0, m) once per half-step and pair walker i with ``other[(i + r) % m]`` —
one contiguous ``jnp.roll``, no gather. Validity: the pairing is chosen
independently of the chain state, so conditioned on the complement the
update remains a product of valid per-walker Metropolis kernels, and the
step is a uniform mixture over m cyclic pairings — detailed balance holds
exactly as for iid selection (walkers in the active half are conditionally
independent given the complement). Movers needing k distinct partners draw
k *distinct* shifts, guaranteeing per-walker distinctness.

``mode="gather"`` keeps the reference-faithful iid choice for small
ensembles / parity studies.
"""

import jax
import jax.numpy as jnp


def distinct_shifts(key, m, k):
    """k distinct uniform shifts in [0, m), k static & small (O(k²) scalar).

    Sorted-insertion sampling: draw d_t in [0, m−t) and bump it past each
    already-chosen value in increasing order — exact uniform sampling
    without replacement, branchless, all scalar ops.
    """
    if k > m:
        raise ValueError(f"need {k} distinct shifts from only {m} values")
    chosen = []
    for t in range(k):
        d = jax.random.randint(jax.random.fold_in(key, t), (), 0, m - t)
        if chosen:
            prev = jnp.sort(jnp.stack(chosen))
            for idx in range(t):
                d = d + (d >= prev[idx]).astype(d.dtype)
        chosen.append(d)
    return jnp.stack(chosen)


def rolled_partners(key, other, k):
    """(k, m, P) stack: row j is ``other`` rolled so that walker i sees
    partner (i + r_j) mod m, with r_1..r_k distinct."""
    m = other.shape[0]
    shifts = distinct_shifts(key, m, k)
    return jnp.stack([jnp.roll(other, -shifts[j], axis=0) for j in range(k)])


def gather_partners(key, other, n, k):
    """(k, n, P) iid uniform partners (reference-faithful; HBM gather).

    For k ≥ 2 the draws are made distinct per walker via shifted draws
    (uniform over distinct k-tuples, no rejection loop) — replaces the
    reference's rejection loop (``DifferentialEvolution.h:116-120``).
    """
    m = other.shape[0]
    out = []
    prev_idx = []
    for t in range(k):
        kt = jax.random.fold_in(key, t)
        j = jax.random.randint(kt, (n,), 0, m - t)
        if prev_idx:
            prev = jnp.sort(jnp.stack(prev_idx, axis=-1), axis=-1)  # (n, t)
            for s in range(t):
                j = j + (j >= prev[:, s]).astype(j.dtype)
        prev_idx.append(j)
        out.append(jnp.take(other, j, axis=0))
    return jnp.stack(out)


def select_partners(key, other, n, k, mode):
    """Dispatch: (k, n, P) partners for n active walkers.

    mode="roll": shared-shift (requires n == m, the red/black layout).
    mode="gather": iid per-walker uniform draws.
    """
    if mode == "roll":
        parts = rolled_partners(key, other, k)
        if parts.shape[1] != n:
            raise ValueError(
                f"roll mode requires equal halves (n={n}, m={parts.shape[1]})"
            )
        return parts
    if mode == "gather":
        return gather_partners(key, other, n, k)
    raise ValueError(f"unknown partner mode {mode!r}")
