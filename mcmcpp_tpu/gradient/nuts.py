"""No-U-Turn Sampler: iterative, multinomial, fixed max depth.

XLA cannot trace the classic recursive tree build, so this is the iterative
formulation (cf. the numpyro/blackjax lineage): an outer ``while_loop`` over
tree doublings and an inner ``while_loop`` over the 2^depth leapfrog leaves
of each new subtree, with U-turn detection against O(log n) stored
checkpoints. For leaf ``n`` the active-subtree left endpoints live at
checkpoint slots [idx_min, idx_max] where

    idx_max = popcount(n >> 1)
    idx_min = idx_max - popcount(n & ~(n+1)) + 1   (trailing ones)

even leaves store slot ``idx_max``; odd leaves U-turn-test against every
slot in range. Proposals are drawn progressively with multinomial weights
w = exp(H - H0) and the outer merge is biased (Betancourt 2017).

Per-chain transition; vmapped over chains by the shared GradientSampler
driver (hmc.py). No reference counterpart — north-star scope.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mcmcpp_tpu.gradient.hmc import GradientSampler
from mcmcpp_tpu.gradient.metric import (
    mass_kinetic,
    mass_momentum,
    mass_velocity,
)


class _Z(NamedTuple):
    """One phase-space point."""

    q: jax.Array
    p: jax.Array
    lp: jax.Array
    g: jax.Array


def _uturn(dq, p_a, p_b, inv_mass):
    """Generalized U-turn test on a segment with displacement dq (time
    order a→b): turning when dq·(M⁻¹p) < 0 at either end."""
    return (jnp.dot(dq, mass_velocity(inv_mass, p_a)) < 0.0) | (
        jnp.dot(dq, mass_velocity(inv_mass, p_b)) < 0.0
    )


def nuts_kernel(logp_fn, max_depth=10, max_delta_energy=1000.0):
    """Build the one-chain NUTS transition.

    Returns ``kernel(key, q, logp, grad, step_size, inv_mass) ->
    ((q, logp, grad), (accept_stat, moved, diverging, energy))`` where
    ``accept_stat`` is the Stan-style mean Metropolis statistic over
    visited leaves (drives dual averaging in the shared driver),
    ``diverging`` flags a tree whose build stopped on an energy error
    beyond ``max_delta_energy``, and ``energy`` is the post-refresh
    Hamiltonian (E-BFMI statistic).
    """
    logp_grad_fn = jax.value_and_grad(logp_fn)
    D = int(max_depth)

    def leapfrog_full(z: _Z, eps, inv_mass):
        p = z.p + 0.5 * eps * z.g
        q = z.q + eps * mass_velocity(inv_mass, p)
        lp, g = logp_grad_fn(q)
        p = p + 0.5 * eps * g
        return _Z(q, p, lp, g)

    def energy(z: _Z, inv_mass):
        return z.lp - mass_kinetic(inv_mass, z.p)

    def kernel(key, position, logp, grad, step_size, inv_mass):
        dtype = position.dtype
        p_dim = position.shape[-1]
        k_mom, k_tree = jax.random.split(key)
        p0 = mass_momentum(
            inv_mass, jax.random.normal(k_mom, position.shape, dtype)
        )
        z0 = _Z(position, p0, logp, grad)
        h0 = energy(z0, inv_mass)

        def build_subtree(key, z_edge, direction, depth):
            """Iteratively add 2^depth leaves from z_edge going `direction`.

            Returns (z_far, proposal, logw, sum_acc, n_leaf, turning, diverging).
            """
            eps = direction.astype(dtype) * step_size
            n_leaves = jnp.int32(1) << depth
            ckpt_q = jnp.zeros((D + 1, p_dim), dtype)
            ckpt_p = jnp.zeros((D + 1, p_dim), dtype)

            def cond(c):
                leaf, *_ , turning, diverging = (
                    c[0], c[-2], c[-1])
                return (c[0] < n_leaves) & (~c[-2]) & (~c[-1])

            def body(c):
                (leaf, key, z, prop, logw, sum_acc,
                 cq, cp, turning, diverging) = c
                key, k_sel = jax.random.split(key)
                z_new = leapfrog_full(z, eps, inv_mass)
                h_new = energy(z_new, inv_mass)
                logw_leaf = h_new - h0
                logw_leaf = jnp.where(jnp.isnan(logw_leaf), -jnp.inf, logw_leaf)
                diverging = logw_leaf < -max_delta_energy
                sum_acc = sum_acc + jnp.minimum(1.0, jnp.exp(logw_leaf))
                # progressive multinomial sampling within the subtree
                logw_new = jnp.logaddexp(logw, logw_leaf)
                take = jnp.log(jax.random.uniform(k_sel, (), dtype)) < (
                    logw_leaf - logw_new
                )
                prop = jax.tree.map(
                    lambda a, b: jnp.where(take, b, a),
                    prop,
                    (z_new.q, z_new.lp, z_new.g),
                )
                # checkpoint store (even leaf) / U-turn scan (odd leaf)
                idx_max = jax.lax.population_count(leaf >> 1).astype(jnp.int32)
                trailing = jax.lax.population_count(leaf & ~(leaf + 1)).astype(
                    jnp.int32
                )
                idx_min = idx_max - trailing + 1
                is_even = (leaf & 1) == 0
                cq = jnp.where(is_even, cq.at[idx_max].set(z_new.q), cq)
                cp = jnp.where(is_even, cp.at[idx_max].set(z_new.p), cp)

                def check(i, t):
                    in_range = (i >= idx_min) & (i <= idx_max)
                    dq = direction.astype(dtype) * (z_new.q - cq[i])
                    turn_i = _uturn(dq, cp[i], z_new.p, inv_mass)
                    return t | (in_range & turn_i)

                turning = jnp.where(
                    is_even,
                    turning,
                    jax.lax.fori_loop(0, D + 1, check, turning),
                )
                return (leaf + 1, key, z_new, prop, logw_new, sum_acc,
                        cq, cp, turning, diverging)

            init = (
                jnp.int32(0), key, z_edge,
                (z_edge.q, z_edge.lp, z_edge.g),  # placeholder, w = -inf
                jnp.asarray(-jnp.inf, dtype), jnp.zeros((), dtype),
                ckpt_q, ckpt_p, jnp.asarray(False), jnp.asarray(False),
            )
            (leaf, _, z_far, prop, logw, sum_acc, _, _, turning, diverging) = (
                jax.lax.while_loop(cond, body, init)
            )
            return z_far, prop, logw, sum_acc, leaf, turning, diverging

        def outer_cond(c):
            depth, *_, turning, diverging = c[0], c[-2], c[-1]
            return (c[0] < D) & (~c[-2]) & (~c[-1])

        def outer_body(c):
            (depth, key, z_left, z_right, prop, logw, sum_acc, n_leaf,
             turning, diverging) = c
            key, k_dir, k_sub, k_merge = jax.random.split(key, 4)
            go_right = jax.random.bernoulli(k_dir)
            direction = jnp.where(go_right, jnp.int32(1), jnp.int32(-1))
            z_edge = jax.tree.map(
                lambda a, b: jnp.where(go_right, b, a), z_left, z_right
            )
            z_far, sub_prop, sub_logw, sub_acc, sub_n, sub_turn, sub_div = (
                build_subtree(k_sub, z_edge, direction, depth)
            )
            sum_acc = sum_acc + sub_acc
            n_leaf = n_leaf + sub_n
            valid = (~sub_turn) & (~sub_div)
            # biased progressive sampling between tree and new subtree
            take = valid & (
                jnp.log(jax.random.uniform(k_merge, (), dtype))
                < (sub_logw - logw)
            )
            prop = jax.tree.map(
                lambda a, b: jnp.where(take, b, a), prop, sub_prop
            )
            logw = jnp.where(valid, jnp.logaddexp(logw, sub_logw), logw)
            z_left = jax.tree.map(
                lambda a, b: jnp.where(valid & ~go_right, b, a), z_left, z_far
            )
            z_right = jax.tree.map(
                lambda a, b: jnp.where(valid & go_right, b, a), z_right, z_far
            )
            tree_turn = _uturn(
                z_right.q - z_left.q, z_left.p, z_right.p, inv_mass
            )
            turning = sub_turn | (valid & tree_turn)
            diverging = sub_div
            return (depth + 1, key, z_left, z_right, prop, logw, sum_acc,
                    n_leaf, turning, diverging)

        init = (
            jnp.int32(0), k_tree, z0, z0, (z0.q, z0.lp, z0.g),
            jnp.zeros((), dtype),  # initial point has weight exp(0)
            jnp.zeros((), dtype), jnp.int32(0),
            jnp.asarray(False), jnp.asarray(False),
        )
        (_, _, _, _, prop, _, sum_acc, n_leaf, _, diverging) = (
            jax.lax.while_loop(outer_cond, outer_body, init)
        )
        q_new, lp_new, g_new = prop
        accept_stat = sum_acc / jnp.maximum(n_leaf, 1).astype(dtype)
        moved = jnp.any(q_new != position)
        return (q_new, lp_new, g_new), (accept_stat, moved, diverging, -h0)

    return kernel


class NUTSSampler(GradientSampler):
    """NUTS with dual-averaged step size + mass adaptation
    (``metric="diag"`` or ``"dense"``, see GradientSampler)."""

    def __init__(self, *args, max_depth=10, **kwargs):
        self.max_depth = int(max_depth)
        super().__init__(*args, **kwargs)

    def _make_kernel(self):
        return nuts_kernel(self.logp_fn, self.max_depth)
