"""Pathfinder: quasi-Newton variational inference along an L-BFGS path.

Zhang, Carpenter, Gelman & Vehtari (2022, JMLR): run L-BFGS on logp,
keep the whole optimization trajectory, build a local Gaussian
approximation ``q_l = N(theta_l, Sigma_l)`` at every iterate from the
L-BFGS inverse-Hessian estimate, pick the iterate maximizing a K-draw
Monte-Carlo ELBO, and return draws with importance weights. Multi-path
mode runs M paths from dispersed starts (one vmapped program — all paths
advance in lockstep on the chip) and pools their draws by truncated
importance resampling (Ionides 2008), with a Hill tail-index diagnostic
in place of the paper's PSIS fit.

Design notes (vs the paper): the inverse-Hessian estimate is built
DENSELY from the m stored (s, y) pairs — O(m P^2) per iterate — rather
than via the factored O(P m^2) sampling identity; Pathfinder's role here
is warmup/initialization at small-to-moderate P, where the dense build
is cheap and exact. The whole path phase is one ``lax.scan``; the
per-iterate ELBO phase is one vmap over iterates.

No reference counterpart (derivative-free Calculator,
``/root/reference/MCMCpp/Utility/UserOjbectsTest.h:144-151``) —
north-star scope beside MAP/Laplace (map_laplace.py) and ADVI (vi.py).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class PathfinderResult(NamedTuple):
    draws: jax.Array  # (n_draws, P) from the ELBO-best approximation
    logw: jax.Array  # (n_draws,) logp - logq importance log-weights
    elbo_history: jax.Array  # (L,) per-iterate ELBO estimates (-inf invalid)
    best_iter: jax.Array  # () int32
    mean: jax.Array  # (P,) center of the selected approximation
    path_logp: jax.Array  # (L,) logp along the optimization path


class MultiPathfinderResult(NamedTuple):
    draws: jax.Array  # (n_draws, P) resampled across all paths
    pareto_k: float  # Hill tail-index diagnostic of the pooled weights
    paths: PathfinderResult  # vmapped per-path results (leading axis M)


def _two_loop(g, s_buf, y_buf, valid, gamma):
    """L-BFGS two-loop recursion with masked history (m, P) buffers,
    positions ordered oldest -> newest."""
    m = s_buf.shape[0]
    rho = 1.0 / jnp.maximum(jnp.sum(s_buf * y_buf, axis=1), 1e-30)

    def bwd(carry, i):
        q, alphas = carry
        j = m - 1 - i  # newest first
        a = jnp.where(valid[j], rho[j] * jnp.dot(s_buf[j], q), 0.0)
        q = q - a * jnp.where(valid[j], 1.0, 0.0) * y_buf[j]
        return (q, alphas.at[j].set(a)), None

    (q, alphas), _ = jax.lax.scan(
        bwd, (g, jnp.zeros((m,), g.dtype)), jnp.arange(m)
    )
    r = gamma * q

    def fwd(r, j):  # oldest first
        b = jnp.where(valid[j], rho[j] * jnp.dot(y_buf[j], r), 0.0)
        r = r + (alphas[j] - b) * jnp.where(valid[j], 1.0, 0.0) * s_buf[j]
        return r, None

    r, _ = jax.lax.scan(fwd, r, jnp.arange(m))
    return r


def _inv_hessian_dense(s_buf, y_buf, valid, gamma, p):
    """Dense inverse-Hessian estimate: start from gamma*I and apply the
    BFGS inverse update for each stored pair, oldest -> newest."""
    eye = jnp.eye(p, dtype=s_buf.dtype)

    def body(sigma, j):
        s, y = s_buf[j], y_buf[j]
        rho = 1.0 / jnp.maximum(jnp.dot(s, y), 1e-30)
        v = eye - rho * jnp.outer(s, y)
        upd = v @ sigma @ v.T + rho * jnp.outer(s, s)
        return jnp.where(valid[j], upd, sigma), None

    sigma, _ = jax.lax.scan(body, gamma * eye, jnp.arange(s_buf.shape[0]))
    return 0.5 * (sigma + sigma.T)


def pathfinder(logp_fn, init, maxiter=60, history=6, n_elbo_draws=30,
               n_draws=400, seed=0, init_step=1.0, dtype=jnp.float32,
               fold=None):
    """Single-path Pathfinder from ``init`` (P,). Returns PathfinderResult.

    The L-BFGS phase runs exactly ``maxiter`` iterates (fixed-shape scan;
    converged iterates just stop moving), with backtracking Armijo line
    search; every iterate's (theta, g, history snapshot) feeds the
    vmapped ELBO phase. ``fold``: optional (traced) int folded into the
    RNG so vmapped multi-path runs draw independent noise.
    """
    init = jnp.asarray(init, dtype)
    p = init.shape[0]
    m = int(history)
    key = jax.random.key(seed)
    if fold is not None:
        key = jax.random.fold_in(key, fold)
    val_grad = jax.value_and_grad(lambda t: -logp_fn(t))  # minimize -logp

    def ls_cond(c):
        alpha, n, f_new, f0, slope = c
        bad = jnp.isnan(f_new) | (f_new > f0 + 1e-4 * alpha * slope)
        return (n < 16) & bad

    def step(carry, _):
        theta, f, g, s_buf, y_buf, valid, count = carry
        gamma0 = jnp.where(
            valid[m - 1],
            jnp.sum(s_buf[m - 1] * y_buf[m - 1])
            / jnp.maximum(jnp.sum(y_buf[m - 1] ** 2), 1e-30),
            1.0,
        )
        d = -_two_loop(g, s_buf, y_buf, valid, gamma0)
        slope = jnp.dot(g, d)
        # if not a descent direction (degenerate history), fall back to -g;
        # the Armijo slope must match the direction actually taken (a
        # -||g||^2 floor on a kept shallow direction would make the test
        # unsatisfiable and collapse steps to init_step/2^16)
        descent = slope < 0
        d = jnp.where(descent, d, -g)
        slope = jnp.where(descent, slope, -jnp.sum(g * g))

        def ls_body(c):
            alpha, n, _, f0, sl = c
            alpha = alpha * 0.5
            f_try, _ = val_grad(theta + alpha * d)
            return (alpha, n + 1, f_try, f0, sl)

        f_try, _ = val_grad(theta + init_step * d)
        alpha, _, f_new, _, _ = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(init_step, dtype), 0, f_try, f, slope)
        )
        theta_new = theta + alpha * d
        f_new, g_new = val_grad(theta_new)
        # reject a non-finite or non-improving step entirely (keep state)
        ok = jnp.isfinite(f_new) & (f_new <= f)
        theta_new = jnp.where(ok, theta_new, theta)
        f_new = jnp.where(ok, f_new, f)
        g_new = jnp.where(ok, g_new, g)
        s = theta_new - theta
        y = g_new - g
        keep = ok & (jnp.dot(s, y) > 1e-12)  # curvature condition
        s_buf = jnp.where(keep, jnp.roll(s_buf, -1, axis=0).at[m - 1].set(s),
                          s_buf)
        y_buf = jnp.where(keep, jnp.roll(y_buf, -1, axis=0).at[m - 1].set(y),
                          y_buf)
        valid = jnp.where(keep, jnp.roll(valid, -1).at[m - 1].set(True),
                          valid)
        count = count + keep.astype(jnp.int32)
        out = (theta_new, g_new, s_buf, y_buf, valid, -f_new)
        return (theta_new, f_new, g_new, s_buf, y_buf, valid, count), out

    f0, g0 = val_grad(init)
    carry0 = (
        init, f0, g0,
        jnp.zeros((m, p), dtype), jnp.zeros((m, p), dtype),
        jnp.zeros((m,), bool), jnp.int32(0),
    )
    _, (thetas, grads, s_snaps, y_snaps, valids, path_logp) = jax.lax.scan(
        step, carry0, None, length=int(maxiter)
    )

    # -- ELBO phase: one Gaussian approximation per iterate ------------------
    z = jax.random.normal(jax.random.fold_in(key, 1),
                          (int(n_elbo_draws), p), dtype)
    logp_batch = jax.vmap(logp_fn)
    const = 0.5 * p * np.log(2.0 * np.pi)

    def elbo_at(theta, s_buf, y_buf, valid):
        gamma = jnp.where(
            valid[m - 1],
            jnp.sum(s_buf[m - 1] * y_buf[m - 1])
            / jnp.maximum(jnp.sum(y_buf[m - 1] ** 2), 1e-30),
            1.0,
        )
        sigma = _inv_hessian_dense(s_buf, y_buf, valid, gamma, p)
        chol = jnp.linalg.cholesky(
            sigma + 1e-8 * jnp.eye(p, dtype=dtype)
        )
        bad = jnp.any(jnp.isnan(chol))
        chol = jnp.where(bad, jnp.eye(p, dtype=dtype), chol)
        x = theta[None, :] + z @ chol.T
        logq = (-0.5 * jnp.sum(z * z, axis=1) - const
                - jnp.sum(jnp.log(jnp.diagonal(chol))))
        lp = logp_batch(x)
        elbo = jnp.mean(lp - logq)
        return jnp.where(bad | jnp.isnan(elbo), -jnp.inf, elbo), chol

    elbos, chols = jax.vmap(elbo_at)(thetas, s_snaps, y_snaps, valids)
    best = jnp.argmax(elbos)
    mean = thetas[best]
    chol = chols[best]

    zf = jax.random.normal(jax.random.fold_in(key, 2),
                           (int(n_draws), p), dtype)
    draws = mean[None, :] + zf @ chol.T
    logq = (-0.5 * jnp.sum(zf * zf, axis=1) - const
            - jnp.sum(jnp.log(jnp.diagonal(chol))))
    logw = logp_batch(draws) - logq
    return PathfinderResult(draws, logw, elbos, best, mean, path_logp)


def _hill_khat(logw, frac=0.2):
    """Hill estimator of the importance-weight tail index (diagnostic
    analogue of PSIS k-hat; > 0.7 means the proposal is too light-tailed
    to trust the weights)."""
    lw = np.sort(np.asarray(logw, np.float64))
    n = lw.size
    mtail = max(int(frac * n), 5)
    tail = lw[-mtail:]
    return float(np.mean(tail[1:] - tail[0])) if mtail > 1 else np.inf


def multi_pathfinder(logp_fn, n_paths, init, init_scale=2.0, n_draws=1000,
                     seed=0, maxiter=60, history=6, n_elbo_draws=30,
                     draws_per_path=400, dtype=jnp.float32, mesh=None):
    """M Pathfinder paths from dispersed starts, pooled by truncated
    importance resampling (Ionides 2008: cap at mean * sqrt(n)).

    ``init``: (P,) center — starts are ``init + init_scale * N(0, I)`` —
    or (M, P) explicit starts. Returns MultiPathfinderResult whose
    ``draws`` initialize MCMC chains (or stand alone as a crude
    posterior approximation); check ``pareto_k``.

    ``mesh``: optional ``jax.sharding.Mesh`` — the path axis shards over
    the mesh (paths are fully independent: the whole vmapped L-BFGS+ELBO
    program partitions with ZERO collectives in the hot loop; only the
    host-side pooling sees all paths). Use ``n_paths`` a multiple of the
    mesh size.
    """
    init = jnp.asarray(init, dtype)
    key = jax.random.key(seed)
    if init.ndim == 1:
        starts = init[None, :] + init_scale * jax.random.normal(
            key, (int(n_paths), init.shape[0]), dtype
        )
    else:
        if init.shape[0] != n_paths:
            raise ValueError("explicit starts must be (n_paths, P)")
        starts = init

    run_paths = jax.vmap(lambda s, i: pathfinder(
        logp_fn, s, maxiter=maxiter, history=history,
        n_elbo_draws=n_elbo_draws, n_draws=draws_per_path, seed=seed,
        dtype=dtype, fold=i,
    ))
    folds = jnp.arange(int(n_paths), dtype=jnp.int32)
    if mesh is not None:
        from mcmcpp_tpu.parallel.mesh import vector_sharding, walker_sharding

        path_sharding = walker_sharding(mesh)
        starts = jax.device_put(starts, path_sharding)
        folds = jax.device_put(folds, vector_sharding(path_sharding))
        run_paths = jax.jit(run_paths)  # let GSPMD partition the path axis
    paths = run_paths(starts, folds)

    pooled = paths.draws.reshape(-1, starts.shape[1])
    logw = np.asarray(paths.logw.reshape(-1), np.float64)
    khat = _hill_khat(logw)
    w = np.exp(logw - logw.max())
    cap = w.mean() * np.sqrt(w.size)  # truncated IS
    w = np.minimum(w, cap)
    w = w / w.sum()
    idx = np.asarray(
        jax.random.choice(
            jax.random.fold_in(jax.random.key(seed), 3), w.size,
            (int(n_draws),), replace=True, p=jnp.asarray(w),
        )
    )
    return MultiPathfinderResult(np.asarray(pooled)[idx], khat, paths)
