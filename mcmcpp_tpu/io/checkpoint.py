"""Checkpoint / resume for every sampler family.

The reference has NO checkpointing (SURVEY.md §5: in-memory chain only; the
closest thing is ``reset()`` + ``storeCurrentWalkerPositions()``). Here a
checkpoint is one ``.npz`` archive holding the device state (walker/chain
positions, log-probs, counters), the threefry key data, adaptation state
(step size / inverse mass for gradient samplers), and the host chain —
enough to resume sampling bitwise-identically to an uninterrupted run.

Format: flat name → array dict plus a JSON meta blob; no pickling, so
checkpoints are portable and safe to load from untrusted storage.
"""

import json
import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


_FORMAT_VERSION = 3  # v3: PT / SMC / SGMCMC engine coverage (round 2)


def _key_data(key):
    return np.asarray(jax.random.key_data(key))


def _key_impl_name(key):
    impl = jax.random.key_impl(key)
    return getattr(impl, "name", None) or str(impl).strip("'\"")


def _wrap_key(data, impl=None):
    return jax.random.wrap_key_data(jnp.asarray(data), impl=impl)


def _is_pt(sampler):
    from mcmcpp_tpu.tempering import ParallelTemperingSampler

    return isinstance(sampler, ParallelTemperingSampler)


def _is_smc(sampler):
    from mcmcpp_tpu.smc import SMCSampler

    return isinstance(sampler, SMCSampler)


def _is_sgmcmc(sampler):
    from mcmcpp_tpu.gradient.sgmcmc import StochasticGradientSampler

    return isinstance(sampler, StochasticGradientSampler)


def _is_pmmh(sampler):
    from mcmcpp_tpu.particle import PMMHSampler

    return isinstance(sampler, PMMHSampler)


def _is_gibbs(sampler):
    from mcmcpp_tpu.gibbs import BlockedGibbsSampler

    return isinstance(sampler, BlockedGibbsSampler)


def _is_elliptical(sampler):
    from mcmcpp_tpu.elliptical import EllipticalSliceSampler

    return isinstance(sampler, EllipticalSliceSampler)


def _is_pcn(sampler):
    from mcmcpp_tpu.pcn import PCNSampler

    return isinstance(sampler, PCNSampler)


def _is_mclmc(sampler):
    from mcmcpp_tpu.gradient.mclmc import MCLMCSampler

    return isinstance(sampler, MCLMCSampler)


def _is_mams(sampler):
    from mcmcpp_tpu.gradient.mclmc import MAMSSampler

    return isinstance(sampler, MAMSSampler)


def _is_nested(sampler):
    from mcmcpp_tpu.nested import NestedSampler

    return isinstance(sampler, NestedSampler)


def _is_ibis(sampler):
    from mcmcpp_tpu.ibis import IBISSampler

    return isinstance(sampler, IBISSampler)


def _is_smc2(sampler):
    from mcmcpp_tpu.smc2 import SMC2Sampler

    return isinstance(sampler, SMC2Sampler)


def _is_neutra(sampler):
    from mcmcpp_tpu.neutra import NeuTra

    return isinstance(sampler, NeuTra)


def _is_advi(sampler):
    from mcmcpp_tpu.vi import ADVI

    return isinstance(sampler, ADVI)


def _param_count(sampler):
    """Parameter-space dimension of any supported object (NeuTra calls it
    ``dim``); explicit sentinel so a legitimately-falsy ``n_params``
    can't silently fall through to the wrong attribute."""
    _missing = object()
    n = getattr(sampler, "n_params", _missing)
    if n is _missing:
        n = getattr(sampler, "dim", _missing)
    if n is _missing:
        raise TypeError(
            f"{type(sampler).__name__} exposes neither n_params nor dim"
        )
    return n


def _pack_leaves(arrays, meta, prefix, tree):
    """Flatten a pytree's array leaves into the archive (no pickling;
    the structure is rebuilt at load from the sampler's own config)."""
    leaves = jax.tree_util.tree_leaves(tree)
    meta[f"n_{prefix}_leaves"] = len(leaves)
    arrays.update({
        f"{prefix}_leaf_{i}": np.asarray(leaf)
        for i, leaf in enumerate(leaves)
    })


def _unpack_leaves(arrays, meta, prefix, template):
    """Rebuild a pytree stored by :func:`_pack_leaves` using
    ``template``'s treedef (leaf VALUES in the template are ignored)."""
    n = int(meta[f"n_{prefix}_leaves"])
    treedef = jax.tree_util.tree_structure(template)
    if treedef.num_leaves != n:
        raise ValueError(
            f"checkpoint stores {n} {prefix} leaves but the sampler's "
            f"configuration implies {treedef.num_leaves} — flow/optimizer "
            "architecture mismatch"
        )
    leaves = [jnp.asarray(arrays[f"{prefix}_leaf_{i}"]) for i in range(n)]
    tmpl_leaves = jax.tree_util.tree_leaves(template)
    for i, (stored, tmpl) in enumerate(zip(leaves, tmpl_leaves)):
        if jnp.shape(stored) != jnp.shape(tmpl):
            raise ValueError(
                f"{prefix} leaf {i} shape {jnp.shape(stored)} != the "
                f"sampler configuration's {jnp.shape(tmpl)} — same-depth "
                "but different-width architecture mismatch"
            )
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(sampler, path):
    """Write ``sampler``'s full resumable state to ``path`` (.npz)."""
    from mcmcpp_tpu.sampler import EnsembleSampler
    from mcmcpp_tpu.gradient.hmc import GradientSampler

    path = Path(path)
    if path.suffix != ".npz":
        # np.savez appends .npz itself; normalize so the returned path is
        # the file that actually exists
        path = path.with_name(path.name + ".npz")
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    meta = {
        "format": _FORMAT_VERSION,
        "class": type(sampler).__name__,
        "n_params": _param_count(sampler),
    }
    if isinstance(sampler, EnsembleSampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="ensemble",
            n_walkers=sampler.n_walkers,
            accepted_global_host=sampler._accepted_global_host,
            steps_host=sampler._steps_host,
            reset_step_base=getattr(sampler, "_reset_step_base", 0),
            step_epoch=getattr(sampler, "_step_epoch", 0),
            epoch_base_steps=getattr(sampler, "_epoch_base_steps", 0),
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            red=np.asarray(s.red), black=np.asarray(s.black),
            logp_red=np.asarray(s.logp_red), logp_black=np.asarray(s.logp_black),
            accepted_red=np.asarray(s.accepted_red),
            accepted_black=np.asarray(s.accepted_black),
            step=np.asarray(s.step),
            accepted_walkers_host=(
                sampler._accepted_walkers_host
                if sampler._accepted_walkers_host is not None
                else np.zeros((0,), np.int64)
            ),
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
    elif isinstance(sampler, GradientSampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="gradient",
            n_chains=sampler.n_chains,
            prng_impl=_key_impl_name(sampler._key),
        )
        # ChEES-HMC carries an adapted trajectory length
        if getattr(sampler, "traj_length", None) is not None:
            meta["traj_length"] = float(sampler.traj_length)
        # ... and, under continuous_adapt, the live (log T, Adam) state
        sa = getattr(sampler, "_sadapt", None)
        if sa is not None:
            arrays.update(
                sadapt_log_traj=np.asarray(sa[0]),
                sadapt_m=np.asarray(sa[1].m),
                sadapt_v=np.asarray(sa[1].v),
                sadapt_count=np.asarray(sa[1].count),
            )
        s = sampler.state
        arrays.update(
            position=np.asarray(s.position), logp=np.asarray(s.logp),
            grad=np.asarray(s.grad),
            step_size=np.asarray(sampler.step_size),
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
        # MEADS carries persistent momentum as part of the chain state
        if hasattr(s, "momentum"):
            arrays["momentum"] = np.asarray(s.momentum)
        # dense metric: store the covariance; factors are recomputed on load
        from mcmcpp_tpu.gradient.metric import is_dense

        if is_dense(sampler.inv_mass):
            meta["metric"] = "dense"
            arrays["inv_mass_cov"] = np.asarray(sampler.inv_mass.cov)
        else:
            arrays["inv_mass"] = np.asarray(sampler.inv_mass)
        # divergence/energy sample stats stay aligned with the chain
        stats = sampler.get_sample_stats()
        arrays["stat_diverging"] = stats["diverging"]
        arrays["stat_energy"] = stats["energy"]
    elif _is_pt(sampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="pt",
            n_walkers=sampler.n_walkers,
            n_temps=sampler.n_temps,
            power=bool(sampler._power),
            step_epoch=sampler._step_epoch,
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            red=np.asarray(s.red), black=np.asarray(s.black),
            logp_red=np.asarray(s.logp_red),
            logp_black=np.asarray(s.logp_black),
            step=np.asarray(s.step),
            swaps_accepted=np.asarray(s.swaps_accepted),
            swaps_proposed=np.asarray(s.swaps_proposed),
            swaps_acc_host=sampler._swaps_acc_host,
            swaps_prop_host=sampler._swaps_prop_host,
            betas=np.asarray(sampler.betas),
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
        if sampler._power:
            arrays.update(
                ll_red=np.asarray(s.ll_red),
                ll_black=np.asarray(s.ll_black),
                ll_mean=np.asarray(s.ll_mean), ll_m2=np.asarray(s.ll_m2),
                ss_max=np.asarray(s.ss_max), ss_sum=np.asarray(s.ss_sum),
                acc_n=np.asarray(s.acc_n), ll_n=np.asarray(s.ll_n),
            )
    elif _is_smc(sampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="smc",
            n_particles=sampler.n,
            n_stages=sampler.n_stages,
            beta_ladder=[float(b) for b in sampler.beta_ladder],
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            particles=np.asarray(s.particles),
            log_prior=np.asarray(s.log_prior),
            log_like=np.asarray(s.log_like),
            beta=np.asarray(s.beta),
            log_evidence=np.asarray(s.log_evidence),
            key=_key_data(sampler._key),
        )
        if sampler._flow is not None:
            # flow-mutation proposal state (flow params + Adam moments):
            # flattened leaves; structure is rebuilt at load from the
            # sampler's own flow config, so only arrays hit the archive
            leaves = jax.tree_util.tree_leaves(sampler._flow_carry)
            meta.update(n_flow_leaves=len(leaves))
            arrays.update({
                f"flow_leaf_{i}": np.asarray(leaf)
                for i, leaf in enumerate(leaves)
            })
    elif _is_sgmcmc(sampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="sgmcmc",
            n_chains=sampler.n_chains,
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            position=np.asarray(s.position),
            velocity=np.asarray(s.velocity),
            sg_step=np.asarray(s.step),
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
    elif _is_pmmh(sampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="pmmh",
            n_chains=sampler.n_chains,
            n_steps_done=sampler._n_steps_done,
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            position=np.asarray(s.position),
            loglik=np.asarray(s.loglik),
            logprior=np.asarray(s.logprior),
            accepted=np.asarray(s.accepted),
            prop_chol=np.asarray(sampler._prop_chol),
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
    elif _is_gibbs(sampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="gibbs",
            n_chains=sampler.n_chains,
            layout=[[n, int(sz)] for n, sz in sampler._layout],
            prng_impl=_key_impl_name(sampler._key),
        )
        arrays.update(
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
        arrays.update({
            f"block_{name}": np.asarray(sampler.state[name])
            for name, _ in sampler._layout
        })
    elif _is_elliptical(sampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="elliptical",
            n_chains=sampler.n_chains,
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            position=np.asarray(s.position),
            loglike=np.asarray(s.loglike),
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
    elif _is_pcn(sampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            kind="pcn",
            n_chains=sampler.n_chains,
            total_steps=sampler.total_steps,
            beta=sampler.beta,  # tune() mutates it — part of the state
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            position=np.asarray(s.position),
            loglike=np.asarray(s.loglike),
            accepted=np.asarray(s.accepted),
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
    elif _is_mclmc(sampler):
        if sampler.state is None:
            raise RuntimeError("cannot checkpoint an uninitialized sampler")
        meta.update(
            # distinct kinds: resuming an adjusted run under the
            # unadjusted algorithm (or vice versa) silently changes the
            # sampler's exactness contract
            kind="mams" if _is_mams(sampler) else "mclmc",
            # marks the adjusted/unadjusted split as EXPLICIT (round-4
            # format): legacy checkpoints carry kind="mclmc" for both
            # algorithms and are migrated leniently on load
            adjusted=_is_mams(sampler),
            n_chains=sampler.n_chains,
            step_size=float(sampler.step_size),
            decoherence_length=float(sampler.decoherence_length),
            energy_var=float(sampler.energy_var),
            prng_impl=_key_impl_name(sampler._key),
        )
        if _is_mams(sampler):
            meta["target_accept"] = float(sampler.target_accept)
            meta["last_mean_accept"] = float(sampler.last_mean_accept)
        s = sampler.state
        arrays.update(
            position=np.asarray(s.position),
            momentum=np.asarray(s.momentum),
            logp=np.asarray(s.logp),
            grad=np.asarray(s.grad),
            key=_key_data(sampler._key),
            chain_samples=sampler.chain.get(),
            chain_logp=sampler.chain.get_logp(),
        )
        if sampler.inv_mass is not None:
            arrays["inv_mass"] = np.asarray(sampler.inv_mass)
    elif _is_nested(sampler):
        if sampler._live is None:
            raise RuntimeError(
                "cannot checkpoint a NestedSampler before run() has "
                "initialized the live set"
            )
        meta.update(
            kind="nested",
            n_live=sampler.n_live,
            batch=sampler.batch,
            kernel=sampler.kernel,
            n_mcmc=sampler.n_mcmc,
            a=sampler.a,
            iters_done=sampler._iters_done,
            n_calls=int(sampler._n_calls),
            logz=float(sampler._logz),
            logx=float(sampler._logx),
            low_acc_warned=bool(sampler._low_acc_warned),
            prng_impl=_key_impl_name(sampler._key),
        )
        d = sampler.n_params
        arrays.update(
            live=np.asarray(sampler._live),
            ll=np.asarray(sampler._ll),
            lpp=np.asarray(sampler._lpp),
            dead_pos=(np.concatenate(sampler._dead_pos, 0)
                      if sampler._dead_pos else np.zeros((0, d))),
            dead_ll=(np.concatenate(sampler._dead_ll)
                     if sampler._dead_ll else np.zeros((0,))),
            dead_logw=(np.concatenate(sampler._dead_logw)
                       if sampler._dead_logw else np.zeros((0,))),
            key=_key_data(sampler._key),
        )
    elif _is_ibis(sampler):
        if sampler.state is None:
            raise RuntimeError(
                "cannot checkpoint an IBISSampler before update()"
            )
        meta.update(
            kind="ibis",
            n_particles=sampler.n,
            batch_size=sampler.batch_size,
            n_resamples=sampler.n_resamples,
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            particles=np.asarray(s.particles),
            log_prior=np.asarray(s.log_prior),
            loglik_cum=np.asarray(s.loglik_cum),
            log_w=np.asarray(s.log_w),
            log_evidence=np.asarray(s.log_evidence),
            n_included=np.asarray(s.n_included),
            evidence_trace=np.asarray(sampler.log_evidence_trace,
                                      np.float64),
            key=_key_data(sampler._key),
        )
        # the absorbed stream travels with the state: move events
        # re-score proposals against it, so resuming without it would
        # silently break pi_t-invariance. No pickling -> the buffer must
        # be an array or a flat dict of arrays (the supported layouts).
        if isinstance(sampler._data, dict):
            keys = sorted(sampler._data)
            if any(not hasattr(sampler._data[k], "shape") for k in keys):
                raise TypeError(
                    "ibis checkpointing supports an array or a flat "
                    "dict of arrays as the data buffer"
                )
            meta["data_format"] = "dict"
            meta["data_keys"] = keys
            arrays.update({
                f"data_{i}": np.asarray(sampler._data[k])
                for i, k in enumerate(keys)
            })
        elif hasattr(sampler._data, "shape"):
            meta["data_format"] = "array"
            arrays["data_0"] = np.asarray(sampler._data)
        else:
            raise TypeError(
                "ibis checkpointing supports an array or a flat dict of "
                f"arrays as the data buffer, got {type(sampler._data)}"
            )
    elif _is_smc2(sampler):
        # state alone is not enough: init() sets state while leaving the
        # observation buffer None, and np.asarray(None) would silently
        # pickle an object array the (allow_pickle=False) loader rejects
        if sampler.state is None or sampler._ys is None:
            raise RuntimeError(
                "cannot checkpoint an SMC2Sampler before update()"
            )
        meta.update(
            kind="smc2",
            n_theta=sampler.m,
            n_x=sampler.n_x,
            n_resamples=sampler.n_resamples,
            n_growths=sampler.n_growths,
            prng_impl=_key_impl_name(sampler._key),
        )
        s = sampler.state
        arrays.update(
            theta=np.asarray(s.theta),
            log_prior=np.asarray(s.log_prior),
            loglik_hat=np.asarray(s.loglik_hat),
            xs=np.asarray(s.xs),
            x_logw=np.asarray(s.x_logw),
            log_w=np.asarray(s.log_w),
            log_evidence=np.asarray(s.log_evidence),
            n_included=np.asarray(s.n_included),
            evidence_trace=np.asarray(sampler.log_evidence_trace,
                                      np.float64),
            # rejuvenation moves re-filter the absorbed prefix, so the
            # observation buffer must travel with the state (the IBIS
            # rationale; here it is always a plain (T, E) array)
            ys=np.asarray(sampler._ys),
            key=_key_data(sampler._key),
        )
    elif _is_neutra(sampler):
        meta.update(
            kind="neutra",
            flow=type(sampler.flow).__name__,
            prng_impl=_key_impl_name(sampler._key),
        )
        arrays["key"] = _key_data(sampler._key)
        _pack_leaves(arrays, meta, "flow", sampler.params)
        if sampler._opt_state is not None:
            _pack_leaves(arrays, meta, "opt", sampler._opt_state)
        for attr in ("fit_result", "refit_result"):
            fr = getattr(sampler, attr, None)
            if fr is not None:
                arrays[f"{attr}_hist"] = np.asarray(fr.elbo_history)
    elif _is_advi(sampler):
        meta.update(
            kind="advi",
            full_rank=bool(sampler.full_rank),
            prng_impl=_key_impl_name(sampler._key),
        )
        arrays["key"] = _key_data(sampler._key)
        arrays["elbo_trace"] = np.asarray(sampler.elbo_trace, np.float64)
        _pack_leaves(arrays, meta, "vi", sampler.params)
        _pack_leaves(arrays, meta, "opt", sampler.opt_state)
    else:
        raise TypeError(f"unsupported sampler type {type(sampler).__name__}")
    arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), np.uint8)
    # atomic replace: a crash mid-save must not destroy the previous good
    # checkpoint (the whole point of checkpointing)
    tmp = path.with_name(path.name + ".tmp.npz")
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp, path)
    return path


def load_checkpoint(sampler, path):
    """Restore state saved by :func:`save_checkpoint` into ``sampler``.

    ``sampler`` must be constructed with the same target/shape configuration
    (validated against the stored meta). Returns the sampler.
    """
    from mcmcpp_tpu.sampler import EnsembleSampler, EnsembleState
    from mcmcpp_tpu.gradient.hmc import GradientSampler, HMCState

    path = Path(path)
    if path.suffix != ".npz" and not path.exists():
        path = path.with_name(path.name + ".npz")
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    version = meta.get("format", 0)
    if version != _FORMAT_VERSION:
        # v3 renamed ensemble keys (accepted -> accepted_red/black etc.),
        # so older archives would die with an opaque KeyError below —
        # fail actionably instead (round-2 advisor finding)
        raise ValueError(
            f"incompatible checkpoint format v{version} (this build reads "
            f"v{_FORMAT_VERSION}); re-save the checkpoint with the version "
            "that wrote it, or resume from raw samples"
        )
    n_params = _param_count(sampler)
    if meta["n_params"] != n_params:
        raise ValueError(
            f"checkpoint has n_params={meta['n_params']}, "
            f"sampler has {n_params}"
        )
    if meta["kind"] == "ensemble":
        if not isinstance(sampler, EnsembleSampler):
            raise TypeError("checkpoint is for an EnsembleSampler")
        if meta["n_walkers"] != sampler.n_walkers:
            raise ValueError("walker count mismatch")
        sampler.state = EnsembleState(
            red=jnp.asarray(arrays["red"]),
            black=jnp.asarray(arrays["black"]),
            logp_red=jnp.asarray(arrays["logp_red"]),
            logp_black=jnp.asarray(arrays["logp_black"]),
            accepted_red=jnp.asarray(arrays["accepted_red"]),
            accepted_black=jnp.asarray(arrays["accepted_black"]),
            step=jnp.asarray(arrays["step"]),
        )
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler._step_key, sampler._aux_key = jax.random.split(sampler._key)
        sampler._step_epoch = int(meta.get("step_epoch", 0))
        sampler._epoch_base_steps = int(meta.get("epoch_base_steps", 0))
        sampler._rebuild_step_fn()
        sampler._accepted_global_host = int(meta["accepted_global_host"])
        awh = arrays["accepted_walkers_host"]
        sampler._accepted_walkers_host = (
            awh.astype(np.int64) if awh.shape[0] else None
        )
        sampler._steps_host = int(meta["steps_host"])
        sampler._reset_step_base = int(meta["reset_step_base"])
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] == "gradient":
        if not isinstance(sampler, GradientSampler):
            raise TypeError("checkpoint is for a gradient sampler")
        if meta["n_chains"] != sampler.n_chains:
            raise ValueError("chain count mismatch")
        if "momentum" in arrays:
            from mcmcpp_tpu.gradient.meads import MEADSState

            sampler.state = MEADSState(
                position=jnp.asarray(arrays["position"]),
                momentum=jnp.asarray(arrays["momentum"]),
                logp=jnp.asarray(arrays["logp"]),
                grad=jnp.asarray(arrays["grad"]),
            )
        else:
            sampler.state = HMCState(
                position=jnp.asarray(arrays["position"]),
                logp=jnp.asarray(arrays["logp"]),
                grad=jnp.asarray(arrays["grad"]),
            )
        step_size = jnp.asarray(arrays["step_size"])
        sampler.step_size = float(step_size) if step_size.ndim == 0 else step_size
        if meta.get("metric") == "dense":
            from mcmcpp_tpu.gradient.metric import dense_mass_from_cov

            sampler.inv_mass = dense_mass_from_cov(
                jnp.asarray(arrays["inv_mass_cov"])
            )
        else:
            sampler.inv_mass = jnp.asarray(arrays["inv_mass"])
        if "stat_diverging" in arrays:
            sampler._divergences = (
                [arrays["stat_diverging"]]
                if arrays["stat_diverging"].shape[0] else []
            )
            sampler._energies = (
                [arrays["stat_energy"]]
                if arrays["stat_energy"].shape[0] else []
            )
        else:  # pre-stats checkpoint: drop any stale stats from `sampler`
            sampler._divergences = []
            sampler._energies = []
        if "traj_length" in meta and hasattr(sampler, "traj_length"):
            sampler.traj_length = float(meta["traj_length"])
            # ChEES run programs bake the trajectory length in at trace time
            sampler._run_cache.clear()
        if "sadapt_log_traj" in arrays and hasattr(sampler, "_sadapt"):
            from mcmcpp_tpu.gradient.chees import AdamState

            sampler._sadapt = (
                jnp.asarray(arrays["sadapt_log_traj"]),
                AdamState(
                    m=jnp.asarray(arrays["sadapt_m"]),
                    v=jnp.asarray(arrays["sadapt_v"]),
                    count=jnp.asarray(arrays["sadapt_count"]),
                ),
            )
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] == "pt":
        from mcmcpp_tpu.tempering import PTState

        if not _is_pt(sampler):
            raise TypeError("checkpoint is for a ParallelTemperingSampler")
        if meta["n_walkers"] != sampler.n_walkers:
            raise ValueError("walker count mismatch")
        if meta["n_temps"] != sampler.n_temps:
            raise ValueError("ladder size mismatch")
        if bool(meta["power"]) != bool(sampler._power):
            raise ValueError(
                "checkpoint/sampler disagree on power-posterior mode"
            )
        extra = {}
        if sampler._power:
            extra = dict(
                ll_red=jnp.asarray(arrays["ll_red"]),
                ll_black=jnp.asarray(arrays["ll_black"]),
                ll_mean=jnp.asarray(arrays["ll_mean"]),
                ll_m2=jnp.asarray(arrays["ll_m2"]),
                ss_max=jnp.asarray(arrays["ss_max"]),
                ss_sum=jnp.asarray(arrays["ss_sum"]),
                acc_n=jnp.asarray(arrays["acc_n"]),
                ll_n=jnp.asarray(arrays["ll_n"]),
            )
        sampler.state = PTState(
            red=jnp.asarray(arrays["red"]),
            black=jnp.asarray(arrays["black"]),
            logp_red=jnp.asarray(arrays["logp_red"]),
            logp_black=jnp.asarray(arrays["logp_black"]),
            step=jnp.asarray(arrays["step"]),
            swaps_accepted=jnp.asarray(arrays["swaps_accepted"]),
            swaps_proposed=jnp.asarray(arrays["swaps_proposed"]),
            **extra,
        )
        # a tuned ladder travels with the checkpoint
        sampler.betas = jnp.asarray(arrays["betas"], sampler.dtype)
        sampler._run_cache.clear()
        sampler._swaps_acc_host = arrays["swaps_acc_host"].astype(np.int64)
        sampler._swaps_prop_host = arrays["swaps_prop_host"].astype(np.int64)
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler._step_key, sampler._aux_key = jax.random.split(sampler._key)
        sampler._step_epoch = int(meta.get("step_epoch", 0))
        sampler._epoch_key = jax.random.fold_in(
            sampler._step_key, sampler._step_epoch
        )
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] == "smc":
        from mcmcpp_tpu.smc import SMCState

        if not _is_smc(sampler):
            raise TypeError("checkpoint is for an SMCSampler")
        if meta["n_particles"] != sampler.n:
            raise ValueError("particle count mismatch")
        sampler.state = SMCState(
            particles=jnp.asarray(arrays["particles"]),
            log_prior=jnp.asarray(arrays["log_prior"]),
            log_like=jnp.asarray(arrays["log_like"]),
            beta=jnp.asarray(arrays["beta"]),
            log_evidence=jnp.asarray(arrays["log_evidence"]),
        )
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler.n_stages = int(meta["n_stages"])
        sampler.beta_ladder = list(meta["beta_ladder"])
        n_flow = int(meta.get("n_flow_leaves", 0))
        if (n_flow > 0) != (sampler._flow is not None):
            raise ValueError(
                "flow-mutation mismatch: checkpoint "
                f"{'has' if n_flow else 'lacks'} flow state but the sampler "
                f"was built with mutation="
                f"{sampler.mutation!r}"
            )
        if n_flow:
            # template carry gives the treedef (key value is irrelevant —
            # only the pytree structure and leaf shapes are used)
            fp = sampler._flow.init(jax.random.key(0))
            tmpl = (fp, sampler._flow_opt.init(fp))
            treedef = jax.tree_util.tree_structure(tmpl)
            sampler._flow_carry = jax.tree_util.tree_unflatten(
                treedef,
                [jnp.asarray(arrays[f"flow_leaf_{i}"])
                 for i in range(n_flow)],
            )
    elif meta["kind"] == "sgmcmc":
        from mcmcpp_tpu.gradient.sgmcmc import SGState

        if not _is_sgmcmc(sampler):
            raise TypeError("checkpoint is for a stochastic-gradient sampler")
        if meta["n_chains"] != sampler.n_chains:
            raise ValueError("chain count mismatch")
        sampler.state = SGState(
            position=jnp.asarray(arrays["position"]),
            velocity=jnp.asarray(arrays["velocity"]),
            step=jnp.asarray(arrays["sg_step"]),
        )
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] == "pmmh":
        from mcmcpp_tpu.particle import PMMHState

        if not _is_pmmh(sampler):
            raise TypeError("checkpoint is for a PMMHSampler")
        if meta["n_chains"] != sampler.n_chains:
            raise ValueError("chain count mismatch")
        state = PMMHState(
            position=jnp.asarray(arrays["position"]),
            loglik=jnp.asarray(arrays["loglik"]),
            logprior=jnp.asarray(arrays["logprior"]),
            accepted=jnp.asarray(arrays["accepted"]),
        )
        sampler.state = sampler._constrain(state)
        sampler._n_steps_done = int(meta["n_steps_done"])
        if "prop_chol" in arrays:  # a tuned proposal travels with the state
            sampler._prop_chol = jnp.asarray(arrays["prop_chol"])
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] == "gibbs":
        if not _is_gibbs(sampler):
            raise TypeError("checkpoint is for a BlockedGibbsSampler")
        if meta["n_chains"] != sampler.n_chains:
            raise ValueError("chain count mismatch")
        layout = [(n, int(sz)) for n, sz in meta["layout"]]
        if layout != list(sampler._layout):
            raise ValueError(
                f"block layout mismatch: checkpoint {layout}, "
                f"sampler {list(sampler._layout)}"
            )
        state = {
            name: jnp.asarray(arrays[f"block_{name}"])
            for name, _ in layout
        }
        if sampler._chain_sharding is not None:
            state = {
                k: jax.device_put(v, sampler._chain_sharding)
                for k, v in state.items()
            }
        sampler.state = state
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] == "elliptical":
        from mcmcpp_tpu.elliptical import EllipticalState

        if not _is_elliptical(sampler):
            raise TypeError("checkpoint is for an EllipticalSliceSampler")
        if meta["n_chains"] != sampler.n_chains:
            raise ValueError("chain count mismatch")
        state = EllipticalState(
            position=jnp.asarray(arrays["position"]),
            loglike=jnp.asarray(arrays["loglike"]),
        )
        sampler.state = sampler._constrain(state)
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] == "pcn":
        from mcmcpp_tpu.pcn import PCNState

        if not _is_pcn(sampler):
            raise TypeError("checkpoint is for a PCNSampler")
        if meta["n_chains"] != sampler.n_chains:
            raise ValueError("chain count mismatch")
        state = PCNState(
            position=jnp.asarray(arrays["position"]),
            loglike=jnp.asarray(arrays["loglike"]),
            accepted=jnp.asarray(arrays["accepted"]),
        )
        sampler.state = sampler._constrain(state)
        sampler.total_steps = int(meta["total_steps"])
        if "beta" in meta:  # absent in pre-tune()-era checkpoints
            sampler.beta = float(meta["beta"])
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] in ("mclmc", "mams"):
        from mcmcpp_tpu.gradient.mclmc import MCLMCState

        if "adjusted" not in meta:
            # legacy checkpoint (no explicit marker). The MCLMC-family
            # class check still applies (loading into an unrelated
            # sampler would silently corrupt its state); kind="mams" was
            # ALWAYS reliable (written only by MAMS savers), so that
            # direction stays strict too. Only kind="mclmc" is ambiguous
            # (the earliest format wrote it for both algorithms) and is
            # accepted into either MCLMC-family class, keeping the live
            # sampler's MAMS tuning fields.
            if not _is_mclmc(sampler):
                raise TypeError("checkpoint is for an MCLMC-family "
                                "sampler")
            if meta["kind"] == "mams" and not _is_mams(sampler):
                raise TypeError("checkpoint is for a MAMSSampler")
            if meta["kind"] == "mclmc" and _is_mams(sampler):
                import warnings

                warnings.warn(
                    "legacy MCLMC checkpoint without an adjusted/"
                    "unadjusted marker: resuming under MAMS with the "
                    "sampler's current target_accept", UserWarning,
                )
        elif meta["kind"] == "mams":
            if not _is_mams(sampler):
                raise TypeError("checkpoint is for a MAMSSampler")
        elif not _is_mclmc(sampler) or _is_mams(sampler):
            raise TypeError(
                "checkpoint is for an (unadjusted) MCLMCSampler — "
                "resuming it under MAMS would silently change the "
                "algorithm"
            )
        if meta["n_chains"] != sampler.n_chains:
            raise ValueError("chain count mismatch")
        state = MCLMCState(
            position=jnp.asarray(arrays["position"]),
            momentum=jnp.asarray(arrays["momentum"]),
            logp=jnp.asarray(arrays["logp"]),
            grad=jnp.asarray(arrays["grad"]),
        )
        sampler.state = sampler._constrain(state)
        sampler.step_size = float(meta["step_size"])
        sampler.decoherence_length = float(meta["decoherence_length"])
        sampler.energy_var = float(meta["energy_var"])
        sampler.inv_mass = (jnp.asarray(arrays["inv_mass"])
                            if "inv_mass" in arrays else None)
        if meta["kind"] == "mams":
            sampler.target_accept = float(meta["target_accept"])
            sampler.last_mean_accept = float(meta["last_mean_accept"])
        sampler._run_cache.clear()
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        sampler.chain.clear()
        if arrays["chain_samples"].shape[0]:
            sampler.chain.append(arrays["chain_samples"], arrays["chain_logp"])
    elif meta["kind"] == "nested":
        if not _is_nested(sampler):
            raise TypeError("checkpoint is for a NestedSampler")
        for field in ("n_live", "batch", "kernel", "n_mcmc", "a"):
            # n_mcmc/a absent from early-round-4 archives: skip, the
            # remaining fields still guard the load
            if field in meta and meta[field] != getattr(sampler, field):
                raise ValueError(
                    f"{field} mismatch: checkpoint {meta[field]!r}, "
                    f"sampler {getattr(sampler, field)!r}"
                )
        live = jnp.asarray(arrays["live"], sampler.dtype)
        if sampler._row_sharding is not None:
            live = jax.device_put(live, sampler._row_sharding)
        sampler._live = live
        sampler._ll = jnp.asarray(arrays["ll"])
        sampler._lpp = jnp.asarray(arrays["lpp"])
        sampler._dead_pos = (
            [arrays["dead_pos"]] if arrays["dead_pos"].shape[0] else []
        )
        sampler._dead_ll = (
            [arrays["dead_ll"]] if arrays["dead_ll"].shape[0] else []
        )
        sampler._dead_logw = (
            [arrays["dead_logw"]] if arrays["dead_logw"].shape[0] else []
        )
        sampler._logz = float(meta["logz"])
        sampler._logx = float(meta["logx"])
        sampler._n_calls = int(meta["n_calls"])
        sampler._iters_done = int(meta["iters_done"])
        sampler._low_acc_warned = bool(meta["low_acc_warned"])
        sampler.result = None  # stale; run() re-finalizes
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
    elif meta["kind"] == "ibis":
        from mcmcpp_tpu.ibis import IBISState

        if not _is_ibis(sampler):
            raise TypeError("checkpoint is for an IBISSampler")
        if meta["n_particles"] != sampler.n:
            raise ValueError("particle count mismatch")
        if meta["batch_size"] != sampler.batch_size:
            raise ValueError("batch_size mismatch")
        state = IBISState(
            particles=jnp.asarray(arrays["particles"]),
            log_prior=jnp.asarray(arrays["log_prior"]),
            loglik_cum=jnp.asarray(arrays["loglik_cum"]),
            log_w=jnp.asarray(arrays["log_w"]),
            log_evidence=jnp.asarray(arrays["log_evidence"]),
            n_included=jnp.asarray(arrays["n_included"]),
        )
        sampler.state = sampler._constrain(state)
        if meta["data_format"] == "dict":
            sampler._data = {
                k: jnp.asarray(arrays[f"data_{i}"])
                for i, k in enumerate(meta["data_keys"])
            }
        else:
            sampler._data = jnp.asarray(arrays["data_0"])
        sampler.n_resamples = int(meta["n_resamples"])
        sampler.log_evidence_trace = [
            float(v) for v in arrays["evidence_trace"]
        ]
        sampler._stage_cache = {}
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
    elif meta["kind"] == "smc2":
        from mcmcpp_tpu.smc2 import SMC2State

        if not _is_smc2(sampler):
            raise TypeError("checkpoint is for an SMC2Sampler")
        if meta["n_theta"] != sampler.m:
            raise ValueError("theta-particle count mismatch")
        # n_x is RUNTIME state (the grow step doubles it mid-stream), so
        # the checkpoint's value is adopted rather than validated
        sampler.n_x = int(meta["n_x"])
        sampler.n_growths = int(meta.get("n_growths", 0))
        state = SMC2State(
            theta=jnp.asarray(arrays["theta"]),
            log_prior=jnp.asarray(arrays["log_prior"]),
            loglik_hat=jnp.asarray(arrays["loglik_hat"]),
            xs=jnp.asarray(arrays["xs"]),
            x_logw=jnp.asarray(arrays["x_logw"]),
            log_w=jnp.asarray(arrays["log_w"]),
            log_evidence=jnp.asarray(arrays["log_evidence"]),
            n_included=jnp.asarray(arrays["n_included"]),
        )
        sampler.state = sampler._constrain(state)
        sampler._ys = jnp.asarray(arrays["ys"])
        sampler.n_resamples = int(meta["n_resamples"])
        sampler.log_evidence_trace = [
            float(v) for v in arrays["evidence_trace"]
        ]
        sampler._stage_cache = {}
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
    elif meta["kind"] == "neutra":
        if not _is_neutra(sampler):
            raise TypeError("checkpoint is for a NeuTra transport")
        if meta["flow"] != type(sampler.flow).__name__:
            raise ValueError(
                f"flow family mismatch: checkpoint {meta['flow']}, "
                f"sampler {type(sampler.flow).__name__}"
            )
        sampler.params = _unpack_leaves(arrays, meta, "flow", sampler.params)
        if "n_opt_leaves" in meta:
            import optax

            tmpl = optax.adam(1e-3).init(sampler.params)
            sampler._opt_state = _unpack_leaves(arrays, meta, "opt", tmpl)
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
        from mcmcpp_tpu.neutra import FitResult

        for attr in ("fit_result", "refit_result"):
            if f"{attr}_hist" in arrays:
                hist = arrays[f"{attr}_hist"]
                setattr(sampler, attr,
                        FitResult(hist, float(hist[-100:].mean())))
    elif meta["kind"] == "advi":
        if not _is_advi(sampler):
            raise TypeError("checkpoint is for an ADVI fit")
        if bool(meta["full_rank"]) != bool(sampler.full_rank):
            raise ValueError(
                "checkpoint/sampler disagree on full_rank mode"
            )
        sampler.params = _unpack_leaves(arrays, meta, "vi", sampler.params)
        sampler.opt_state = _unpack_leaves(
            arrays, meta, "opt", sampler.opt_state
        )
        sampler.elbo_trace = [float(v) for v in arrays["elbo_trace"]]
        sampler._key = _wrap_key(arrays["key"], meta.get("prng_impl"))
    else:
        raise ValueError(f"unknown checkpoint kind {meta['kind']!r}")
    return sampler

