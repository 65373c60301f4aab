"""Examples must stay runnable (subprocess smoke on the CPU mesh)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

# Grouping (pytest-xdist --dist loadgroup, set in pyproject addopts):
# at most ONE example subprocess alive per group at a time — each spins
# an 8-virtual-device XLA pool whose collectives busy-spin; two of those
# on a saturated 4-core box starve each other past any reasonable
# timeout. Two groups so the two COMPILE-HEAVY smokes (own group, run
# reniced) overlap the light ones instead of serializing behind them.
# NOTE: pytest-xdist UNIONS multiple xdist_group markers into a combined
# name, so every test here carries exactly ONE explicit marker — do not
# add a module-level pytestmark on top.
_light = pytest.mark.xdist_group("example_subprocess")
_heavy = pytest.mark.xdist_group("example_heavy")


def _run(script, *args, timeout=900, devices=8, nice=None):
    """``nice``: negative value raises the subprocess's scheduling
    priority (root only — silently a no-op otherwise). The heavy
    example smokes use it because a few-threaded subprocess under 4
    busy xdist workers gets a CFS share measured at ~1/35 of solo
    (1768 s for a 49 s run); priority restores ~solo pace while the
    workers lose only that minute."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices}"
    ).strip()
    env["JAX_PLATFORMS"] = "cpu"  # stripped by the site plugin, but harmless
    # force cpu the reliable way: sitecustomize-level config via -c wrapper
    path = str(REPO / "examples" / script)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        f"import sys; sys.argv = {[path, *args]!r};"
        f"exec(compile(open({path!r}).read(), {path!r}, 'exec'),"
        f" {{'__file__': {path!r}, '__name__': '__main__'}})"
    )
    # renice from the PARENT after spawn (os.setpriority on the child
    # pid) — preexec_fn runs Python between fork and exec, which is
    # documented-unsafe in threaded parents like a JAX-loaded xdist
    # worker (locks held mid-fork can deadlock the child)
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd=REPO, env=env,
    )
    if nice is not None:
        try:
            os.setpriority(os.PRIO_PROCESS, proc.pid, int(nice))
        except (OSError, PermissionError):
            pass
    try:
        stdout, stderr = proc.communicate(timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.communicate()
        raise
    return subprocess.CompletedProcess(proc.args, proc.returncode,
                                       stdout, stderr)


@pytest.mark.slow
@_light
def test_skewed_gaussian_example():
    r = _run("skewed_gaussian.py", "--steps", "400", "--thin", "4",
             "--walkers", "64", "--burn", "100")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "acceptance fraction" in r.stdout
    assert "covariance" in r.stdout


@pytest.mark.slow
@_light
def test_actime_example():
    r = _run("actime.py", "--steps", "4096", "--walkers", "32")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "true tau" in r.stdout


@pytest.mark.slow
@_light
def test_actime_example_sharded():
    r = _run("actime.py", "--steps", "2048", "--walkers", "32", "--sharded")
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
@_light
def test_inner_benchmark_example():
    r = _run("inner_benchmark.py", "--steps", "500", "--walkers", "128")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "walker-updates/s" in r.stdout


@pytest.mark.slow
@_light
def test_hierarchical_example():
    r = _run("hierarchical.py", "--chains", "16")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "mu" in r.stdout and "posterior-predictive" in r.stdout


@pytest.mark.slow
@_light
def test_gp_latent_example():
    r = _run("gp_latent.py", "--quick")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "posterior-mean RMSE" in r.stdout


@pytest.mark.slow
@_light
def test_bayesian_workflow_example():
    r = _run("bayesian_workflow.py", "--dim", "6", "--quick")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "divergent transitions" in r.stdout
    assert "ArviZ export groups" in r.stdout


@_light
def test_api_doc_generation():
    """docs/gen_api.py must run clean AND match the checked-in api.md —
    red on drift (regenerate with `python docs/gen_api.py` and commit)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_api", REPO / "docs" / "gen_api.py"
    )
    gen_api = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen_api)
    rendered = gen_api.render()
    assert len(rendered) > 5000
    checked_in = (REPO / "docs" / "api.md").read_text()
    assert rendered == checked_in, (
        "docs/api.md is stale — run `python docs/gen_api.py` and commit"
    )


@pytest.mark.slow
@_light
def test_streaming_example():
    r = _run("streaming.py", "--quick")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "log BF" in r.stdout
    assert "OK" in r.stdout


@pytest.mark.slow
@_light
def test_dp_mixture_example():
    r = _run("dp_mixture.py", "--quick", "--n", "120")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "predictive-density L1 error" in r.stdout
    assert "OK" in r.stdout


@pytest.mark.slow
@_light
def test_evidence_example():
    r = _run("evidence.py", "--quick")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "log Bayes factor" in r.stdout
    assert "decisive for M2" in r.stdout


@pytest.mark.slow
@_heavy
def test_gp_hyperparams_example():
    # Own xdist group (round-5 wall-time fix): these two compile-heavy
    # smokes previously ran IN-PROCESS inside the serialized
    # example_subprocess group, where worker starvation measured 1768 s
    # for a 49 s-solo run — singlehandedly setting the full-suite wall
    # time. A separate group lets them run on another worker in
    # parallel with the light example subprocesses; the function-level
    # marker overrides the module-level group (closest marker wins).
    r = _run("gp_hyperparams.py", "--quick", timeout=1500, nice=-10)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
    assert "lengthscale" in r.stdout


@pytest.mark.slow
@_heavy
def test_state_space_example():
    # Same separate-group treatment as the GP smoke above (three
    # Gibbs/PMMH loops, ~60 s solo).
    r = _run("state_space.py", "--quick", timeout=1500, nice=-10)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
    assert "sticky diagonal" in r.stdout


@pytest.mark.slow
@_light
def test_regime_switching_example():
    r = _run("regime_switching.py", "--quick")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "regime-classification" in r.stdout
    assert "PMMH (RB'd likelihood)" in r.stdout


@pytest.mark.slow
@_light
def test_data_assimilation_example():
    r = _run("data_assimilation.py", "--quick")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "analysis RMSE" in r.stdout


@pytest.mark.slow
@_light
def test_skewed_gaussian_example_dram():
    r = _run("skewed_gaussian.py", "--mover", "dram", "--steps", "400",
             "--thin", "4", "--walkers", "64", "--burn", "100")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "acceptance fraction" in r.stdout


@pytest.mark.slow
@_light
def test_function_space_example():
    r = _run("function_space.py", "--steps", "300", "--chains", "8")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dimension-robust" in r.stdout


@pytest.mark.slow
@_light
def test_ssm_mle_example():
    r = _run("ssm_mle.py", "--t", "60", "--if2-iters", "6",
             "--particles", "256")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "IF2 MLE" in r.stdout and "PMMH mean" in r.stdout
