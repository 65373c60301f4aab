#!/usr/bin/env python
"""Run the TPU-gated statistical tests on the real chip and commit the
evidence (round-3 verdict item 3).

``tests/test_fused.py::test_fused_mover_moments`` (the Pallas fused-mover
moment recovery) is ``skipif(backend != "tpu")`` because interpret-mode
``pltpu.prng_random_bits`` returns zeros (CLAUDE.md) — so every CPU suite
run skips it and the path would otherwise have zero statistical
verification anywhere. This orchestrator reuses bench.py's outage-proof
pattern (the tunneled chip hangs/500s transiently): bounded retries, each
attempt a fresh subprocess running pytest with ``MCMCPP_TEST_TPU=1``
(tests/conftest.py then leaves the backend on the TPU), and the outcome —
per-test pass/fail, timings, attempt count — is appended to
``docs/artifacts/tpu_test_ledger.json``.

Usage: python benchmarks/tpu_test_ledger.py  (~2-4 min on a warm tunnel)
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
LEDGER = REPO / "docs" / "artifacts" / "tpu_test_ledger.json"
ATTEMPT_TIMEOUT_S = 900
OVERALL_DEADLINE_S = 3600
RETRY_SLEEP_S = 120

# ONLY the real-hardware statistical paths. The interpret-mode kernel
# tests in the same file run the Pallas interpreter op-by-op — over the
# tunneled chip that is a multi-hour crawl (observed 2026-08-20: >15 min
# with ~0 progress), and they are already covered by every CPU run.
TESTS = [
    "tests/test_fused.py::test_fused_mover_moments",
    "tests/test_fused.py::test_rbg_prng_impl",
]


def _log(msg):
    print(f"[ledger +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


T0 = time.time()


def one_attempt(budget):
    env = dict(os.environ)
    env["MCMCPP_TEST_TPU"] = "1"
    env.pop("JAX_PLATFORMS", None)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *TESTS, "-v", "-n0", "-rs",
         "--no-header", "-p", "no:cacheprovider"],
        capture_output=True, text=True, timeout=budget, cwd=REPO, env=env,
    )
    wall = time.time() - t0
    results = {}
    for line in proc.stdout.splitlines():
        for status in ("PASSED", "FAILED", "SKIPPED", "ERROR"):
            if f" {status}" in line and "::" in line:
                results[line.split(" ")[0]] = status
    return proc.returncode, results, wall, proc.stdout[-3000:]


def main():
    deadline = T0 + OVERALL_DEADLINE_S
    attempt = 0
    while True:
        attempt += 1
        budget = min(ATTEMPT_TIMEOUT_S, max(60, int(deadline - time.time())))
        _log(f"attempt {attempt} (timeout {budget}s)")
        try:
            rc, results, wall, tail = one_attempt(budget)
        except subprocess.TimeoutExpired:
            _log(f"attempt {attempt} timed out (tunnel outage pattern)")
            rc, results, wall, tail = -1, {}, budget, "TIMEOUT"
        tpu_stat_tests = {
            k: v for k, v in results.items() if "moments" in k
        }
        ok = rc == 0 and results and all(
            v == "PASSED" for v in results.values()
        ) and tpu_stat_tests
        if ok:
            entry = {
                "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
                "attempts": attempt,
                "wall_s": round(wall, 1),
                "backend": "tpu (MCMCPP_TEST_TPU=1, tunneled axon chip)",
                "results": results,
                "note": (
                    "test_fused_mover_moments is the Pallas-RNG "
                    "statistical path: skipped on every CPU run "
                    "(interpret-mode prng_random_bits yields zeros); "
                    "PASSED here means it executed on real hardware."
                ),
            }
            LEDGER.parent.mkdir(parents=True, exist_ok=True)
            history = []
            if LEDGER.exists():
                history = json.loads(LEDGER.read_text())
            history.append(entry)
            LEDGER.write_text(json.dumps(history, indent=1))
            print(json.dumps(entry["results"]))
            _log(f"ledger updated: {LEDGER}")
            return 0
        _log(f"attempt {attempt} failed rc={rc} results={results}\n"
             f"{tail[-1500:]}")
        if time.time() + RETRY_SLEEP_S + 60 > deadline:
            _log("deadline exhausted")
            return 1
        time.sleep(RETRY_SLEEP_S)


if __name__ == "__main__":
    sys.exit(main())
