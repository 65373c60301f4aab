#!/usr/bin/env bash
# Weak-scaling playbook for a real TPU pod slice (round-4 VERDICT item 9).
#
# Target (BASELINE.md): >=85% walker-updates/s scaling efficiency
# 1 chip -> 1 host -> full slice. Run when multi-chip hardware appears;
# the dev box in this repo has exactly one tunneled chip, so this script
# has never been run end-to-end — the sharded programs it drives ARE
# continuously validated (8-virtual-device dryrun, 2-process Gloo tests,
# HLO collective-pattern asserts incl. the two-level hosts x devices
# mesh in tests/test_hlo_collectives.py).
#
# Usage:
#   Single host (steps 1-2):    benchmarks/pod_scaling.sh
#   Full slice (step 3) — run the SAME command on EVERY host, e.g.:
#     gcloud compute tpus tpu-vm ssh $TPU --worker=all \
#       --command="cd mcmcpp_tpu && benchmarks/pod_scaling.sh --slice $BASE"
#   where $BASE is the single-chip updates/s printed by step 1.
set -euo pipefail
cd "$(dirname "$0")/.."

WPD="${WPD:-262144}"       # walkers per device (the v5e throughput knee)
STEPS="${STEPS:-400}"      # >=400/launch amortizes dispatch (CLAUDE.md)

if [[ "${1:-}" == "--slice" ]]; then
  # ---- step 3: whole slice, one process per host ----------------------
  BASE="${2:?pass the single-chip updates/s as: --slice <base_rate>}"
  exec python benchmarks/scaling.py --distributed --base-rate "$BASE" \
    --walkers-per-device "$WPD" --steps "$STEPS"
fi

echo "== step 1+2: single-host sweep (1 chip -> all local chips) =="
echo "   (single-chip row doubles as the --slice base rate)"
python benchmarks/scaling.py --walkers-per-device "$WPD" --steps "$STEPS"

cat <<'EOF'

== step 3: full slice ==
Re-run on EVERY host of the slice with the single-chip rate from above:
    benchmarks/pod_scaling.sh --slice <single_chip_updates_per_s>
Pass = every efficiency row >= 0.85 (BASELINE.md). If the full-slice row
falls below while the single-host rows hold, the DCN hop is the suspect:
confirm with a profiler trace that the opposite-half all-gather's
replica groups keep same-host devices contiguous (ICI-inner ordering —
the property pinned by tests/test_hlo_collectives.py).
EOF
