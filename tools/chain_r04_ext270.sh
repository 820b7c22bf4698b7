#!/bin/bash
# Fourth chained phase of round 4 (fresh session wall-clock budget):
#   1. GAN branch to 270 cumulative fine-tune minutes (fm50_ext270) from the
#      ext180 snapshot — the SI-SDR trajectory was still monotone when the
#      180-min point crossed the phase floor (+5.57 dB), so another matched
#      point tells us whether the adversarial phase repair keeps compounding.
#   2. Energy GAN branch +90 more minutes IF the in-flight ext90 point shows
#      the energy branch escaping the phase floor too (SI-SDR > -20 dB).
#   3. bench.py sanity run on the then-idle TPU — validates the auto-selected
#      headline path (XLA vs fused Pallas stack) end-to-end before the
#      driver's round-end bench.
# Waits for the ext180 chain's anchored done marker (serial TPU, CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r04_ext270.pid

grace=0
while true; do
    grep -q '^r04 ext180 chain done' /tmp/chain_r04_ext180.log 2>/dev/null && break
    pid=$(cat /tmp/chain_r04_ext180.pid 2>/dev/null)
    if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
        grace=0
    else
        grace=$((grace + 60))
        [ "$grace" -ge 300 ] && { echo "ext180 chain gone without marker; proceeding"; break; }
    fi
    sleep 60
done

commit_sweep() {
    git add GANFT_SWEEP_r04.json QUALITY_r04 QUALITY_r04.md artifacts 2>/dev/null
    git diff --cached --quiet || git commit -q -m "$1"
}

if [ ! -f QUALITY_r04/sweep/fm50_ext270.json ] && \
   [ -f artifacts/ckpt/ganft_fm50_ext180.npz ]; then
    timeout 7200 python -u tools/ganft_sweep.py extend fm50 ganft_fm50_ext180 90 fm50_ext270 \
        > /tmp/r04_ext270_gan.log 2>&1
    echo "fm50_ext270 exited $? at $(date)"
    timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_ext270_gan.log 2>&1
    timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_ext270_gan.log 2>&1
    commit_sweep "GANFT_SWEEP_r04: GAN branch to 270 fine-tune minutes (fm50_ext270)"
else
    echo "skipping fm50_ext270 (already done or ext180 snapshot missing)"
fi

ENERGY_GO=$(python - <<'EOF'
import json
try:
    after = json.load(open("QUALITY_r04/sweep/energy_fm50_ext90.json"))["after"]
    print("yes" if after.get("si_sdr_db", -99.0) > -20.0 else "no")
except Exception:
    print("no")
EOF
)
if [ "$ENERGY_GO" = "yes" ] && \
   [ ! -f QUALITY_r04/sweep/energy_fm50_ext90_ext90.json ] && \
   [ -f artifacts/ckpt/ganft_energy_fm50_ext90.npz ]; then
    timeout 7200 python -u tools/energy_ganft.py extend ganft_energy_fm50_ext90 90 \
        > /tmp/r04_ext270_energy.log 2>&1
    echo "energy second extension exited $? at $(date)"
    timeout 600 python tools/ganft_sweep.py report >> /tmp/r04_ext270_energy.log 2>&1
    timeout 600 python tools/quality_r04.py --markdown >> /tmp/r04_ext270_energy.log 2>&1
    commit_sweep "GANFT_SWEEP_r04: energy GAN branch +90 min (phase-floor escape follow-up)"
else
    echo "skipping second energy extension (gate=$ENERGY_GO)"
fi

timeout 2400 python bench.py > /tmp/r04_bench_sanity.log 2>&1
echo "bench sanity exited $? at $(date)"
tail -1 /tmp/r04_bench_sanity.log

echo "r04 ext270 chain done at $(date)"
