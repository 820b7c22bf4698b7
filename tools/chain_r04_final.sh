#!/bin/bash
# Post-campaign tail for round 4, chained on the r04 queue's done marker
# (runs unattended even if the builder session dies — CLAUDE.md protocol).
# Serial TPU use only; each step is timeout-bounded and committed.
set -x
cd "$(dirname "$0")/.."
echo $$ > /tmp/chain_r04_final.pid

while ! grep -q "r04 queue done" /tmp/r04_queue.log 2>/dev/null; do
    sleep 120
done

# 1. real-audio demo: round-trip the reference's own om.wav through the
#    trained speech flagships (the only REAL recording available offline)
timeout 1800 python -u tools/om_demo.py rvq8_speech --animate \
    > /tmp/r04_om.log 2>&1
timeout 1200 python -u tools/om_demo.py rvq8_gan_ft_speech \
    >> /tmp/r04_om.log 2>&1

# 2. parity artifact (torch generator + NEW discriminator parity + TPU-vs-
#    CPU indices — needs the TPU idle, which it is once the queue is done)
timeout 2400 python -u tools/parity_check.py --out PARITY_r04.json \
    > /tmp/r04_parity.log 2>&1

git add -A QUALITY_r04 QUALITY_r04.md PARITY_r04.json artifacts 2>/dev/null
git diff --cached --quiet || git commit -q -m \
    "QUALITY_r04: om.wav real-audio demos + PARITY_r04 (generator, adversaries, TPU indices)"

echo "chain_r04_final done at $(date)"
