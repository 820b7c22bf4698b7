#!/bin/bash
# Round-3 (continuation) TPU queue. Waits for the quality campaign PID to
# exit, then runs the remaining TPU experiments SERIALLY (never overlap TPU
# compiles — see CLAUDE.md wedge protocol). Each phase is timeout-bounded so
# a wedged remote compile cannot eat the session. Logs under /tmp/r03b_*.log.
#
# Usage: tools/r03b_queue.sh <campaign_pid>
set -x
cd "$(dirname "$0")/.."

PID="${1:?campaign pid required}"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "campaign exited; starting queue at $(date)"

# 1. regenerate QUALITY_r03.md from all final jsons (CPU-fast)
timeout 300 python tools/quality_r03.py --markdown > /tmp/r03b_markdown.log 2>&1

# 2. one-sampled vs full-bank discriminator head-to-head (reference
#    README.md:58 speed claim). One-sampled step variants are already in the
#    persistent XLA cache from the campaign; full-bank adds one big compile.
timeout 7200 python -u tools/onedisc_r03.py --dtype bfloat16 --mini-epochs 24 \
    > /tmp/r03b_onedisc.log 2>&1

# 3. bottleneck swap on the trained GAN checkpoint (train_new_quantizer demo)
timeout 3600 python -u tools/swap_r03.py --epochs 4 > /tmp/r03b_swap.log 2>&1

# 4. real-audio round-trip + codebook animation from the trained checkpoint
timeout 2400 python -u tools/om_demo.py rvq8_gan_hifi --animate \
    > /tmp/r03b_om.log 2>&1

# 5. current per-stage inference ablation (perf record for the round)
timeout 2400 python -u tools/profile_ablate.py > /tmp/r03b_ablate.log 2>&1

echo "queue done at $(date)"
