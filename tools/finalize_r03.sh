#!/bin/bash
# Round-3 finalize sequence (run AFTER the quality campaign process exits;
# needs the TPU free). Each phase is bounded; artifacts land in QUALITY_r03/
# and the repo root.
set -x
cd "$(dirname "$0")/.."

# 1. regenerate QUALITY_r03.md with the horizon-aware generator (the
#    campaign's in-process writer used the pre-update code)
timeout 300 python tools/quality_r03.py --markdown

# 2. real-audio demo + trained-checkpoint codebook animation (om.wav)
timeout 2400 python -u tools/om_demo.py rvq8_gan_hifi --animate

# 3. headline bench (driver runs this again at round end; this is the
#    sanity copy)
timeout 2400 python bench.py | tail -1
