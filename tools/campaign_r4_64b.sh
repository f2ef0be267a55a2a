#!/bin/bash
# Round-4 64^3 campaign, part B — restart after the 25-epoch-chunk HBM
# OOM (RESOURCE_EXHAUSTED at epoch 12: the remote plugin leaks per-array
# memory, so long chunks creep into the step's working set; the round-3
# 60-epoch run survived only because its chunks were 15 epochs).
#
# Changes vs campaign_r4_64.sh's vae64 stage:
#   - 10-epoch chunks, every chunk --resume (RESUME=1), latest saved
#     every 5 epochs so a mid-chunk crash resumes instead of restarting
#   - best-val plot refreshes thinned to every 5 epochs (--plot-every):
#     early training improves val every epoch and each refresh ships
#     arrays through the leaky plugin
#
#   nohup bash tools/campaign_r4_64b.sh > output/ns10k/r4_64b.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOG=output/ns10k/r4_64_driver.log
mkdir -p output/ns10k

stamp() { echo "=== $1 $(date)" | tee -a $LOG; }

stamp "vae64 part B (250 epochs, chunk 10, resume-always)"
RESUME=1 CKPT_EVERY=5 PLOT_EVERY=5 UNET_CKPT=checkpoints/mix64/unet \
  bash tools/campaign_mix64.sh 250 10 ndhwc \
  || { stamp "vae64 FAILED"; exit 1; }
stamp "vae64 done"

stamp "eval64 + gen64"
bash tools/campaign_r3_extras.sh eval64 gen64
stamp "campaign_r4_64 complete"
