#!/bin/bash
# Round-4 64^3 campaign, part D — continuation after the chunk-teardown
# lease tax surfaced: each heavy 64^3 session's exit leaves the remote
# chip cleaning up for ~10-17 min, during which the NEXT chunk's client
# futex-waits on its claim (observed on vae64 chunks 3-4; unet64's
# lighter sessions paid no such tax).  Per-chunk startup cost is fixed,
# so fewer/larger chunks amortize it: 25-epoch chunks (mid-chunk latest
# saves every 5 epochs + thinned plots keep the HBM-creep risk bounded;
# a mid-chunk OOM costs <=5 epochs and one retry).
#
# Resumes the part-C campaign at 30/250 epochs done, then runs the
# eval/gen stages and the follow-on campaign inline (the separate
# waiter was killed with the rest of the part-C tree).
#
#   nohup bash tools/campaign_r4_64d.sh > output/ns10k/r4_64d.log 2>&1 &
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOG=output/ns10k/r4_64_driver.log
mkdir -p output/ns10k
rm -f /tmp/campaign64.pid   # stale part-C pid; followon must not wait on it

stamp() { echo "=== $1 $(date)" | tee -a $LOG; }

stamp "vae64 part D (220 more epochs, chunk 25, resume-always)"
RESUME=1 CKPT_EVERY=5 PLOT_EVERY=5 UNET_CKPT=checkpoints/mix64/unet \
  bash tools/campaign_mix64.sh 220 25 ndhwc \
  || { stamp "vae64 FAILED"; exit 1; }
stamp "vae64 done"

stamp "eval64 + gen64"
bash tools/campaign_r3_extras.sh eval64 gen64
stamp "campaign_r4_64 complete"

stamp "follow-on stages"
bash tools/campaign_r4_followon.sh
stamp "follow-on complete"
