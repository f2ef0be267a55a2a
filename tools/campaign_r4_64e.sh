#!/bin/bash
# Round-4 64^3 campaign, part E — finish the 250-epoch schedule in ONE
# process via the whole-epoch lax.scan path (--epoch-scan): one
# permutation upload + one metrics fetch per epoch means the remote
# plugin's per-array creep never builds up, so no chunking and none of
# the per-chunk teardown claim tax that was costing 10-17 min per
# 25-epoch chunk (COVERAGE.md round-4).  Falls back to the proven
# chunked loop if the scan run fails.
#
#   bash tools/campaign_r4_64e.sh <remaining_epochs>
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOG=output/ns10k/r4_64_driver.log
REMAINING=${1:?usage: campaign_r4_64e.sh <remaining_epochs>}
mkdir -p output/ns10k
rm -f /tmp/campaign64.pid

stamp() { echo "=== $1 $(date)" | tee -a $LOG; }

stamp "vae64 part E ($REMAINING more epochs, single-process epoch-scan)"
timeout 10800 python -m icsg3d_tpu.apps.train_vae \
  --data data/mix64 --ckpt checkpoints/mix64/vae \
  --unet-ckpt checkpoints/mix64/unet \
  --epochs "$REMAINING" --batch-size 48 --lr 5e-4 --nrot 0 \
  --layout ndhwc --ship-dtype float16 \
  --resident --epoch-scan --resume --ckpt-every 10 --plot-every 5 \
  >> output/ns10k/mix64_vae.log 2>&1
rc=$?
stamp "vae64 epoch-scan rc=$rc"
if [ $rc -ne 0 ]; then
  stamp "epoch-scan run FAILED; falling back to chunked (resumes from latest)"
  RESUME=1 CKPT_EVERY=5 PLOT_EVERY=5 UNET_CKPT=checkpoints/mix64/unet \
    bash tools/campaign_mix64.sh "$REMAINING" 25 ndhwc \
    || { stamp "vae64 FAILED"; exit 1; }
fi
stamp "vae64 done"

stamp "eval64 + gen64"
bash tools/campaign_r3_extras.sh eval64 gen64
stamp "campaign_r4_64 complete"

stamp "follow-on stages"
bash tools/campaign_r4_followon.sh
stamp "follow-on complete"
