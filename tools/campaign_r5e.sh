#!/bin/bash
# Round-5 part E — rebalanced remainder of the part-D rebuild.
#
# Part D's stage order (unet 50 -> vae 250 -> unet continuation) would
# have squeezed the U-Net continuation out entirely at the measured
# 86 s/epoch pace, so this script replaces it at the first chunk
# boundary with the budget-aware order:
#   unet64c  continue the 64^3 U-Net to UNET_TOTAL (default 65) epochs
#            - a real (if trimmed) version of the part-C head
#            continuation;
#   vae64    250-epoch single-process epoch-scan (r4-proven config);
#   gen      ONE 200-sample generation at --binary-threshold 0.9
#            sweeping --merge-closer-than 0,0.5,0.7,0.9 (the new
#            single-run sweep), giving both the head-continuation
#            comparison (m=0 arm vs the pre-wipe 73/200 @ head-50) and
#            the merge dose-response from the same decodes.
#
# Env: UNET_TOTAL (65), VAE_EPOCHS (250), GEN_TRIM_AFTER (epoch secs -
# if gen starts later than this, sample count drops 200 -> 140).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOGDIR=output/ns10k
DRIVER=$LOGDIR/r5d_driver.log
mkdir -p $LOGDIR checkpoints/mix64

UNET_TOTAL=${UNET_TOTAL:-65}
VAE_EPOCHS=${VAE_EPOCHS:-250}
GEN_TRIM_AFTER=${GEN_TRIM_AFTER:-0}

stamp() { echo "=== $1 $(date)" | tee -a $DRIVER; }

while [ -f .chip_busy.pid ] && kill -0 "$(cat .chip_busy.pid)" 2>/dev/null; do
  sleep 30
done
echo $$ > .chip_busy.pid
trap 'rm -f .chip_busy.pid' EXIT

run() {
  local name=$1 to=$2; shift 2
  stamp "$name start"
  timeout "$to" "$@" > $LOGDIR/$name.log 2>&1
  local rc=$?
  stamp "$name rc=$rc"
  return $rc
}

unet_done_epochs() {
  python -c '
import json, os
p = "checkpoints/mix64/unet/progress.json"
print(json.load(open(p))["step"] // 200 if os.path.exists(p) else 0)'
}

for stage in ${*:-unet64c vae64 gen}; do
  case $stage in
    unet64c)
      fails=0
      while :; do
        done_e=$(unet_done_epochs)
        rem=$((UNET_TOTAL - done_e))
        [ $rem -le 0 ] && break
        n=25; [ $rem -lt $n ] && n=$rem
        uargs=(--data data/mix64 --ckpt checkpoints/mix64/unet
               --batch-size 8 --lr 3e-6 --nrot 0 --epochs $n
               --resident --ship-dtype float16 --ckpt-every $n)
        [ $done_e -gt 0 ] && uargs+=(--resume)
        stamp "unet64c chunk done=$done_e n=$n"
        timeout 3600 python -m icsg3d_tpu.apps.train_unet "${uargs[@]}" \
          >> $LOGDIR/unet64.log 2>&1
        rc=$?
        echo "=== unet64c chunk rc=$rc $(date)" >> $LOGDIR/unet64.log
        if [ $rc -ne 0 ]; then
          fails=$((fails + 1)); [ $fails -ge 3 ] && exit 1
          sleep 60; continue
        fi
        fails=0
      done
      stamp "unet64c complete at $(unet_done_epochs) epochs"
      ;;
    vae64)
      vargs=(--data data/mix64 --ckpt checkpoints/mix64/vae
             --unet-ckpt checkpoints/mix64/unet
             --epochs "$VAE_EPOCHS" --batch-size 48 --lr 5e-4 --nrot 0
             --layout ndhwc --ship-dtype float16
             --resident --epoch-scan --ckpt-every 25 --plot-every 25)
      [ -f checkpoints/mix64/vae/progress.json ] && vargs+=(--resume)
      run vae64 10800 python -m icsg3d_tpu.apps.train_vae "${vargs[@]}"
      rc=$?
      if [ $rc -ne 0 ]; then
        stamp "vae64 epoch-scan FAILED rc=$rc; chunked fallback"
        done_e=0
        [ -f checkpoints/mix64/vae/progress.json ] && done_e=$(python -c '
import json; s=json.load(open("checkpoints/mix64/vae/progress.json"))["step"]
print(s // (1600 // 48))')
        RESUME=1 CKPT_EVERY=25 PLOT_EVERY=25 UNET_CKPT=checkpoints/mix64/unet \
          bash tools/campaign_mix64.sh $((VAE_EPOCHS - done_e)) 25 ndhwc \
          || stamp "vae64 chunked fallback also failed; gen uses best-so-far"
      fi
      ;;
    gen)
      BASE=$(python -c '
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/mix64").ids[0])')
      NS=200
      if [ "$GEN_TRIM_AFTER" -gt 0 ] && [ "$(date +%s)" -gt "$GEN_TRIM_AFTER" ]; then
        NS=140
        stamp "gen: past trim deadline, nsamples -> $NS"
      fi
      run gen64sweep 5400 python -m icsg3d_tpu.apps.generate \
        --data data/mix64 --base "$BASE" \
        --vae-ckpt checkpoints/mix64/vae --unet-ckpt checkpoints/mix64/unet \
        --nsamples $NS --batch-size 20 --var 0.5 \
        --binary-threshold 0.9 --merge-closer-than 0,0.5,0.7,0.9 \
        --output $LOGDIR/generated64_sweep
      run eval64d 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/mix64 --vae-ckpt checkpoints/mix64/vae \
        --unet-ckpt checkpoints/mix64/unet --batch-size 32 \
        --binary-threshold 0.9 --merge-closer-than 0.7 \
        --output $LOGDIR/eval_mix64_d.json
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
stamp "campaign_r5e complete"
