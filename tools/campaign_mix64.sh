#!/bin/bash
# BASELINE config 5: DFC-VAE on the 64^3 mixed binary/ternary dataset
# (data/mix64, 2000 structures: perovskite ABX3 + rocksalt AB).
# The 32^3-trained U-Net (fully convolutional) supplies the perceptual
# taps unchanged.  Chunked --resume runs: the axon plugin leaks host RAM
# per jax array, so each chunk is a fresh process (CLAUDE.md).
#
#   bash tools/campaign_mix64.sh [total_epochs] [chunk] [layout]
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1  # timely log lines under redirection
TOTAL=${1:-60}
CHUNK=${2:-15}
LAYOUT=${3:-ndhwc}  # measured whole-step winner at 64^3 (ndcs_step.json r3)
# Perceptual-tap U-Net.  The reference trains the DFC U-Net on the SAME
# dataset as the VAE (train_unet.py then train_vae.py over one data dir),
# so when the dedicated 64^3 U-Net exists (campaign_r3_extras.sh unet64)
# pass UNET_CKPT=checkpoints/mix64/unet; the 32^3 ns10k default is the
# fully-convolutional fallback used by the first recorded 60-epoch run.
UNET_CKPT=${UNET_CKPT:-checkpoints/ns10k/unet}
LOG=output/ns10k/mix64_vae.log
mkdir -p output/ns10k checkpoints/mix64
done_epochs=0
first=1
# RESUME=1: continue an existing checkpoints/mix64/vae for TOTAL more
# epochs (every chunk passes --resume, including the first).
[ "${RESUME:-0}" = 1 ] && first=0
fails=0
MAX_FAILS=${MAX_FAILS:-5}   # consecutive-failure cap: a persistent error
                            # (e.g. a kernel that won't compile) must fail
                            # loudly, not retry-loop forever looking slow
while [ $done_epochs -lt $TOTAL ]; do
  n=$CHUNK
  rem=$((TOTAL - done_epochs))
  [ $rem -lt $n ] && n=$rem
  args=(--data data/mix64 --ckpt checkpoints/mix64/vae
        --unet-ckpt "$UNET_CKPT"
        --epochs $n --batch-size 48 --lr 5e-4 --nrot 0
        --layout $LAYOUT --ship-dtype float16
        --ckpt-every "${CKPT_EVERY:-$n}"  # full-state latest cadence (the
                          # loop tail always saves one after the final
                          # epoch); < n gives mid-chunk crash-resume points
        --plot-every "${PLOT_EVERY:-1}"   # thin best-val plot refreshes:
                          # each ships arrays through the leaky remote
                          # plugin (HBM creep killed a 25-epoch chunk)
        --resident)       # whole split HBM-resident: zero per-epoch
                          # host->device traffic (the 64^3 split is
                          # ~1 GB; epochs were measured transfer-bound)
  [ $first -eq 0 ] && args+=(--resume)
  echo "=== chunk start epochs_done=$done_epochs n=$n $(date)" >> $LOG
  timeout 3600 python -m icsg3d_tpu.apps.train_vae "${args[@]}" >> $LOG 2>&1
  rc=$?
  echo "=== chunk rc=$rc $(date)" >> $LOG
  if [ $rc -ne 0 ]; then
    fails=$((fails + 1))
    if [ $fails -ge $MAX_FAILS ]; then
      echo "=== campaign ABORTED: $fails consecutive chunk failures (last rc=$rc) $(date)" >> $LOG
      echo "campaign_mix64: aborted after $fails consecutive failures; see $LOG" >&2
      exit 1
    fi
    echo "=== chunk failed ($fails/$MAX_FAILS); waiting before retry" >> $LOG
    sleep 180
    continue
  fi
  fails=0
  done_epochs=$((done_epochs + n))
  first=0
done
echo "=== campaign complete $(date)" >> $LOG
