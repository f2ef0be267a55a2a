#!/bin/bash
# Round-5 campaign (VERDICT r4 items 3 and 4, item-2 follow-up):
#
#   eval64train  item 4 diagnostic: evaluate the trained 64^3 model on
#                its FULL TRAIN split (no --samples: data_split trims
#                before shuffling, so a trimmed "train" split is not a
#                subset of the model's actual train split).  Comparing
#                against eval_mix64.json's val numbers separates a
#                generalization gap (train much better) from
#                model/post-processing saturation (both equal).
#   vaefb90      item 3 proof: the flagship ns10k + 9.96 GB feature
#                cache in ONE process via the flat-resident --epoch-scan
#                path (AOT-priced 15.25 GB, tools/scan_mem_probe.py
#                --flat), AND the kld-floor dose-response extension
#                (floor=90; measured points: KLD~20 -> 597/1000
#                balanced, KLD~68 -> 758/1000, r2 natural ~70 -> 858).
#   genfb90      1000 samples -> charge-balance count (target >=800)
#   evalfb90     full val-split eval
#
# Writes .chip_busy.pid so the driver's bench.py waits instead of
# OOM-colliding with a live trainer (the round-4 failure mode).
# Re-invokable: every stage skips or resumes from its artifacts.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOGDIR=output/ns10k
DRIVER=$LOGDIR/r5_driver.log
mkdir -p $LOGDIR
echo $$ > .chip_busy.pid
trap 'rm -f .chip_busy.pid' EXIT

KLD_FLOOR=${KLD_FLOOR:-90}
CKPT=checkpoints/ns10k/vae_fb90
TOTAL=${VAEFB_EPOCHS:-250}
SPE=62  # steps/epoch: 8000-sample ns10k train split / bs 128

stamp() { echo "=== $1 $(date)" | tee -a $DRIVER; }

run() {  # run <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  stamp "$name start"
  timeout "$to" "$@" > $LOGDIR/$name.log 2>&1
  local rc=$?
  stamp "$name rc=$rc"
  return $rc
}

epochs_done() {
  python - <<PY
import json
try:
    with open("$CKPT/progress.json") as f:
        print(json.load(f)["step"] // $SPE)
except Exception:
    print(0)
PY
}

for stage in ${*:-eval64train vaefb90 genfb90 evalfb90}; do
  case $stage in
    eval64train)
      [ -s $LOGDIR/eval_mix64_train.json ] && { stamp "eval64train done already"; continue; }
      UNET64=checkpoints/ns10k/unet
      [ -d checkpoints/mix64/unet ] && UNET64=checkpoints/mix64/unet
      run eval64train 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/mix64 --vae-ckpt checkpoints/mix64/vae \
        --unet-ckpt $UNET64 --batch-size 32 --eval-split train \
        --output $LOGDIR/eval_mix64_train.json \
        || stamp "eval64train FAILED (continuing)"
      ;;
    vaefb90)
      done_e=0; vextra=()
      if [ -d $CKPT/latest ]; then
        vextra=(--resume); done_e=$(epochs_done)
      fi
      rem=$((TOTAL - done_e))
      [ $rem -le 0 ] && { stamp "vaefb90 already complete"; continue; }
      # The cache+scan combination does not fit the 15.75 G chip at the
      # flagship config (four hardware attempts: compile-OOM unflat,
      # then execution-OOM at <0.5 G margin flat and flat+remat); the
      # trainer's auto-gate now drops the cache for the scan attempt and
      # logs why.  Uncached scan: 5.0 G program, and still faster than
      # chunked (no 2-RTT/step host tax).
      run vaefb90 10800 python -m icsg3d_tpu.apps.train_vae \
        --data data/ns10k --ckpt $CKPT \
        --unet-ckpt checkpoints/ns10k/unet --kld-floor $KLD_FLOOR \
        --batch-size 128 --lr 5e-4 --nrot 0 --epochs $rem \
        --cache-true-features --plot-every 50 \
        --resident --ship-dtype float16 --epoch-scan --ckpt-every 25 \
        ${vextra[@]+"${vextra[@]}"} \
        && { stamp "vaefb90 complete (single-process epoch-scan)"; continue; }
      stamp "vaefb90 epoch-scan FAILED; falling back to chunked resume"
      fails=0
      [ -d $CKPT/latest ] && done_e=$(epochs_done)
      while [ $done_e -lt $TOTAL ]; do
        n=25; rem=$((TOTAL - done_e)); [ $rem -lt $n ] && n=$rem
        vargs=(--data data/ns10k --ckpt $CKPT
               --unet-ckpt checkpoints/ns10k/unet --kld-floor $KLD_FLOOR
               --batch-size 128 --lr 5e-4 --nrot 0 --epochs $n
               --cache-true-features --plot-every 10
               --resident --ship-dtype float16 --ckpt-every $n)
        [ -d $CKPT/latest ] && vargs+=(--resume)
        echo "=== vaefb90 chunk start epochs_done=$done_e n=$n $(date)" \
          >> $LOGDIR/vaefb90.log
        timeout 3600 python -m icsg3d_tpu.apps.train_vae "${vargs[@]}" \
          >> $LOGDIR/vaefb90.log 2>&1
        rc=$?
        echo "=== vaefb90 chunk rc=$rc $(date)" >> $LOGDIR/vaefb90.log
        if [ $rc -ne 0 ]; then
          fails=$((fails + 1)); [ $fails -ge 5 ] && exit 1
          sleep 120
        else
          fails=0
        fi
        done_e=$(epochs_done)
      done
      stamp "vaefb90 complete (chunked)"
      ;;
    genfb90)
      [ -s $LOGDIR/genfb90.log ] && grep -q "charge-balanced" $LOGDIR/genfb90.log \
        && { stamp "genfb90 done already"; continue; }
      BASE=$(python -c '
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/ns10k").ids[0])')
      run genfb90 5400 python -m icsg3d_tpu.apps.generate \
        --data data/ns10k --base "$BASE" \
        --vae-ckpt $CKPT --unet-ckpt checkpoints/ns10k/unet \
        --nsamples 1000 --batch-size 100 --var 0.5 \
        --output $LOGDIR/generated_fb90
      ;;
    evalfb90)
      [ -s $LOGDIR/eval_fb90.json ] && { stamp "evalfb90 done already"; continue; }
      run evalfb90 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/ns10k --vae-ckpt $CKPT \
        --unet-ckpt checkpoints/ns10k/unet --batch-size 100 \
        --output $LOGDIR/eval_fb90.json
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
stamp "campaign_r5 complete"
