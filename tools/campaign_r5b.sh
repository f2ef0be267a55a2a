#!/bin/bash
# Round-5 part B — the 64^3 binary-threshold follow-up (VERDICT r4
# item 4's "concrete follow-up executed"):
#
#   eval64t90   evaluate the 64^3 val split at --binary-threshold 0.9
#               (the measured optimum: tools/diag64_binary.py — the
#               sigmoid head over-covers at the default 0.8; at 0.9 the
#               predicted occupied fraction matches the true 12.2% and
#               true-density EMD halves 0.79 -> 0.39)
#   gen64t90    200-sample generation at 0.9 -> validity count
#               (round-4 baseline at 0.8: 80/200 valid)
#
# Queues behind campaign_r5.sh via its .chip_busy.pid.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOGDIR=output/ns10k
DRIVER=$LOGDIR/r5_driver.log

stamp() { echo "=== $1 $(date)" | tee -a $DRIVER; }

# wait for any prior campaign holding the chip
while [ -f .chip_busy.pid ] && kill -0 "$(cat .chip_busy.pid)" 2>/dev/null; do
  sleep 60
done
echo $$ > .chip_busy.pid
trap 'rm -f .chip_busy.pid' EXIT

UNET64=checkpoints/ns10k/unet
[ -d checkpoints/mix64/unet ] && UNET64=checkpoints/mix64/unet

run() {
  local name=$1 to=$2; shift 2
  stamp "$name start"
  timeout "$to" "$@" > $LOGDIR/$name.log 2>&1
  local rc=$?
  stamp "$name rc=$rc"
  return $rc
}

for stage in ${*:-eval64t90 gen64t90}; do
  case $stage in
    eval64t90)
      [ -s $LOGDIR/eval_mix64_t90.json ] && { stamp "eval64t90 done already"; continue; }
      run eval64t90 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/mix64 --vae-ckpt checkpoints/mix64/vae \
        --unet-ckpt $UNET64 --batch-size 32 --binary-threshold 0.9 \
        --output $LOGDIR/eval_mix64_t90.json
      ;;
    gen64t90)
      grep -q "valid structures" $LOGDIR/gen64t90.log 2>/dev/null \
        && { stamp "gen64t90 done already"; continue; }
      BASE=$(python -c '
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/mix64").ids[0])')
      run gen64t90 5400 python -m icsg3d_tpu.apps.generate \
        --data data/mix64 --base "$BASE" \
        --vae-ckpt checkpoints/mix64/vae --unet-ckpt $UNET64 \
        --nsamples 200 --batch-size 20 --var 0.5 \
        --binary-threshold 0.9 --output $LOGDIR/generated64_t90
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
stamp "campaign_r5b complete"
