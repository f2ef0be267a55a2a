#!/bin/bash
# Round-5 part C — sharpen the 64^3 U-Net binary head (the measured
# 64^3 bottleneck: COVERAGE round-5 item 4).  loss_sig was still
# falling steadily at epoch 49 (0.68 -> 0.44, no plateau), so the head
# is undertrained; continue +100 epochs via the single-process
# epoch-scan path, then re-probe the threshold sweep and re-run the
# 200-sample generation at the best threshold.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOGDIR=output/ns10k
DRIVER=$LOGDIR/r5_driver.log

stamp() { echo "=== $1 $(date)" | tee -a $DRIVER; }

while [ -f .chip_busy.pid ] && kill -0 "$(cat .chip_busy.pid)" 2>/dev/null; do
  sleep 60
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

for stage in ${*:-unet64b diag64b gen64b}; do
  case $stage in
    unet64b)
      # The epoch-scan form of this stage crashed the TPU WORKER twice
      # (UNAVAILABLE "worker process crashed", before epoch 0 printed) —
      # the 64^3 U-Net + flat-resident scan is a new combination and
      # faults the runtime, so this stage uses the round-4-proven
      # per-step resident path in 25-epoch chunks instead.
      for c in 1 2 3; do
        run unet64b_$c 7200 python -m icsg3d_tpu.apps.train_unet \
          --data data/mix64 --ckpt checkpoints/mix64/unet \
          --batch-size 8 --lr 3e-6 --nrot 0 --epochs 25 \
          --resident --ship-dtype float16 --ckpt-every 25 \
          --resume || exit 1
      done
      ;;
    diag64b)
      run diag64b 3600 python tools/diag64_binary.py --data data/mix64 \
        --unet-ckpt checkpoints/mix64/unet --n 32 \
        --thresholds 0.5,0.65,0.8,0.9,0.95 \
        --out $LOGDIR/diag64_binary_retrained.json
      ;;
    gen64b)
      BASE=$(python -c '
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/mix64").ids[0])')
      # threshold picked from diag64b: use the sweep minimum-EMD entry
      T=$(python - <<'PY'
import json
d = json.load(open("output/ns10k/diag64_binary_retrained.json"))
best, bt = 1e9, 0.9
for k, v in d.items():
    if k.startswith("t=") and v.get("mean_emd") is not None:
        # balance EMD against blob fragmentation
        score = v["mean_emd"] + 0.02 * v["mean_datoms"]
        if score < best:
            best, bt = score, float(k[2:])
print(bt)
PY
)
      stamp "gen64b threshold=$T"
      run gen64b 5400 python -m icsg3d_tpu.apps.generate \
        --data data/mix64 --base "$BASE" \
        --vae-ckpt checkpoints/mix64/vae --unet-ckpt checkpoints/mix64/unet \
        --nsamples 200 --batch-size 20 --var 0.5 \
        --binary-threshold "$T" --output $LOGDIR/generated64_b
      run eval64b 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/mix64 --vae-ckpt checkpoints/mix64/vae \
        --unet-ckpt checkpoints/mix64/unet --batch-size 32 \
        --binary-threshold "$T" \
        --output $LOGDIR/eval_mix64_b.json
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
stamp "campaign_r5c complete"
