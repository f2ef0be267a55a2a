#!/bin/bash
# Round-3 post-training campaign steps, run after tools/campaign_ns10k.sh
# has produced checkpoints/ns10k/{unet,vae,cgcnn}:
#
#   bash tools/campaign_r3_extras.sh [stage...]
#   stages: eval generate adjudicate mix64 eval64 gen64 condrepeat
#
# Each stage is a separate fresh process (axon host-RAM leak, CLAUDE.md).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
LOGDIR=output/ns10k
mkdir -p $LOGDIR
BASE=${BASE:-$(python - <<'EOF'
import json, os
# first non-rotated train id = a stable base compound for generation
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/ns10k").ids[0])
EOF
)}

run() {  # run <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date)" >> $LOGDIR/extras.log
  timeout "$to" "$@" > $LOGDIR/$name.log 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date)" >> $LOGDIR/extras.log
  [ $rc -ne 0 ] && echo "campaign_r3_extras: $name FAILED (rc=$rc)" >&2
  return $rc
}

for stage in ${*:-eval generate adjudicate}; do
  case $stage in
    eval)
      run eval 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/ns10k --vae-ckpt checkpoints/ns10k/vae \
        --unet-ckpt checkpoints/ns10k/unet --batch-size 100 \
        --output $LOGDIR/eval.json --plots $LOGDIR/eval_plots
      ;;
    generate)
      run generate 3600 python -m icsg3d_tpu.apps.generate \
        --data data/ns10k --base "$BASE" \
        --vae-ckpt checkpoints/ns10k/vae --unet-ckpt checkpoints/ns10k/unet \
        --cgcnn-ckpt formation_energy_per_atom=checkpoints/ns10k/cgcnn \
        --nsamples 1000 --batch-size 100 --var 0.5 \
        --output $LOGDIR/generated
      run generate_fused 3600 python -m icsg3d_tpu.apps.generate \
        --data data/ns10k --base "$BASE" \
        --vae-ckpt checkpoints/ns10k/vae --unet-ckpt checkpoints/ns10k/unet \
        --nsamples 1000 --batch-size 128 --var 0.5 --fused \
        --output $LOGDIR/generated_fused
      ;;
    adjudicate)
      run adjudicate 7200 python tools/validate_watershed.py \
        --data data/ns10k --vae-ckpt checkpoints/ns10k/vae \
        --unet-ckpt checkpoints/ns10k/unet --base "$BASE" \
        --nsamples 1000 --nval 500 --adjudicate \
        --out $LOGDIR/watershed_validation.json
      ;;
    mix64)
      if [ ! -d data/mix64 ]; then
        run voxelize64 3600 python -m icsg3d_tpu.apps.voxelize \
          --synthetic 2000 --kinds perovskite,rocksalt --nrot 0 \
          --out data/mix64 --d 64 --seed 11
      fi
      bash tools/campaign_mix64.sh 60 15 ndhwc || exit 1
      ;;
    eval64)
      run eval64 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/mix64 --vae-ckpt checkpoints/mix64/vae \
        --unet-ckpt checkpoints/ns10k/unet --batch-size 32 \
        --output $LOGDIR/eval_mix64.json --plots $LOGDIR/eval64_plots
      ;;
    gen64)
      run gen64 3600 python -m icsg3d_tpu.apps.generate \
        --data data/mix64 --base "$(python -c '
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/mix64").ids[0])')" \
        --vae-ckpt checkpoints/mix64/vae --unet-ckpt checkpoints/ns10k/unet \
        --nsamples 200 --batch-size 20 --var 0.5 \
        --output $LOGDIR/generated64
      ;;
    condrepeat)
      # VERDICT r2 item 9: a short cond_repeat=4 (44-channel encoder,
      # the pinned reference width) run to show losses track the
      # cond_repeat=1 production run — the artifact repeat is inert.
      run condrepeat 3600 python -m icsg3d_tpu.apps.train_vae \
        --data data/ns10k --ckpt checkpoints/ns10k/vae_cr4 \
        --unet-ckpt checkpoints/ns10k/unet --cond-repeat 4 \
        --epochs 25 --batch-size 128 --lr 5e-4 --nrot 0
      run condrepeat_ref 3600 python -m icsg3d_tpu.apps.train_vae \
        --data data/ns10k --ckpt checkpoints/ns10k/vae_cr1 \
        --unet-ckpt checkpoints/ns10k/unet \
        --epochs 25 --batch-size 128 --lr 5e-4 --nrot 0
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
echo "=== campaign_r3_extras done: ${*:-eval generate adjudicate} $(date)"
