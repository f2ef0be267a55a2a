#!/bin/bash
# Round-3 post-training campaign steps, run after tools/campaign_ns10k.sh
# has produced checkpoints/ns10k/{unet,vae,cgcnn}:
#
#   bash tools/campaign_r3_extras.sh [stage...]
#   stages: eval generate adjudicate mix64 vae64ext unet64 eval64 gen64
#           condrepeat
#
# Each stage is a separate fresh process (axon host-RAM leak, CLAUDE.md).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1  # timely log lines under redirection
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
    vae64ext)
      # Extend checkpoints/mix64/vae to the full 250-epoch reference
      # schedule (train_vae.py:46-52): 190 more on top of mix64's 60.
      RESUME=1 bash tools/campaign_mix64.sh "${VAE64EXT_EPOCHS:-190}" 15 ndhwc \
        || exit 1
      ;;
    unet64)
      # Dedicated 64^3 segmentation U-Net on the mixed dataset — the
      # 32^3-trained ns10k U-Net runs fully-convolutionally at 64^3 but
      # sees 2x-wider blobs (sigma is fixed in Angstrom) and a different
      # chemistry mix; gen64 species labeling needs the matched model.
      done_e=0; first=1; fails=0
      total=${UNET64_EPOCHS:-50}
      while [ $done_e -lt $total ]; do
        n=10; rem=$((total - done_e)); [ $rem -lt $n ] && n=$rem
        uargs=(--data data/mix64 --ckpt checkpoints/mix64/unet
               --batch-size 8 --lr 3e-6 --nrot 0 --epochs $n
               --resident --ship-dtype float16 --ckpt-every $n)
        [ $first -eq 0 ] && uargs+=(--resume)
        echo "=== unet64 chunk start epochs_done=$done_e n=$n $(date)" \
          >> $LOGDIR/unet64.log
        timeout 3600 python -m icsg3d_tpu.apps.train_unet "${uargs[@]}" \
          >> $LOGDIR/unet64.log 2>&1
        rc=$?
        echo "=== unet64 chunk rc=$rc $(date)" >> $LOGDIR/unet64.log
        if [ $rc -ne 0 ]; then
          fails=$((fails + 1)); [ $fails -ge 5 ] && exit 1
          sleep 120; continue
        fi
        fails=0; done_e=$((done_e + n)); first=0
      done
      ;;
    eval64)
      UNET64=checkpoints/ns10k/unet
      [ -d checkpoints/mix64/unet ] && UNET64=checkpoints/mix64/unet
      run eval64 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/mix64 --vae-ckpt checkpoints/mix64/vae \
        --unet-ckpt $UNET64 --batch-size 32 \
        --output $LOGDIR/eval_mix64.json --plots $LOGDIR/eval64_plots
      ;;
    gen64)
      UNET64=checkpoints/ns10k/unet
      [ -d checkpoints/mix64/unet ] && UNET64=checkpoints/mix64/unet
      run gen64 3600 python -m icsg3d_tpu.apps.generate \
        --data data/mix64 --base "$(python -c '
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/mix64").ids[0])')" \
        --vae-ckpt checkpoints/mix64/vae --unet-ckpt $UNET64 \
        --nsamples 200 --batch-size 20 --var 0.5 \
        --output $LOGDIR/generated64
      ;;
    condrepeat)
      # VERDICT r2 item 9: a short cond_repeat=4 (44-channel encoder,
      # the pinned reference width) run to show losses track the
      # cond_repeat=1 production run — the artifact repeat is inert.
      # Perceptual net: the matched ns10k U-Net when it exists, else any
      # trained U-Net (fully convolutional, runs at 32^3) — both arms use
      # the SAME net, so the cr4-vs-cr1 comparison stays controlled.
      CR_UNET=${CR_UNET:-checkpoints/ns10k/unet}
      [ -d "$CR_UNET" ] || CR_UNET=checkpoints/mix64/unet
      run condrepeat 3600 python -m icsg3d_tpu.apps.train_vae \
        --data data/ns10k --ckpt checkpoints/ns10k/vae_cr4 \
        --unet-ckpt "$CR_UNET" --cond-repeat 4 \
        --epochs 25 --batch-size 128 --lr 5e-4 --nrot 0 \
        --resident --ship-dtype float16 --ckpt-every 25
      run condrepeat_ref 3600 python -m icsg3d_tpu.apps.train_vae \
        --data data/ns10k --ckpt checkpoints/ns10k/vae_cr1 \
        --unet-ckpt "$CR_UNET" \
        --epochs 25 --batch-size 128 --lr 5e-4 --nrot 0 \
        --resident --ship-dtype float16 --ckpt-every 25
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
echo "=== campaign_r3_extras done: ${*:-eval generate adjudicate} $(date)"
