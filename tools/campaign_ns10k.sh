#!/bin/bash
# North-star campaign (BASELINE.md): 10k perovskite 32^3 grids through the
# full reference schedules — U-Net 50 epochs, DFC-VAE 250 epochs, CGCNN 60
# epochs — then evaluation over the whole val split and 1000-sample
# generation.  Everything through the public CLIs on the tunneled chip,
# as chunked --resume runs in fresh processes (the axon plugin leaks host
# RAM per jax array; CLAUDE.md).
#
#   bash tools/campaign_ns10k.sh [stage...]     # default: all stages
#   stages: data unet vae cgcnn
#
# Env: LAYOUT (default ndhwc), MAX_FAILS (default 5), VAE_EPOCHS (250),
# UNET_EPOCHS (50), CGCNN_EPOCHS (60).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
LAYOUT=${LAYOUT:-ndhwc}
MAX_FAILS=${MAX_FAILS:-5}
UNET_EPOCHS=${UNET_EPOCHS:-50}
VAE_EPOCHS=${VAE_EPOCHS:-250}
CGCNN_EPOCHS=${CGCNN_EPOCHS:-60}
# HBM-resident dataset mode (default on): ship the whole split to the
# chip once per chunk and gather batches on-device — measured 2-3x per
# epoch vs streaming on the 64^3 campaign; best-val saves are unchanged
# (--ckpt-every only thins the "latest" saves inside a chunk).
RESIDENT=${RESIDENT:-1}
RES_ARGS=()
[ "$RESIDENT" = 1 ] && RES_ARGS=(--resident --ship-dtype float16 --ckpt-every 25)
LOGDIR=output/ns10k
mkdir -p $LOGDIR checkpoints/ns10k

# run_chunked <name> <total_epochs> <chunk> <cmd...>   (cmd gets
# --epochs N [--resume] appended)
run_chunked() {
  local name=$1 total=$2 chunk=$3; shift 3
  local log=$LOGDIR/$name.log done_epochs=0 first=1 fails=0 rc n rem
  while [ $done_epochs -lt $total ]; do
    n=$chunk
    rem=$((total - done_epochs))
    [ $rem -lt $n ] && n=$rem
    local args=("$@" --epochs $n)
    [ $first -eq 0 ] && args+=(--resume)
    echo "=== $name chunk start epochs_done=$done_epochs n=$n $(date)" >> $log
    timeout 3600 python -m "${args[@]}" >> $log 2>&1
    rc=$?
    echo "=== $name chunk rc=$rc $(date)" >> $log
    if [ $rc -ne 0 ]; then
      fails=$((fails + 1))
      if [ $fails -ge $MAX_FAILS ]; then
        echo "=== $name ABORTED: $fails consecutive failures $(date)" >> $log
        echo "campaign_ns10k: $name aborted after $fails failures; see $log" >&2
        return 1
      fi
      echo "=== $name chunk failed ($fails/$MAX_FAILS); retrying" >> $log
      sleep 120
      continue
    fi
    fails=0
    done_epochs=$((done_epochs + n))
    first=0
  done
  echo "=== $name complete $(date)" >> $log
}

stages=${*:-"data unet vae cgcnn"}
for stage in $stages; do
  case $stage in
    data)
      if [ ! -f data/ns10k/arrays.json ] && [ ! -d data/ns10k ]; then
        echo "=== building data/ns10k $(date)"
        timeout 1800 python -m icsg3d_tpu.apps.voxelize \
          --synthetic 10000 --kinds perovskite --nrot 0 \
          --out data/ns10k --d 32 --seed 7 > $LOGDIR/voxelize.log 2>&1 \
          || { echo "campaign_ns10k: data build failed" >&2; exit 1; }
      fi
      ;;
    unet)
      run_chunked unet $UNET_EPOCHS 10 \
        icsg3d_tpu.apps.train_unet --data data/ns10k \
        --ckpt checkpoints/ns10k/unet --batch-size 64 --lr 3e-6 \
        --nrot 0 --layout $LAYOUT "${RES_ARGS[@]}" || exit 1
      ;;
    vae)
      run_chunked vae $VAE_EPOCHS 50 \
        icsg3d_tpu.apps.train_vae --data data/ns10k \
        --ckpt checkpoints/ns10k/vae --unet-ckpt checkpoints/ns10k/unet \
        --batch-size 128 --lr 5e-4 --nrot 0 --layout $LAYOUT \
        "${RES_ARGS[@]}" || exit 1
      ;;
    cgcnn)
      run_chunked cgcnn $CGCNN_EPOCHS 30 \
        icsg3d_tpu.apps.train_cgcnn --synthetic 10000 \
        --ckpt checkpoints/ns10k/cgcnn --batch-size 256 || exit 1
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
echo "=== campaign_ns10k done: $stages $(date)"
