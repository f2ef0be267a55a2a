#!/bin/bash
# Round-4 follow-on campaign — queues behind tools/campaign_r4_64.sh on
# the single tunneled chip and runs, in order:
#
#   bench64   kernel smoke gate + 64^3 DFC whole-step layout bench
#             (VERDICT r3 item 4 measurement of the resident ndcs path)
#   realcif   the realistic third-party-CIF end-to-end campaign
#             (tools/campaign_realcif.sh, VERDICT r3 item 2)
#   unet      full 50-epoch ns10k U-Net (replaces the 5-epoch leftover;
#             perceptual + segmentation net for the stages below)
#   vaefb     DFC-VAE with --kld-floor (free bits) at the round-2 KLD
#             equilibrium (~70 nats) — VERDICT r3 item 5's lever to
#             recover generation charge balance
#   evalfb    evaluate the floor-VAE over the whole val split
#   genfb     1000-sample generation -> charge-balance count
#
#   nohup bash tools/campaign_r4_followon.sh > output/ns10k/r4_followon.log 2>&1 &
#
# Stages are fresh processes (axon host-RAM leak, CLAUDE.md).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp_cache
export PYTHONUNBUFFERED=1
LOGDIR=output/ns10k
DRIVER=$LOGDIR/r4_followon_driver.log
mkdir -p $LOGDIR
KLD_FLOOR=${KLD_FLOOR:-70}

stamp() { echo "=== $1 $(date)" | tee -a $DRIVER; }

# Wait for the 64^3 campaign to release the chip (liveness poll only —
# never kill anything).  The campaign writes "campaign_r4_64 complete"
# on success; a crashed campaign just stops having a live process.
wait_for_chip() {
  local pid=${CAMPAIGN64_PID:-}
  [ -z "$pid" ] && pid=$(cat /tmp/campaign64.pid 2>/dev/null || true)
  if [ -n "$pid" ]; then
    stamp "waiting for campaign_r4_64 (pid $pid)"
    while kill -0 "$pid" 2>/dev/null; do sleep 60; done
  fi
  stamp "chip free"
}

run() {  # run <name> <timeout> <cmd...>
  local name=$1 to=$2; shift 2
  stamp "$name start"
  timeout "$to" "$@" > $LOGDIR/$name.log 2>&1
  local rc=$?
  stamp "$name rc=$rc"
  return $rc
}

wait_for_chip

# genfb ahead of evalfb: the 1000-sample charge-balance count is item 5's
# headline number, so if the round's wall-clock cuts the tail, the eval
# pass is the piece sacrificed, not the generation count.
for stage in ${*:-bench64 realcif unet vaefb genfb evalfb}; do
  case $stage in
    bench64)
      # smoke gate first: the layout/pool changes feed the Pallas path
      run smoke_followon 1800 python tools/tpu_kernel_smoke.py || exit 1
      NDCS_BENCH_CONFIGS=64 NDCS_BENCH_LAYOUTS=ndhwc,ndcs,mixed \
      NDCS_BENCH_UNET=0 NDCS_BENCH_GEN=0 \
        run bench64 3600 python tools/ndcs_step_bench.py
      ;;
    realcif)
      bash tools/campaign_realcif.sh || stamp "realcif FAILED (continuing)"
      ;;
    unet)
      # single-process 50-epoch run via the whole-epoch lax.scan path:
      # one program per epoch means ~3 host arrays/epoch instead of
      # ~250, so the plugin's per-array creep never builds up and no
      # chunking (hence no per-chunk teardown claim tax) is needed.
      # Falls back to the proven chunked campaign on any failure.
      # --resume guarded on checkpoint existence: re-invoking this
      # script after an interruption must continue, not restart from
      # epoch 0 over the existing latest (ADVICE r4).
      uextra=()
      [ -d checkpoints/ns10k/unet/latest ] && uextra=(--resume)
      run unet 7200 python -m icsg3d_tpu.apps.train_unet \
        --data data/ns10k --ckpt checkpoints/ns10k/unet \
        --batch-size 64 --lr 3e-6 --nrot 0 --epochs 50 \
        --resident --ship-dtype float16 --epoch-scan --ckpt-every 10 \
        ${uextra[@]+"${uextra[@]}"} \
        || { stamp "unet epoch-scan FAILED; falling back to chunked"; \
             bash tools/campaign_ns10k.sh unet || exit 1; }
      ;;
    vaefb)
      # First attempt: the whole 250-epoch schedule in ONE process via
      # --epoch-scan (see the unet stage note).  The chunked loop below
      # remains the fallback and resumes from wherever a failed scan run
      # checkpointed (mid-run latest saves every 25 epochs).
      total=${VAEFB_EPOCHS:-250}
      # derive epochs already in the checkpoint (step / steps-per-epoch,
      # 8000-sample train split) so BOTH the scan attempt and the chunk
      # fallback train only the remainder — a scan run that checkpointed
      # partway previously caused the fallback to restart its count at 0
      # and overshoot the schedule (ADVICE r4)
      # step // steps-per-epoch from the latest-save sidecar (62 =
      # 8000-sample train split / bs 128); cumulative across chunks and
      # correct even after a crash (history.json is end-of-run only)
      epochs_done() {
        python - <<'PY'
import json
try:
    with open("checkpoints/ns10k/vae_fb/progress.json") as f:
        print(json.load(f)["step"] // 62)
except Exception:
    print(0)
PY
      }
      done_e=0; first=1; vextra=()
      if [ -d checkpoints/ns10k/vae_fb/latest ]; then
        first=0; vextra=(--resume)
        done_e=$(epochs_done)
      fi
      rem=$((total - done_e)); [ $rem -le 0 ] && { stamp "vaefb already complete"; continue; }
      run vaefb_scan 10800 python -m icsg3d_tpu.apps.train_vae \
        --data data/ns10k --ckpt checkpoints/ns10k/vae_fb \
        --unet-ckpt checkpoints/ns10k/unet --kld-floor $KLD_FLOOR \
        --batch-size 128 --lr 5e-4 --nrot 0 --epochs $rem \
        --cache-true-features --plot-every 5 \
        --resident --ship-dtype float16 --epoch-scan --ckpt-every 25 \
        ${vextra[@]+"${vextra[@]}"} \
        && { stamp "vaefb complete (epoch-scan)"; continue; }
      stamp "vaefb epoch-scan FAILED; falling back to chunked resume"
      fails=0
      # re-derive progress: the failed scan attempt may have advanced it
      if [ -d checkpoints/ns10k/vae_fb/latest ]; then
        first=0
        done_e=$(epochs_done)
      fi
      # frozen-net true-grid taps cached once per chunk (9.9 GB HBM at
      # 32^3); dropped automatically after 2 consecutive chunk failures
      # in case the cache + leak creep exhausts HBM (the 64^3 OOM lesson)
      cache_args=(--cache-true-features)
      while [ $done_e -lt $total ]; do
        # 25-epoch chunks: the cache leaves ~3 GB HBM headroom and the
        # remote plugin's per-array leak creeps into it over long chunks
        n=25; rem=$((total - done_e)); [ $rem -lt $n ] && n=$rem
        vargs=(--data data/ns10k --ckpt checkpoints/ns10k/vae_fb
               --unet-ckpt checkpoints/ns10k/unet
               --kld-floor $KLD_FLOOR
               --batch-size 128 --lr 5e-4 --nrot 0 --epochs $n
               ${cache_args[@]+"${cache_args[@]}"}
               --plot-every 5
               --resident --ship-dtype float16 --ckpt-every $n)
        [ $first -eq 0 ] && vargs+=(--resume)
        echo "=== vaefb chunk start epochs_done=$done_e n=$n $(date)" \
          >> $LOGDIR/vaefb.log
        timeout 3600 python -m icsg3d_tpu.apps.train_vae "${vargs[@]}" \
          >> $LOGDIR/vaefb.log 2>&1
        rc=$?
        echo "=== vaefb chunk rc=$rc $(date)" >> $LOGDIR/vaefb.log
        if [ $rc -ne 0 ]; then
          fails=$((fails + 1)); [ $fails -ge 5 ] && exit 1
          if [ $fails -ge 2 ] && [ ${#cache_args[@]} -gt 0 ]; then
            cache_args=()
            echo "=== vaefb: dropping --cache-true-features after $fails failures" \
              >> $LOGDIR/vaefb.log
          fi
          sleep 120; continue
        fi
        fails=0; done_e=$((done_e + n)); first=0
      done
      stamp "vaefb complete"
      ;;
    evalfb)
      run evalfb 3600 python -m icsg3d_tpu.apps.evaluate \
        --data data/ns10k --vae-ckpt checkpoints/ns10k/vae_fb \
        --unet-ckpt checkpoints/ns10k/unet --batch-size 100 \
        --output $LOGDIR/eval_fb.json --plots $LOGDIR/evalfb_plots
      ;;
    genfb)
      BASE=$(python -c '
from icsg3d_tpu.data.store import GridDataset
print(GridDataset("data/ns10k").ids[0])')
      run genfb 5400 python -m icsg3d_tpu.apps.generate \
        --data data/ns10k --base "$BASE" \
        --vae-ckpt checkpoints/ns10k/vae_fb \
        --unet-ckpt checkpoints/ns10k/unet \
        --nsamples 1000 --batch-size 100 --var 0.5 \
        --output $LOGDIR/generated_fb
      ;;
    *) echo "unknown stage $stage" >&2; exit 1 ;;
  esac
done
stamp "campaign_r4_followon complete"
