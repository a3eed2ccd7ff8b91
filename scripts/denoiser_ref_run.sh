#!/bin/sh
# Reference-scale denoiser training (VERDICT round-1 item #5):
# 33 poses x 16 patches of 256^2 cut from 512^2 renders (2 spp noisy vs
# 20,000 spp ground truth — the reference's collect_data.py workload),
# trained with the reference recipe (L1, SGD nesterov, plateau, batch 5)
# for thousands of epochs; per-epoch JSONL metrics + 200-epoch PSNR
# checkpoints land in results/<ts>_ref_scale/.
set -x
exec python -m pathtrace_tpu.train \
  --name ref_scale \
  --size 512 \
  --poses 33 \
  --patch-size 256 \
  --patches-per-image 16 \
  --spp-train 2 \
  --spp-gt 20000 \
  --epochs "${EPOCHS:-3000}" \
  --batch 5 \
  --scan-epochs \
  --ckpt-every 200 \
  --pose-mode interior
