#!/bin/bash
# Pretrain ViT-P8S8 on CASIA-100 (mirrors reference scripts/run_sub.sh:
# CosFace, bs 480, lr 3e-4, 1200 epochs, warmup 10, decay 150)
set -e
python -m gslora_tpu.cli.train_pretrain -b 480 -d casia100 -n VIT -e 1200 \
    --head CosFace --vit_depth 6 --lora_rank 0 \
    --outdir ./results/ViT-P8S8_casia100_cosface \
    --warmup-epochs 10 --lr 3e-4 --decay-epochs 150
