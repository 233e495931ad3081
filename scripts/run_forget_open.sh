#!/bin/bash
# Single-step OPEN-SET forgetting recipes (mirrors reference
# scripts/run_forget_open.sh): 3-way split — remain / forget / open classes,
# where the open classes are excluded from training and replay entirely and
# only evaluated. The reference's active config is the L2 baseline
# (lora_rank 0, --l2 --l2_lambda 0.01 --replay); the GS-LoRA variant is the
# commented template at run_forget_open.sh:13-26 — both mirrored here,
# selected by METHOD.
set -e
NUM_FIRST_CLS=70
PER_FORGET_CLS=$((100 - NUM_FIRST_CLS))
RATIO=0.1
OPEN=40
EPOCH=100
CKPT=${1:?usage: run_forget_open.sh <pretrained_ckpt> [gs_lora|l2]}
METHOD=${2:-l2}

if [ "$METHOD" = "gs_lora" ]; then
    # GS-LoRA single-step open (run_forget_open.sh:13-26 template)
    for lr in 1e-2; do for beta in 0.1; do for alpha in 0; do
    python -m gslora_tpu.cli.train_forget -b 48 -d casia100 -n VIT -e $EPOCH \
        --head CosFace --group_type block --data_ratio $RATIO --alpha_epoch 0 \
        --open_cls_num $OPEN \
        --outdir ./exps/forget-open/ratio${RATIO}start${NUM_FIRST_CLS}forget${PER_FORGET_CLS}lr${lr}beta${beta}alpha${alpha}open${OPEN} \
        --warmup-epochs 0 --lr $lr --lora_rank 8 --decay-epochs $EPOCH \
        --vit_depth 6 --num_of_first_cls $NUM_FIRST_CLS \
        --per_forget_cls $PER_FORGET_CLS -r "$CKPT" \
        --BND 110 --beta $beta --alpha $alpha --min-lr 1e-5
    done; done; done
else
    # L2 baseline with replay (run_forget_open.sh:29-42 active config)
    for lr in 1e-4; do
    python -m gslora_tpu.cli.train_forget_cl -b 48 -d casia100 -n VIT \
        -e $EPOCH --head CosFace --data_ratio $RATIO --open_cls_num $OPEN \
        --num_tasks 1 \
        --outdir ./exps/forget-open/L2-0.01-ratio${RATIO}start${NUM_FIRST_CLS}forget${PER_FORGET_CLS}lr${lr}open${OPEN} \
        --warmup-epochs 0 --lr $lr --lora_rank 0 --decay-epochs $EPOCH \
        --vit_depth 6 --num_of_first_cls $NUM_FIRST_CLS \
        --per_forget_cls $PER_FORGET_CLS -r "$CKPT" \
        --min-lr 1e-5 --l2 --l2_lambda 0.01 --replay
    done
fi
