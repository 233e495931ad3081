"""Full-scale integration: flagship ViT-P8S8 (19.2M params) on synthetic
CASIA-100 stand-in, bf16 on real v5e: pretrain -> GS-LoRA++ forget recipe
(the FULL recipe: alpha warmup, prototypes, EMA averaging).

--unsaturated (VERDICT r3 #2): re-base on the UNSATURATED pretrain the
baseline zoo uses (Softmax head, noise 2.4, ~63% test acc) — CosFace s=64
saturates CE to 0 on separable blobs, which flatters the relu(BND-CE)
ascent term. Shares the cached checkpoint with integration_continual.py /
integration_baselines.py. BND drops 110 -> 10 (Softmax CE lives near
ln(100) ~ 4.6, not CosFace's s=64 scale)."""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gslora_tpu.cli.common import setup_jax_runtime

setup_jax_runtime()  # persistent compile cache (slow remote compiles)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_default_prng_impl', 'rbg')

from gslora_tpu.checkpoints.io import load_pytree, save_pytree
from gslora_tpu.config import (DataConfig, ForgetConfig, LoraConfig,
                               OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import (make_order_list, ratio_subset,
                                    split_by_class_window)
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.engine.loop import ForgetData, run_forget_training
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

ap = argparse.ArgumentParser()
ap.add_argument("--unsaturated", action="store_true")
a = ap.parse_args()

MODEL = ViTConfig(image_size=112, patch_size=8, dim=512, depth=6, heads=8,
                  dim_head=64, mlp_dim=2048, num_class=100, dropout=0.1,
                  emb_dropout=0.1,
                  head_type="Softmax" if a.unsaturated else "CosFace")
LORA = LoraConfig(rank=8)
noise, pre_epochs = (2.4, 12) if a.unsaturated else (1.0, 25)
ckpt = os.environ.get("PRETRAIN_CKPT", "/tmp/flagship_pretrained.msgpack")
if a.unsaturated:
    ckpt = ckpt.replace(".msgpack", "_unsat.msgpack")

t0 = time.time()
train = synthetic_face_dataset(num_classes=100, per_class=24, image_size=112,
                               seed=0, noise=noise)
test = synthetic_face_dataset(num_classes=100, per_class=5, image_size=112,
                              seed=77, noise=noise)
print('data built', round(time.time()-t0, 1), 's', flush=True)

params = init_vit_params(jax.random.key(0), MODEL, LORA,
                         param_dtype=jnp.float32)
n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params['base']))
print('base params:', n_params, flush=True)
if os.path.exists(ckpt):
    params = load_pytree(ckpt, params)
    print('loaded pretrained', ckpt, flush=True)
else:
    pre_cfg = RunConfig(model=dataclasses.replace(MODEL, remat=True),
                        lora=LORA,
                        optim=OptimConfig(lr=3e-4, warmup_epochs=2,
                                          epochs=pre_epochs),
                        data=DataConfig(batch_size=240))
    state, m = pretrain(pre_cfg, params,
                        lambda: BatchLoader(train, 240, seed=3),
                        epochs=pre_epochs, compute_dtype=jnp.bfloat16)
    params = state.params
    save_pytree(ckpt, params)
    print('pretrained + saved', round(time.time()-t0, 1), 's', flush=True)
ev = make_eval_step(MODEL, LORA, compute_dtype=jnp.bfloat16)
acc = eval_accuracy(ev, params, BatchLoader(test, 250, shuffle=False,
                                            prefetch=0))
print('pretrain test acc', acc, flush=True)

order = make_order_list(100, seed=1337)
remain_tr, forget_tr = split_by_class_window(train, order, 0, 90, 90, 100)
remain_te, forget_te = split_by_class_window(test, order, 0, 90, 90, 100)
forget_sub = ratio_subset(forget_tr, 0.5, seed=1337)
remain_sub = ratio_subset(remain_tr, 0.5, seed=1337)
data = ForgetData(train_forget=forget_sub, train_remain=remain_sub,
                  test_forget=forget_te, test_remain=remain_te)

cfg = RunConfig(model=MODEL, lora=LORA,
    optim=OptimConfig(lr=1e-2, warmup_epochs=0, epochs=25),
    forget=ForgetConfig(bnd=10.0 if a.unsaturated else 110.0, beta=0.15,
                        alpha=0.01,
                        warmup_alpha=True, big_alpha=0.01, alpha_epoch=10,
                        prototype=True, pro_f_weight=0.1, pro_r_weight=0.0,
                        bnd_pro=18.0, average_weight=True, ema_epoch=12,
                        ema_decay=0.9),
    data=DataConfig(batch_size=48),
    num_epoch=25, ver_freq=30, compute_dtype="bfloat16",
    lora_apply="merged")
res = run_forget_training(cfg, params, data)
report = {
    "pretrain_test_acc": acc,
    "head": MODEL.head_type, "noise": noise,
    "forget_acc_before": res.forget_acc_before,
    "forget_acc_after": res.forget_acc,
    "remain_acc_after": res.remain_acc,
    "best_H_mean": res.best_h,
    "norm_list": [round(n, 3) for n in res.norm_list],
    "wallclock_s": round(time.time()-t0, 1),
}
print(json.dumps(report, indent=2), flush=True)
out = 'integration_report_unsat.json' if a.unsaturated \
    else 'integration_report.json'
with open(out, 'w') as f:
    json.dump(report, f)
