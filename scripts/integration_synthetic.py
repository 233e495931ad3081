"""Full-scale integration: flagship ViT-P8S8 (19.2M params) on synthetic
CASIA-100 stand-in, bf16 on real v5e: pretrain -> GS-LoRA++ forget recipe."""
import json, time, jax, jax.numpy as jnp, numpy as np
jax.config.update('jax_default_prng_impl', 'rbg')
import sys; sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
from gslora_tpu.config import *
from gslora_tpu.data.pipeline import BatchLoader
from gslora_tpu.data.splits import make_order_list, ratio_subset, split_by_class_window
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
from gslora_tpu.engine.loop import ForgetData, run_forget_training
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

import dataclasses
MODEL = ViTConfig(image_size=112, patch_size=8, dim=512, depth=6, heads=8,
                  dim_head=64, mlp_dim=2048, num_class=100, dropout=0.1,
                  emb_dropout=0.1, head_type="CosFace")
MODEL_REMAT = dataclasses.replace(MODEL, remat=True)
LORA = LoraConfig(rank=8)
t0 = time.time()
train = synthetic_face_dataset(num_classes=100, per_class=24, image_size=112, seed=0, noise=1.0)
test = synthetic_face_dataset(num_classes=100, per_class=5, image_size=112, seed=77, noise=1.0)
print('data built', round(time.time()-t0,1), 's', flush=True)

pre_cfg = RunConfig(model=MODEL_REMAT, lora=LORA,
                    optim=OptimConfig(lr=3e-4, warmup_epochs=2, epochs=25),
                    data=DataConfig(batch_size=240))
params = init_vit_params(jax.random.key(0), MODEL, LORA, param_dtype=jnp.float32)
n_params = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params['base']))
print('base params:', n_params, flush=True)
state, m = pretrain(pre_cfg, params, lambda: BatchLoader(train, 240, seed=3), epochs=25, compute_dtype=jnp.bfloat16)
params = state.params
ev = make_eval_step(MODEL, LORA, compute_dtype=jnp.bfloat16)
acc = eval_accuracy(ev, params, BatchLoader(test, 250, shuffle=False, prefetch=0))
print('pretrain done', round(time.time()-t0,1), 's; loss', float(m['loss']), 'test acc', acc, flush=True)

order = make_order_list(100, seed=1337)
remain_tr, forget_tr = split_by_class_window(train, order, 0, 90, 90, 100)
remain_te, forget_te = split_by_class_window(test, order, 0, 90, 90, 100)
forget_sub = ratio_subset(forget_tr, 0.5, seed=1337)
remain_sub = ratio_subset(remain_tr, 0.5, seed=1337)
data = ForgetData(train_forget=forget_sub, train_remain=remain_sub,
                  test_forget=forget_te, test_remain=remain_te)

cfg = RunConfig(model=MODEL, lora=LORA,
    optim=OptimConfig(lr=1e-2, warmup_epochs=0, epochs=25),
    forget=ForgetConfig(bnd=110.0, beta=0.15, alpha=0.01,
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
    "forget_acc_before": res.forget_acc_before,
    "forget_acc_after": res.forget_acc,
    "remain_acc_after": res.remain_acc,
    "best_H_mean": res.best_h,
    "norm_list": [round(n, 3) for n in res.norm_list],
    "wallclock_s": round(time.time()-t0, 1),
}
print(json.dumps(report, indent=2), flush=True)
with open('integration_report.json', 'w') as f:
    json.dump(report, f)
