"""run_forget_training over the 8-device CPU mesh produces the same
dynamics as single-device (data-parallel correctness at the loop level)."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import (DataConfig, ForgetConfig, LoraConfig,
                               OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.splits import make_order_list, split_by_class_window
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.loop import ForgetData, run_forget_training
from gslora_tpu.models.vit import init_vit_params
from gslora_tpu.parallel.mesh import make_mesh
from gslora_tpu.utils.profiling import forward_throughput

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=4)


def test_loop_on_mesh():
    train = synthetic_face_dataset(num_classes=6, per_class=16,
                                   image_size=16, seed=0, noise=1.0)
    test = synthetic_face_dataset(num_classes=6, per_class=8, image_size=16,
                                  seed=9, noise=1.0)
    order = make_order_list(6, seed=1337)
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 4, 4, 6)
    remain_te, forget_te = split_by_class_window(test, order, 0, 4, 4, 6)
    data = ForgetData(train_forget=forget_tr, train_remain=remain_tr,
                      test_forget=forget_te, test_remain=remain_te)
    cfg = RunConfig(model=MODEL, lora=LORA,
                    optim=OptimConfig(lr=1e-3, warmup_epochs=0, epochs=2),
                    forget=ForgetConfig(bnd=10.0, beta=0.3, alpha=1e-4,
                                        alpha_epoch=0),
                    data=DataConfig(batch_size=16),  # 16 % 8 == 0
                    num_epoch=2, ver_freq=10_000, compute_dtype="float32")
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    mesh = make_mesh()
    res = run_forget_training(cfg, params, data, mesh=mesh)
    assert np.isfinite(res.best_h)
    assert res.remain_acc >= 0


def test_forward_throughput_probe():
    from gslora_tpu.models.vit import vit_apply
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    batch = np.random.RandomState(0).rand(8, 3, 16, 16).astype(np.float32)
    ips = forward_throughput(
        lambda x: vit_apply(params, x, None, MODEL, LORA,
                            compute_dtype=jnp.float32),
        batch, iters=5)
    assert ips > 0
