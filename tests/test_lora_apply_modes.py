"""merged vs factored LoRA application: identical function of (A, B)."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.losses.classification import cross_entropy
from gslora_tpu.models.vit import init_vit_params, vit_apply

CFG = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=4)


def _params():
    p = init_vit_params(jax.random.key(0), CFG, LORA)
    for n in ("B1", "B2"):
        p["lora"]["ffn"][n] = 0.3 * jax.random.normal(
            jax.random.key(1), p["lora"]["ffn"][n].shape)
    return p


def test_forward_equivalence():
    p = _params()
    x = jax.random.normal(jax.random.key(2), (3, 3, 16, 16))
    y = jnp.array([0, 1, 2])
    lf, _ = vit_apply(p, x, y, CFG, LORA, compute_dtype=jnp.float32,
                      lora_apply="factored")
    lm, _ = vit_apply(p, x, y, CFG, LORA, compute_dtype=jnp.float32,
                      lora_apply="merged")
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lm), rtol=1e-4,
                               atol=1e-4)


def test_gradient_equivalence():
    p = _params()
    x = jax.random.normal(jax.random.key(3), (3, 3, 16, 16))
    y = jnp.array([0, 1, 2])

    def loss(lt, mode):
        logits, _ = vit_apply({"base": p["base"], "lora": lt}, x, y, CFG,
                              LORA, compute_dtype=jnp.float32,
                              lora_apply=mode)
        return cross_entropy(logits, y)

    gf = jax.grad(lambda lt: loss(lt, "factored"))(p["lora"])
    gm = jax.grad(lambda lt: loss(lt, "merged"))(p["lora"])
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-5)
