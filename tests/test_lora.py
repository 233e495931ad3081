"""LoRA core: init shapes, merge-vs-functional equivalence, group-Lasso,
reinit semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.lora.core import (group_lasso, init_lora, lora_delta,
                                  lora_group_norms, merge_lora, reinit_lora)

CFG = ViTConfig(depth=3, dim=64, mlp_dim=128, heads=4, dim_head=16,
                image_size=32, patch_size=8, num_class=10)
LORA = LoraConfig(rank=4)


def test_init_shapes_and_zero_delta():
    tree = init_lora(jax.random.key(0), CFG, LORA)
    f = tree["ffn"]
    assert f["A1"].shape == (3, 4, 64)
    assert f["B1"].shape == (3, 128, 4)
    assert f["A2"].shape == (3, 4, 128)
    assert f["B2"].shape == (3, 64, 4)
    # B zero-init => functional delta is exactly zero at init (loralib)
    x = jax.random.normal(jax.random.key(1), (2, 5, 64))
    d = lora_delta(x, f["A1"][0], f["B1"][0], LORA.scaling)
    assert np.allclose(np.asarray(d), 0.0)


def test_merge_equals_functional_path():
    key = jax.random.key(2)
    tree = init_lora(key, CFG, LORA)
    # give B nonzero values so the delta is nontrivial
    tree["ffn"]["B1"] = jax.random.normal(key, tree["ffn"]["B1"].shape) * 0.1
    kernel = jax.random.normal(jax.random.key(3), (3, 64, 128))
    blocks = {"fc1": {"kernel": kernel},
              "fc2": {"kernel": jnp.zeros((3, 128, 64))},
              "qkv": {"kernel": jnp.zeros((3, 64, 192))}}
    merged = merge_lora(blocks, tree, LORA.scaling)
    x = jax.random.normal(jax.random.key(4), (2, 64))
    for layer in range(3):
        y_func = x @ kernel[layer] + lora_delta(
            x, tree["ffn"]["A1"][layer], tree["ffn"]["B1"][layer],
            LORA.scaling)
        y_merged = x @ merged["fc1"]["kernel"][layer]
        np.testing.assert_allclose(np.asarray(y_func), np.asarray(y_merged),
                                   rtol=2e-5, atol=2e-5)


def test_group_lasso_matches_naive():
    key = jax.random.key(5)
    tree = init_lora(key, CFG, LORA)
    for n in ("B1", "B2"):
        tree["ffn"][n] = jax.random.normal(key, tree["ffn"][n].shape)
    f = tree["ffn"]
    # naive: per block sqrt of total sum of squares (engine.py:671-687)
    naive = 0.0
    for layer in range(3):
        s = sum(float(jnp.sum(f[n][layer] ** 2))
                for n in ("A1", "B1", "A2", "B2"))
        naive += np.sqrt(s)
    got = float(group_lasso(tree, "block", "FFN"))
    assert abs(got - naive) < 1e-4

    # lora granularity: 2 groups per block
    naive_lora = 0.0
    for layer in range(3):
        naive_lora += np.sqrt(float(jnp.sum(f["A1"][layer] ** 2)) +
                              float(jnp.sum(f["B1"][layer] ** 2)))
        naive_lora += np.sqrt(float(jnp.sum(f["A2"][layer] ** 2)) +
                              float(jnp.sum(f["B2"][layer] ** 2)))
    assert abs(float(group_lasso(tree, "lora", "FFN")) - naive_lora) < 1e-4

    norms = lora_group_norms(tree)
    assert len(norms) == 3 and all(n > 0 for n in norms)


def test_reinit_zeroes_B_and_redraws_A():
    tree = init_lora(jax.random.key(6), CFG, LORA)
    tree["ffn"]["B1"] = jnp.ones_like(tree["ffn"]["B1"])
    new = reinit_lora(jax.random.key(7), tree)
    assert np.allclose(np.asarray(new["ffn"]["B1"]), 0.0)
    assert not np.allclose(np.asarray(new["ffn"]["A1"]),
                           np.asarray(tree["ffn"]["A1"]))
    # a=sqrt(50) → much tighter bound than a=sqrt(5)
    assert float(jnp.abs(new["ffn"]["A1"]).max()) < \
        float(jnp.abs(tree["ffn"]["A1"]).max())


def test_attention_lora_placement():
    tree = init_lora(jax.random.key(8), CFG, LoraConfig(rank=4,
                                                        pos="Attention"))
    assert tree["attn"]["A"].shape == (3, 3, 4, 64)
    assert tree["attn"]["B"].shape == (3, 3, 64, 4)
    assert float(group_lasso(tree, "block", "Attention")) > 0
