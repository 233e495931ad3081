"""Resume paths of build_params: reference .pth (torch pickle), our
.msgpack, and the missing-LoRA-keeps-fresh-init rule."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.checkpoints.io import save_pytree
from gslora_tpu.cli.common import build_params
from gslora_tpu.config import (DataConfig, LoraConfig, RunConfig, ViTConfig)
from gslora_tpu.models.import_torch import to_state_dict
from gslora_tpu.models.vit import init_vit_params, vit_apply

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                  emb_dropout=0.0, head_type="CosFace")
LORA = LoraConfig(rank=4)


def _cfg(resume):
    return RunConfig(net="VIT", model=MODEL, lora=LORA,
                     data=DataConfig(data_mode="synthetic", seed=7),
                     resume=resume)


def test_resume_from_torch_pth(tmp_path):
    torch = pytest.importorskip("torch")
    src = init_vit_params(jax.random.key(1), MODEL, LORA)
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in to_state_dict(src, MODEL).items()}
    path = str(tmp_path / "Backbone_VIT_checkpoint.pth")
    torch.save(sd, path)

    params = build_params(_cfg(path))
    x = jax.random.normal(jax.random.key(2), (2, 3, 16, 16))
    y = jnp.array([0, 1])
    a, _ = vit_apply(src, x, y, MODEL, LORA, compute_dtype=jnp.float32)
    b, _ = vit_apply(params, x, y, MODEL, LORA, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_resume_from_pth_without_lora_keeps_fresh_init(tmp_path):
    torch = pytest.importorskip("torch")
    src = init_vit_params(jax.random.key(3), MODEL, LORA)
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in to_state_dict(src, MODEL).items() if "lora" not in k}
    path = str(tmp_path / "pretrained_no_lora.pth")
    torch.save(sd, path)
    params = build_params(_cfg(path))
    # A has a fresh (nonzero) kaiming init, B is zero — loralib resume rule
    assert float(jnp.abs(params["lora"]["ffn"]["A1"]).max()) > 0
    assert float(jnp.abs(params["lora"]["ffn"]["B1"]).max()) == 0


def test_resume_from_msgpack(tmp_path):
    src = init_vit_params(jax.random.key(4), MODEL, LORA)
    path = str(tmp_path / "state.msgpack")
    save_pytree(path, src)
    params = build_params(_cfg(path))
    np.testing.assert_allclose(
        np.asarray(params["base"]["patch"]["kernel"]),
        np.asarray(src["base"]["patch"]["kernel"]))
