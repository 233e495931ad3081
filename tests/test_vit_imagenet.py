"""ViT-B/16 path: forward parity against torchvision vit_b_16 itself
(random weights, no download), head modify/resume."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import LoraConfig
from gslora_tpu.models.vit import vit_apply
from gslora_tpu.models.vit_imagenet import (from_torchvision_state_dict,
                                            modify_head, resume_head,
                                            vit_b16_config)

LORA = LoraConfig(rank=8)


@pytest.mark.slow
def test_forward_parity_with_torchvision():
    torch = pytest.importorskip("torch")
    torchvision = pytest.importorskip("torchvision")
    torch.manual_seed(0)
    tv = torchvision.models.vit_b_16(weights=None).eval()
    sd = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    model = vit_b16_config(num_class=1000)
    params = from_torchvision_state_dict(sd, model, LORA)
    assert params["lora"]["ffn"]["A1"].shape == (12, 8, 768)

    img = np.random.RandomState(1).rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        t_out = tv(torch.from_numpy(img)).numpy()
    labels = jnp.array([0, 1])
    j_out, j_emb = vit_apply(params, jnp.asarray(img), labels, model, LORA,
                             train=False, compute_dtype=jnp.float32)
    # LoRA B=0 at init, so the imported model must match torchvision exactly
    np.testing.assert_allclose(np.asarray(j_out), t_out, rtol=2e-3,
                               atol=2e-3)


def test_modify_and_resume_head():
    model = vit_b16_config(num_class=1000)
    rng = np.random.RandomState(0)
    head = {"weight": jnp.asarray(rng.randn(1000, 768).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(1000).astype(np.float32))}
    params = {"base": {"head": head}, "lora": {}}
    id_map = {0: 7, 1: 42, 2: 999}
    out = modify_head(params, id_map)
    assert out["base"]["head"]["weight"].shape == (3, 768)
    np.testing.assert_allclose(np.asarray(out["base"]["head"]["weight"][1]),
                               np.asarray(head["weight"][42]))
    np.testing.assert_allclose(np.asarray(out["base"]["head"]["bias"][2]),
                               np.asarray(head["bias"][999]))
    back = resume_head(out, out["original_head"])
    assert back["base"]["head"]["weight"].shape == (1000, 768)
