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


def test_cli_vit_b16_config_has_torchvision_parity_fields():
    """config_from_args must build VIT_B16 with the same fields the
    torchvision importer assumes (qkv bias, head-dim scale, conv-layout
    patchify, no dropout) — a hand-rolled config here silently produces
    garbage embeddings from imported weights."""
    from gslora_tpu.config import build_parser, config_from_args
    a = build_parser().parse_args(
        ["-n", "VIT_B16", "-d", "imagenet100"])
    cfg = config_from_args(a)
    ref = vit_b16_config(num_class=100)
    for f in ("image_size", "patch_size", "dim", "depth", "heads",
              "dim_head", "mlp_dim", "num_class", "head_type", "dropout",
              "emb_dropout", "soft_split", "ac_patch_size", "pad",
              "qkv_bias", "attn_scale"):
        assert getattr(cfg.model, f) == getattr(ref, f), f


def test_prepare_imagenet_head_slices_by_wnid_map(tmp_path):
    """1000-way resumed head -> num_class rows via the folder-names map
    (reference modify_head flow, cl.py:180-296)."""
    from gslora_tpu.cli.common import prepare_imagenet_head
    from gslora_tpu.config import DataConfig, RunConfig, ViTConfig

    wnids = [f"n{i:08d}" for i in range(10)]
    (tmp_path / "imagenet_folder_names.txt").write_text(
        "\n".join(wnids) + "\n")
    cfg = RunConfig(model=ViTConfig.vit_b16(num_class=3),
                    data=DataConfig(data_mode="imagenet100",
                                    data_root=str(tmp_path)))
    rng = np.random.RandomState(0)
    head = {"weight": jnp.asarray(rng.randn(10, 768).astype(np.float32)),
            "bias": jnp.asarray(rng.randn(10).astype(np.float32))}
    params = {"base": {"head": head}, "lora": {}}

    class DS:  # classes sorted lexicographically, as ImageFolder yields
        classes = [wnids[2], wnids[5], wnids[9]]

    out, original = prepare_imagenet_head(cfg, params, DS())
    assert out["base"]["head"]["weight"].shape == (3, 768)
    np.testing.assert_allclose(np.asarray(out["base"]["head"]["weight"][1]),
                               np.asarray(head["weight"][5]))
    assert original is not None and original["weight"].shape == (10, 768)
    # already-sliced head: no-op
    out2, orig2 = prepare_imagenet_head(cfg, out, DS())
    assert orig2 is None and out2 is out


def test_build_missing_dataset(tmp_path):
    """Held-out-class folders get GLOBAL ImageNet-1k labels
    (cl.py:160-178)."""
    from PIL import Image
    from gslora_tpu.cli.common import build_missing_dataset
    from gslora_tpu.config import DataConfig, RunConfig, ViTConfig

    wnids = [f"n{i:08d}" for i in range(6)]
    root = tmp_path / "data"
    root.mkdir()
    (root / "imagenet_folder_names.txt").write_text("\n".join(wnids))
    miss = tmp_path / "nonexist"
    for w in (wnids[4], wnids[1]):
        d = miss / w
        d.mkdir(parents=True)
        Image.new("RGB", (32, 32)).save(d / "a.jpg")
    cfg = RunConfig(model=ViTConfig.vit_b16(num_class=3),
                    data=DataConfig(data_mode="imagenet100",
                                    data_root=str(root)))
    ds = build_missing_dataset(cfg, str(miss))
    assert len(ds) == 2
    assert sorted(ds.targets) == [1, 4]  # global ids, not folder order


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
