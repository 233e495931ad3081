"""At-scale reference-interop parity harness (flagship dims).

The standard parity tests (test_import_parity.py, test_training_parity.py)
run at tiny dims; this file pins the SAME guarantees at the flagship
configuration the reference's headline numbers come from —
ViT-P8S8 depth-6, dim 512, CosFace, rank-8 FFN LoRA
(train_own_forget.py:553-567, scripts/run_forget.sh) — and exercises the
real ``.pth`` export path (torch.save/torch.load round-trip through
cli/export_torch) so a real-data comparison against the reference is one
command when a dataset/checkpoint is available.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import LoraConfig, ViTConfig
from gslora_tpu.models.import_torch import from_state_dict, to_state_dict
from gslora_tpu.models.vit import init_vit_params, vit_apply

torch = pytest.importorskip("torch")

from test_import_parity import _torch_reference_forward  # noqa: E402

# dropout zeroed for determinism; everything else is the reference flagship
FLAGSHIP = ViTConfig(dropout=0.0, emb_dropout=0.0)
LORA = LoraConfig(rank=8)
REF_PARAM_COUNT = 19_157_504  # train_own_forget.py:658-662


def _flagship_params():
    params = init_vit_params(jax.random.key(0), FLAGSHIP, LORA)
    # make the adapters non-trivial so the LoRA path is part of the check
    # (fresh init has B=0 => LoRA contributes nothing)
    f = params["lora"]["ffn"]
    f["B1"] = 0.05 * jax.random.normal(jax.random.key(1), f["B1"].shape)
    f["B2"] = 0.05 * jax.random.normal(jax.random.key(2), f["B2"].shape)
    return params


@pytest.fixture(scope="module")
def flagship():
    params = _flagship_params()
    img = np.random.RandomState(3).rand(4, 3, 112, 112).astype(np.float32)
    labels = np.array([5, 17, 42, 99])
    sd = to_state_dict(params, FLAGSHIP)
    logits_t, emb_t = _torch_reference_forward(sd, img, FLAGSHIP, LORA.rank,
                                               labels)
    return params, img, labels, sd, logits_t, emb_t


def test_flagship_param_count():
    params = init_vit_params(jax.random.key(0), FLAGSHIP, LoraConfig(rank=0))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert n == REF_PARAM_COUNT


def test_flagship_forward_parity_fp32(flagship):
    """512-d depth-6 fp32 forward matches the torch re-derivation of
    vit_face.py:523-548 + CosFace (vit_face.py:171-208)."""
    params, img, labels, _, logits_t, emb_t = flagship
    logits_j, emb_j = vit_apply(params, jnp.asarray(img), jnp.asarray(labels),
                                FLAGSHIP, LORA, train=False,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(emb_j), emb_t, rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, rtol=1e-3,
                               atol=5e-3)
    # eval parity: identical predictions (the quantity eval_data compares)
    assert (np.argmax(np.asarray(logits_j), -1) ==
            np.argmax(logits_t, -1)).all()


def test_flagship_bf16_delta_bounded(flagship):
    """The production compute dtype is bf16; document/bound its deviation
    from the fp32 torch reference at flagship dims. Predictions must agree;
    embeddings drift by O(bf16 eps * sqrt(depth)) — bounded here."""
    params, img, labels, _, logits_t, emb_t = flagship
    logits_j, emb_j = vit_apply(params, jnp.asarray(img), jnp.asarray(labels),
                                FLAGSHIP, LORA, train=False,
                                compute_dtype=jnp.bfloat16)
    emb_j = np.asarray(emb_j, np.float32)
    logits_j = np.asarray(logits_j, np.float32)
    assert (np.argmax(logits_j, -1) == np.argmax(logits_t, -1)).all()
    # post-LN embeddings are O(1); bf16 has ~3 decimal digits
    assert float(np.max(np.abs(emb_j - emb_t))) < 0.15
    # CosFace logits live in [-s(1+m), s]; cosines good to ~1e-2 in bf16
    assert float(np.max(np.abs(logits_j - logits_t))) < 1.5


def test_flagship_pth_export_import_roundtrip(flagship, tmp_path):
    """export -> torch.save -> torch.load -> import reproduces the pytree
    bit-exactly (fp32) at flagship dims."""
    from gslora_tpu.cli.export_torch import save_pth
    params, _, _, sd, _, _ = flagship
    path = str(tmp_path / "flagship.pth")
    save_pth(sd, path)
    sd_back = {k: v.numpy() for k, v in
               torch.load(path, map_location="cpu",
                          weights_only=True).items()}
    tree = from_state_dict(sd_back, FLAGSHIP, LORA)
    want = {jax.tree_util.keystr(p): l for p, l in
            jax.tree_util.tree_leaves_with_path(params)}
    for p, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = jax.tree_util.keystr(p)
        np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                      np.asarray(want[key], np.float32),
                                      err_msg=key)


def test_merged_export_matches_unmerged_semantics(flagship):
    """loralib eval-mode (merged) export: base kernels absorb
    scaling*(B@A); running the torch reference on the merged weights with
    LoRA zeroed must equal the unmerged forward (within fp32 reassociation)."""
    from gslora_tpu.cli.export_torch import export_state_dict
    params, img, labels, _, logits_t, emb_t = flagship
    merged_sd = export_state_dict(params, FLAGSHIP, LORA, form="merged")
    # merged form keeps the (stale) lora tensors like loralib's state_dict;
    # zero them for the torch forward so the delta isn't double-counted
    for k in merged_sd:
        if "lora" in k:
            merged_sd[k] = np.zeros_like(merged_sd[k])
    logits_m, emb_m = _torch_reference_forward(merged_sd, img, FLAGSHIP,
                                               LORA.rank, labels)
    np.testing.assert_allclose(emb_m, emb_t, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(logits_m, logits_t, rtol=1e-4, atol=1e-3)


def test_export_cli_end_to_end(tmp_path):
    """msgpack checkpoint -> cli/export_torch --export_form both ->
    both .pth files load in torch with reference key names, and
    merged - unmerged == scaling * (B@A)^T on an FFN kernel."""
    from gslora_tpu.checkpoints.io import save_pytree
    from gslora_tpu.cli import export_torch

    params = _flagship_params()
    ckpt = str(tmp_path / "ckpt.msgpack")
    save_pytree(ckpt, params)
    out = str(tmp_path / "export.pth")
    written = export_torch.main([
        "-r", ckpt, "--export_out", out, "--export_form", "both",
        "--outdir", str(tmp_path)])
    assert {w["form"] for w in written} == {"unmerged", "merged"}
    un = torch.load(out, map_location="cpu", weights_only=True)
    me = torch.load(str(tmp_path / "export_merged.pth"),
                    map_location="cpu", weights_only=True)
    key_w = "transformer.layers.2.1.fn.fn.net.0.weight"
    key_a = "transformer.layers.2.1.fn.fn.net.0.lora_A"
    key_b = "transformer.layers.2.1.fn.fn.net.0.lora_B"
    assert set(un) == set(me)
    # lora tensors identical across forms; weight differs by scaling*B@A
    np.testing.assert_array_equal(un[key_a].numpy(), me[key_a].numpy())
    delta = (me[key_w] - un[key_w]).numpy()
    want = (un[key_b].numpy() @ un[key_a].numpy()) * LORA.scaling
    np.testing.assert_allclose(delta, want, rtol=1e-5, atol=1e-6)
    # sanity: full reference key surface present (6 layers x lora keys)
    lora_keys = [k for k in un if "lora_" in k]
    assert len(lora_keys) == 6 * 4


@pytest.mark.slow
def test_flagship_training_dynamics_match_torch():
    """3 full GS-LoRA forget steps at FLAGSHIP dims (512-d, depth-6,
    19.2M params, CosFace-100, rank-8) match the torch autograd loop on
    identical weights/batches — the at-scale extension of
    test_training_parity (which runs dim 32): rules out dims-dependent
    divergence (reassociation over 2048-wide FFN reductions, 196-token
    attention) in the trained LoRA trajectory itself."""
    import test_training_parity as ttp
    from gslora_tpu.config import ForgetConfig, OptimConfig
    from gslora_tpu.engine.forget import make_forget_step
    from gslora_tpu.engine.state import ForgetState, make_optimizer

    params = _flagship_params()
    sd = to_state_dict(params, FLAGSHIP)

    rng = np.random.RandomState(11)
    steps = 3
    batches = []
    for _ in range(steps):
        batches.append((rng.rand(2, 3, 112, 112).astype(np.float32),
                        rng.randint(90, 100, 2).astype(np.int64),
                        rng.rand(2, 3, 112, 112).astype(np.float32),
                        rng.randint(0, 90, 2).astype(np.int64)))

    torch_lora = ttp._torch_training_loop(sd, batches, FLAGSHIP.depth,
                                          steps, cfg=FLAGSHIP, lora=LORA)

    opt = make_optimizer(OptimConfig(opt="adamw", lr=ttp.LR,
                                     weight_decay=ttp.WD))
    state = ForgetState.create(params, opt)
    step = make_forget_step(FLAGSHIP, LORA,
                            ForgetConfig(bnd=ttp.BND, beta=ttp.BETA,
                                         alpha=ttp.ALPHA, alpha_epoch=0),
                            opt, compute_dtype=jnp.float32,
                            use_prototype=False)
    sc = {k: jnp.float32(v) for k, v in dict(
        beta=ttp.BETA, alpha=ttp.ALPHA, lr=ttp.LR, bnd=ttp.BND,
        bnd_pro=18.0, w_pro_f=0.0, w_pro_r=0.0).items()}
    protos = jnp.zeros((FLAGSHIP.num_class, FLAGSHIP.dim))
    for s in range(steps):
        xf, yf, xr, yr = batches[s]
        state, _ = step(state, jnp.asarray(xf), jnp.asarray(yf),
                        jnp.asarray(xr), jnp.asarray(yr), protos, sc,
                        jax.random.key(s))

    ours = to_state_dict({"base": state.base, "lora": state.lora}, FLAGSHIP)
    for name, want in torch_lora.items():
        got = np.asarray(ours[name])
        np.testing.assert_allclose(
            got, want, rtol=5e-3, atol=1e-4,
            err_msg=f"flagship LoRA diverged after {steps} steps: {name}")
