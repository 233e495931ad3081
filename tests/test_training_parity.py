"""Training-DYNAMICS parity: N forget steps of our jitted engine vs a torch
autograd loop over the torch re-derivation of the reference forward, with
identical weights, batches, and AdamW hyperparameters (fp32, dropout off).

This is the strongest accuracy-parity evidence available without the CASIA
dataset: if per-step gradients and AdamW updates match, long-horizon
accuracy trajectories match too (same function, same optimizer, same data
order)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gslora_tpu.config import ForgetConfig, LoraConfig, OptimConfig, ViTConfig
from gslora_tpu.engine.forget import make_forget_step
from gslora_tpu.engine.state import ForgetState, make_optimizer
from gslora_tpu.models.import_torch import to_state_dict
from gslora_tpu.models.vit import init_vit_params

CFG = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                emb_dropout=0.0, head_type="CosFace")
LORA = LoraConfig(rank=4)
BND, BETA, ALPHA = 40.0, 0.3, 0.01
LR, WD = 1e-3, 0.05


def _torch_training_loop(sd, batches, depth, steps, cfg=None, lora=None):
    """Reference semantics in torch: CosFace ViT fwd, bounded forget CE +
    remain CE + per-block group-Lasso on LoRA, AdamW on LoRA only.

    ``cfg``/``lora`` default to this module's tiny config; pass the
    flagship config for the at-scale variant (test_parity_at_scale)."""
    import torch
    import torch.nn.functional as F
    from einops import rearrange as rr

    cfg = CFG if cfg is None else cfg
    lora = LORA if lora is None else lora
    ps = cfg.patch_size

    t = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}
    lora_names = [k for k in t if "lora" in k]
    for k in lora_names:
        t[k].requires_grad_(True)
    opt = torch.optim.AdamW([t[k] for k in lora_names], lr=LR,
                            betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)

    def fwd(img, labels):
        x = torch.from_numpy(img)
        x = rr(x, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=ps, p2=ps)
        x = x @ t["patch_to_embedding.weight"].T + \
            t["patch_to_embedding.bias"]
        b = x.shape[0]
        x = torch.cat([t["cls_token"].expand(b, 1, cfg.dim), x], 1)
        x = x + t["pos_embedding"][:, : x.shape[1]]
        for i in range(depth):
            p = f"transformer.layers.{i}"
            h = F.layer_norm(x, (cfg.dim,), t[f"{p}.0.fn.norm.weight"],
                             t[f"{p}.0.fn.norm.bias"])
            qkv = h @ t[f"{p}.0.fn.fn.to_qkv.weight"].T
            q, k, v = qkv.chunk(3, -1)
            q = rr(q, "b n (h d) -> b h n d", h=cfg.heads)
            k = rr(k, "b n (h d) -> b h n d", h=cfg.heads)
            v = rr(v, "b n (h d) -> b h n d", h=cfg.heads)
            a = (torch.einsum("bhid,bhjd->bhij", q, k) *
                 cfg.dim ** -0.5).softmax(-1)
            o = rr(torch.einsum("bhij,bhjd->bhid", a, v),
                   "b h n d -> b n (h d)")
            x = x + o @ t[f"{p}.0.fn.fn.to_out.0.weight"].T + \
                t[f"{p}.0.fn.fn.to_out.0.bias"]
            h = F.layer_norm(x, (cfg.dim,), t[f"{p}.1.fn.norm.weight"],
                             t[f"{p}.1.fn.norm.bias"])
            u = h @ t[f"{p}.1.fn.fn.net.0.weight"].T + \
                t[f"{p}.1.fn.fn.net.0.bias"]
            u = u + (h @ t[f"{p}.1.fn.fn.net.0.lora_A"].T) @ \
                t[f"{p}.1.fn.fn.net.0.lora_B"].T / lora.rank
            u = F.gelu(u)
            y = u @ t[f"{p}.1.fn.fn.net.3.weight"].T + \
                t[f"{p}.1.fn.fn.net.3.bias"]
            y = y + (u @ t[f"{p}.1.fn.fn.net.3.lora_A"].T) @ \
                t[f"{p}.1.fn.fn.net.3.lora_B"].T / lora.rank
            x = x + y
        emb = F.layer_norm(x[:, 0], (cfg.dim,), t["mlp_head.0.weight"],
                           t["mlp_head.0.bias"])
        cos = F.linear(F.normalize(emb), F.normalize(t["loss.weight"]))
        onehot = torch.zeros_like(cos)
        onehot.scatter_(1, torch.from_numpy(labels).view(-1, 1).long(), 1)
        return (onehot * (cos - 0.35) + (1 - onehot) * cos) * 64.0

    for s in range(steps):
        xf, yf, xr, yr = batches[s]
        ce_f = F.cross_entropy(fwd(xf, yf), torch.from_numpy(yf).long())
        ce_r = F.cross_entropy(fwd(xr, yr), torch.from_numpy(yr).long())
        lasso = 0.0
        for i in range(depth):
            p = f"transformer.layers.{i}.1.fn.fn"
            sq = sum(torch.sum(t[f"{p}.net.{j}.lora_{ab}"] ** 2)
                     for j in (0, 3) for ab in ("A", "B"))
            lasso = lasso + torch.sqrt(sq)
        loss = BETA * torch.relu(torch.tensor(BND) - ce_f) + ce_r + \
            ALPHA * lasso
        opt.zero_grad()
        loss.backward()
        opt.step()
    return {k: t[k].detach().numpy() for k in lora_names}


@pytest.mark.slow
def test_ten_step_forget_dynamics_match_torch():
    torch = pytest.importorskip("torch")  # noqa: F841
    params = init_vit_params(jax.random.key(0), CFG, LORA)
    # nonzero B so LoRA grads flow through both factors from step 1
    params["lora"]["ffn"]["B1"] = 0.05 * jax.random.normal(
        jax.random.key(1), params["lora"]["ffn"]["B1"].shape)
    params["lora"]["ffn"]["B2"] = 0.05 * jax.random.normal(
        jax.random.key(2), params["lora"]["ffn"]["B2"].shape)
    sd = to_state_dict(params, CFG)

    rng = np.random.RandomState(3)
    steps = 10
    batches = []
    for _ in range(steps):
        batches.append((rng.rand(4, 3, 16, 16).astype(np.float32),
                        rng.randint(4, 6, 4).astype(np.int64),
                        rng.rand(4, 3, 16, 16).astype(np.float32),
                        rng.randint(0, 4, 4).astype(np.int64)))

    torch_lora = _torch_training_loop(sd, batches, CFG.depth, steps)

    opt = make_optimizer(OptimConfig(opt="adamw", lr=LR, weight_decay=WD))
    state = ForgetState.create(params, opt)
    step = make_forget_step(CFG, LORA,
                            ForgetConfig(bnd=BND, beta=BETA, alpha=ALPHA,
                                         alpha_epoch=0),
                            opt, compute_dtype=jnp.float32,
                            use_prototype=False)
    sc = {k: jnp.float32(v) for k, v in dict(
        beta=BETA, alpha=ALPHA, lr=LR, bnd=BND, bnd_pro=18.0, w_pro_f=0.0,
        w_pro_r=0.0).items()}
    protos = jnp.zeros((CFG.num_class, CFG.dim))
    for s in range(steps):
        xf, yf, xr, yr = batches[s]
        state, _ = step(state, jnp.asarray(xf), jnp.asarray(yf),
                        jnp.asarray(xr), jnp.asarray(yr), protos, sc,
                        jax.random.key(s))

    ours = to_state_dict({"base": state.base, "lora": state.lora}, CFG)
    for name, want in torch_lora.items():
        got = np.asarray(ours[name])
        np.testing.assert_allclose(
            got, want, rtol=5e-3, atol=5e-5,
            err_msg=f"LoRA weights diverged after {steps} steps: {name}")
