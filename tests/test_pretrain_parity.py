"""Pretrain-DYNAMICS parity: N supervised pretrain steps (CosFace + CE,
AdamW over ALL parameters — reference train/train_own.py:422-546) of our
jitted engine vs a torch autograd loop on identical weights/batches.

Mirror of test_training_parity.py for the least-evidenced engine
(engine/pretrain.py). fp32, dropout off."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gslora_tpu.config import LoraConfig, OptimConfig, ViTConfig
from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
from gslora_tpu.engine.state import make_optimizer
from gslora_tpu.models.import_torch import to_state_dict
from gslora_tpu.models.vit import init_vit_params

CFG = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                emb_dropout=0.0, head_type="CosFace")
LORA = LoraConfig(rank=0)  # pretrain trains the FULL model (run_sub.sh)
LR, WD = 1e-3, 0.05


def _torch_pretrain_loop(sd, batches, steps):
    import torch
    import torch.nn.functional as F
    from einops import rearrange as rr

    t = {k: torch.from_numpy(np.asarray(v).copy()).requires_grad_(True)
         for k, v in sd.items()}
    opt = torch.optim.AdamW(list(t.values()), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)

    def fwd(img, labels):
        x = torch.from_numpy(img)
        x = rr(x, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=8, p2=8)
        x = x @ t["patch_to_embedding.weight"].T + \
            t["patch_to_embedding.bias"]
        b = x.shape[0]
        x = torch.cat([t["cls_token"].expand(b, 1, CFG.dim), x], 1)
        x = x + t["pos_embedding"][:, : x.shape[1]]
        for i in range(CFG.depth):
            p = f"transformer.layers.{i}"
            h = F.layer_norm(x, (CFG.dim,), t[f"{p}.0.fn.norm.weight"],
                             t[f"{p}.0.fn.norm.bias"])
            qkv = h @ t[f"{p}.0.fn.fn.to_qkv.weight"].T
            q, k, v = qkv.chunk(3, -1)
            q = rr(q, "b n (h d) -> b h n d", h=CFG.heads)
            k = rr(k, "b n (h d) -> b h n d", h=CFG.heads)
            v = rr(v, "b n (h d) -> b h n d", h=CFG.heads)
            a = (torch.einsum("bhid,bhjd->bhij", q, k) *
                 CFG.dim ** -0.5).softmax(-1)
            o = rr(torch.einsum("bhij,bhjd->bhid", a, v),
                   "b h n d -> b n (h d)")
            x = x + o @ t[f"{p}.0.fn.fn.to_out.0.weight"].T + \
                t[f"{p}.0.fn.fn.to_out.0.bias"]
            h = F.layer_norm(x, (CFG.dim,), t[f"{p}.1.fn.norm.weight"],
                             t[f"{p}.1.fn.norm.bias"])
            u = F.gelu(h @ t[f"{p}.1.fn.fn.net.0.weight"].T +
                       t[f"{p}.1.fn.fn.net.0.bias"])
            x = x + u @ t[f"{p}.1.fn.fn.net.3.weight"].T + \
                t[f"{p}.1.fn.fn.net.3.bias"]
        emb = F.layer_norm(x[:, 0], (CFG.dim,), t["mlp_head.0.weight"],
                           t["mlp_head.0.bias"])
        cos = F.linear(F.normalize(emb), F.normalize(t["loss.weight"]))
        onehot = torch.zeros_like(cos)
        onehot.scatter_(1, torch.from_numpy(labels).view(-1, 1).long(), 1)
        return (onehot * (cos - 0.35) + (1 - onehot) * cos) * 64.0

    for s in range(steps):
        x, y = batches[s]
        loss = F.cross_entropy(fwd(x, y), torch.from_numpy(y).long())
        opt.zero_grad()
        loss.backward()
        opt.step()
    return {k: v.detach().numpy() for k, v in t.items()}


@pytest.mark.slow
def test_pretrain_dynamics_match_torch():
    pytest.importorskip("torch")
    params = init_vit_params(jax.random.key(0), CFG, LORA)
    sd = to_state_dict(params, CFG)

    rng = np.random.RandomState(1)
    steps = 8
    batches = [(rng.rand(4, 3, 16, 16).astype(np.float32),
                rng.randint(0, 6, 4).astype(np.int64))
               for _ in range(steps)]

    torch_params = _torch_pretrain_loop(sd, batches, steps)

    opt = make_optimizer(OptimConfig(opt="adamw", lr=LR, weight_decay=WD))
    state = PretrainState.create(params, opt)
    step = make_pretrain_step(CFG, LORA, opt, compute_dtype=jnp.float32)
    for s in range(steps):
        x, y = batches[s]
        state, metrics = step(state, jnp.asarray(x), jnp.asarray(y),
                              jnp.float32(LR), jax.random.key(s))
    assert bool(jnp.isfinite(metrics["loss"]))

    ours = to_state_dict(state.params, CFG)
    assert set(ours) == set(torch_params)
    for name, want in torch_params.items():
        np.testing.assert_allclose(
            np.asarray(ours[name]), want, rtol=5e-3, atol=5e-5,
            err_msg=f"pretrain params diverged after {steps} steps: {name}")
