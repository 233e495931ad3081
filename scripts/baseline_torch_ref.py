"""Measured sanity anchor for the A100 baseline derivation (BASELINE.md).

Re-derives the reference's dual-batch GS-LoRA fine-tune step in plain torch
(fp32, eager, LoRA-only grads — the exact shape of engine.py:242-317 with
ViT-P8S8 depth-6 from vit_face.py:449-548) and measures images/sec on the
CPU we have. The point is NOT the absolute CPU number: it anchors the
"torch eager achieves X% of platform matmul peak on this loop" factor used
to project the A100 number in BASELINE.md. No reference code is imported
or copied — the model below is rebuilt from the cited semantics.

Run: python scripts/baseline_torch_ref.py [--steps 5] [--bs 48]
Prints one JSON line with img/s and achieved FLOP/s (using the same
24.0 GFLOP/image step cost bench.py uses, so ratios are apples-to-apples).
"""
import argparse
import json
import math
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

DIM, DEPTH, HEADS, MLP, N_CLASS = 512, 6, 8, 2048, 100
PATCH, IMG = 8, 112
RANK, LORA_SCALE = 8, 1.0 / 8  # loralib default lora_alpha=1 -> alpha/r
STEP_GFLOP_PER_IMG = 24.0  # analytic fwd(7.95) x3, same count as bench.py


class LoraLinear(nn.Module):
    """frozen weight + trainable A(r,in)/B(out,r), y = xW^T + x A^T B^T * s
    (loralib Linear semantics, vit_face.py:326-338 injection site)."""

    def __init__(self, din, dout):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(dout, din) * 0.02,
                                   requires_grad=False)
        self.bias = nn.Parameter(torch.zeros(dout), requires_grad=False)
        self.lora_A = nn.Parameter(torch.randn(RANK, din) * 0.01)
        self.lora_B = nn.Parameter(torch.zeros(dout, RANK))

    def forward(self, x):
        y = F.linear(x, self.weight, self.bias)
        return y + (x @ self.lora_A.T @ self.lora_B.T) * LORA_SCALE


class Block(nn.Module):
    def __init__(self):
        super().__init__()
        self.ln1 = nn.LayerNorm(DIM)
        self.qkv = nn.Linear(DIM, DIM * 3, bias=False)
        self.proj = nn.Linear(DIM, DIM)
        self.ln2 = nn.LayerNorm(DIM)
        self.ff1 = LoraLinear(DIM, MLP)
        self.ff2 = LoraLinear(MLP, DIM)

    def forward(self, x):
        h = self.ln1(x)
        q, k, v = self.qkv(h).chunk(3, dim=-1)
        b, n, _ = q.shape
        hd = DIM // HEADS
        q, k, v = (t.view(b, n, HEADS, hd).transpose(1, 2) for t in (q, k, v))
        att = (q @ k.transpose(-2, -1)) * (DIM ** -0.5)  # dim**-0.5 quirk
        att = att.softmax(-1)
        h = (att @ v).transpose(1, 2).reshape(b, n, DIM)
        x = x + self.proj(h)
        h = self.ln2(x)
        x = x + self.ff2(F.gelu(self.ff1(h)))
        return x


class ViT(nn.Module):
    def __init__(self):
        super().__init__()
        n_patch = (IMG // PATCH) ** 2
        self.embed = nn.Linear(3 * PATCH * PATCH, DIM)
        self.cls = nn.Parameter(torch.zeros(1, 1, DIM))
        self.pos = nn.Parameter(torch.zeros(1, n_patch + 1, DIM))
        self.blocks = nn.ModuleList(Block() for _ in range(DEPTH))
        self.ln = nn.LayerNorm(DIM)
        self.head_w = nn.Parameter(torch.randn(N_CLASS, DIM))

    def forward(self, img, y):
        b = img.shape[0]
        p = img.unfold(2, PATCH, PATCH).unfold(3, PATCH, PATCH)
        p = p.permute(0, 2, 3, 1, 4, 5).reshape(b, -1, 3 * PATCH * PATCH)
        x = torch.cat([self.cls.expand(b, -1, -1), self.embed(p)], 1) + self.pos
        for blk in self.blocks:
            x = blk(x)
        emb = self.ln(x[:, 0])
        # CosFace margin head s=64 m=0.35 (vit_face.py:146-208)
        cos = F.normalize(emb) @ F.normalize(self.head_w).T
        one_hot = F.one_hot(y, N_CLASS).float()
        return 64.0 * (cos - one_hot * 0.35), emb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--bs", type=int, default=48)
    args = ap.parse_args()
    torch.manual_seed(0)

    model = ViT()
    for n, pm in model.named_parameters():
        pm.requires_grad = "lora_" in n  # mark_only_lora_as_trainable
    opt = torch.optim.AdamW([p for p in model.parameters()
                             if p.requires_grad], lr=1e-2)

    bs = args.bs
    xf = torch.randn(bs, 3, IMG, IMG)
    yf = torch.arange(bs) % 10 + 90
    xr = torch.randn(bs, 3, IMG, IMG)
    yr = torch.arange(bs) % 90

    def step():
        logits_f, _ = model(xf, yf)
        logits_r, _ = model(xr, yr)
        l_remain = F.cross_entropy(logits_r, yr)
        l_forget = F.relu(110.0 - F.cross_entropy(logits_f, yf))
        l_struct = sum(
            torch.sqrt((blk.ff1.lora_A ** 2).sum() +
                       (blk.ff1.lora_B ** 2).sum() +
                       (blk.ff2.lora_A ** 2).sum() +
                       (blk.ff2.lora_B ** 2).sum() + 1e-12)
            for blk in model.blocks)
        loss = 0.15 * l_forget + l_remain + 0.01 * l_struct
        opt.zero_grad(set_to_none=True)
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = (time.perf_counter() - t0) / args.steps
    ips = 2 * bs / dt
    print(json.dumps({
        "platform": "torch-cpu-eager-fp32",
        "threads": torch.get_num_threads(),
        "images_per_sec": round(ips, 2),
        "sec_per_step": round(dt, 3),
        "achieved_gflops": round(ips * STEP_GFLOP_PER_IMG, 1),
    }))


if __name__ == "__main__":
    main()
