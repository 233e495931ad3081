"""Scanned face Vision Transformer with stacked LoRA — TPU-native.

Functional re-design of the reference backbones (vit_face.py:449-548
``ViT_face``, vits_face.py:409-509 ``ViTs_face``): pre-norm transformer,
learnable pos-embed + CLS, LayerNorm "mlp_head" on the CLS token, margin
head on top. Differences from the reference that matter on TPU:

* all L blocks' parameters are **stacked on a leading layer axis** and the
  depth loop is one ``jax.lax.scan`` — one trace/compile regardless of
  depth, and LoRA group operations become layer-axis reductions;
* parameters are plain pytrees; train/eval is a flag, dropout RNG is
  explicit; LoRA is held in a separate subtree (see gslora_tpu.lora.core)
  and applied functionally — never merged statefully;
* matmuls run in a configurable compute dtype (bf16 on TPU → MXU),
  LayerNorm / softmax / heads in fp32.

Exact reference semantics kept for parity: GELU is the erf form (torch
nn.GELU default, NOT jax.nn.gelu's tanh approximation); patchify token
layout is (p1 p2 c) for the hard split (vit_face.py:530) and channel-major
(c kh kw) for the unfold soft split (vits_face.py:446-450); attention
scale is dim**-0.5 (NOT dim_head**-0.5 — reference vit_face.py:346 quirk).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange

from gslora_tpu.config import (IMAGENET_MEAN, IMAGENET_STD, LoraConfig,
                               ViTConfig)
from gslora_tpu.lora.core import init_lora, lora_delta
from gslora_tpu.models.heads import apply_head
from gslora_tpu.utils.inits import kaiming_uniform, lecun_linear_bias, \
    xavier_normal, xavier_uniform

Params = Dict


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _linear_init(key, fan_in: int, fan_out: int, dtype, bias: bool = True):
    """torch nn.Linear default init; kernel stored (fan_in, fan_out)."""
    kw, kb = jax.random.split(key)
    w = kaiming_uniform(kw, (fan_out, fan_in), a=math.sqrt(5), dtype=dtype).T
    p = {"kernel": w}
    if bias:
        p["bias"] = lecun_linear_bias(kb, fan_in, (fan_out,), dtype)
    return p


def _stack_linears(key, depth, fan_in, fan_out, dtype, bias=True):
    keys = jax.random.split(key, depth)
    ps = [_linear_init(k, fan_in, fan_out, dtype, bias) for k in keys]
    out = {"kernel": jnp.stack([p["kernel"] for p in ps])}
    if bias:
        out["bias"] = jnp.stack([p["bias"] for p in ps])
    return out


def init_vit_params(key, model: ViTConfig, lora: Optional[LoraConfig] = None,
                    param_dtype=jnp.float32) -> Params:
    """Build {"base": ..., "lora": ...} pytree for the ViT backbone."""
    d, L, m, inner = model.dim, model.depth, model.mlp_dim, model.inner_dim
    ks = jax.random.split(key, 12)
    dt = param_dtype

    blocks = {
        "attn_ln": {"scale": jnp.ones((L, d), dt), "bias": jnp.zeros((L, d), dt)},
        "qkv": _stack_linears(ks[0], L, d, 3 * inner, dt,
                              bias=model.qkv_bias),
        "attn_out": _stack_linears(ks[1], L, inner, d, dt),
        "ffn_ln": {"scale": jnp.ones((L, d), dt), "bias": jnp.zeros((L, d), dt)},
        "fc1": _stack_linears(ks[2], L, d, m, dt),
        "fc2": _stack_linears(ks[3], L, m, d, dt),
    }
    base = {
        "patch": _linear_init(ks[4], model.patch_dim, d, dt),
        "cls_token": jax.random.normal(ks[5], (d,), dt),
        "pos_embed": jax.random.normal(ks[6], (model.seq_len, d), dt),
        "blocks": blocks,
        "head_ln": {"scale": jnp.ones((d,), dt), "bias": jnp.zeros((d,), dt)},
    }
    if model.head_type != "None":
        C = model.num_class
        if model.head_type == "Softmax":
            base["head"] = {
                "weight": xavier_uniform(ks[7], (C, d), dtype=dt),
                "bias": jnp.zeros((C,), dt),
            }
        elif model.head_type == "SFace":
            base["head"] = {"weight": xavier_normal(ks[7], (C, d), gain=2.0,
                                                    dtype=dt)}
        else:  # CosFace / ArcFace: xavier uniform (vit_face.py:169,98)
            base["head"] = {"weight": xavier_uniform(ks[7], (C, d), dtype=dt)}

    lora_tree = init_lora(ks[8], model, lora, dtype=jnp.float32) \
        if (lora is not None and lora.rank > 0) else {}
    return {"base": base, "lora": lora_tree}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float = 1e-5, ln_dtype: str = "fp32") -> jax.Array:
    """LayerNorm in fp32 (torch nn.LayerNorm eps=1e-5). ``ln_dtype="bf16"``
    keeps the input dtype (perf ablation, ViTConfig.ln_dtype)."""
    xf = x.astype(jnp.float32) if ln_dtype == "fp32" else x
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(xf.dtype) + bias.astype(xf.dtype)


def _proj(x: jax.Array, kernel: jax.Array, model: ViTConfig) -> jax.Array:
    """x @ kernel for the transformer's projection GEMMs, dispatched on
    ``model.gemm_impl``: "default" = compute-dtype einsum (bf16 on TPU ->
    MXU); "int8" = W8A8 dynamic quantization (ops/quant.py — ~2x MXU rate
    on v5e, eval-only)."""
    if model.gemm_impl == "int8":
        from gslora_tpu.ops.quant import int8_linear
        return int8_linear(x, kernel, out_dtype=x.dtype)
    return jnp.einsum("...k,kn->...n", x, kernel.astype(x.dtype))


def _dropout(x: jax.Array, rate: float, rng, deterministic: bool,
             impl: str = "uniform") -> jax.Array:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    if impl == "bits32":
        # one 32-bit RBG word per element, kept iff word < keep * 2^32:
        # skips the uniform path's int->float conversion AND bits16's
        # lane-packing bitcast/reshape/slice chain (which materialized
        # instead of fusing — DEVNOTES round-3). P(keep) quantized at
        # 2^-32, finer than the fp32 uniform compare's 2^-24.
        thresh = jnp.uint32(min(0xFFFFFFFF, round(keep * 4294967296.0)))
        mask = jax.random.bits(rng, x.shape, dtype=jnp.uint32) < thresh
    elif impl == "bits8":
        # one uint8 RBG word per element: the RngBitGenerator HLO's output
        # is materialized in HBM (it cannot fuse into consumer fusions),
        # so the mask generator's traffic — not the compare/apply, which
        # DO fuse — dominates dropout cost on TPU. u8 output quarters
        # that tensor vs uniform/bits32 (measured at the pretrain
        # b480-ga20 optimum in scripts/perf_pretrain_lab.py). P(keep)
        # quantized at 2^-8 (keep=0.9 realizes 230/256 = 0.8984) — a
        # perf option, not the parity default.
        thresh = jnp.uint8(min(255, round(keep * 256.0)))
        mask = jax.random.bits(rng, x.shape, dtype=jnp.uint8) < thresh
    elif impl == "bits16":
        # mask-generation cost dominates dropout on TPU (the FFN-hidden
        # mask is (b, n, mlp_dim) per layer): draw HALF as many 32-bit
        # RBG words, view them as uint16 lanes, and keep iff
        # lane < round(keep * 2^16) — P(keep) quantized to 2^-16
        # granularity (error <= 2^-17; the uniform-fp32 compare path is
        # itself quantized at 2^-24), no int->float conversion
        n = x.size
        words = jax.random.bits(rng, ((n + 1) // 2,), dtype=jnp.uint32)
        lanes = jax.lax.bitcast_convert_type(words, jnp.uint16)
        thresh = jnp.uint16(min(65535, int(round(keep * 65536.0))))
        mask = (lanes.reshape(-1)[:n] < thresh).reshape(x.shape)
    else:
        mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def patchify(images: jax.Array, model: ViTConfig) -> jax.Array:
    """(B, C, H, W) -> (B, N, patch_dim) tokens.

    Hard split (ViT_face, vit_face.py:530): token layout (p1 p2 c).
    Soft split (ViTs_face, vits_face.py:446-450): overlapping unfold,
    channel-major (c kh kw) layout — implemented with
    conv_general_dilated_patches which emits the same ordering.
    """
    if model.soft_split:
        patches = jax.lax.conv_general_dilated_patches(
            images,
            filter_shape=(model.ac_patch_size, model.ac_patch_size),
            window_strides=(model.patch_size, model.patch_size),
            padding=[(model.pad, model.pad), (model.pad, model.pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )  # (B, C*k*k, h, w), feature dim ordered (c, kh, kw) like nn.Unfold
        return rearrange(patches, "b f h w -> b (h w) f")
    p = model.patch_size
    return rearrange(images, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)",
                     p1=p, p2=p)


def _attention_block(x, blk, lora_blk, model: ViTConfig, scaling: float,
                     rngs, deterministic: bool):
    """Pre-norm MHA with residual (vit_face.py:341-379)."""
    cdt = x.dtype
    h = _layer_norm(x, blk["attn_ln"]["scale"], blk["attn_ln"]["bias"],
                    ln_dtype=model.ln_dtype)
    h = h.astype(cdt)
    qkv = _proj(h, blk["qkv"]["kernel"], model)
    if "bias" in blk["qkv"]:
        qkv = qkv + blk["qkv"]["bias"].astype(cdt)
    if lora_blk is not None and "attn" in lora_blk:
        A, B = lora_blk["attn"]["A"], lora_blk["attn"]["B"]  # (3,r,d),(3,o,r)
        deltas = [lora_delta(h, A[c], B[c], scaling) for c in range(3)]
        qkv = qkv + jnp.concatenate(deltas, axis=-1)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = model.dim_head
    # vit_face quirk: dim**-0.5 (vit_face.py:346); "dim_head" = standard
    scale = (model.dim if model.attn_scale == "dim" else model.dim_head) \
        ** -0.5
    impl = model.attn_impl
    if impl == "auto":
        # the blocked Pallas kernel wins under the per-layer SCAN on real
        # TPU (2267 vs 2153 img/s full step, v5e round 2) — it amortizes
        # the scan's per-GEMM pipeline bubbles. Under FULL UNROLL those
        # bubbles are gone and XLA's batched einsums win or tie at every
        # measured batch (b24: 3757 vs 3537 img/s; b48: tie — round-4
        # breakdown, DEVNOTES), so auto prefers xla there. Interpret-mode
        # Pallas on CPU is test-only slow — keep the XLA einsum there.
        # Multi-device: the pallas_call custom op carries no GSPMD
        # partitioning rule, so it only runs when the loop registered a
        # mesh (the kernel then runs per-shard under jax.shard_map); an
        # unregistered multi-device context falls back to the einsums,
        # which shard batch-wise for free.
        from gslora_tpu.parallel.mesh import attention_mesh, sequence_mesh
        on_accel = jax.default_backend() != "cpu"
        full_unroll = model.scan_unroll == 0 or \
            model.scan_unroll >= model.depth
        single = jax.device_count() == 1
        impl = "pallas" if (on_accel and not full_unroll and
                            (single or attention_mesh() is not None)) \
            else "xla"
        if sequence_mesh() is not None:
            # under sequence parallelism the activations are token-sharded
            # over `model`; the pallas shard_map (data axis only) would
            # just all-gather them back — the XLA einsums let GSPMD keep
            # the sequence sharding through the softmax instead
            impl = "xla"
    if impl == "dpa":
        # jax.nn.dot_product_attention ((B,N,H,D) layout): faster in
        # isolation on v5e but SLOWER inside the full fused train step
        # (1943 vs 2163 img/s) — kept as an option; einsum is the default
        b, n = q.shape[0], q.shape[1]
        o = jax.nn.dot_product_attention(
            q.reshape(b, n, -1, hd), k.reshape(b, n, -1, hd),
            v.reshape(b, n, -1, hd), scale=scale)
        out = o.reshape(b, n, -1)
        out = _proj(out, blk["attn_out"]["kernel"], model)
        out = out + blk["attn_out"]["bias"].astype(cdt)
        out = _dropout(out, model.dropout,
                       rngs[0] if rngs is not None else None, deterministic,
                       impl=model.dropout_impl)
        return x + out
    if impl == "skip":
        # ABLATION ONLY (perf lab): bypass scores/softmax/AV, keep the
        # projection GEMMs — isolates the attention-einsum+softmax cost
        out = _proj(v, blk["attn_out"]["kernel"], model)
        out = out + blk["attn_out"]["bias"].astype(cdt)
        out = _dropout(out, model.dropout,
                       rngs[0] if rngs is not None else None, deterministic,
                       impl=model.dropout_impl)
        return x + out
    if impl == "bnhd":
        # head-trailing layout: q/k/v stay (b, n, h, d) — a free reshape of
        # the qkv projection output instead of a physical (b,h,n,d)
        # transpose per tensor per block; heads batch in einsum position 2
        # and the output reshape back to (b, n, dim) is contiguous
        b, n = q.shape[0], q.shape[1]
        qh = q.reshape(b, n, -1, hd)
        kh = k.reshape(b, n, -1, hd)
        vh = v.reshape(b, n, -1, hd)
        dots = jnp.einsum("bihd,bjhd->bhij", qh, kh) * scale
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(cdt)
        out = jnp.einsum("bhij,bjhd->bihd", attn, vh).reshape(b, n, -1)
        out = _proj(out, blk["attn_out"]["kernel"], model)
        out = out + blk["attn_out"]["bias"].astype(cdt)
        out = _dropout(out, model.dropout,
                       rngs[0] if rngs is not None else None, deterministic,
                       impl=model.dropout_impl)
        return x + out
    q = rearrange(q, "b n (h d) -> b h n d", d=hd)
    k = rearrange(k, "b n (h d) -> b h n d", d=hd)
    v = rearrange(v, "b n (h d) -> b h n d", d=hd)
    if impl == "pallas":
        from gslora_tpu.ops.attention import fused_attention_bhnd
        from gslora_tpu.parallel.mesh import attention_mesh
        out = fused_attention_bhnd(q, k, v, scale, mesh=attention_mesh())
        out = rearrange(out, "b h n d -> b n (h d)")
    else:
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(cdt)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = rearrange(out, "b h n d -> b n (h d)")
    out = _proj(out, blk["attn_out"]["kernel"], model)
    out = out + blk["attn_out"]["bias"].astype(cdt)
    out = _dropout(out, model.dropout, rngs[0] if rngs is not None else None,
                   deterministic, impl=model.dropout_impl)
    return x + out


def _ffn_block(x, blk, lora_blk, model: ViTConfig, scaling: float, rngs,
               deterministic: bool):
    """Pre-norm LoRA-FFN with residual (vit_face.py:326-338): where the
    GS-LoRA trainable parameters live."""
    cdt = x.dtype
    h = _layer_norm(x, blk["ffn_ln"]["scale"], blk["ffn_ln"]["bias"],
                    ln_dtype=model.ln_dtype)
    h = h.astype(cdt)
    u = _proj(h, blk["fc1"]["kernel"], model)
    u = u + blk["fc1"]["bias"].astype(cdt)
    if lora_blk is not None and "ffn" in lora_blk:
        u = u + lora_delta(h, lora_blk["ffn"]["A1"], lora_blk["ffn"]["B1"],
                           scaling)
    if model.gelu_impl == "erf":
        # torch nn.GELU parity: exact erf in fp32
        u = jax.nn.gelu(u.astype(jnp.float32), approximate=False).astype(cdt)
    elif model.gelu_impl == "erf_bf16":
        u = jax.nn.gelu(u, approximate=False)
    else:  # "tanh" — parity-diverging ablation
        u = jax.nn.gelu(u, approximate=True)
    u = _dropout(u, model.dropout, rngs[1] if rngs is not None else None,
                 deterministic, impl=model.dropout_impl)
    y = _proj(u, blk["fc2"]["kernel"], model)
    y = y + blk["fc2"]["bias"].astype(cdt)
    if lora_blk is not None and "ffn" in lora_blk:
        y = y + lora_delta(u, lora_blk["ffn"]["A2"], lora_blk["ffn"]["B2"],
                           scaling)
    y = _dropout(y, model.dropout, rngs[2] if rngs is not None else None,
                 deterministic, impl=model.dropout_impl)
    return x + y


def transformer_stack(x: jax.Array, blocks: Params, lora_tree: Params,
                      model: ViTConfig, scaling: float, rng,
                      deterministic: bool,
                      layer_range: Optional[Tuple[int, int]] = None
                      ) -> jax.Array:
    """Apply the (stacked) transformer blocks with one lax.scan.

    ``layer_range=(lo, hi)`` runs only blocks [lo, hi) — the LIRF low/up
    split (vit_face.py:382-446 ``up=True`` path) expressed as slicing the
    stacked params instead of model surgery.
    """
    L = model.depth
    lo, hi = layer_range if layer_range is not None else (0, L)
    blocks = jax.tree.map(lambda a: a[lo:hi], blocks)
    lora_tree = jax.tree.map(lambda a: a[lo:hi], lora_tree) if lora_tree \
        else {}
    n_layers = hi - lo
    if n_layers == 0:
        return x

    if rng is not None and not deterministic:
        layer_rngs = jax.random.split(rng, n_layers * 3).reshape(n_layers, 3)
    else:
        layer_rngs = None

    # scan over the stacked layer axis; scan_unroll trades code size for
    # cross-layer fusion/pipelining (+40% on v5e at full unroll). 0 =
    # auto: full unroll on accelerators, plain scan on CPU (keeps test
    # compile times and the 8-device CPU mesh suite fast)
    unroll = model.scan_unroll
    if unroll == 0:
        unroll = n_layers if jax.default_backend() != "cpu" else 1
    unroll = max(1, min(unroll, n_layers))

    # GPipe pipeline parallelism (MeshConfig.pp): registered at trace time
    # by placement(pp=True); only the full stack pipelines — layer_range
    # slices (LIRF) fall through to the scan, which stays correct on
    # stage-sharded params (GSPMD gathers)
    from gslora_tpu.parallel.mesh import pipeline_config
    pcfg = pipeline_config()
    if pcfg is not None and layer_range is None:
        mesh_pp, n_micro = pcfg
        stages = mesh_pp.shape["model"]
        if stages > 1 and n_layers % stages == 0:
            import dataclasses as _dc

            from gslora_tpu.parallel.pipeline import pipeline_transformer

            # XLA einsum attention inside the manual pipeline body (a
            # nested pallas shard_map has no partitioning rule there)
            model_pp = _dc.replace(model, attn_impl="xla")

            def layer_fn(carry, blk, lora_blk, rr):
                y = _attention_block(carry, blk, lora_blk, model_pp,
                                     scaling, rr, deterministic)
                return _ffn_block(y, blk, lora_blk, model_pp, scaling, rr,
                                  deterministic)

            if model.remat:
                # rematerialize per layer inside the pipeline body too —
                # without this, remat would silently be dropped on the pp
                # path (each stage would keep all M+S-1 ticks' activations)
                layer_fn = jax.checkpoint(layer_fn)

            return pipeline_transformer(x, blocks,
                                        lora_tree if lora_tree else None,
                                        layer_rngs, layer_fn, mesh_pp,
                                        n_micro, unroll=unroll)

    # Megatron-style sequence parallelism (MeshConfig.sp, registered by
    # placement(sp=True)): token dim sharded over `model` at the layer
    # boundaries — the LN/dropout/residual VPU work runs token-sharded and
    # GSPMD derives the all-gather / reduce-scatter pairs around attention
    # and the (optionally tp-sharded) FFN matmuls. Identity when unset.
    from gslora_tpu.parallel.mesh import sequence_sharding_constraint
    x = sequence_sharding_constraint(x)

    def body(carry, xs):
        blk, lora_blk, rngs = xs
        rngs = list(rngs) if rngs is not None else None
        y = _attention_block(carry, blk, lora_blk, model, scaling, rngs,
                             deterministic)
        y = _ffn_block(y, blk, lora_blk, model, scaling, rngs, deterministic)
        return sequence_sharding_constraint(y), None

    xs = (blocks, lora_tree if lora_tree else None, layer_rngs)
    if model.remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, xs, length=n_layers, unroll=unroll)
    return x


def vit_embed(params: Params, images: jax.Array, model: ViTConfig,
              lora: LoraConfig, *, train: bool = False, rng=None,
              compute_dtype=jnp.bfloat16,
              layer_range: Optional[Tuple[int, int]] = None,
              tokens_in: Optional[jax.Array] = None,
              return_tokens: bool = False,
              lora_apply: str = "factored") -> jax.Array:
    """Backbone forward -> post-LN CLS embedding (B, dim) in fp32.

    ``tokens_in``/``return_tokens`` expose the token sequence boundary used
    by the LIRF low/up split (vit_face.py:638-665, 755-781).

    ``lora_apply``: "factored" runs the low-rank path as two skinny matmuls
    per adapted linear (loralib semantics); "merged" folds B@A into the
    kernels ONCE per call before the block scan — same function of (A, B)
    (grads flow through the fold), but the hot loop sees plain matmuls.
    At rank 8 the fold costs ~0.1 GFLOP while removing 4 skinny MXU-hostile
    matmuls per block from both forward and backward — the faster mode for
    training on TPU ("Run LoRA Run"-style).

    Precision note: with bf16 base params, "merged" quantizes the fold to
    the kernel dtype, so delta components below the base weight's bf16 ulp
    round away in the forward (gradients are unaffected — the cast's VJP is
    identity). Keep fp32 base params (the default) when using "merged" for
    accuracy-critical runs.
    """
    if train and model.gemm_impl == "int8":
        # int8 rounding has zero gradient — training would silently see
        # dead gradients through every projection; refuse at trace time
        raise ValueError("gemm_impl='int8' is an inference/serving path; "
                         "train with the default bf16 GEMMs")
    base = params["base"]
    lora_tree = params.get("lora", {})
    if lora_tree and lora_apply == "merged":
        from gslora_tpu.lora.core import merge_lora
        base = dict(base)
        base["blocks"] = merge_lora(base["blocks"], lora_tree, lora.scaling)
        lora_tree = {}
    cdt = compute_dtype
    deterministic = not train
    r_emb = r_blocks = None
    if rng is not None and train:
        r_emb, r_blocks = jax.random.split(rng)

    if tokens_in is None:
        if images.dtype == jnp.uint8:
            # uint8-transfer path (pipeline.BatchLoader(uint8_transfer=
            # True)): dequantize on device — k/255 in fp32 is the exact
            # host ToTensor value (train_own.py:287), then the same cast
            # to compute dtype as the fp32 path; XLA fuses the scale into
            # the patch-embedding GEMM's input. 4x less H2D traffic.
            images = images.astype(jnp.float32) / 255.0
            if model.input_norm == "imagenet":
                # torchvision ImageNet mean/std (image_iter.py:147-149),
                # same fp32 ops/order as the host transform — exact
                mean = jnp.asarray(IMAGENET_MEAN,
                                   jnp.float32).reshape(1, 3, 1, 1)
                std = jnp.asarray(IMAGENET_STD,
                                  jnp.float32).reshape(1, 3, 1, 1)
                images = (images - mean) / std
        x = patchify(images.astype(cdt), model)
        x = _proj(x, base["patch"]["kernel"], model)
        x = x + base["patch"]["bias"].astype(cdt)
        b = x.shape[0]
        cls = jnp.broadcast_to(base["cls_token"].astype(cdt),
                               (b, 1, model.dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + base["pos_embed"].astype(cdt)[None, : x.shape[1]]
        x = _dropout(x, model.emb_dropout, r_emb, deterministic,
                     impl=model.dropout_impl)
    else:
        x = tokens_in.astype(cdt)

    x = transformer_stack(x, base["blocks"], lora_tree, model, lora.scaling,
                          r_blocks, deterministic, layer_range)
    if return_tokens:
        return x
    pooled = x.mean(axis=1) if model.pool == "mean" else x[:, 0]
    emb = _layer_norm(pooled, base["head_ln"]["scale"],
                      base["head_ln"]["bias"])
    return emb  # fp32


def vit_apply(params: Params, images: jax.Array,
              labels: Optional[jax.Array], model: ViTConfig,
              lora: LoraConfig, *, train: bool = False, rng=None,
              compute_dtype=jnp.bfloat16, lora_apply: str = "factored"):
    """Full forward. With labels: (logits, emb) like ViT_face.forward
    (vit_face.py:523-548); without: emb only."""
    emb = vit_embed(params, images, model, lora, train=train, rng=rng,
                    compute_dtype=compute_dtype, lora_apply=lora_apply)
    if labels is None or model.head_type == "None":
        return emb
    logits = apply_head(model.head_type, params["base"]["head"], emb, labels)
    return logits, emb
