"""Uncovered configuration branches: Attention-placement LoRA training,
lora/matrix group types in the step, mean pooling, step LR schedule."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import (ForgetConfig, LoraConfig, OptimConfig,
                               ViTConfig)
from gslora_tpu.engine.forget import make_forget_step
from gslora_tpu.engine.schedule import timm_cosine_lr
from gslora_tpu.engine.state import ForgetState, make_optimizer
from gslora_tpu.models.vit import init_vit_params, vit_apply

CFG = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                emb_dropout=0.0, head_type="Softmax")


def _run_steps(cfg, lora, fcfg, n=3):
    params = init_vit_params(jax.random.key(0), cfg, lora)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    state = ForgetState.create(params, opt)
    step = make_forget_step(cfg, lora, fcfg, opt, compute_dtype=jnp.float32,
                            use_prototype=False)
    x = jax.random.normal(jax.random.key(1), (4, 3, 16, 16))
    yf = jnp.array([4, 5, 4, 5])
    yr = jnp.array([0, 1, 2, 3])
    protos = jnp.zeros((6, 32))
    sc = {k: jnp.float32(v) for k, v in dict(
        beta=0.3, alpha=0.01, lr=1e-3, bnd=10.0, bnd_pro=18.0, w_pro_f=0.0,
        w_pro_r=0.0).items()}
    m = None
    for i in range(n):
        state, m = step(state, x, yf, x, yr, protos, sc, jax.random.key(i))
    return state, m


def test_attention_placement_lora_trains():
    lora = LoraConfig(rank=4, pos="Attention")
    fcfg = ForgetConfig(group_pos="Attention", alpha_epoch=0)
    state, m = _run_steps(CFG, lora, fcfg)
    assert np.isfinite(float(m["loss_total"]))
    # attention LoRA moved
    assert float(jnp.abs(state.lora["attn"]["B"]).max()) > 0


@pytest.mark.parametrize("group_type", ["lora", "matrix"])
def test_group_type_variants_in_step(group_type):
    lora = LoraConfig(rank=4)
    fcfg = ForgetConfig(group_type=group_type, alpha_epoch=0)
    state, m = _run_steps(CFG, lora, fcfg)
    assert np.isfinite(float(m["loss_structure"]))


def test_mean_pooling_forward():
    cfg = dataclasses.replace(CFG, pool="mean")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora)
    x = jax.random.normal(jax.random.key(1), (2, 3, 16, 16))
    logits, emb = vit_apply(params, x, jnp.array([0, 1]), cfg, lora,
                            compute_dtype=jnp.float32)
    assert emb.shape == (2, 32)
    # mean pool differs from CLS pool
    logits_cls, _ = vit_apply(params, x, jnp.array([0, 1]), CFG, lora,
                              compute_dtype=jnp.float32)
    assert float(jnp.abs(logits - logits_cls).max()) > 1e-5


def test_step_schedule():
    oc = OptimConfig(lr=1e-2, sched="step", warmup_epochs=0,
                     decay_epochs=10, decay_rate=0.1, min_lr=1e-6)
    assert timm_cosine_lr(oc, 0) == 1e-2
    assert abs(timm_cosine_lr(oc, 10) - 1e-3) < 1e-9
    assert abs(timm_cosine_lr(oc, 25) - 1e-4) < 1e-9
    oc2 = OptimConfig(lr=1e-2, sched="constant", warmup_epochs=0)
    assert timm_cosine_lr(oc2, 5) == 1e-2


def test_sface_pretrain_step():
    """SFace head uses its internal loss in pretraining
    (train_own.py SFace branch)."""
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    cfg = dataclasses.replace(CFG, head_type="SFace")
    lora = LoraConfig(rank=0)
    params = init_vit_params(jax.random.key(0), cfg, lora)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    state = PretrainState.create(params, opt)
    step = make_pretrain_step(cfg, lora, opt, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (4, 3, 16, 16))
    y = jnp.array([0, 1, 2, 3])
    w0 = np.asarray(params["base"]["head"]["weight"])
    for i in range(3):
        state, m = step(state, x, y, jnp.float32(1e-3), jax.random.key(i))
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(w0, np.asarray(
        state.params["base"]["head"]["weight"]))


def test_lora_only_pretrain_freezes_base():
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), CFG, lora)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    state = PretrainState.create(params, opt, lora_only=True)
    step = make_pretrain_step(CFG, lora, opt, compute_dtype=jnp.float32,
                              lora_only=True)
    x = jax.random.normal(jax.random.key(1), (4, 3, 16, 16))
    y = jnp.array([0, 1, 2, 3])
    for i in range(2):
        state, _ = step(state, x, y, jnp.float32(1e-3), jax.random.key(i))
    np.testing.assert_array_equal(
        np.asarray(params["base"]["patch"]["kernel"]),
        np.asarray(state.params["base"]["patch"]["kernel"]))
    assert not np.allclose(np.asarray(params["lora"]["ffn"]["A1"]),
                           np.asarray(state.params["lora"]["ffn"]["A1"]))
    # the optimizer state is scoped to the LoRA subtree (torch skips
    # grad-None base params entirely) — no full-model moment buffers
    opt_size = sum(l.size for l in jax.tree.leaves(state.opt_state))
    base_size = sum(l.size for l in jax.tree.leaves(params["base"]))
    assert opt_size < base_size


def test_grad_accum_matches_full_batch():
    """grad_accum=N inside the jitted pretrain step == one full-batch
    step: CE/accuracy are means over equal micro slices, so the averaged
    micro gradients equal the full-batch gradient exactly (fp32, dropout
    off)."""
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    lora = LoraConfig(rank=0)
    x = jax.random.normal(jax.random.key(1), (8, 3, 16, 16))
    y = jnp.array([0, 1, 2, 3, 4, 5, 0, 1])

    def run(n):
        params = init_vit_params(jax.random.key(0), CFG, lora)
        opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
        state = PretrainState.create(params, opt)
        step = make_pretrain_step(CFG, lora, opt, compute_dtype=jnp.float32,
                                  grad_accum=n)
        for i in range(3):
            state, m = step(state, x, y, jnp.float32(1e-3), jax.random.key(i))
        return state, m

    ref_state, ref_m = run(1)
    for n in (2, 4):
        st, m = run(n)
        assert abs(float(m["loss"]) - float(ref_m["loss"])) < 1e-5
        assert abs(float(m["acc"]) - float(ref_m["acc"])) < 1e-4
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(st.params)):
            # AdamW's eps nonlinearity amplifies micro-sum reassociation
            # noise over 3 steps — tolerance covers that, not math drift
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_grad_accum_bf16_carry_close_to_fp32():
    """accum_dtype=bfloat16 (the round-5 perf-lab lever: halves the
    micro-grad carry's HBM traffic) must track the fp32-carry step to
    bf16 rounding — same math, coarser accumulator — and return grads
    in the params' dtype either way."""
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    lora = LoraConfig(rank=0)
    x = jax.random.normal(jax.random.key(1), (8, 3, 16, 16))
    y = jnp.array([0, 1, 2, 3, 4, 5, 0, 1])

    def run(dt):
        params = init_vit_params(jax.random.key(0), CFG, lora)
        opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
        state = PretrainState.create(params, opt)
        step = make_pretrain_step(CFG, lora, opt, compute_dtype=jnp.float32,
                                  grad_accum=4, accum_dtype=dt)
        state, m = step(state, x, y, jnp.float32(1e-3), jax.random.key(0))
        return state, m

    ref, mref = run(jnp.float32)
    st, m = run(jnp.bfloat16)
    # loss metric itself rides the bf16 carry: ~1e-2 relative rounding
    assert abs(float(m["loss"]) - float(mref["loss"])) < 2e-2 * max(
        1.0, abs(float(mref["loss"])))
    for a, b in zip(jax.tree.leaves(ref.params), jax.tree.leaves(st.params)):
        assert a.dtype == b.dtype
        # atol 2*lr: AdamW's g/sqrt(v) normalization can turn one
        # bf16-rounded micro-grad into an O(lr) update flip on a leaf
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=2e-3)


def test_grad_accum_lora_only_and_indivisible():
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), CFG, lora)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    state = PretrainState.create(params, opt, lora_only=True)
    step = make_pretrain_step(CFG, lora, opt, compute_dtype=jnp.float32,
                              lora_only=True, grad_accum=2)
    x = jax.random.normal(jax.random.key(1), (4, 3, 16, 16))
    y = jnp.array([0, 1, 2, 3])
    state, m = step(state, x, y, jnp.float32(1e-3), jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    np.testing.assert_array_equal(
        np.asarray(params["base"]["patch"]["kernel"]),
        np.asarray(state.params["base"]["patch"]["kernel"]))
    # an indivisible (ragged unpadded tail) batch falls back to one
    # unaccumulated full-batch call instead of raising mid-run
    state0 = PretrainState.create(params, opt, lora_only=True)
    step3 = make_pretrain_step(CFG, lora, opt, compute_dtype=jnp.float32,
                               lora_only=True, grad_accum=3)
    step1 = make_pretrain_step(CFG, lora, opt, compute_dtype=jnp.float32,
                               lora_only=True, grad_accum=1)
    s3, m3 = step3(state0, x, y, jnp.float32(1e-3), jax.random.key(0))
    s1, m1 = step1(state0, x, y, jnp.float32(1e-3), jax.random.key(0))
    assert float(m3["loss"]) == float(m1["loss"])
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s3.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_padded_tail_weighting():
    """With mask_padding sentinels (-1), accumulation must weight each
    micro slice by its VALID count so the update equals the full-batch
    masked mean — including when one slice is ALL padding (ADVICE r3:
    per-micro mean averaging gave tail samples up to (B/n)x weight and
    deflated updates on all-pad slices)."""
    from gslora_tpu.engine.pretrain import PretrainState, make_pretrain_step
    lora = LoraConfig(rank=0)
    x = jax.random.normal(jax.random.key(1), (8, 3, 16, 16))
    # 3 valid samples, unevenly split across 4 micro slices of 2:
    # [0,1] [2,-1] [-1,-1] [-1,-1]
    y = jnp.array([0, 1, 2, -1, -1, -1, -1, -1])

    def run(n):
        params = init_vit_params(jax.random.key(0), CFG, lora)
        opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
        state = PretrainState.create(params, opt)
        step = make_pretrain_step(CFG, lora, opt, compute_dtype=jnp.float32,
                                  grad_accum=n)
        return step(state, x, y, jnp.float32(1e-3), jax.random.key(0))

    ref_state, ref_m = run(1)
    for n in (2, 4):
        st, m = run(n)
        assert abs(float(m["loss"]) - float(ref_m["loss"])) < 1e-6
        assert abs(float(m["acc"]) - float(ref_m["acc"])) < 1e-4
        for a, b in zip(jax.tree.leaves(ref_state.params),
                        jax.tree.leaves(st.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)


def test_grad_accum_flag_parses():
    from gslora_tpu.config import build_parser, config_from_args
    a = build_parser().parse_args(["-b", "16", "--grad_accum", "4"])
    assert config_from_args(a).optim.grad_accum == 4


def _forget_accum_run(n, bnd=10.0, yf=None, yr=None, proto_w=0.1,
                      fused=False, rank=4, steps=2, bnd_pro=18.0):
    lora = LoraConfig(rank=rank)
    fcfg = ForgetConfig(alpha_epoch=0, prototype=proto_w > 0)
    params = init_vit_params(jax.random.key(0), CFG, lora)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    trainable = "lora" if rank else "base"
    state = ForgetState.create(params, opt, trainable=trainable)
    step = make_forget_step(CFG, lora, fcfg, opt, compute_dtype=jnp.float32,
                            use_prototype=proto_w > 0, fused_batch=fused,
                            trainable=trainable, grad_accum=n)
    xf = jax.random.normal(jax.random.key(1), (8, 3, 16, 16))
    xr = jax.random.normal(jax.random.key(2), (8, 3, 16, 16))
    yf = jnp.array([4, 5, 4, 5, 4, 5, 4, 5]) if yf is None else yf
    yr = jnp.array([0, 1, 2, 3, 0, 1, 2, 3]) if yr is None else yr
    protos = jax.random.normal(jax.random.key(3), (6, 32))
    sc = {k: jnp.float32(v) for k, v in dict(
        beta=0.3, alpha=0.01, lr=1e-3, bnd=bnd, bnd_pro=bnd_pro,
        w_pro_f=proto_w, w_pro_r=proto_w).items()}
    m = None
    for i in range(steps):
        state, m = step(state, xf, yf, xr, yr, protos, sc, jax.random.key(i))
    return state, m


def _assert_forget_states_match(ref, got, rtol=1e-4, atol=1e-6):
    ref_state, ref_m = ref
    got_state, got_m = got
    for k in ref_m:
        assert abs(float(got_m[k]) - float(ref_m[k])) < \
            1e-4 * max(1.0, abs(float(ref_m[k]))), \
            (k, float(got_m[k]), float(ref_m[k]))
    for a, b in zip(jax.tree.leaves((ref_state.lora, ref_state.base)),
                    jax.tree.leaves((got_state.lora, got_state.base))):
        # AdamW's eps nonlinearity amplifies micro-sum reassociation noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("fused", [False, True])
def test_forget_grad_accum_matches_full_batch(fused):
    """grad_accum on the DUAL-batch forget step == the full-batch step:
    the two-phase gate scheme (engine/forget._accum_grads) must reproduce
    the bounded-CE + hinged-prototype + group-Lasso gradient exactly
    (fp32, dropout off), in both forward layouts."""
    ref = _forget_accum_run(1, fused=fused)
    for n in (2, 4):
        _assert_forget_states_match(ref, _forget_accum_run(n, fused=fused))


def test_forget_grad_accum_gate_straddle():
    """The case naive per-micro loss averaging gets WRONG: micro-level
    forget-CEs straddling BND (relu gating each micro separately) must not
    change the gradient — the gate is a function of the GLOBAL mean.
    Constructed by measuring the per-micro CEs and placing BND strictly
    between them (global gate ON, one micro's local gate would be OFF),
    then the reverse (global gate OFF while a local one would be ON)."""
    from gslora_tpu.losses.classification import cross_entropy
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), CFG, lora)
    xf = jax.random.normal(jax.random.key(1), (8, 3, 16, 16))
    # labels chosen per-half so the two micro slices (n=2) have different
    # CEs: first half "easy" duplicated labels, second half spread
    yf = jnp.array([4, 4, 4, 4, 5, 3, 2, 1])
    logits, _ = vit_apply(params, xf, yf, CFG, lora, train=False,
                          compute_dtype=jnp.float32)
    ce = [float(cross_entropy(logits[i * 4:(i + 1) * 4],
                              yf[i * 4:(i + 1) * 4])) for i in range(2)]
    ce_lo, ce_hi = sorted(ce)
    ce_all = float(cross_entropy(logits, yf))  # equal counts: the average
    assert ce_lo < ce_all < ce_hi and ce_hi - ce_lo > 1e-4, \
        "need distinct micro CEs for the straddle"
    for bnd in ((ce_all + ce_hi) / 2,   # global gate ON, hi-micro's OFF
                (ce_lo + ce_all) / 2):  # global gate OFF, lo-micro's ON
        ref = _forget_accum_run(1, bnd=bnd, yf=yf, steps=1)
        _assert_forget_states_match(
            ref, _forget_accum_run(2, bnd=bnd, yf=yf, steps=1))


def test_forget_grad_accum_padded_and_base():
    """Padding sentinels spread unevenly over micro slices (incl. an
    all-padding slice) weight by GLOBAL valid counts; the rank-0
    train-all-parameters path accumulates over the base tree."""
    yf = jnp.array([4, 5, 4, -1, -1, -1, -1, -1])
    yr = jnp.array([0, 1, 2, 3, 0, -1, -1, -1])
    ref = _forget_accum_run(1, yf=yf, yr=yr)
    for n in (2, 4):
        _assert_forget_states_match(ref, _forget_accum_run(n, yf=yf, yr=yr))
    ref0 = _forget_accum_run(1, rank=0, proto_w=0.0, steps=1)
    _assert_forget_states_match(
        ref0, _forget_accum_run(2, rank=0, proto_w=0.0, steps=1))


def test_forget_grad_accum_indivisible_falls_back():
    """A stream not divisible by grad_accum runs the unaccumulated path
    bit-exactly (trace-time static-shape branch)."""
    lora = LoraConfig(rank=4)
    fcfg = ForgetConfig(alpha_epoch=0)
    params = init_vit_params(jax.random.key(0), CFG, lora)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    xf = jax.random.normal(jax.random.key(1), (6, 3, 16, 16))
    xr = jax.random.normal(jax.random.key(2), (4, 3, 16, 16))
    yf = jnp.array([4, 5, 4, 5, 4, 5])
    yr = jnp.array([0, 1, 2, 3])
    protos = jnp.zeros((6, 32))
    sc = {k: jnp.float32(v) for k, v in dict(
        beta=0.3, alpha=0.01, lr=1e-3, bnd=10.0, bnd_pro=18.0,
        w_pro_f=0.0, w_pro_r=0.0).items()}
    outs = []
    for n in (1, 4):  # 4 divides the remain stream (4) but not forget (6)
        state = ForgetState.create(params, opt)
        step = make_forget_step(CFG, lora, fcfg, opt,
                                compute_dtype=jnp.float32,
                                use_prototype=False, grad_accum=n)
        outs.append(step(state, xf, yf, xr, yr, protos, sc,
                         jax.random.key(0)))
    assert float(outs[0][1]["loss_total"]) == float(outs[1][1]["loss_total"])
    for a, b in zip(jax.tree.leaves(outs[0][0].lora),
                    jax.tree.leaves(outs[1][0].lora)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
