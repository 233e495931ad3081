"""Baseline zoo: importance estimation, reg/distill/SCRUB/LIRF smoke +
behavioral checks on tiny synthetic data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.baselines.distill import der_loss, fdr_loss, run_distill_task
from gslora_tpu.baselines.lirf import run_lirf_task
from gslora_tpu.baselines.regularization import (estimate_importance,
                                                 run_regularization_task)
from gslora_tpu.baselines.scrub import param_dist, run_scrub_task, swa_update
from gslora_tpu.config import (BaselineConfig, DataConfig, ForgetConfig,
                               LoraConfig, OptimConfig, RunConfig, ViTConfig)
from gslora_tpu.data.pipeline import BatchLoader, CyclingLoader
from gslora_tpu.data.splits import make_order_list, random_relabel, \
    split_by_class_window
from gslora_tpu.data.synthetic import synthetic_face_dataset
from gslora_tpu.engine.pretrain import pretrain
from gslora_tpu.models.vit import init_vit_params

MODEL = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                  dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                  emb_dropout=0.0, head_type="Softmax")
LORA = LoraConfig(rank=0)


@pytest.fixture(scope="module")
def setup():
    train = synthetic_face_dataset(num_classes=6, per_class=12,
                                   image_size=16, seed=0, noise=1.2)
    test = synthetic_face_dataset(num_classes=6, per_class=6, image_size=16,
                                  seed=99, noise=1.2)
    cfg = RunConfig(model=MODEL, lora=LORA,
                    optim=OptimConfig(lr=3e-3, warmup_epochs=0, epochs=30),
                    data=DataConfig(batch_size=16))
    params = init_vit_params(jax.random.key(0), MODEL, LORA)
    state, _ = pretrain(cfg, params,
                        lambda: BatchLoader(train, 16, seed=3, prefetch=0),
                        epochs=10, compute_dtype=jnp.float32, lr=3e-3)
    order = make_order_list(6, seed=1337)
    remain_tr, forget_tr = split_by_class_window(train, order, 0, 4, 4, 6)
    remain_te, forget_te = split_by_class_window(test, order, 0, 4, 4, 6)
    return state.params, forget_tr, remain_tr, forget_te, remain_te


def _cfg(method, epochs=6, lr=1e-3):
    return RunConfig(
        model=MODEL, lora=LORA,
        optim=OptimConfig(opt="adamw", lr=lr, warmup_epochs=0,
                          epochs=epochs),
        forget=ForgetConfig(per_forget_cls=2),
        baseline=BaselineConfig(method=method, der_lambda=0.1,
                                fdr_lambda=0.1, scrub_superepoch=2,
                                sgda_learning_rate=5e-4),
        data=DataConfig(batch_size=8),
        num_epoch=epochs, ver_freq=10_000, compute_dtype="float32")


def _loaders(forget_tr, remain_tr, forget_te, remain_te, relabel=True):
    f_ds = random_relabel(forget_tr, 6, seed=0) if relabel else forget_tr
    fl = BatchLoader(f_ds, 8, seed=1)
    rl = BatchLoader(remain_tr, 8, seed=2)
    tbf = lambda: BatchLoader(forget_te, 24, shuffle=False, prefetch=0)  # noqa: E731
    tbr = lambda: BatchLoader(remain_te, 24, shuffle=False, prefetch=0)  # noqa: E731
    return fl, rl, tbf, tbr


def test_importance_estimation(setup):
    params, forget_tr, remain_tr, *_ = setup
    batches = list(BatchLoader(remain_tr, 16, shuffle=False, prefetch=0))
    imp_l2 = estimate_importance("l2", params, batches, MODEL, LORA,
                                 jnp.float32)
    assert all(float(jnp.all(leaf == 1.0)) for leaf in
               jax.tree.leaves(imp_l2))
    imp_ewc = estimate_importance("ewc", params, batches, MODEL, LORA,
                                  jnp.float32)
    total = sum(float(jnp.sum(leaf)) for leaf in jax.tree.leaves(imp_ewc))
    assert np.isfinite(total) and total >= 0
    imp_mas = estimate_importance("mas", params, batches, MODEL, LORA,
                                  jnp.float32)
    assert all(float(jnp.min(leaf)) >= 0 for leaf in
               jax.tree.leaves(imp_mas))


def test_ewc_task_forgets_via_relabeling(setup):
    params, forget_tr, remain_tr, forget_te, remain_te = setup
    fl, rl, tbf, tbr = _loaders(forget_tr, remain_tr, forget_te, remain_te)
    cfg = _cfg("ewc", epochs=8)
    anchors = [params]
    imps = [estimate_importance(
        "ewc", params, list(BatchLoader(remain_tr, 16, shuffle=False,
                                        prefetch=0)), MODEL, LORA,
        jnp.float32)]
    out = run_regularization_task(
        cfg, params, lambda: iter(fl), tbf, tbr, lam=1.0,
        anchors=anchors, importances=imps)
    assert out["forget_acc"] < out["forget_acc_before"]
    assert np.isfinite(out["best_h"])


def test_ewc_penalty_protects_remain(setup):
    """The EWC mechanism certificate: with a strong penalty, remain
    accuracy survives relabeled-forget training far better than with
    lambda=0 (requires an UNSATURATED model — Softmax head + overlapping
    blobs — so the grad^2 importance is non-trivial; on saturated CosFace
    synthetic data the importance is ~0 and nothing can protect remain,
    see BASELINE.md)."""
    params, forget_tr, remain_tr, forget_te, remain_te = setup
    imps = [estimate_importance(
        "ewc", params, list(BatchLoader(remain_tr, 16, shuffle=False,
                                        prefetch=0)), MODEL, LORA,
        jnp.float32)]
    total = sum(float(jnp.sum(leaf)) for leaf in jax.tree.leaves(imps[0]))
    assert total > 0  # non-trivial importance on unsaturated model

    def run(lam):
        # lr/epochs high enough that unregularized relabel training wrecks
        # the whole model within the budget — re-tuned for the round-5
        # frozen-head default (cl.py:426 parity): with the head pinned the
        # unprotected collapse needs more steps (16 ep lr 5e-2 ->
        # unprotected ~17% vs protected ~50% on this toy)
        fl, _, tbf, tbr = _loaders(forget_tr, remain_tr, forget_te,
                                   remain_te)
        out = run_regularization_task(
            _cfg("ewc", epochs=16, lr=5e-2), params, lambda: iter(fl),
            tbf, tbr, lam=lam, anchors=[params], importances=imps)
        return out["remain_acc"]

    unprotected = run(0.0)
    protected = run(3e4)
    assert protected > unprotected + 10.0, (protected, unprotected)


def test_retrain_on_remain_only(setup):
    params, forget_tr, remain_tr, forget_te, remain_te = setup
    _, rl, tbf, tbr = _loaders(forget_tr, remain_tr, forget_te, remain_te)
    cfg = _cfg("retrain", epochs=4)
    from gslora_tpu.models.vit import init_vit_params as fresh
    out = run_regularization_task(
        cfg, fresh(jax.random.key(42), MODEL, LORA), lambda: iter(rl),
        tbf, tbr, lam=0.0, anchors=[], importances=[])
    # fresh model trained on remain only: forget acc ~ chance
    assert out["forget_acc"] < 60.0
    assert out["remain_acc"] > 60.0


@pytest.mark.parametrize("method", ["lwf", "der", "der_plus", "fdr"])
def test_distill_family(setup, method):
    params, forget_tr, remain_tr, forget_te, remain_te = setup
    fl, rl, tbf, tbr = _loaders(forget_tr, remain_tr, forget_te, remain_te)
    cfg = _cfg(method, epochs=6)
    out = run_distill_task(cfg, params, params, lambda: iter(fl),
                           CyclingLoader(rl), tbf, tbr)
    assert np.isfinite(out["best_h"])
    assert out["forget_acc"] < out["forget_acc_before"] + 1e-6


def test_lwf_faithful_zero_kd(setup):
    """--lwf_faithful_zero_kd reproduces the reference's self-zeroing KD
    term (Lwftrain.py:16-24): loss_KD is identically 0 and the update
    equals an LwF step with lambda_kd=0."""
    from gslora_tpu.baselines.distill import make_distill_step
    from gslora_tpu.engine.pretrain import PretrainState
    from gslora_tpu.engine.state import make_optimizer
    params, forget_tr, remain_tr, _, _ = setup
    fl, rl, _, _ = _loaders(forget_tr, remain_tr, forget_tr, remain_tr)
    xf, yf = next(iter(fl))
    xr, yr = next(iter(rl))
    hp = {"T": 2.0, "lambda_kd": 0.5, "lambda_remain": 1.0,
          "lambda_der": 0.1, "lambda_der_plus": 0.1, "lambda_fdr": 0.1}
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))

    def one(faithful, lam_kd):
        h = dict(hp, lambda_kd=lam_kd)
        step = make_distill_step("lwf", MODEL, LORA, opt, h,
                                 compute_dtype=jnp.float32,
                                 faithful_zero_kd=faithful)
        st = PretrainState.create(params, opt)
        st2, m = step(st, params, xf, yf, xr, yr, xr, yr,
                      jnp.float32(1e-3), jax.random.key(0))
        return st2, m

    st_f, m_f = one(True, 0.5)
    st_0, m_0 = one(False, 0.0)
    assert float(m_f["loss_KD"]) == 0.0
    assert float(m_0["loss_KD"]) > 0.0  # intended loss is live
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
                 st_f.params, st_0.params)

    # CLI plumbing: flag -> BaselineConfig; --si warns (no-op parity)
    import warnings
    from gslora_tpu.config import build_parser, config_from_args
    a = build_parser().parse_args(
        ["--Lwf", "--lwf_faithful_zero_kd", "--si", "--data_mode",
         "synthetic"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = config_from_args(a)
    assert cfg.baseline.lwf_faithful_zero_kd is True
    assert any("--si" in str(x.message) for x in w)


def test_scrub(setup):
    params, forget_tr, remain_tr, forget_te, remain_te = setup
    # SCRUB uses true labels and the FULL (unsubsampled) forget set
    fl = BatchLoader(forget_tr, 8, seed=1)
    rl = BatchLoader(remain_tr, 8, seed=2)
    tbf = lambda: BatchLoader(forget_te, 24, shuffle=False, prefetch=0)  # noqa: E731
    tbr = lambda: BatchLoader(remain_te, 24, shuffle=False, prefetch=0)  # noqa: E731
    cfg = RunConfig(
        model=MODEL, lora=LORA,
        baseline=BaselineConfig(method="scrub", scrub_superepoch=5,
                                sgda_learning_rate=2e-3, sgda_gamma=0.99,
                                sgda_alpha=0.001),
        data=DataConfig(batch_size=8), compute_dtype="float32")
    out = run_scrub_task(cfg, params, lambda: iter(fl), lambda: iter(rl),
                         tbf, tbr)
    # max/min KD schedule escapes the student==teacher saddle and forgets
    assert out["forget_acc"] < out["forget_acc_before"]
    assert out["remain_acc"] > 80.0
    assert out["best_h"] > 0


def test_lirf(setup):
    params, forget_tr, remain_tr, forget_te, remain_te = setup
    fl, rl, tbf, tbr = _loaders(forget_tr, remain_tr, forget_te, remain_te)
    cfg = _cfg("lirf", epochs=4)
    out = run_lirf_task(cfg, params, lambda: iter(fl), CyclingLoader(rl),
                        tbf, tbr, num_epoch=4)
    assert np.isfinite(out["best_h"])
    assert "student_low" in out and "deposit_low" in out


def test_lirf_merges_lora_into_teacher(setup):
    """A LoRA-carrying pretrained model must enter LIRF as the MERGED
    backbone: facc_before equals the merged model's accuracy, not the
    adapter-stripped base's."""
    from gslora_tpu.engine.ema import merged_params
    from gslora_tpu.engine.evaluate import eval_accuracy, make_eval_step
    from gslora_tpu.lora.core import init_lora

    params, forget_tr, remain_tr, forget_te, remain_te = setup
    lora4 = LoraConfig(rank=4)
    # graft nonzero adapters onto the pretrained base so merged != base
    lt = init_lora(jax.random.key(5), MODEL, lora4)
    lt = jax.tree.map(lambda a: a + 0.05, lt)  # B != 0 -> real deltas
    p4 = {"base": params["base"], "lora": lt}
    cfg = RunConfig(model=MODEL, lora=lora4,
                    optim=OptimConfig(opt="adamw", lr=1e-3,
                                      warmup_epochs=0, epochs=1),
                    forget=ForgetConfig(per_forget_cls=2),
                    baseline=BaselineConfig(method="lirf"),
                    data=DataConfig(batch_size=8), num_epoch=1,
                    ver_freq=10_000, compute_dtype="float32")
    fl, rl, tbf, tbr = _loaders(forget_tr, remain_tr, forget_te, remain_te)
    out = run_lirf_task(cfg, p4, lambda: iter(fl), CyclingLoader(rl),
                        tbf, tbr, num_epoch=0)
    ev = make_eval_step(MODEL, lora4, compute_dtype=jnp.float32)
    merged = {"base": merged_params(params["base"], lt, lora4.scaling),
              "lora": {}}
    want = eval_accuracy(ev, merged, tbf())
    assert abs(out["forget_acc_before"] - want) < 1e-6


def test_lirf_eval_ignores_pad_rows(setup):
    """lirf_eval_accuracy on padded static-shape loaders must divide by
    the VALID count (regression: 100 correct / 240-padded-batch read as
    41.7%)."""
    from gslora_tpu.baselines.lirf import lirf_eval_accuracy
    params, _, _, forget_te, _ = setup
    base = params["base"]
    plain = lirf_eval_accuracy(
        base, base, BatchLoader(forget_te, 5, shuffle=False, prefetch=0),
        MODEL, LORA, jnp.float32)
    padded = lirf_eval_accuracy(
        base, base, BatchLoader(forget_te, 9, shuffle=False, prefetch=0,
                                mask_padding=True),
        MODEL, LORA, jnp.float32)
    assert abs(plain - padded) < 1e-6


def test_scrub_helpers():
    a = {"w": jnp.ones((2, 2))}
    b = {"w": jnp.zeros((2, 2))}
    assert abs(float(param_dist(a, b, 0.5)) - 0.5 * 2.0) < 1e-6
    assert float(param_dist(a, b, 0.0)) == 0.0
    # first swa update copies
    swa = swa_update(b, a, n_averaged=0)
    np.testing.assert_allclose(np.asarray(swa["w"]), 1.0)
    swa = swa_update(b, a, n_averaged=1, beta=0.1)
    np.testing.assert_allclose(np.asarray(swa["w"]), 0.1)


def test_der_fdr_loss_shapes():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(4, 8).astype(np.float32))
    # DER: squared frobenius SUM (not mean)
    assert abs(float(der_loss(a, b)) -
               float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))) < 1e-4
    # FDR: mean of row-wise L2
    want = float(np.mean(np.linalg.norm(np.asarray(a) - np.asarray(b),
                                        axis=1)))
    assert abs(float(fdr_loss(a, b)) - want) < 1e-5


# ---------------------------------------------------------------------------
# grad accumulation on the baseline steps (round 4): EVERY family
# accumulates EXACTLY — reg/SCRUB reuse engine.pretrain._accumulated
# (masked-mean + data-independent terms), distill and LIRF use per-stream
# linear surrogates (DER's term is a SUM, the means normalize over
# different streams, so single-stream valid-count reweighting does not
# apply; LIRF's five terms are per-stream masked means, grads through
# student_low only).

def _ga_params(seed=0):
    return init_vit_params(jax.random.key(seed), MODEL, LORA)


def _ga_batch(seed, pad=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(8, 3, 16, 16).astype(np.float32))
    y = np.asarray(rng.randint(0, 6, size=8), dtype=np.int32)
    if pad:
        y[-pad:] = -1  # mask_padding sentinel, unevenly split over micros
    return x, jnp.asarray(y)


def _assert_trees_close(a, b, rtol=2e-5, atol=1e-7):
    for p, q in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   rtol=rtol, atol=atol)


@pytest.mark.parametrize("pad", [0, 3])
def test_reg_step_grad_accum_matches(pad):
    from gslora_tpu.baselines.regularization import make_reg_step
    from gslora_tpu.engine.pretrain import PretrainState
    from gslora_tpu.engine.state import make_optimizer
    params = _ga_params()
    anchors = (jax.tree.map(lambda t: t + 0.01, params),)
    imps = (jax.tree.map(jnp.ones_like, params),)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    x, y = _ga_batch(1, pad=pad)
    outs = []
    for n in (1, 2, 4):
        step = make_reg_step(MODEL, LORA, opt, n_terms=1,
                             compute_dtype=jnp.float32, grad_accum=n)
        st, m = step(PretrainState.create(params, opt), x, y, anchors,
                     imps, jnp.float32(0.1), jnp.float32(1e-3),
                     jax.random.key(0))
        outs.append((st, m))
    for st, m in outs[1:]:
        assert abs(float(m["loss_total"]) -
                   float(outs[0][1]["loss_total"])) < 1e-5
        _assert_trees_close(outs[0][0].params, st.params)


@pytest.mark.parametrize("pad", [0, 3])
def test_scrub_steps_grad_accum_match(pad):
    from gslora_tpu.baselines.scrub import make_scrub_steps
    from gslora_tpu.engine.pretrain import PretrainState
    from gslora_tpu.engine.state import make_optimizer
    params = _ga_params()
    teacher = jax.tree.map(lambda t: t + 0.02, params)
    swa = jax.tree.map(lambda t: t + 0.01, params)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    x, y = _ga_batch(2, pad=pad)
    for which in (0, 1):  # max step, min step
        ref = None
        for n in (1, 2):
            step = make_scrub_steps(MODEL, LORA, opt, kd_T=4.0,
                                    smoothing=0.01, gamma=0.99, alpha=0.5,
                                    compute_dtype=jnp.float32,
                                    grad_accum=n)[which]
            st, m = step(PretrainState.create(params, opt), teacher, swa,
                         x, y, jnp.float32(1e-3), jax.random.key(0))
            if ref is None:
                ref = (st, m)
            else:
                for k in ref[1]:
                    assert abs(float(m[k]) - float(ref[1][k])) < \
                        1e-5 * max(1.0, abs(float(ref[1][k]))), (which, k)
                # SCRUB's -KD ascent gradient is tiny at init (student
                # near teacher), so AdamW's eps nonlinearity amplifies
                # micro-sum reassociation noise more than the other
                # families — same convention as test_variants'
                # _assert_forget_states_match
                _assert_trees_close(ref[0].params, st.params,
                                    rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("method", ["lwf", "der", "der_plus", "fdr"])
def test_distill_step_grad_accum_matches(method):
    """The linear-surrogate scheme: DER's SUM term, per-stream global
    counts (incl. a padded remain stream whose sentinels split unevenly
    over micro slices), DER++'s third stream."""
    from gslora_tpu.baselines.distill import make_distill_step
    from gslora_tpu.engine.pretrain import PretrainState
    from gslora_tpu.engine.state import make_optimizer
    params = _ga_params()
    teacher = jax.tree.map(lambda t: t + 0.02, params)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    xf, yf = _ga_batch(3)
    xr, yr = _ga_batch(4, pad=3)
    xr2, yr2 = _ga_batch(5, pad=1)
    hp = {"T": 2.0, "lambda_kd": 0.5, "lambda_remain": 1.0,
          "lambda_der": 0.1, "lambda_der_plus": 0.2, "lambda_fdr": 0.1}
    ref = None
    for n in (1, 2, 4):
        step = make_distill_step(method, MODEL, LORA, opt, hp,
                                 compute_dtype=jnp.float32, grad_accum=n)
        st, m = step(PretrainState.create(params, opt), teacher, xf, yf,
                     xr, yr, xr2, yr2, jnp.float32(1e-3), jax.random.key(0))
        if ref is None:
            ref = (st, m)
        else:
            assert set(m) == set(ref[1]), method
            for k in ref[1]:
                assert abs(float(m[k]) - float(ref[1][k])) < \
                    1e-4 * max(1.0, abs(float(ref[1][k]))), (method, k)
            _assert_trees_close(ref[0].params, st.params)


def test_distill_step_grad_accum_indivisible_falls_back():
    from gslora_tpu.baselines.distill import make_distill_step
    from gslora_tpu.engine.pretrain import PretrainState
    from gslora_tpu.engine.state import make_optimizer
    params = _ga_params()
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    xf, yf = _ga_batch(3)
    xf, yf = xf[:6], yf[:6]  # 6 % 4 != 0 -> unaccumulated path
    xr, yr = _ga_batch(4)
    hp = {"lambda_der": 0.1}
    outs = []
    for n in (1, 4):
        step = make_distill_step("der", MODEL, LORA, opt, hp,
                                 compute_dtype=jnp.float32, grad_accum=n)
        outs.append(step(PretrainState.create(params, opt), params, xf, yf,
                         xr, yr, xr, yr, jnp.float32(1e-3),
                         jax.random.key(0)))
    assert float(outs[0][1]["loss_total"]) == float(outs[1][1]["loss_total"])
    for a, b in zip(jax.tree.leaves(outs[0][0].params),
                    jax.tree.leaves(outs[1][0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("pad", [0, 3])
def test_lirf_step_grad_accum_matches(pad):
    """LIRF's per-stream linear surrogate (all five terms are masked
    means over the forget or remain stream; grads flow through
    student_low only)."""
    from gslora_tpu.baselines.lirf import (LIRFState, low_slice,
                                           make_lirf_step)
    from gslora_tpu.engine.state import make_optimizer
    base = _ga_params()["base"]
    teacher = base
    half = MODEL.depth // 2
    student_low = low_slice(jax.tree.map(lambda t: t + 0.01, base), half)
    deposit_low = low_slice(base, half)
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-3))
    xf, yf = _ga_batch(6, pad=pad)
    xr, yr = _ga_batch(7, pad=pad and 1)
    ref = None
    for n in (1, 2, 4):
        step = make_lirf_step(MODEL, LORA, opt, split=2, T=4.0, alpha=0.1,
                              compute_dtype=jnp.float32, grad_accum=n)
        st = LIRFState(student_low=student_low, deposit_low=deposit_low,
                       opt_state=opt.init(student_low), step=jnp.int32(0))
        st, m = step(st, teacher, xf, yf, xr, yr, jnp.float32(1e-3),
                     jax.random.key(0))
        if ref is None:
            ref = (st, m)
        else:
            assert set(m) == set(ref[1])
            for k in ref[1]:
                assert abs(float(m[k]) - float(ref[1][k])) < \
                    1e-4 * max(1.0, abs(float(ref[1][k]))), (k,)
            _assert_trees_close(ref[0].student_low, st.student_low,
                                rtol=1e-4, atol=1e-6)


def test_baseline_head_frozen_by_default(setup):
    """Reference parity (round-5 fix, baselines/freeze.py): every CL
    baseline branch freezes the margin head unless --ffn_open
    (cl.py:426) — the head must be BIT-unchanged through reg/distill/
    SCRUB steps by default, train under ffn_open, and --only_ffn must
    narrow training to the FFN Linears + head."""
    import dataclasses

    from gslora_tpu.baselines.distill import make_distill_step
    from gslora_tpu.baselines.regularization import make_reg_step
    from gslora_tpu.baselines.scrub import make_scrub_steps
    from gslora_tpu.engine.pretrain import PretrainState
    from gslora_tpu.engine.state import make_optimizer

    params = setup[0]
    opt = make_optimizer(OptimConfig(opt="adamw", lr=1e-2))
    x = jax.random.normal(jax.random.key(3), (8, 3, 16, 16))
    y = jnp.arange(8, dtype=jnp.int32) % 6

    def changed(a, b):
        return {
            "head": bool(jnp.any(a["base"]["head"]["weight"] !=
                                 b["base"]["head"]["weight"])),
            "fc1": bool(jnp.any(a["base"]["blocks"]["fc1"]["kernel"] !=
                                b["base"]["blocks"]["fc1"]["kernel"])),
            "qkv": bool(jnp.any(a["base"]["blocks"]["qkv"]["kernel"] !=
                                b["base"]["blocks"]["qkv"]["kernel"])),
        }

    def run_reg(freeze):
        step = make_reg_step(MODEL, LORA, opt, 0, compute_dtype=jnp.float32,
                             freeze=freeze)
        s = PretrainState.create(params, opt)
        s, _ = step(s, x, y, (), (), jnp.float32(0.0), jnp.float32(1e-2),
                    jax.random.key(0))
        return changed(params, s.params)

    # default: head frozen, backbone trains
    c = run_reg({"ffn_open": False, "only_ffn": False, "imagenet": False})
    assert c == {"head": False, "fc1": True, "qkv": True}, c
    # --ffn_open: head trains
    c = run_reg({"ffn_open": True, "only_ffn": False, "imagenet": False})
    assert c == {"head": True, "fc1": True, "qkv": True}, c
    # imagenet100 freezes the head unconditionally
    c = run_reg({"ffn_open": True, "only_ffn": False, "imagenet": True})
    assert c == {"head": False, "fc1": True, "qkv": True}, c
    # --only_ffn: FFN Linears + head only
    c = run_reg({"ffn_open": False, "only_ffn": True, "imagenet": False})
    assert c == {"head": True, "fc1": True, "qkv": False}, c

    # distill + SCRUB steps honor the same freeze
    freeze = {"ffn_open": False, "only_ffn": False, "imagenet": False}
    hp = {"T": 2.0, "lambda_kd": 0.5, "lambda_remain": 1.0}
    dstep = make_distill_step("lwf", MODEL, LORA, opt, hp,
                              compute_dtype=jnp.float32, freeze=freeze)
    s = PretrainState.create(params, opt)
    s, _ = dstep(s, params, x, y, x, y, x, y, jnp.float32(1e-2),
                 jax.random.key(0))
    c = changed(params, s.params)
    assert c == {"head": False, "fc1": True, "qkv": True}, c

    mx, _mn = make_scrub_steps(MODEL, LORA, opt, 2.0, 0.0, 0.99, 0.001,
                               compute_dtype=jnp.float32, freeze=freeze)
    s = PretrainState.create(params, opt)
    s, _ = mx(s, params, params, x, y, jnp.float32(1e-2), jax.random.key(0))
    c = changed(params, s.params)
    assert c == {"head": False, "fc1": True, "qkv": True}, c
