"""Odds and ends: ViTs soft-split model forward, run-name assembly,
scalars_for_epoch schedules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.config import (ForgetConfig, LoraConfig, OptimConfig,
                               RunConfig, ViTConfig)
from gslora_tpu.engine.forget import scalars_for_epoch
from gslora_tpu.metrics.logging import make_run_name
from gslora_tpu.models.vit import init_vit_params, vit_apply
from gslora_tpu.config import LoraConfig as _L


def test_vits_soft_split_model_forward():
    """ViTs_face config: overlapping unfold patches, same transformer."""
    cfg = ViTConfig(image_size=32, patch_size=8, ac_patch_size=12, pad=4,
                    soft_split=True, dim=32, depth=2, heads=2, dim_head=16,
                    mlp_dim=64, num_class=6, dropout=0.0, emb_dropout=0.0,
                    head_type="CosFace")
    assert cfg.num_patches == 16
    assert cfg.patch_dim == 3 * 144
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora)
    assert params["base"]["patch"]["kernel"].shape == (432, 32)
    x = jax.random.normal(jax.random.key(1), (2, 3, 32, 32))
    logits, emb = vit_apply(params, x, jnp.array([0, 1]), cfg, lora,
                            compute_dtype=jnp.float32)
    assert logits.shape == (2, 6) and emb.shape == (2, 32)
    assert np.isfinite(np.asarray(logits)).all()


def test_scalars_for_epoch_schedules():
    cfg = RunConfig(forget=ForgetConfig(beta=0.15, alpha=0.01,
                                        warmup_alpha=True, big_alpha=0.02,
                                        alpha_epoch=5, beta_decay=True,
                                        small_beta=0.05),
                    optim=OptimConfig())
    s0 = scalars_for_epoch(cfg, 0, lr=1e-2)
    assert float(s0["alpha"]) == 0.0          # warmup: alpha off
    assert float(s0["beta"]) == pytest.approx(0.15)
    s6 = scalars_for_epoch(cfg, 6, lr=1e-2)
    assert float(s6["alpha"]) == pytest.approx(0.02)         # big_alpha after alpha_epoch
    s60 = scalars_for_epoch(cfg, 60, lr=1e-2)
    assert float(s60["beta"]) == pytest.approx(0.05)         # beta decay at epoch >= 50
    # plain gate (no warmup): structure loss off before alpha_epoch
    cfg2 = RunConfig(forget=ForgetConfig(alpha=0.01, alpha_epoch=3))
    assert float(scalars_for_epoch(cfg2, 1, lr=0)["alpha"]) == 0.0
    assert float(scalars_for_epoch(cfg2, 3, lr=0)["alpha"]) == pytest.approx(0.01)
    # per-task overrides
    sb = scalars_for_epoch(cfg2, 3, lr=0, beta=0.4, w_pro_f=0.06)
    assert float(sb["beta"]) == pytest.approx(0.4)
    assert float(sb["w_pro_f"]) == pytest.approx(0.06)


def test_make_run_name():
    """Byte-for-byte the reference assembly (train_own_forget.py:844-877):
    EMA prefix, then few_shot prefix, then the remain-…-alpha… base."""
    cfg = RunConfig(forget=ForgetConfig(prototype=True, few_shot=True,
                                        average_weight=True))
    f = cfg.forget
    name = make_run_name(cfg)
    base = (f"remain-{f.num_of_first_cls}-forget-{f.per_forget_cls}"
            f"-lora_rank-{cfg.lora.rank}beta{f.beta}lr{cfg.optim.lr}"
            f"BND{f.bnd}alpha{f.alpha}")
    expected = (f"EMA{f.ema_decay}-epoch{f.ema_epoch}"
                f"few_shot-{f.few_shot_num}epoch-{cfg.num_epoch}" + base)
    assert name == expected

    cfg2 = RunConfig(forget=ForgetConfig(warmup_alpha=True))
    assert make_run_name(cfg2).endswith(
        f"-warmup_alpha{cfg2.forget.big_alpha}")
    assert make_run_name(cfg2).startswith("remain-")


def test_remat_matches_no_remat():
    import dataclasses
    cfg = ViTConfig(image_size=16, patch_size=8, dim=32, depth=2, heads=2,
                    dim_head=16, mlp_dim=64, num_class=6, dropout=0.0,
                    emb_dropout=0.0, head_type="Softmax")
    lora = LoraConfig(rank=4)
    params = init_vit_params(jax.random.key(0), cfg, lora)
    x = jax.random.normal(jax.random.key(1), (2, 3, 16, 16))
    y = jnp.array([0, 1])

    from gslora_tpu.losses.classification import cross_entropy

    def loss(lt, model):
        logits, _ = vit_apply({"base": params["base"], "lora": lt}, x, y,
                              model, lora, compute_dtype=jnp.float32)
        return cross_entropy(logits, y)

    cfg_r = dataclasses.replace(cfg, remat=True)
    g0 = jax.grad(lambda lt: loss(lt, cfg))(params["lora"])
    g1 = jax.grad(lambda lt: loss(lt, cfg_r))(params["lora"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_param_summary_matches_reference_counts():
    """The flagship ViT-P8S8 depth-6 must hit the reference's exact count
    (19,157,504, train_own_forget.py:658-662) and ~1.19% LoRA fraction."""
    from gslora_tpu.utils.params import count_params, param_summary
    flagship = ViTConfig()  # defaults = ViT-P8S8 depth-6, 100 classes
    params = init_vit_params(jax.random.key(0), flagship, LoraConfig(rank=8))
    s = param_summary(params)
    assert s["base"] == 19_157_504
    assert abs(s["trainable_fraction"] - 0.0119) < 2e-3
    assert count_params(params["lora"]) == s["lora"]


def test_make_run_name_cl_method_prefixes():
    """CL recipe (train_own_forget_cl.py:1764-1807): base stops at lr,
    method prefixes prepend, imagenet100- outermost."""
    from gslora_tpu.config import BaselineConfig, DataConfig

    f = ForgetConfig()
    base = (f"remain-{f.num_of_first_cls}-forget-{f.per_forget_cls}"
            f"-lora_rank-8beta{f.beta}lr")

    cfg = RunConfig(forget=f, baseline=BaselineConfig(method="ewc",
                                                      ewc_lambda=10.0))
    name = make_run_name(cfg, cl=True)
    assert name.startswith("ewc10.0" + base)
    assert "BND" not in name and "alpha" not in name

    cfg = RunConfig(forget=f, baseline=BaselineConfig(method="der_plus",
                                                      der_lambda=0.05))
    assert make_run_name(cfg, cl=True).startswith("DERTrue0.05remain-")

    cfg = RunConfig(forget=f, baseline=BaselineConfig(method="scrub",
                                                      sgda_smoothing=0.0))
    assert make_run_name(cfg, cl=True).startswith("SCRUB0.0remain-")

    cfg = RunConfig(forget=ForgetConfig(few_shot=True),
                    baseline=BaselineConfig(method="lirf"),
                    data=DataConfig(data_mode="imagenet100"))
    name = make_run_name(cfg, cl=True)
    assert name.startswith("imagenet100-few_shot-")
    assert "LIRFremain-" in name

    # gs_lora CL run: plain base, no method prefix
    cfg = RunConfig(forget=f)
    assert make_run_name(cfg, cl=True).startswith("remain-")


def test_topk_accuracy_matches_torch():
    import numpy as np
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from gslora_tpu.losses.classification import topk_accuracy

    rng = np.random.RandomState(0)
    logits = rng.randn(32, 10).astype(np.float32)
    labels = rng.randint(0, 10, 32)

    # reference util/utils.py:354-368 train_accuracy
    out = torch.from_numpy(logits)
    tgt = torch.from_numpy(labels)
    maxk = 5
    _, pred = out.topk(maxk, 1, True, True)
    correct = pred.t().eq(tgt.view(1, -1).expand_as(pred.t()))
    want = [float(correct[:k].reshape(-1).float().sum(0) * (100.0 / 32))
            for k in (1, 5)]

    got = topk_accuracy(jnp.asarray(logits), jnp.asarray(labels),
                        topk=(1, 5))
    np.testing.assert_allclose([float(g) for g in got], want, atol=1e-4)

    # pad sentinel (-1) rows are excluded from the denominator
    labels2 = labels.copy()
    labels2[:8] = -1
    g1, = topk_accuracy(jnp.asarray(logits), jnp.asarray(labels2), topk=(1,))
    pred1 = logits.argmax(1)
    want1 = 100.0 * (pred1[8:] == labels2[8:]).mean()
    np.testing.assert_allclose(float(g1), want1, atol=1e-4)


def test_parallelism_flags_parse_into_mesh_config():
    """--tp/--fsdp/--pp/--pp_micro/--sp/--mesh_slices land in MeshConfig
    (the engines read cfg.mesh.* at placement time)."""
    from gslora_tpu.config import build_parser, config_from_args

    a = build_parser().parse_args(
        ["-b", "16", "--mesh_data", "4", "--mesh_model", "2", "--tp",
         "--fsdp"])
    cfg = config_from_args(a)
    assert cfg.mesh == type(cfg.mesh)(data=4, model=2, tp=True, fsdp=True)

    a = build_parser().parse_args(
        ["-b", "16", "--mesh_model", "2", "--pp", "--pp_micro", "3"])
    cfg = config_from_args(a)
    assert cfg.mesh.pp and cfg.mesh.pp_micro == 3 and not cfg.mesh.tp

    a = build_parser().parse_args(
        ["-b", "16", "--mesh_model", "2", "--sp", "--mesh_slices", "2"])
    cfg = config_from_args(a)
    assert cfg.mesh.sp and cfg.mesh.slices == 2

    a = build_parser().parse_args(["-b", "16"])
    cfg = config_from_args(a)
    assert not (cfg.mesh.tp or cfg.mesh.fsdp or cfg.mesh.pp or cfg.mesh.sp)
    assert cfg.mesh.slices == 1


def test_bench_time_chain_slope_and_noise_guard(monkeypatch):
    """bench._time_chain: the M=1..3 slope must recover the true per-step
    time with the fixed readback cost C cancelled, and the noise guard
    must fall back to the inclusive rate on a non-positive or absurdly
    fast slope (driver-contract surface: bench.py's headline `value`)."""
    import bench

    class _FakeLoss:
        def __float__(self):
            return 0.0

    calls = {"n": 0}

    def fake_multi(state, keys):
        calls["n"] += 1
        return state, [_FakeLoss()]

    def make_clock(walls):
        # _time_chain calls perf_counter twice per timed repeat (start,
        # stop); warmup does not touch the clock. 3 repeats per span.
        seq = []
        for m in bench.CHAIN_SPANS:
            for _ in range(3):
                seq.append((0.0, walls[m]))
        it = iter([t for pair in seq for t in pair])
        return lambda: next(it)

    k, bs, c, step = 10, 8, 0.036, 0.010
    # wall(M) = M*k*step + C
    monkeypatch.setattr(bench.time, "perf_counter",
                        make_clock({1: k * step + c, 3: 3 * k * step + c}))
    slope, incl = bench._time_chain(fake_multi, None, None, bs, k_steps=k)
    dev = jax.device_count()
    np.testing.assert_allclose(slope, bs / step / dev, rtol=1e-9)
    np.testing.assert_allclose(incl, k * bs / (k * step + c) / dev,
                               rtol=1e-9)
    assert slope > incl  # the slope removed the fixed cost

    # non-positive slope (M=3 measured FASTER than M=1): fall back
    monkeypatch.setattr(bench.time, "perf_counter",
                        make_clock({1: 0.5, 3: 0.4}))
    slope, incl = bench._time_chain(fake_multi, None, None, bs, k_steps=k)
    assert slope == incl

    # absurd slope (>1.5x inclusive would imply C > a third of wall(1)
    # at these spans... make it extreme): fall back
    monkeypatch.setattr(bench.time, "perf_counter",
                        make_clock({1: 1.0, 3: 1.001}))
    slope, incl = bench._time_chain(fake_multi, None, None, bs, k_steps=k)
    assert slope == incl
