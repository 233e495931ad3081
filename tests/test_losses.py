"""Loss math parity vs torch re-derivations of the reference formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslora_tpu.losses.classification import (bounded_forget_loss,
                                              cross_entropy, top1_accuracy)
from gslora_tpu.losses.distillation import (attention_transfer_loss,
                                            kd_kl_loss,
                                            lwf_kd_loss)
from gslora_tpu.losses.prototype import hinged_prototype_losses, \
    prototype_loss
from gslora_tpu.losses.regularization import quadratic_penalty


def test_cross_entropy_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    logits = rng.randn(8, 100).astype(np.float32)
    labels = rng.randint(0, 100, 8)
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(ours - want) < 1e-5


def test_bounded_forget_loss_hinge():
    logits = jnp.asarray(np.random.RandomState(1).randn(4, 10)
                         .astype(np.float32))
    labels = jnp.array([0, 1, 2, 3])
    ce = float(cross_entropy(logits, labels))
    assert abs(float(bounded_forget_loss(logits, labels, 110.0)) -
               (110.0 - ce)) < 1e-5
    # saturates at zero once CE clears the bound
    assert float(bounded_forget_loss(logits, labels, 0.0)) == 0.0


def test_prototype_kl_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    emb = rng.randn(6, 32).astype(np.float32)
    protos = rng.randn(10, 32).astype(np.float32)
    labels = rng.randint(0, 10, 6)
    ours = float(prototype_loss(jnp.asarray(emb), jnp.asarray(labels),
                                jnp.asarray(protos), "kl"))
    # torch re-derivation of engine.py:690-722
    te = torch.from_numpy(emb)
    tp = torch.from_numpy(protos[labels])
    want = float(torch.nn.functional.kl_div(
        torch.nn.functional.log_softmax(te, dim=1),
        torch.nn.functional.log_softmax(tp, dim=1),
        reduction="batchmean", log_target=True))
    assert abs(ours - want) < 1e-5

    l2_ours = float(prototype_loss(jnp.asarray(emb), jnp.asarray(labels),
                                   jnp.asarray(protos), "l2"))
    l2_want = float(((emb - protos[labels]) ** 2).mean())
    assert abs(l2_ours - l2_want) < 1e-5


def test_hinged_prototype_combination():
    rng = np.random.RandomState(3)
    emb_f = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    emb_r = jnp.asarray(rng.randn(4, 16).astype(np.float32))
    protos = jnp.asarray(rng.randn(5, 16).astype(np.float32))
    yf, yr = jnp.array([0, 1, 2, 3]), jnp.array([4, 3, 2, 1])
    total, hinge_f, lr = hinged_prototype_losses(
        emb_f, yf, emb_r, yr, protos, w_forget=0.5, w_remain=0.1,
        bnd_pro=18.0)
    lf = float(prototype_loss(emb_f, yf, protos))
    assert abs(float(hinge_f) - max(0.0, 18.0 - lf)) < 1e-5
    assert abs(float(total) - (0.5 * float(hinge_f) + 0.1 * float(lr))) < 1e-5


def test_kd_kl_vs_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(4)
    s = rng.randn(8, 20).astype(np.float32)
    t = rng.randn(8, 20).astype(np.float32)
    T = 2.0
    ours = float(kd_kl_loss(jnp.asarray(s), jnp.asarray(t), T))
    # DistillKL: KLDiv(log_softmax(s/T), softmax(t/T)) * T^2 batchmean
    want = float(torch.nn.functional.kl_div(
        torch.nn.functional.log_softmax(torch.from_numpy(s) / T, dim=1),
        torch.nn.functional.softmax(torch.from_numpy(t) / T, dim=1),
        reduction="batchmean") * T * T)
    assert abs(ours - want) < 1e-4


def test_quadratic_penalty():
    p = {"a": jnp.ones((3,)) * 2.0}
    anchor = {"a": jnp.ones((3,))}
    imp = {"a": jnp.ones((3,)) * 0.5}
    got = float(quadratic_penalty(p, [anchor], [imp], 0.1))
    assert abs(got - 0.1 * 3 * 0.5 * 1.0) < 1e-6


def test_misc_losses_finite():
    rng = np.random.RandomState(5)
    s = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    t = jnp.asarray(rng.randn(4, 10).astype(np.float32))
    assert np.isfinite(float(lwf_kd_loss(s, t, 2.0)))
    tok_s = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    tok_t = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    assert float(attention_transfer_loss(tok_s, tok_s)) == 0.0
    assert float(attention_transfer_loss(tok_s, tok_t)) > 0.0


def test_top1_accuracy():
    logits = jnp.asarray(np.eye(4, 10, dtype=np.float32) * 5.0)
    assert float(top1_accuracy(logits, jnp.array([0, 1, 2, 3]))) == 100.0
    assert float(top1_accuracy(logits, jnp.array([9, 9, 9, 9]))) == 0.0


def test_masked_reductions_ignore_pad_sentinel():
    """Label -1 (BatchLoader mask_padding) must be invisible to every
    reduction: loss/accuracy on [valid; pads] == on [valid] alone."""
    import numpy as np
    from gslora_tpu.losses.classification import (bounded_forget_loss,
                                                  cross_entropy,
                                                  top1_accuracy)
    from gslora_tpu.losses.prototype import prototype_loss

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(6, 5).astype(np.float32))
    labels = jnp.asarray(np.array([0, 3, 2, 1], np.int32))
    pad = jnp.concatenate([labels, jnp.full((2,), -1, jnp.int32)])

    np.testing.assert_allclose(
        float(cross_entropy(logits, pad)),
        float(cross_entropy(logits[:4], labels)), rtol=1e-6)
    np.testing.assert_allclose(
        float(bounded_forget_loss(logits, pad, 5.0)),
        float(bounded_forget_loss(logits[:4], labels, 5.0)), rtol=1e-6)
    np.testing.assert_allclose(
        float(top1_accuracy(logits, pad)),
        float(top1_accuracy(logits[:4], labels)), rtol=1e-6)

    emb = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    protos = jnp.asarray(rng.randn(5, 8).astype(np.float32))
    for dist in ("kl", "l2"):
        np.testing.assert_allclose(
            float(prototype_loss(emb, pad, protos, dist)),
            float(prototype_loss(emb[:4], labels, protos, dist)), rtol=1e-6)


def test_distill_losses_ignore_pad_sentinel():
    """The teacher-student loss family must also mask label -1: on
    padded tail batches (mask_padding=True under TPU/mesh) KD/DER/FDR/AT
    terms equal their unpadded values."""
    import numpy as np
    from gslora_tpu.baselines.distill import der_loss, fdr_loss
    from gslora_tpu.losses.distillation import (attention_transfer_loss,
                                                kd_kl_loss,
                                                lwf_kd_loss)

    rng = np.random.RandomState(1)
    s = jnp.asarray(rng.randn(6, 5).astype(np.float32))
    t = jnp.asarray(rng.randn(6, 5).astype(np.float32))
    labels = jnp.asarray(np.array([0, 3, 2, 1], np.int32))
    pad = jnp.concatenate([labels, jnp.full((2,), -1, jnp.int32)])

    for fn in (lambda a, b, y: kd_kl_loss(a, b, 2.0, labels=y),
               lambda a, b, y: lwf_kd_loss(a, b, 2.0, labels=y),
               lambda a, b, y: der_loss(a, b, labels=y),
               lambda a, b, y: fdr_loss(a, b, labels=y),
               ):
        np.testing.assert_allclose(
            float(fn(s, t, pad)), float(fn(s[:4], t[:4], labels)), rtol=1e-5)
        # labels=None keeps the original unmasked reduction
        np.testing.assert_allclose(
            float(fn(s, t, None)), float(fn(s, t, jnp.zeros(6, jnp.int32))),
            rtol=1e-5)

    tok_s = jnp.asarray(rng.randn(6, 9, 7).astype(np.float32))
    tok_t = jnp.asarray(rng.randn(6, 9, 7).astype(np.float32))
    np.testing.assert_allclose(
        float(attention_transfer_loss(tok_s, tok_t, labels=pad)),
        float(attention_transfer_loss(tok_s[:4], tok_t[:4], labels=labels)),
        rtol=1e-5)


def test_sface_masked_matches_unpadded():
    """sface_head on [valid; pad(-1)] equals sface_head on [valid]
    (loss and all summary stats; logits row content for pads is ignored)."""
    import numpy as np
    from gslora_tpu.models.heads import sface_head

    rng = np.random.RandomState(0)
    params = {"weight": jnp.asarray(rng.randn(5, 8).astype(np.float32))}
    emb = jnp.asarray(rng.randn(6, 8).astype(np.float32))
    labels = jnp.asarray(np.array([0, 3, 2, 1], np.int32))
    pad = jnp.concatenate([labels, jnp.full((2,), -1, jnp.int32)])

    full = sface_head(params, emb, pad)
    ref = sface_head(params, emb[:4], labels)
    for a, b in zip(full[1:], ref[1:]):  # skip logits (shape differs)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
