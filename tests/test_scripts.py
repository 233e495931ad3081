"""Dress rehearsal for the shell-script surface (VERDICT r4 ask #4).

Every `scripts/*.sh` is executed FOR REAL via subprocess on a generated
100-class JPEG ImageFolder — the same decode/split/driver path a user
runs — shrunk through the `GSLORA_EXTRA_ARGS` override hook (argparse
last-occurrence-wins) to 1 epoch / tiny depth. A typo in any .sh (path,
flag rename, recipe drift against the CLI) fails here instead of
shipping silently.

Subprocess env: drops PALLAS_AXON_POOL_IPS and forces JAX_PLATFORMS=cpu
(sitecustomize would otherwise register the tunneled TPU and claim the
chip grant — DEVNOTES).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")

# depth-2 P8S8 on CPU: every run is 1 epoch, small batches; the smoke is
# about the .sh surface, not accuracy
_TINY = "--vit_depth 2 -e 1"


def _make_face_folder(root, n_cls=100, n_train=2, n_test=1, size=112):
    """100-class JPEG ImageFolder (train/test) at the native 112x112 so
    decode takes the pre-sized fast path."""
    from PIL import Image
    rng = np.random.RandomState(0)
    for split, n in [("train", n_train), ("test", n_test)]:
        for c in range(n_cls):
            d = os.path.join(root, split, f"id_{c:03d}")
            os.makedirs(d, exist_ok=True)
            for i in range(n):
                arr = rng.randint(0, 255, (size, size, 3), np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"),
                                          quality=90)
    return root


def _run_script(name, args, extra, timeout=900):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["GSLORA_EXTRA_ARGS"] = extra
    proc = subprocess.run(["bash", os.path.join(SCRIPTS, name)] + args,
                          env=env, cwd=REPO, capture_output=True,
                          text=True, timeout=timeout)
    if proc.returncode != 0:
        raise AssertionError(
            f"{name} rc={proc.returncode}\nstdout tail:\n"
            f"{proc.stdout[-3000:]}\nstderr tail:\n{proc.stderr[-3000:]}")
    return proc


@pytest.fixture(scope="module")
def face_root(tmp_path_factory):
    return _make_face_folder(str(tmp_path_factory.mktemp("faces")))


@pytest.fixture(scope="module")
def pretrained(face_root, tmp_path_factory):
    """run_pretrain.sh end-to-end (tiny) -> best-acc .msgpack checkpoint
    consumed by every downstream script."""
    out = str(tmp_path_factory.mktemp("pre"))
    # b=8 -> 25 batches: the best-acc save fires only every VER_FREQ=20
    # batches (parity with train_own.py:483 — shorter runs never save)
    _run_script("run_pretrain.sh", [], (
        f"{_TINY} -b 8 --lr 3e-3 --warmup-epochs 0 "
        f"--data_root {face_root} --outdir {out}"))
    import glob
    ckpts = sorted(glob.glob(os.path.join(out, "*.msgpack")))
    assert ckpts, f"run_pretrain.sh saved no checkpoint in {out}"
    return ckpts[-1], out


def test_run_pretrain_sh(pretrained):
    ckpt, out = pretrained
    assert os.path.exists(os.path.join(out, "config.txt"))


def test_test_sh(pretrained, face_root, tmp_path):
    ckpt, _ = pretrained
    # test.sh takes outdir as $2; its default --lora_rank 8 also exercises
    # the missing-LoRA msgpack resume path (fresh LoRA is a zero delta at
    # eval, B=0)
    _run_script("test.sh", [ckpt, str(tmp_path)],
                f"{_TINY} -b 25 --data_root {face_root}")
    assert (tmp_path / "class_accuracy.txt").exists()


def test_run_forget_sh(pretrained, face_root, tmp_path):
    ckpt, _ = pretrained
    _run_script("run_forget.sh", [ckpt], (
        f"{_TINY} -b 16 --aug_num 0 --data_root {face_root} "
        f"--outdir {tmp_path}"))
    rep = json.load(open(tmp_path / "report.json"))
    assert "best_H_mean" in rep


@pytest.mark.parametrize("method", ["gs_lora", "full"])
def test_run_forget_open_sh(pretrained, face_root, tmp_path, method):
    ckpt, _ = pretrained
    _run_script("run_forget_open.sh", [ckpt, method], (
        f"{_TINY} -b 8 --data_root {face_root} --outdir {tmp_path}"))
    rep = json.load(open(tmp_path / "report.json"))
    assert rep["open_acc"] is not None


def test_run_cl_forget_sh(pretrained, face_root, tmp_path):
    ckpt, _ = pretrained
    _run_script("run_cl_forget.sh", [ckpt], (
        f"{_TINY} -b 16 --few_shot_num 2 --num_tasks 1 --aug_num 0 "
        f"--data_root {face_root} --outdir {tmp_path}"))
    rep = json.load(open(tmp_path / "report.json"))
    assert len(rep) == 1 and "best_H_mean" in rep[0]


def test_run_cl_forget_open_sh(pretrained, face_root, tmp_path):
    ckpt, _ = pretrained
    _run_script("run_cl_forget_open.sh", [ckpt], (
        f"{_TINY} -b 8 --num_tasks 1 --data_root {face_root} "
        f"--outdir {tmp_path}"))
    rep = json.load(open(tmp_path / "report.json"))
    assert rep[0]["open_acc"] is not None


def test_run_cl_forget_image_sh(pretrained, face_root, tmp_path):
    """Drives the ImageNet recipe script's full flag surface. The 86M
    ViT-B/16 itself is too heavy for a 1-core CPU smoke (its import/eval
    parity is covered by tests/test_vit_imagenet.py and
    test_foreign_checkpoint.py), so GSLORA_EXTRA_ARGS retargets the SAME
    invocation at the tiny face model — every script-authored flag still
    parses and a real first step runs."""
    ckpt, _ = pretrained
    _run_script("run_cl_forget_image.sh", [ckpt, ""], (
        f"{_TINY} -b 16 -n VIT -d casia100 --head CosFace --num_tasks 1 "
        f"--lora_rank 4 -r {ckpt} --data_root {face_root} "
        f"--outdir {tmp_path}"))
    rep = json.load(open(tmp_path / "report.json"))
    assert len(rep) == 1
