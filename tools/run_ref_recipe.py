"""Run the reference training recipe end-to-end, with a kill/resume proof.

Automates the workflow that produced runs/ref_recipe (round 3, 2x) so the
flagship 4x configuration (reference README.md:27: batch 4, Adam 2e-4,
StepLR(15, 0.5)) gets the same evidence:

  1. generate a synthetic h5 dataset in the reference schema
     (lft_tpu/data/synth.py; reference Generate_Data_for_Training.m
     semantics);
  2. continuous leg: train.py for --epochs epochs straight through;
  3. kill/resume leg: same command, SIGKILLed mid-epoch after the
     --kill_after_epoch checkpoint lands, then resumed with
     --use_pre_pth True from that checkpoint (reference train.py:40-64
     resume flow -- ours restores Adam moments + schedule, which the
     reference silently drops, SURVEY.md 3.5);
  4. compare the two legs' final checkpoints tensor-by-tensor (params AND
     optimizer moments) -- the recipe passes iff bit-identical;
  5. evaluate the final checkpoint with the stock test.py on the held-out
     synthetic test scenes.

Writes <out>/compare.json, the training logs, and the eval log. The h5
data itself lands under --data_root (not for committing).

Usage (the round-4 flagship run):
  python tools/run_ref_recipe.py --scale 4 --batch 4 --epochs 20 \
      --n_train 800 --out runs/ref_recipe_s4 --data_root data/synth_s4
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(f"[recipe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def gen_data(root, scale, n_train, n_test, seed):
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        log(f"dataset already generated at {root}")
        return
    sys.path.insert(0, REPO)
    from lft_tpu.data.synth import make_synth_data
    log(f"generating {n_train} train patches + {n_test} test scenes (x{scale})")
    make_synth_data(root, ang_res=5, scale=scale, n_train=n_train,
                    n_test=n_test, test_hw=64, seed=seed)
    open(marker, "w").write("ok\n")


def train_cmd(ns, log_root, use_pre=None):
    cmd = [sys.executable, os.path.join(REPO, "train.py"),
           "--model_name", "LFT", "--angRes", "5",
           "--scale_factor", str(ns.scale), "--batch_size", str(ns.batch),
           "--data_name", "SynthLF", "--epoch", str(ns.epochs),
           "--num_workers", str(ns.num_workers), "--seed", str(ns.seed),
           "--path_for_train", os.path.join(ns.data_root, "data_for_train") + os.sep,
           "--path_log", log_root + os.sep,
           "--dtype", ns.dtype, "--train_fused", ns.train_fused]
    if use_pre:
        cmd += ["--use_pre_pth", "True", "--path_pre_pth", use_pre]
    return cmd


def ckpt_dir(ns, log_root):
    return os.path.join(log_root, f"SR_5x5_{ns.scale}x", "LFT", "SynthLF",
                        "checkpoints")


def ckpt_path(ns, log_root, epoch):
    return os.path.join(ckpt_dir(ns, log_root),
                        f"LFT_5x5_{ns.scale}x_epoch_{epoch:02d}_model.npz")


def log_file(ns, log_root):
    return os.path.join(log_root, f"SR_5x5_{ns.scale}x", "LFT", "SynthLF",
                        "logs", "LFT.txt")


def run_leg(ns, log_root, kill_after_epoch=None):
    proc = subprocess.Popen(train_cmd(ns, log_root),
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, cwd=REPO)
    if kill_after_epoch is None:
        rc = proc.wait()
        if rc != 0:
            raise RuntimeError(f"train.py exited {rc} (leg {log_root})")
        return
    # wait for the kill_after_epoch checkpoint, then kill mid-next-epoch
    target = ckpt_path(ns, log_root, kill_after_epoch)
    while proc.poll() is None and not os.path.exists(target):
        time.sleep(2.0)
    if proc.poll() is not None:
        raise RuntimeError("train.py finished before the kill point")
    time.sleep(ns.kill_delay)          # into the middle of the next epoch
    log(f"SIGKILL mid-epoch-{kill_after_epoch + 1} (pid {proc.pid})")
    proc.send_signal(signal.SIGKILL)
    proc.wait()
    # resume from the last complete checkpoint
    log(f"resuming from {target}")
    proc = subprocess.Popen(train_cmd(ns, log_root, use_pre=target),
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, cwd=REPO)
    rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"resume train.py exited {rc}")


def compare_ckpts(a_path, b_path):
    a, b = np.load(a_path), np.load(b_path)
    keys_a, keys_b = set(a.files), set(b.files)
    assert keys_a == keys_b, (keys_a ^ keys_b)
    deltas = {}
    for k in sorted(keys_a):
        va, vb = a[k], b[k]
        if va.dtype.kind in "OSU":     # metadata strings
            deltas[k] = 0.0 if np.array_equal(va, vb) else float("inf")
        else:
            deltas[k] = float(np.max(np.abs(va.astype(np.float64)
                                            - vb.astype(np.float64)))) \
                if va.size else 0.0
    return deltas


def run_eval(ns, ckpt, log_root):
    cmd = [sys.executable, os.path.join(REPO, "test.py"),
           "--model_name", "LFT", "--angRes", "5",
           "--scale_factor", str(ns.scale), "--data_name", "SynthLF",
           "--use_pre_pth", "True", "--path_pre_pth", ckpt,
           "--path_for_test", os.path.join(ns.data_root, "data_for_test") + os.sep,
           "--path_log", log_root + os.sep]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    if out.returncode != 0:
        raise RuntimeError(f"test.py failed: {out.stderr[-2000:]}")
    return out.stdout


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--n_train", type=int, default=800)
    ap.add_argument("--n_test", type=int, default=3)
    ap.add_argument("--num_workers", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16", "mixed"],
                    help="training compute dtype (mixed = shipping config)")
    ap.add_argument("--train_fused", default="auto",
                    choices=["auto", "true", "false"])
    ap.add_argument("--kill_after_epoch", type=int, default=12)
    ap.add_argument("--kill_delay", type=float, default=8.0,
                    help="seconds past the kill-point checkpoint")
    ap.add_argument("--out", default="runs/ref_recipe_s4")
    ap.add_argument("--data_root", default="data/synth_s4")
    ns = ap.parse_args(argv)

    out = os.path.join(REPO, ns.out)
    data_root = os.path.join(REPO, ns.data_root)
    os.makedirs(out, exist_ok=True)
    gen_data(data_root, ns.scale, ns.n_train, ns.n_test, ns.seed)

    legA = os.path.join(out, "log_continuous")
    legB = os.path.join(out, "log_resume")
    for leg in (legA, legB):
        if os.path.exists(leg):
            shutil.rmtree(leg)

    t0 = time.time()
    log("leg A: continuous")
    run_leg(ns, legA)
    log(f"leg A done in {time.time() - t0:.0f}s")
    t1 = time.time()
    log("leg B: kill + resume")
    run_leg(ns, legB, kill_after_epoch=ns.kill_after_epoch)
    log(f"leg B done in {time.time() - t1:.0f}s")

    final_a = ckpt_path(ns, legA, ns.epochs)
    final_b = ckpt_path(ns, legB, ns.epochs)
    deltas = compare_ckpts(final_a, final_b)
    max_delta = max(deltas.values())
    log(f"checkpoint compare: {len(deltas)} tensors, max |delta| = {max_delta}")

    log("evaluating final checkpoint with stock test.py")
    eval_out = run_eval(ns, final_a, os.path.join(out, "log_eval"))
    scenes = re.findall(r"(scene_\d+): psnr/ssim ([0-9.]+)/([0-9.]+)",
                        eval_out)
    mean = re.search(r"Mean over datasets: psnr/ssim is ([0-9.]+)/([0-9.]+)",
                     eval_out)
    psnr_ssim = {
        "per_scene": {s: [float(p), float(ss)] for s, p, ss in scenes},
        "mean": [float(mean.group(1)), float(mean.group(2))] if mean
        else None,
        "note": "stock test.py on the held-out synthetic scenes (log_eval/)",
    }

    result = {
        "workload": f"reference training recipe end-to-end at the flagship "
                    f"{ns.scale}x config (VERDICT round-3 item 5)",
        "config": {
            "model": "LFT 5x5", "scale": ns.scale, "batch_size": ns.batch,
            "dtype": ns.dtype, "train_fused": ns.train_fused,
            "lr": 2e-4, "lr_schedule": "StepLR(n_steps=15, gamma=0.5)",
            "epochs": ns.epochs, "num_workers": ns.num_workers,
            "seed": ns.seed,
            "dataset": f"{ns.n_train} synthetic h5 patches "
                       f"(data/generate.py pipeline schema)",
            "per_epoch_checkpoints": True,
            "ckpt_format": "npz (params + Adam moments + epoch)",
        },
        "legs": {
            "continuous": f"train.py {ns.epochs} epochs straight through",
            "kill_resume": f"train.py SIGKILLed mid-epoch-"
                           f"{ns.kill_after_epoch + 1}, resumed with "
                           f"--use_pre_pth True from the epoch-"
                           f"{ns.kill_after_epoch} checkpoint",
        },
        "comparison": {
            "tensors_compared": len(deltas),
            "max_abs_delta": max_delta,
            "bit_identical": max_delta == 0.0,
        },
        "final_eval_psnr_ssim": psnr_ssim,
        "ok": max_delta == 0.0,
    }
    with open(os.path.join(out, "compare.json"), "w") as f:
        json.dump(result, f, indent=1)
    log(f"wrote {out}/compare.json (ok={result['ok']})")
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
