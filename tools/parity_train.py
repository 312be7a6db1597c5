"""Train-step numerical parity harness vs the reference (VERDICT r2 #2).

Closes the last leg of the parity triangle: forward (goldens) and eval
pipeline (tools/parity_eval.py) are proven; this compares one TRAINING
step -- L1 backward + Adam(lr=2e-4, betas=(0.9, 0.999), eps=1e-8) update
(reference train.py:77-84, 111-138) -- and an N-step loss curve between
the reference's torch loop and `lft_tpu.training.make_train_step`, on
identical weights and identical batches.

Compared, in increasing integration order:
  1. first-step gradients per parameter tensor (the sensitive probe --
     Adam's step-1 update is ~sign(g)·lr, which would mask magnitude
     disagreements): rel tol 1e-5;
  2. per-step losses over N steps: rel tol 1e-5;
  3. post-N-step parameters, in ABSOLUTE units of `steps * lr`.

On (3): Adam's early update is ~sign(g)·lr, so an element whose true
gradient is within f32-noise of zero can step in opposite directions on
the two sides -- a per-element divergence of up to 2·lr from a gradient
disagreement of ~1e-6. This is intrinsic to comparing f32 Adam
trajectories, not an implementation gap; the null experiment (two
*jax* impls, 'tiled' vs 'dense', identical data) shows the same
mechanism at smaller amplitude (gradients agreeing to ~1e-7 still
produce ~1e-5-relative param drift over 4 steps). Hence params are
bounded distributionally: the fraction of "flipped" elements
(|dtheta| > 0.5·steps·lr) must be tiny and the 99th-percentile
|dtheta| small, while the *math* proof rests on (1) and (2).

Both sides run f32 on CPU (torch CPU vs XLA CPU with
matmul_precision='highest') so differences measure implementation math,
not hardware rounding.

    python tools/parity_train.py                       # defaults: c16, N=4
    python tools/parity_train.py --channels 64 --steps 2
    python tools/parity_train.py --json PARITY_train.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rel_diff(a: np.ndarray, b: np.ndarray) -> float:
    scale = float(np.max(np.abs(a))) + 1e-12
    return float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64)))) / scale


def run_reference(ref_root, pth, batches_npz, out_npz, args):
    flags = ["--angRes", str(args.angRes),
             "--scale_factor", str(args.scale_factor),
             "--channels", str(args.channels), "--model_name", "LFT",
             "--lr", repr(args.lr), "--decay_rate", repr(args.decay_rate),
             "--num_workers", "0"]
    cmd = [sys.executable, os.path.join(REPO, "tools", "_ref_train_driver.py"),
           ref_root, pth, batches_npz, out_npz] + flags
    res = subprocess.run(cmd, capture_output=True, text=True)
    if res.returncode != 0:
        raise RuntimeError("reference train failed:\n" + res.stdout + res.stderr)
    return dict(np.load(out_npz))


def run_lft_tpu(params0, batches, args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from lft_tpu.config import Args
    from lft_tpu.registry import get_model
    from lft_tpu.training.optim import make_optimizer
    from lft_tpu.training.trainer import make_train_step

    a = Args(angRes=args.angRes, scale_factor=args.scale_factor,
             channels=args.channels, lr=args.lr, decay_rate=args.decay_rate,
             matmul_precision="highest", attention_impl=args.attention_impl,
             dtype="float32")
    model = get_model(a)
    # steps_per_epoch = N keeps every step in epoch 0 -> base lr, exactly
    # what the reference's in-epoch loop sees (StepLR acts per epoch)
    optimizer = make_optimizer(a, steps_per_epoch=max(args.steps, 1))
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    opt_state = optimizer.init(params)

    # step-1 gradients through the same loss
    def loss_fn(p, d, l):
        return model.loss(model.apply(p, d, a), l)
    g0 = jax.grad(loss_fn)(params, jnp.asarray(batches["data"][0]),
                           jnp.asarray(batches["label"][0]))
    g0 = {k: np.asarray(v) for k, v in g0.items()}

    step = make_train_step(model, optimizer, a, with_metrics=False)
    losses = []
    for i in range(batches["data"].shape[0]):
        params, opt_state, aux = step(params, opt_state,
                                      jnp.asarray(batches["data"][i]),
                                      jnp.asarray(batches["label"][i]))
        losses.append(float(aux["loss"]))
    return ({k: np.asarray(v) for k, v in params.items()}, losses, g0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--angRes", type=int, default=5)
    ap.add_argument("--scale_factor", "--scale", type=int, default=2)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--patch", type=int, default=8,
                    help="LR pixels per view of the train patches")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--decay_rate", type=float, default=0.0)
    ap.add_argument("--attention_impl", default="tiled",
                    help="XLA impl = the parity baseline; 'pallas' also "
                         "works (interpret mode on CPU) but is slower")
    ap.add_argument("--grad_tol", type=float, default=1e-5)
    ap.add_argument("--loss_tol", type=float, default=2e-5)
    ap.add_argument("--flip_frac_tol", type=float, default=5e-3,
                    help="max fraction of elements diverged by more than "
                         "0.5*steps*lr (sign-flipped near-zero-gradient "
                         "elements; see module docstring)")
    ap.add_argument("--param_p99_tol", type=float, default=0.1,
                    help="99th-percentile |dtheta| bound in steps*lr units")
    ap.add_argument("--json", default=None)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)

    work = args.workdir or tempfile.mkdtemp(prefix="parity_train_")
    os.makedirs(work, exist_ok=True)

    import jax
    jax.config.update("jax_platforms", "cpu")
    from lft_tpu.config import Args
    from lft_tpu.models import lft
    from lft_tpu.utils.checkpoint import params_to_pth

    a_cfg = Args(angRes=args.angRes, scale_factor=args.scale_factor,
                 channels=args.channels)
    params0 = {k: np.asarray(v) for k, v in
               lft.init_params(jax.random.PRNGKey(0), a_cfg).items()}
    pth = os.path.join(work, "init.pth")
    params_to_pth(params0, pth, epoch=0)

    A, S, h = args.angRes, args.patch, None
    rng = np.random.RandomState(7)
    H = args.angRes * args.patch
    HS = H * args.scale_factor
    batches = {
        "data": rng.rand(args.steps, args.batch, 1, H, H).astype(np.float32),
        "label": rng.rand(args.steps, args.batch, 1, HS, HS).astype(np.float32),
    }
    batches_npz = os.path.join(work, "batches.npz")
    np.savez(batches_npz, **batches)

    print("running lft_tpu train steps (XLA cpu, matmul 'highest') ...")
    ours_params, ours_losses, ours_g0 = run_lft_tpu(params0, batches, args)
    print("running reference train steps (torch cpu) ...")
    ref = run_reference(args.reference, pth, batches_npz,
                        os.path.join(work, "ref_out.npz"), args)
    ref_losses = [float(x) for x in ref.pop("__losses__")]
    ref_g0 = {k[len("grad."):]: v for k, v in ref.items()
              if k.startswith("grad.")}
    ref_params = {k: v for k, v in ref.items() if not k.startswith("grad.")}

    rows = {"grads": {}, "params": {}, "losses": []}
    ok = True

    for k in sorted(ref_g0):
        d = rel_diff(ref_g0[k], ours_g0[k])
        rows["grads"][k] = d
        ok &= d <= args.grad_tol
    worst_g = max(rows["grads"].items(), key=lambda kv: kv[1])
    print(f"step-1 grads: worst rel diff {worst_g[1]:.3g} ({worst_g[0]}) "
          f"[tol {args.grad_tol}]")

    for i, (rl, ol) in enumerate(zip(ref_losses, ours_losses)):
        d = abs(rl - ol) / (abs(rl) + 1e-12)
        rows["losses"].append({"step": i, "ref": rl, "lft_tpu": ol, "rel": d})
        ok &= d <= args.loss_tol
        print(f"step {i}: loss ref {rl:.8f}  lft_tpu {ol:.8f}  rel {d:.3g}")

    lr_units = args.steps * args.lr
    all_d = []
    n_flip = n_total = 0
    for k in sorted(ref_params):
        d = np.abs(ref_params[k].astype(np.float64)
                   - ours_params[k].astype(np.float64)).ravel() / lr_units
        all_d.append(d)
        n_flip += int(np.sum(d > 0.5))
        n_total += d.size
        rows["params"][k] = {"max_lr_units": float(d.max()),
                             "mean_lr_units": float(d.mean())}
    all_d = np.concatenate(all_d)
    p99 = float(np.percentile(all_d, 99))
    flip_frac = n_flip / max(n_total, 1)
    ok &= flip_frac <= args.flip_frac_tol and p99 <= args.param_p99_tol
    worst_p = max(rows["params"].items(),
                  key=lambda kv: kv[1]["max_lr_units"])
    print(f"post-{args.steps}-step params ({n_total} elements): "
          f"p99 |dtheta| {p99:.3g} steps*lr [tol {args.param_p99_tol}], "
          f"sign-flipped {n_flip} ({flip_frac:.2e}) "
          f"[tol {args.flip_frac_tol}]; worst tensor {worst_p[0]} "
          f"max {worst_p[1]['max_lr_units']:.3g}")

    verdict = "TRAIN PARITY OK" if ok else "TRAIN PARITY FAIL"
    print(verdict)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"ok": ok, "rows": rows,
                       "worst_grad": worst_g, "worst_param": worst_p,
                       "param_p99_lr_units": p99,
                       "flip_frac": flip_frac,
                       "config": {k: getattr(args, k) for k in
                                  ("angRes", "scale_factor", "channels",
                                   "patch", "batch", "steps", "lr",
                                   "attention_impl")},
                       "tols": {"grad": args.grad_tol, "loss": args.loss_tol,
                                "flip_frac": args.flip_frac_tol,
                                "param_p99_lr_units": args.param_p99_tol}},
                      f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
