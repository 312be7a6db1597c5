"""Subprocess driver: run the REFERENCE's own training step.

Imports the reference's model from the read-only mount, loads a `.pth`
checkpoint, and replays its exact train loop body -- `out = net(data);
loss = L1(out, label); zero_grad; backward; step` with
`Adam(lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=decay_rate)`
(reference train.py:77-84, 111-138; model/LFT.py:269-277) -- on batches
supplied in an .npz, then writes the post-step state_dict and per-step
losses to an output .npz. `tools/parity_train.py` runs the same steps
through `lft_tpu.training.make_train_step` and compares.

Usage:
    python tools/_ref_train_driver.py <reference_root> <ckpt.pth> \
        <batches.npz> <out.npz> [reference option.py flags...]

batches.npz schema: data [N, B, 1, H, W], label [N, B, 1, H*S, W*S] f32.
"""

from __future__ import annotations

import importlib
import json
import os
import sys

import numpy as np


def main():
    ref_root, ckpt_path, batches_path, out_path = sys.argv[1:5]
    option_flags = sys.argv[5:]
    sys.path.insert(0, ref_root)

    import torch
    torch.set_num_threads(os.cpu_count() or 1)
    # the reference parses argv at import time (reference option.py:27)
    sys.argv = [sys.argv[0]] + list(option_flags)
    from option import args  # noqa: E402  (reference module)

    MODEL = importlib.import_module("model." + args.model_name)
    net = MODEL.get_model(args)
    ckpt = torch.load(ckpt_path, map_location="cpu")
    net.load_state_dict(ckpt["state_dict"])
    net.train()

    criterion = MODEL.get_loss(args)
    optimizer = torch.optim.Adam(
        [p for p in net.parameters() if p.requires_grad],
        lr=args.lr, betas=(0.9, 0.999), eps=1e-08,
        weight_decay=args.decay_rate)
    # StepLR exists in the reference loop but only acts at epoch
    # boundaries (train.py:84,106); N in-epoch steps all see base lr.

    batches = np.load(batches_path)
    data_all, label_all = batches["data"], batches["label"]
    grad_mask = (torch.from_numpy(batches["grad_mask"])
                 if "grad_mask" in batches else None)
    losses = []
    grads0 = {}
    for i in range(data_all.shape[0]):
        data = torch.from_numpy(data_all[i])
        label = torch.from_numpy(label_all[i])
        if i == 0:
            # First-step gradient probe: the most sensitive parity check
            # (Adam's step-1 update is ~sign(g), so post-step params alone
            # would hide gradient-magnitude disagreements). When the
            # harness supplies `grad_mask`, the probe backward uses the
            # identical ambiguity-masked L1 (elements at the |sr-hr| kink
            # excluded on BOTH sides -- their L1 signs are not
            # well-defined across implementations); the actual training
            # step below still uses the true reference loss.
            out_p = net(data)
            if grad_mask is not None:
                probe_loss = ((out_p - label).abs() * grad_mask).mean()
            else:
                probe_loss = criterion(out_p, label)
            optimizer.zero_grad()
            probe_loss.backward()
            grads0 = {f"grad.{n}": p.grad.detach().numpy().copy()
                      for n, p in net.named_parameters() if p.grad is not None}
        out = net(data)
        loss = criterion(out, label)
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        losses.append(float(loss.item()))

    result = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    result.update(grads0)
    result["__losses__"] = np.asarray(losses, dtype=np.float64)
    np.savez(out_path, **result)
    print(json.dumps({"losses": losses}), flush=True)


if __name__ == "__main__":
    main()
