"""Optimizer: Adam + StepLR, torch-parity.

The reference trains with `Adam(lr, betas=(0.9, 0.999), eps=1e-8,
weight_decay=decay_rate)` and `StepLR(step_size=n_steps, gamma)`
(reference train.py:77-84). torch-Adam details reproduced:

* bias-corrected moments, `eps` added OUTSIDE the sqrt -> optax
  `scale_by_adam(eps=1e-8, eps_root=0)`;
* `weight_decay` is L2-added-to-gradient BEFORE the moments (classic Adam,
  not AdamW) -> `add_decayed_weights` placed before `scale_by_adam`;
* StepLR multiplies lr by `gamma` every `n_steps` EPOCHS -> a step-indexed
  schedule via `steps_per_epoch`.
"""

from __future__ import annotations

import optax


def step_lr_schedule(base_lr: float, gamma: float, n_steps_epochs: int,
                     steps_per_epoch: int):
    """lr(step) = base_lr * gamma ** (epoch // n_steps_epochs)
    (reference train.py:84, applied per epoch at train.py:106)."""
    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // n_steps_epochs)
    return schedule


def cosine_schedule(base_lr: float, total_epochs: int, steps_per_epoch: int):
    """Cosine decay over the whole run (BASELINE.json config 4 trains the
    2x model with a cosine schedule instead of the reference's StepLR)."""
    return optax.cosine_decay_schedule(base_lr,
                                       max(total_epochs * steps_per_epoch, 1))


def make_optimizer(args, steps_per_epoch: int) -> optax.GradientTransformation:
    if getattr(args, "lr_schedule", "step") == "cosine":
        sched = cosine_schedule(args.lr, args.epoch, steps_per_epoch)
    else:
        sched = step_lr_schedule(args.lr, args.gamma, args.n_steps,
                                 steps_per_epoch)
    txs = []
    if args.decay_rate:
        txs.append(optax.add_decayed_weights(args.decay_rate))
    txs.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0))
    txs.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*txs)
