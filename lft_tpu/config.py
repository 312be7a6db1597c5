"""Configuration / CLI flags.

Mirrors the reference's public flag surface (reference option.py:1-27) so a
user of the reference can switch without relearning the CLI, but avoids the
reference's import-time global-argparse coupling (reference option.py:27,
utils/utils.py:7): here `build_parser()`/`parse_args()` are explicit calls and
the resulting `Args` dataclass is passed around as a value.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional


def _reference_bool(v) -> bool:
    """Reproduce argparse `type=bool` semantics used by the reference
    (reference option.py:8): any non-empty string is truthy, so
    `--use_pre_pth False` *enables* the flag. The reference README's test
    command relies on this (reference README.md:35-39). We keep the behavior
    for drop-in compatibility but also accept the standard spellings when they
    are unambiguous falsy strings is NOT done -- exact reference semantics.
    """
    if isinstance(v, bool):
        return v
    return bool(v)


@dataclasses.dataclass
class Args:
    # Reference-compatible flags (reference option.py:4-25)
    angRes: int = 5
    scale_factor: int = 4
    model_name: str = "LFT"
    channels: int = 64
    use_pre_pth: bool = False
    path_pre_pth: str = "./pth/LFT_5x5_4x_epoch_50_model.pth"
    data_name: str = "ALL"
    path_for_train: str = "./data_for_train/"
    path_for_test: str = "./data_for_test/"
    path_log: str = "./log/"
    patch_size_for_test: int = 32
    stride_for_test: int = 16
    batch_size: int = 4
    lr: float = 2e-4
    decay_rate: float = 0.0
    n_steps: int = 15
    gamma: float = 0.5
    epoch: int = 50
    num_workers: int = 2
    local_rank: int = 0

    # New, TPU-specific flags (absent from the reference).
    platform: str = "auto"            # auto | cpu | tpu: jax backend override
    seed: int = 0
    dtype: str = "float32"            # compute dtype: float32 | bfloat16 |
                                      # mixed (f32 activations/residuals/
                                      # softmax, bf16 matmul operands -- the
                                      # shipping TPU configuration: MXU-rate
                                      # matmuls without bf16 cast noise on
                                      # the residual stream)
    matmul_precision: str = "default"  # default | high | highest
    attention_impl: str = "auto"      # auto | dense | tiled | pallas
    eval_batch: int = 16              # patches per device batch in tiled eval
    eval_bucket: int = -1             # round scene sizes up to this LR-pixel
                                      # quantum: O(buckets) compiles, same
                                      # output. -1 = auto (32 on TPU, off
                                      # elsewhere); 0 disables
    scene_batch: int = -1             # same-shape scenes per eval jit dispatch
                                      # (amortizes dispatch overhead; output-
                                      # identical to per-scene dispatch).
                                      # -1 = auto (8 on TPU, 1 elsewhere)
    num_devices: Optional[int] = None  # data-parallel devices (None = all)
    coordinator: str = ""             # multi-host: coordinator host:port
    num_processes: int = 1            # multi-host: total process count
    process_id: int = 0               # multi-host: this process's index
    ckpt_format: str = "npz"          # npz | pth
    lr_schedule: str = "step"         # step (reference StepLR) | cosine
    profile_dir: str = ""             # if set, write a jax profiler trace
    log_every: int = 0                # extra per-step logging (0 = per epoch)
    compile_cache_dir: str = ""       # persistent XLA compilation cache dir
    train_remat: bool = True          # checkpoint AltFilter blocks in training
                                      # (False trades HBM for fewer backward
                                      # FLOPs; safe with the Pallas kernels)
    train_fused: str = "auto"         # auto | true | false: run each whole
                                      # transformer block as one Pallas kernel
                                      # in the TRAIN step too (custom fused
                                      # recompute+backward kernels). auto =
                                      # on TPU when dtype is bfloat16 and the
                                      # geometry qualifies

    # Mutable runtime state the reference stores on args (train.py:116).
    temperature: float = 1.0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lft_tpu: TPU-native LF image SR")
    d = Args()
    p.add_argument("--angRes", type=int, default=d.angRes, help="angular resolution")
    p.add_argument("--scale_factor", type=int, default=d.scale_factor, help="4, 2")
    p.add_argument("--model_name", type=str, default=d.model_name, help="model name")
    p.add_argument("--channels", type=int, default=d.channels, help="channels")
    p.add_argument("--use_pre_pth", type=_reference_bool, default=d.use_pre_pth,
                   help="use pre model ckpt (reference type=bool semantics)")
    p.add_argument("--path_pre_pth", type=str, default=d.path_pre_pth,
                   help="path for pre model ckpt (.pth or .npz)")
    p.add_argument("--data_name", type=str, default=d.data_name,
                   help="EPFL, HCI_new, HCI_old, INRIA_Lytro, Stanford_Gantry, ALL")
    p.add_argument("--path_for_train", type=str, default=d.path_for_train)
    p.add_argument("--path_for_test", type=str, default=d.path_for_test)
    p.add_argument("--path_log", type=str, default=d.path_log)
    p.add_argument("--patch_size_for_test", type=int, default=d.patch_size_for_test,
                   help="patch size")
    p.add_argument("--stride_for_test", type=int, default=d.stride_for_test,
                   help="stride")
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--lr", type=float, default=d.lr, help="initial learning rate")
    p.add_argument("--decay_rate", type=float, default=d.decay_rate,
                   help="weight decay [default: 0]")
    p.add_argument("--n_steps", type=int, default=d.n_steps,
                   help="number of epochs to update learning rate")
    p.add_argument("--gamma", type=float, default=d.gamma, help="gamma")
    p.add_argument("--epoch", type=int, default=d.epoch, help="Epoch to run")
    p.add_argument("--num_workers", type=int, default=d.num_workers,
                   help="num workers of the data loader")
    p.add_argument("--local_rank", dest="local_rank", type=int, default=d.local_rank)
    # TPU-native extras
    p.add_argument("--platform", type=str, default=d.platform,
                   choices=["auto", "cpu", "tpu"],
                   help="force the jax backend (the reference hardcodes CPU, "
                        "reference train.py:20; 'auto' uses jax's default)")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--dtype", type=str, default=d.dtype,
                   choices=["float32", "bfloat16", "mixed"],
                   help="mixed = f32 activations with bf16 matmul operands "
                        "(shipping TPU config: full MXU rate, f32-grade "
                        "residual stream)")
    p.add_argument("--matmul_precision", type=str, default=d.matmul_precision,
                   choices=["default", "high", "highest"])
    p.add_argument("--attention_impl", type=str, default=d.attention_impl,
                   choices=["auto", "dense", "tiled", "pallas"])
    p.add_argument("--eval_batch", type=int, default=d.eval_batch)
    p.add_argument("--eval_bucket", type=int, default=d.eval_bucket,
                   help="pad scene geometry to multiples of this many LR "
                        "pixels so a multi-dataset sweep compiles once per "
                        "bucket (0 = exact sizes, -1 = auto: 32 on TPU); "
                        "outputs are identical")
    p.add_argument("--scene_batch", type=int, default=d.scene_batch,
                   help="same-shape scenes SR'd per jit dispatch in eval "
                        "(amortizes per-dispatch overhead on tunneled or "
                        "small-scene workloads; outputs are identical; "
                        "-1 = auto: 8 on TPU, 1 elsewhere)")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--coordinator", type=str, default=d.coordinator,
                   help="multi-host training: coordination-service address "
                        "host:port (jax.distributed.initialize); every "
                        "process passes the same address")
    p.add_argument("--num_processes", type=int, default=d.num_processes,
                   help="multi-host training: total number of processes")
    p.add_argument("--process_id", type=int, default=d.process_id,
                   help="multi-host training: this process's index")
    p.add_argument("--ckpt_format", type=str, default=d.ckpt_format,
                   choices=["npz", "pth"])
    p.add_argument("--lr_schedule", type=str, default=d.lr_schedule,
                   choices=["step", "cosine"],
                   help="step = reference StepLR(n_steps, gamma); cosine = "
                        "cosine decay over --epoch")
    p.add_argument("--profile_dir", type=str, default=d.profile_dir)
    p.add_argument("--log_every", type=int, default=d.log_every)
    p.add_argument("--compile_cache_dir", type=str, default=d.compile_cache_dir,
                   help="persistent XLA compilation-cache directory: the "
                        "full-model compiles (~20-40 s each on TPU) are "
                        "reused across process restarts instead of redone")
    p.add_argument("--train_remat", type=lambda s: s.lower() not in
                   ("false", "0", "no"), default=d.train_remat,
                   help="checkpoint each AltFilter block in the train step "
                        "(False = keep activations, fewer backward FLOPs; "
                        "fine with the Pallas kernels' compact residuals)")
    p.add_argument("--train_fused", type=str, default=d.train_fused,
                   choices=("auto", "true", "false"),
                   help="fused whole-block Pallas kernels in the train step "
                        "(forward AND backward); auto = TPU + bfloat16 + "
                        "qualifying geometry")
    return p


def apply_platform(args: Args) -> None:
    """Apply `--platform` before any jax backend initialization. (Plain
    env-var overrides can be clobbered by site hooks; the config update is
    authoritative.) Also wires `--compile_cache_dir`: with a persistent
    compilation cache, a restarted run (resume, eval-after-train, the next
    epoch's new scene geometry) loads its XLA executables from disk instead
    of recompiling -- first compiles of the full model cost ~20-40 s on TPU."""
    import jax
    if args.platform and args.platform != "auto":
        jax.config.update("jax_platforms", args.platform)
    if getattr(args, "compile_cache_dir", ""):
        jax.config.update("jax_compilation_cache_dir", args.compile_cache_dir)
        # cache every entry: the model compiles we care about are seconds
        # long, but don't let the default 1 MiB / 1 s floors skip any
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def parse_args(argv=None) -> Args:
    ns = build_parser().parse_args(argv)
    return Args(**vars(ns))
