"""Evaluation CLI (reference test.py equivalent).

    python test.py --model_name LFT --angRes 5 --scale_factor 4 \
        --use_pre_pth True --path_pre_pth ./pth/LFT_5x5_4x_epoch_50_model.pth

Accepts reference `.pth` checkpoints directly (converted on load) or native
`.npz`. The per-scene pipeline is one compiled program (divide -> batched
network -> integrate) instead of the reference's serial batch-1 patch loop
(reference test.py:88-95). `--num_devices N` shards scenes' patch batches
across an N-chip mesh.
"""

from __future__ import annotations

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp
    from lft_tpu.config import apply_platform
    apply_platform(args)
    from lft_tpu.utils.logging import Logger, create_dir
    from lft_tpu.utils.checkpoint import load_checkpoint, validate_params
    from lft_tpu.data.datasets import multi_test_sets
    from lft_tpu.registry import get_model
    from lft_tpu.inference.tiled import ScenePipelineCache, evaluate_dataset
    from lft_tpu.models.lft import param_shapes

    experiment_dir, checkpoints_dir, log_dir = create_dir(args)
    logger = Logger(log_dir, args)

    logger.log_string("\nLoad Test Dataset ...")
    names, sets, total = multi_test_sets(args)
    logger.log_string("The number of test data is: %d" % total)

    logger.log_string("\nModel Initial ...")
    model = get_model(args)
    loaded, epoch, _ = load_checkpoint(args.path_pre_pth)
    validate_params(loaded, param_shapes(args.channels, args.scale_factor))
    params = {k: jnp.asarray(v) for k, v in loaded.items()}
    logger.log_string("Use pretrain model!")

    mesh = None
    if args.num_devices and args.num_devices > 1:
        from lft_tpu.parallel.mesh import get_mesh
        mesh = get_mesh(args.num_devices)
        logger.log_string(f"Sharded tiled inference over mesh {mesh}")
    cache = ScenePipelineCache(model.apply, args, eval_batch=args.eval_batch,
                               mesh=mesh,
                               bucket=getattr(args, "eval_bucket", None),
                               scene_batch=getattr(args, "scene_batch", None))

    logger.log_string("\nStart test...")
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    psnr_testset, ssim_testset = [], []
    for name, dataset in zip(names, sets):
        p, s, per_scene = evaluate_dataset(model.apply, params, args, dataset,
                                           cache=cache)
        psnr_testset.append(p)
        ssim_testset.append(s)
        for scene, sp, ss in per_scene:
            logger.log_string("  %s/%s: psnr/ssim %.2f/%.3f"
                              % (name, scene, sp, ss))
        logger.log_string("Test on %s, psnr/ssim is %.2f/%.3f" % (name, p, s))
    if args.profile_dir:
        jax.profiler.stop_trace()
    if psnr_testset:
        logger.log_string("Mean over datasets: psnr/ssim is %.2f/%.3f"
                          % (float(np.mean(psnr_testset)),
                             float(np.mean(ssim_testset))))
    return psnr_testset, ssim_testset


if __name__ == "__main__":
    from lft_tpu.config import parse_args
    main(parse_args())
