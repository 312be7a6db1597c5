"""Training CLI (reference train.py equivalent).

    python train.py --model_name LFT --angRes 5 --scale_factor 2 --batch_size 8
    python train.py --model_name LFT --angRes 5 --scale_factor 4 --batch_size 4

Extends the reference CLI with TPU-native flags: `--num_devices N` turns on
shard_map data parallelism over an N-chip `('dp',)` mesh (batch_size is the
GLOBAL batch and must divide by N), `--dtype bfloat16` switches compute
precision, `--ckpt_format pth` writes reference-loadable checkpoints.
"""

from __future__ import annotations


def main(args):
    import jax
    from lft_tpu.config import apply_platform
    apply_platform(args)
    from lft_tpu.parallel.distributed import maybe_initialize
    multihost = maybe_initialize(args)   # before anything touches devices
    if multihost:
        # reuse the reference's (vestigial) local_rank as the "who writes
        # checkpoints" gate -- trainer.fit saves only at local_rank == 0
        args.local_rank = args.process_id
    from lft_tpu.utils.logging import Logger, create_dir
    from lft_tpu.training.trainer import fit
    from lft_tpu.data.datasets import TrainDataset

    experiment_dir, checkpoints_dir, log_dir = create_dir(args)
    logger = Logger(log_dir, args)

    logger.log_string("\nLoad Training Dataset ...")
    dataset = TrainDataset(args, seed=args.seed)
    logger.log_string("The number of training data is: %d" % len(dataset))

    logger.log_string("\nModel Initial ...")
    logger.log_string("PARAMETER ...")
    logger.log_string(str(args))

    step_builder = None
    put_batch = None
    ndev = args.num_devices or (len(jax.devices()) if multihost else 1)
    if ndev > 1:
        from lft_tpu.parallel.mesh import get_mesh, make_dp_step_builder, put_global_batch
        if args.batch_size % ndev:
            raise ValueError(f"--batch_size {args.batch_size} must divide by "
                             f"--num_devices {ndev}")
        mesh = get_mesh(ndev)
        logger.log_string(f"Data-parallel over mesh {mesh}")
        step_builder = make_dp_step_builder(mesh)
        if multihost:
            from lft_tpu.parallel.distributed import make_distributed_put_batch
            put_batch = make_distributed_put_batch(mesh, args)
        else:
            put_batch = lambda d, l: put_global_batch(mesh, d, l)  # noqa: E731

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    logger.log_string("\nStart training...")
    try:
        params, history = fit(args, logger=logger, step_builder=step_builder,
                              dataset=dataset, checkpoints_dir=str(checkpoints_dir),
                              put_batch=put_batch)
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
    return params, history


if __name__ == "__main__":
    from lft_tpu.config import parse_args
    main(parse_args())
