"""lft_tpu — a TPU-native (JAX/XLA/Pallas) light-field super-resolution framework.

A from-scratch rebuild of the capabilities of LFT ("Light Field Image
Super-Resolution with Transformers", IEEE SPL 2022; reference implementation
HydrogenSulfate/LFT), designed TPU-first:

* the model forward is a pure function over a flat parameter pytree with
  static shapes, jit/vmap/shard_map-friendly;
* the spatial transformer's local-window attention is computed with a tiled
  halo formulation (and optionally a fused Pallas kernel) instead of the
  reference's dense O((hw)^2) additive mask (reference model/LFT.py:147-162);
* full-scene tiled inference (LFdivide -> batched forward -> LFintegrate,
  reference test.py:83-99) is one compiled, batched pipeline;
* bicubic resampling, PSNR/SSIM evaluation and data generation are
  Matlab-free and run on-device;
* training is data-parallel over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from lft_tpu import config  # noqa: F401
from lft_tpu.registry import get_model, get_loss, MODEL_REGISTRY  # noqa: F401
from lft_tpu import models  # noqa: F401  (imports register the built-in models)
