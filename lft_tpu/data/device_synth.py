"""On-device synthetic light-field training stream.

Generates (Lr, Hr) SAI-mosaic batches entirely on the accelerator: smooth
random textures with per-view disparity shifts, downscaled with the same
Matlab-bicubic matrices the offline generators use (lft_tpu/ops/bicubic).
No host IO at all -- useful for smoke-training, kernel benchmarking and
input-pipeline-free scaling tests (on this project's tunneled dev TPU,
host->device batch transfer is orders of magnitude slower than the train
step itself).

This is a framework extra; real training uses the h5 datasets
(lft_tpu/data/datasets.py) exactly like the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lft_tpu.ops.bicubic import resize_matrix_matlab


@functools.partial(jax.jit, static_argnames=("batch", "ang_res", "patch",
                                             "scale", "disparity"))
def synth_batch(key, batch: int = 8, ang_res: int = 5, patch: int = 32,
                scale: int = 2, disparity: int = 1):
    """Returns (lr [B,1,A*patch,A*patch], hr [B,1,A*patch*S,A*patch*S]).

    hr views are integer-disparity crops of a shared band-limited texture
    (so angular attention sees real parallax structure); lr views are
    antialiased Matlab-bicubic downscales of the hr views.
    """
    a = ang_res
    hp = patch * scale
    c = (a - 1) / 2.0
    pad = int(abs(disparity) * a) + 2
    base_hw = hp + 2 * pad
    noise = jax.random.uniform(key, (batch, base_hw, base_hw))
    # band-limit with a few box blurs (separable, cheap)
    for _ in range(3):
        noise = (noise + jnp.roll(noise, 1, 1) + jnp.roll(noise, -1, 1)
                 + jnp.roll(noise, 1, 2) + jnp.roll(noise, -1, 2)) / 5.0
    noise = (noise - noise.min()) / (noise.max() - noise.min() + 1e-9)

    # per-view crops shifted by integer disparity
    views = []
    for u in range(a):
        row = []
        for v in range(a):
            dy = int(round((u - c) * disparity))
            dx = int(round((v - c) * disparity))
            row.append(noise[:, pad + dy:pad + dy + hp,
                             pad + dx:pad + dx + hp])
        views.append(jnp.stack(row, 1))
    hr_views = jnp.stack(views, 1)                      # [B, a, a, hp, hp]

    Wd = jnp.asarray(resize_matrix_matlab(hp, patch))   # [patch, hp]
    lr_views = jnp.einsum("ph,buvhw->buvpw", Wd, hr_views)
    lr_views = jnp.einsum("qw,buvpw->buvpq", Wd, lr_views)

    def mosaic(x):
        B, u, v, h, w = x.shape
        return x.transpose(0, 1, 3, 2, 4).reshape(B, 1, u * h, v * w)

    return mosaic(lr_views).astype(jnp.float32), \
        mosaic(hr_views).astype(jnp.float32)
