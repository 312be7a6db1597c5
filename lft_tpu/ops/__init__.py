from lft_tpu.ops.sai import (  # noqa: F401
    mosaic_to_views, views_to_mosaic, mosaic_to_view_grid, view_grid_to_mosaic,
    flip_sai, crop_center_view,
)
from lft_tpu.ops.posenc import position_encoding_1d, spatial_position, angular_position  # noqa: F401
from lft_tpu.ops.bicubic import (  # noqa: F401
    resize_matrix_torch, resize_matrix_matlab, resize2d, bicubic_upscale_views,
    imresize,
)
from lft_tpu.ops.color import rgb2ycbcr, ycbcr2rgb  # noqa: F401
from lft_tpu.ops.metrics import psnr, ssim, cal_metrics, cal_loss_class  # noqa: F401
from lft_tpu.ops.tiling import lf_divide, lf_integrate, image_extend, tiling_grid  # noqa: F401
