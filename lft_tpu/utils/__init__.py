from lft_tpu.utils.logging import Logger, create_dir, get_logger  # noqa: F401
from lft_tpu.utils.checkpoint import (  # noqa: F401
    save_checkpoint, load_checkpoint, pth_to_params, params_to_pth,
)
