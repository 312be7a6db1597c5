from lft_tpu.models import lft  # noqa: F401  (registers the LFT model)
