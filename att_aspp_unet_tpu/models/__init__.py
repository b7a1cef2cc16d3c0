"""Model zoo: Attention-ASPP-UNet (flagship) + PlainConvUNet baseline with the
sliding-window Gaussian-weighted tiled predictor."""

from .att_aspp_unet import AttentionASPPUNet, create_model  # noqa: F401
from .plain_unet import PlainConvUNet  # noqa: F401
from .sliding_window import sliding_window_predict  # noqa: F401
