from semantic_segmentation_tpu.models.diffusion.bbdm import (  # noqa: F401
    BrownianBridge,
    BridgeSchedule,
)
from semantic_segmentation_tpu.models.diffusion.ema import EMA  # noqa: F401
