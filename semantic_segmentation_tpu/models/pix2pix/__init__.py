from semantic_segmentation_tpu.models.pix2pix.networks import (  # noqa: F401
    NLayerDiscriminator,
    PixelDiscriminator,
    ResnetGenerator,
    UnetGenerator,
    define_D,
    define_G,
)
