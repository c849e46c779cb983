from semantic_segmentation_tpu.models.vae.sivae import (  # noqa: F401
    DNLayersMulti,
    GUnetAddInput,
    ResNet18Encoder,
    SoftIntroVAE,
    calc_kl,
    calc_reconstruction_loss,
    reparameterize,
)
