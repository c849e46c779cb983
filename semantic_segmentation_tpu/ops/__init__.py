from semantic_segmentation_tpu.ops import losses, image, augment, nas  # noqa: F401
