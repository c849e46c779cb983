from semantic_segmentation_tpu.data.folder import (  # noqa: F401
    DATASET_SPECS,
    PairedImageFolder,
    make_dataset,
)
from semantic_segmentation_tpu.data.extra import (  # noqa: F401
    ColorizationDataset,
    InpaintingDataset,
    LABColorizationDataset,
    SingleImageDataset,
    BSubtilisDataset,
    DeePiCtDataset,
    DiabeticDataset,
    NibSliceDataset,
    OmniposeDataset,
)
from semantic_segmentation_tpu.data.pipeline import (  # noqa: F401
    batch_iterator,
    eval_batches,
    stack_dataset,
    subset_split,
)
from semantic_segmentation_tpu.data.synthetic import SyntheticSegDataset  # noqa: F401
