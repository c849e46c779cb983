from semantic_segmentation_tpu.engine.bilevel import (  # noqa: F401
    BilevelEngine,
    EngineState,
    InnerProblem,
)
