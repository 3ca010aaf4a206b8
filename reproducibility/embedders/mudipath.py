from plip_tpu.embedders.mudipath import (  # noqa: F401
    DenseNetEmbedder,
    build_densenet,
    build_resnet,
)
