from plip_tpu.data.datasets import (  # noqa: F401
    CLIPCaptioningDataset,
    CLIPImageCaptioningDataset,
    CLIPImageDataset,
    CLIPImageLabelDataset,
)
