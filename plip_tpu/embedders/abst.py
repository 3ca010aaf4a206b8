"""Embedder interface (`/root/reference/reproducibility/embedders/abst.py:3-11`)."""

from abc import ABC, abstractmethod


class AbstractEmbedder(ABC):
    @abstractmethod
    def image_embedder(self, images, device=None, num_workers=1, batch_size=32):
        ...

    @abstractmethod
    def text_embedder(self, texts, device=None, num_workers=1, batch_size=32):
        ...
