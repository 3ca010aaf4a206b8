from plip_tpu.embedders.abst import AbstractEmbedder  # noqa: F401
