from plip_tpu.embedders.factory import EmbedderFactory  # noqa: F401
