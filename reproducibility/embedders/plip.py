from plip_tpu.embedders.clip_embedder import CLIPEmbedder  # noqa: F401
