from plip_tpu.train.scheduler import cosine_lr  # noqa: F401
