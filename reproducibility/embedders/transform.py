from plip_tpu.data.transform import _train_transform, _transform  # noqa: F401
