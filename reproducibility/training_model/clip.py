from plip_tpu.train.clip_tuner import (  # noqa: F401
    CLIPTuner,
    image_embedder,
    text_embedder,
    zero_shot_classification,
)
