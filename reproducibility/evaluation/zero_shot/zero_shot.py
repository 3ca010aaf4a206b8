from plip_tpu.eval.zero_shot import ZeroShotClassifier  # noqa: F401
