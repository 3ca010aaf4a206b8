from plip_tpu.train.finetune import FineTuner, LinearClassifier  # noqa: F401
