from plip_tpu.eval.metrics import eval_metrics, retrieval_metrics  # noqa: F401
