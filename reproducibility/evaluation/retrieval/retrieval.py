from plip_tpu.eval.retrieval import ImageRetrieval  # noqa: F401
