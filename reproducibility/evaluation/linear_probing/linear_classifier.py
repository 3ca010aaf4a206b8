from plip_tpu.eval.linear_probe import LinearProber  # noqa: F401
