from plip_tpu.utils.results_handler import ResultsHandler  # noqa: F401
