"""Alias of :mod:`plip_tpu.scripts.retrieval_evaluation` at the reference's module path
(/root/reference/reproducibility/scripts/retrieval_evaluation.py) — importable AND runnable
(`python -m reproducibility.scripts.retrieval_evaluation` / `python retrieval_evaluation.py`)."""
from plip_tpu.scripts.retrieval_evaluation import *  # noqa: F401,F403
from plip_tpu.scripts.retrieval_evaluation import main  # noqa: F401

if __name__ == "__main__":
    main()
