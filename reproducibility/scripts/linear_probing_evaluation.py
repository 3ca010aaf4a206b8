"""Alias of :mod:`plip_tpu.scripts.linear_probing_evaluation` at the reference's module path
(/root/reference/reproducibility/scripts/linear_probing_evaluation.py) — importable AND runnable
(`python -m reproducibility.scripts.linear_probing_evaluation` / `python linear_probing_evaluation.py`)."""
from plip_tpu.scripts.linear_probing_evaluation import *  # noqa: F401,F403
from plip_tpu.scripts.linear_probing_evaluation import main  # noqa: F401

if __name__ == "__main__":
    main()
