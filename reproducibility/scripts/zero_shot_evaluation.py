"""Alias of :mod:`plip_tpu.scripts.zero_shot_evaluation` at the reference's module path
(/root/reference/reproducibility/scripts/zero_shot_evaluation.py) — importable AND runnable
(`python -m reproducibility.scripts.zero_shot_evaluation` / `python zero_shot_evaluation.py`)."""
from plip_tpu.scripts.zero_shot_evaluation import *  # noqa: F401,F403
from plip_tpu.scripts.zero_shot_evaluation import main  # noqa: F401

if __name__ == "__main__":
    main()
