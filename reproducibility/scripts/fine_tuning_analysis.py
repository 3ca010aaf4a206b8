"""Alias of :mod:`plip_tpu.scripts.fine_tuning_analysis` at the reference's module path
(/root/reference/reproducibility/scripts/fine_tuning_analysis.py) — importable AND runnable
(`python -m reproducibility.scripts.fine_tuning_analysis` / `python fine_tuning_analysis.py`)."""
from plip_tpu.scripts.fine_tuning_analysis import *  # noqa: F401,F403
from plip_tpu.scripts.fine_tuning_analysis import main  # noqa: F401

if __name__ == "__main__":
    main()
