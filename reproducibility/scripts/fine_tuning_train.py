"""Alias of :mod:`plip_tpu.scripts.fine_tuning_train` at the reference's module path
(/root/reference/reproducibility/scripts/fine_tuning_train.py) — importable AND runnable
(`python -m reproducibility.scripts.fine_tuning_train` / `python fine_tuning_train.py`)."""
from plip_tpu.scripts.fine_tuning_train import *  # noqa: F401,F403
from plip_tpu.scripts.fine_tuning_train import main  # noqa: F401

if __name__ == "__main__":
    main()
