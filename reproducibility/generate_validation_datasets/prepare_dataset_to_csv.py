"""Alias of :mod:`plip_tpu.datagen.prepare_dataset_to_csv` at the reference's
module path (/root/reference/reproducibility/generate_validation_datasets/
prepare_dataset_to_csv.py) — runnable like the original (its argparse
__main__ block executes via runpy)."""
from plip_tpu.datagen.prepare_dataset_to_csv import *  # noqa: F401,F403

if __name__ == "__main__":
    import runpy

    runpy.run_module("plip_tpu.datagen.prepare_dataset_to_csv",
                     run_name="__main__")
