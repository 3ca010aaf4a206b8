"""Alias of :mod:`plip_tpu.datagen.preprocess_digestpath` at the reference's
module path (/root/reference/reproducibility/generate_validation_datasets/
preprocess/preprocess_DigestPath.py) — runnable like the original."""
from plip_tpu.datagen.preprocess_digestpath import *  # noqa: F401,F403

if __name__ == "__main__":
    import runpy

    runpy.run_module("plip_tpu.datagen.preprocess_digestpath",
                     run_name="__main__")
