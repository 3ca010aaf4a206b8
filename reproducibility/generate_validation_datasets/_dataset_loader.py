"""Alias of :mod:`plip_tpu.datagen.dataset_loader` at the reference's module
path (/root/reference/reproducibility/generate_validation_datasets/_dataset_loader.py)."""
from plip_tpu.datagen.dataset_loader import *  # noqa: F401,F403
