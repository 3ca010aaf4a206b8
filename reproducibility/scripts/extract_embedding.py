"""Alias of :mod:`plip_tpu.scripts.extract_embedding` at the reference's module path
(/root/reference/reproducibility/scripts/extract_embedding.py) — importable AND runnable
(`python -m reproducibility.scripts.extract_embedding` / `python extract_embedding.py`)."""
from plip_tpu.scripts.extract_embedding import *  # noqa: F401,F403
from plip_tpu.scripts.extract_embedding import main  # noqa: F401

if __name__ == "__main__":
    main()
