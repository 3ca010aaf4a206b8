"""plip_tpu — TPU-native pathology CLIP framework.

A from-scratch JAX/XLA/Pallas rebuild of everything the PLIP reference stack
(`PathologyFoundation/plip` + its HF/OpenAI-CLIP/torchvision dependency
surface) provides: BPE tokenizer, dual-encoder towers, fused preprocessing,
the public `PLIP` API, the full reproducibility harness (zero-shot, linear
probing, retrieval, fine-tuning), and mesh-parallel training.
"""

__version__ = "0.1.0"

# Opt-in persistent XLA compile cache (PLIP_TPU_COMPILE_CACHE=1 or =/dir):
# on the remote-compile axon backend a warm cache turns ~3 min cold encode
# compiles (and ~10 min Mosaic bwd compiles) into seconds. Env-gated, so a
# bare import stays side-effect free.
import os as _os

if _os.environ.get("PLIP_TPU_COMPILE_CACHE"):
    from .utils.compile_cache import enable_from_env as _ecc

    _ecc()


def __getattr__(name):
    # lazy top-level conveniences (keep bare `import plip_tpu` light)
    if name == "PLIP":
        from .api import PLIP

        return PLIP
    if name == "CLIPConfig":
        from .models.config import CLIPConfig

        return CLIPConfig
    raise AttributeError(f"module 'plip_tpu' has no attribute {name!r}")
