"""plip_tpu — TPU-native pathology CLIP framework.

A from-scratch JAX/XLA/Pallas rebuild of everything the PLIP reference stack
(`PathologyFoundation/plip` + its HF/OpenAI-CLIP/torchvision dependency
surface) provides: BPE tokenizer, dual-encoder towers, fused preprocessing,
the public `PLIP` API, the full reproducibility harness (zero-shot, linear
probing, retrieval, fine-tuning), and mesh-parallel training.
"""

__version__ = "0.1.0"
