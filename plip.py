"""Drop-in compatibility module: ``from plip import PLIP`` works exactly as
with the reference package (`/root/reference/plip.py`), backed by the
TPU-native implementation."""

from plip_tpu.api import PLIP

__all__ = ["PLIP"]
