"""Compatibility alias package: the reference harness's module paths
(``reproducibility.*``, see /root/reference/reproducibility/) re-exported from
the TPU-native implementations, so reference-era scripts import unmodified."""
