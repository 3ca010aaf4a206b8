# The reference ships an empty placeholder here; the working DenseNet embedder
# lives at reproducibility.embedders.mudipath / plip_tpu.embedders.mudipath.
