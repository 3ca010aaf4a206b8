# Intentionally empty — mirrors the reference's placeholder
# (/root/reference/reproducibility/training_model/efficientnet.py, 0 lines).
