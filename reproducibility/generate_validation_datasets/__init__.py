"""Alias package for the reference's validation-dataset generation tree
(/root/reference/reproducibility/generate_validation_datasets/)."""
