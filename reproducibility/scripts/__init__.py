"""Alias package for the reference's eval/driver CLIs
(/root/reference/reproducibility/scripts/)."""
