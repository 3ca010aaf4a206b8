"""Alias package for the reference's WSI preprocessing pipelines."""
