"""Thin shim for legacy tooling; all metadata lives in pyproject.toml."""

from setuptools import setup

setup()
