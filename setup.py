"""Packaging shim (cf. the reference's setup.py:1-6); pyproject.toml is
the real metadata source."""

from setuptools import setup

setup()
