"""Shim for environments whose setuptools lacks the `wheel` package
(PEP 660 editable installs need bdist_wheel): `python setup.py develop`
installs the same metadata + `log2seq-ray` console script declared in
pyproject.toml. Everything lives in pyproject.toml; this file adds no
configuration."""

from setuptools import setup

setup()
