"""Editable-install shim: this sandbox has setuptools but no `wheel`
package and no package index, so PEP 660 editable wheels cannot build —
pip falls back to `setup.py develop` when the legacy backend is used
(pyproject.toml intentionally omits [build-system]). All metadata lives
in pyproject.toml; this file only exists so `pip install -e .` works
offline. Mirrors the reference binding's pyproject+setup.py pairing
(/root/reference/bindings/python/)."""

from setuptools import setup

setup()
