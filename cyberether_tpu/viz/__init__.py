"""Visualization support: colormaps and host-side rendering."""

from cyberether_tpu.viz.colormaps import turbo_lut, apply_colormap  # noqa: F401
