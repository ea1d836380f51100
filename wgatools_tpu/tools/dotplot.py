"""Dotplot rendering (reference: src/tools/dotplot.rs). Full impl in M4."""

from ..errors import NotImplementedFeature


def dotplot(*args, **kwargs):
    raise NotImplementedFeature()
