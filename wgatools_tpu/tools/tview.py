"""Terminal alignment viewer (reference: src/tools/tview.rs). Full impl in M4."""

from ..errors import NotImplementedFeature


def tview(*args, **kwargs):
    raise NotImplementedFeature()
