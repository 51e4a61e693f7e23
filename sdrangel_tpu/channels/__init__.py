"""Channel demodulators and modulators (reference: plugins/channelrx, channeltx)."""

from .registry import REGISTRY, get_demod  # noqa: F401
