from .net import LocalNet, Net, SpmdNet

__all__ = ["Net", "LocalNet", "SpmdNet"]
