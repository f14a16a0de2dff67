from .journal import JournalNet
from .net import LocalNet, Net, SpmdNet

__all__ = ["Net", "LocalNet", "SpmdNet", "JournalNet"]
