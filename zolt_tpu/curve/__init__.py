from . import device, host

__all__ = ["device", "host"]
