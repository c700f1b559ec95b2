from . import hyperkzg, srs

__all__ = ["hyperkzg", "srs"]
