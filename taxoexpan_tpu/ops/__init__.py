from . import segment, star

__all__ = ["segment", "star"]
