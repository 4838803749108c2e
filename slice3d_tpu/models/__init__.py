from . import layers, vgg

__all__ = ["layers", "vgg"]
