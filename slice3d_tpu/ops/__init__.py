from .grid_sample import grid_sample_2d
from .projection import project_points
from .resize import resize_nearest, resize_bilinear

__all__ = ["grid_sample_2d", "project_points", "resize_nearest", "resize_bilinear"]
