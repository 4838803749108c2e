from .metrics import (
    chamfer_metrics,
    hausdorff_distance,
    sample_mesh_surface,
)

__all__ = ["chamfer_metrics", "hausdorff_distance", "sample_mesh_surface"]
