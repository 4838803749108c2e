from .schedule import DiffusionSchedule, DDIMParams

__all__ = ["DiffusionSchedule", "DDIMParams"]
