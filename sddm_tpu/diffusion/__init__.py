from .schedule import DiffusionSchedule, make_beta_schedule, subsample_schedule
from . import transitions
from .variable import VariableSchedule, variable_tables

__all__ = [
    "DiffusionSchedule",
    "make_beta_schedule",
    "subsample_schedule",
    "transitions",
    "VariableSchedule",
    "variable_tables",
]
