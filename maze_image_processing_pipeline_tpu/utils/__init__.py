"""Utility namespace: re-exports the shared infrastructure modules."""

from ..common import (
    FormatParser,
    add_note,
    convert_img_dtype,
    natsort_key,
    natsorted,
    recursive_update,
)
from ..config import DefaultModel, TrueToDefaultsModel, generate_yaml_example
from ..progress import LogProgress, ProgressLogger, format_interval, format_number

__all__ = [
    "FormatParser",
    "add_note",
    "convert_img_dtype",
    "natsort_key",
    "natsorted",
    "recursive_update",
    "DefaultModel",
    "TrueToDefaultsModel",
    "generate_yaml_example",
    "LogProgress",
    "ProgressLogger",
    "format_interval",
    "format_number",
]
