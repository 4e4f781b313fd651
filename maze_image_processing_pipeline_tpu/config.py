"""Self-documenting YAML config framework.

Capability parity with ``maze_ipp/config.py``:

* :func:`generate_yaml_example` renders a commented YAML example from a
  pydantic model (unions as ``## OR ##`` alternatives, defaults as commented
  lines, nested models indented, ``debug``-flagged fields hidden, every field
  must carry a description).
* :class:`DefaultModel` — a scalar shortform is routed to a designated field
  (``threshold_brighter: 43`` can be written as ``threshold: 43``).
* :class:`TrueToDefaultsModel` — the literal ``true`` expands to all-defaults.
"""

from __future__ import annotations

import json
import re
from textwrap import indent, wrap
from types import NoneType, UnionType
from typing import (
    Any,
    ClassVar,
    Literal,
    Mapping,
    Tuple,
    Type,
    Union,
    get_args,
    get_origin,
)

from pydantic import BaseModel, model_validator
from pydantic.fields import FieldInfo
from pydantic_core import PydanticUndefined

__all__ = ["generate_yaml_example", "DefaultModel", "TrueToDefaultsModel"]

_SPHINX_ATTR = re.compile(r":attr:`([^`]*)`", flags=re.MULTILINE)


def _strip_sphinx(description: str) -> str:
    """Rewrite ``:attr:`~a.b.c``` roles to plain backticked names."""
    return _SPHINX_ATTR.sub(
        lambda m: "`"
        + (m.group(1).rsplit(".")[-1] if m.group(1).startswith("~") else m.group(1))
        + "`",
        description,
    )


def generate_yaml_example(model: Type[BaseModel], depth: int = 1) -> str:
    """Render a commented YAML example for a pydantic model class."""

    def field_example(name: str, field: FieldInfo) -> Tuple[str, str]:
        ann = field.annotation
        if ann is None:
            raise ValueError(f"{name} has no annotation")

        if get_origin(ann) in {Union, UnionType}:
            # Optional fields: drop NoneType from the alternatives
            union_types = [t for t in get_args(ann) if t is not NoneType]

            alternatives = []
            have_ellipsis = False
            for t in union_types:
                if get_origin(t) is Literal:
                    alternatives.append(f"# {name}: {json.dumps(get_args(t)[0])}")
                elif get_origin(t) is None and isinstance(t, type) and issubclass(t, BaseModel):
                    alternatives.append(
                        f"# {name}:\n" + indent(generate_yaml_example(t, depth + 1), "#   ")
                    )
                elif not have_ellipsis:
                    alternatives.append(f"# {name}: ...")
                    have_ellipsis = True

            return "\n# ## OR ##\n".join(alternatives), "optional"

        if field.default is not PydanticUndefined:
            return f"# {name}: {json.dumps(field.default)}", "optional"

        if isinstance(ann, type) and issubclass(ann, BaseModel):
            return (
                f"{name}:\n" + indent(generate_yaml_example(ann, depth + 1), "  " * depth),
                "required",
            )

        return f"{name}: ...", "required"

    blocks = []
    for name, field in model.model_fields.items():
        extra = field.json_schema_extra
        if isinstance(extra, Mapping) and extra.get("debug", False):
            continue

        if field.description is None:
            raise ValueError(f"{name} has no description")

        example, modifier = field_example(name, field)
        description = _strip_sphinx(field.description)

        lines = []
        for line in f"[{modifier}] {description}".splitlines():
            lines.append(indent("\n".join(wrap(line, break_on_hyphens=False)), "## "))
        lines.append(example)
        blocks.append("\n".join(lines))

    return "\n\n".join(blocks)


class DefaultModel(BaseModel):
    """A model that accepts a scalar shortform routed to ``__default_field__``."""

    __default_field__: ClassVar[str]

    @model_validator(mode="before")
    @classmethod
    def parse_shortform(cls, data: Any):
        if not isinstance(data, Mapping):
            return {cls.__default_field__: data}
        return data


class TrueToDefaultsModel(BaseModel):
    """A model where the literal ``true`` means "enable with all defaults"."""

    @model_validator(mode="before")
    @classmethod
    def parse_shortform(cls, data: Any):
        if data is True:
            return {}
        return data
