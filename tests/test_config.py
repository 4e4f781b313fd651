from typing import Literal

import pytest
from pydantic import BaseModel, Field

from maze_image_processing_pipeline_tpu.config import (
    DefaultModel,
    TrueToDefaultsModel,
    generate_yaml_example,
)


class Inner(TrueToDefaultsModel):
    radius: int = Field(3, description="A radius.")


class Short(DefaultModel):
    __default_field__ = "threshold"
    threshold: float = Field(..., description="The threshold.")


class Root(BaseModel):
    name: str = Field(description="A name.")
    inner: Inner | Literal[False] = Field(False, description="Inner config.")
    maybe: int | None = Field(None, description="Maybe a number.")
    hidden: int = Field(0, description="Hidden.", json_schema_extra={"debug": True})


def test_default_model_shortform():
    assert Short.model_validate(0.5).threshold == 0.5
    assert Short.model_validate({"threshold": 1.5}).threshold == 1.5


def test_true_to_defaults():
    assert Inner.model_validate(True).radius == 3
    assert Inner.model_validate({"radius": 7}).radius == 7


def test_generate_yaml_example():
    out = generate_yaml_example(Root)
    assert "name: ..." in out
    assert "[required]" in out
    assert "[optional]" in out
    assert "## OR ##" in out  # union alternatives
    assert "radius" in out  # nested model rendered
    assert "hidden" not in out  # debug fields skipped
    assert "false" in out  # Literal[False] alternative


def test_generate_yaml_example_requires_description():
    class Bad(BaseModel):
        x: int = 1

    with pytest.raises(ValueError):
        generate_yaml_example(Bad)


def test_docs_generated_config_in_sync():
    """docs/*.md embed the `maze-ipp config` output (the reference embeds
    it at doc build time, docs/loki.rst:30); the embedded blocks must match
    the current schemas."""
    import importlib.util
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "build_docs", repo / "tools" / "build_docs.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for page in ("loki.md", "predict.md"):
        text = (repo / "docs" / page).read_text()
        assert "BEGIN GENERATED CONFIG" in text, page
        assert mod.render(text) == text, f"{page} stale: run tools/build_docs.py"
