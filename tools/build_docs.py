#!/usr/bin/env python
"""Regenerate the generated-config blocks embedded in docs/*.md.

The reference embeds ``maze-ipp config`` output into its documentation at
build time (``/root/reference/docs/loki.rst:30`` via a sphinx directive);
this is the markdown analog: every block between

    <!-- BEGIN GENERATED CONFIG: <module> -->
    <!-- END GENERATED CONFIG -->

markers is replaced with the current ``maze-ipp config <module>`` output,
so the docs can never drift from the schema (tests/test_config.py checks
they are in sync).

Usage: python tools/build_docs.py [--check]
"""

from __future__ import annotations

import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MARKER = re.compile(
    r"(<!-- BEGIN GENERATED CONFIG: (\w+) -->\n).*?(<!-- END GENERATED CONFIG -->)",
    re.DOTALL,
)


def generated_config(module: str) -> str:
    from maze_image_processing_pipeline_tpu.config import generate_yaml_example

    if module == "loki":
        from maze_image_processing_pipeline_tpu.loki.config_schema import (
            SegmentationPipelineConfig as Schema,
        )
    elif module == "predict":
        from maze_image_processing_pipeline_tpu.predict.config_schema import (
            PredictionPipelineConfig as Schema,
        )
    else:
        raise ValueError(f"Unknown module: {module}")
    return generate_yaml_example(Schema)


def render(text: str) -> str:
    def sub(m: re.Match) -> str:
        body = generated_config(m.group(2)).rstrip("\n")
        return f"{m.group(1)}```yaml\n{body}\n```\n{m.group(3)}"

    return MARKER.sub(sub, text)


def main() -> int:
    check = "--check" in sys.argv
    stale = []
    for path in sorted((REPO / "docs").glob("*.md")):
        old = path.read_text()
        new = render(old)
        if new != old:
            if check:
                stale.append(path.name)
            else:
                path.write_text(new)
                print(f"updated {path.name}")
    if stale:
        print(f"STALE docs (run tools/build_docs.py): {', '.join(stale)}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
