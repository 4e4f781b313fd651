"""CLI surface tests (L5): the ``maze-ipp`` command group.

Parity target: the reference's ``maze_ipp/cli.py`` (loki/predict
subcommands taking a YAML task file, plus config generation). The CLI was
the one layer without direct test coverage (round-3 gap-fill).
"""

import os

import yaml
from click.testing import CliRunner

from maze_image_processing_pipeline_tpu.cli import cli

from fixtures import make_loki_sample


def test_version():
    result = CliRunner().invoke(cli, ["--version"])
    assert result.exit_code == 0
    assert result.output.strip()


def test_help_lists_all_subcommands():
    result = CliRunner().invoke(cli, ["--help"])
    assert result.exit_code == 0
    for sub in ("loki", "predict", "semseg", "polytaxo", "config"):
        assert sub in result.output


def test_config_examples_are_valid_yaml():
    for module, top_keys in (
        ("loki", {"input", "segmentation", "output"}),
        ("predict", {"input", "model"}),
        ("semseg", {"input", "model"}),
    ):
        result = CliRunner().invoke(cli, ["config", module])
        assert result.exit_code == 0, result.output
        parsed = yaml.safe_load(result.output)
        assert top_keys <= set(parsed), (module, set(parsed))


def test_config_unknown_module_fails():
    result = CliRunner().invoke(cli, ["config", "nope"])
    assert result.exit_code != 0


def test_loki_missing_task_file_fails():
    result = CliRunner().invoke(cli, ["loki", "/does/not/exist.yaml"])
    assert result.exit_code != 0


def test_loki_cli_end_to_end(tmp_path):
    """`maze-ipp loki task.yaml` runs the threshold pipeline to an archive
    (the reference's CLI contract: a YAML task file is the only input)."""
    make_loki_sample(str(tmp_path / "data"), n_frames=2, objects_per_frame=2)
    target_dir = tmp_path / "out"
    task = {
        "input": {"path": str(tmp_path / "data")},
        "segmentation": {"threshold": 60},
        "postprocess": {},
        "output": {"target_dir": str(target_dir)},
    }
    task_fn = tmp_path / "task.yaml"
    task_fn.write_text(yaml.safe_dump(task))

    cwd = os.getcwd()
    try:
        result = CliRunner().invoke(
            cli, ["loki", str(task_fn)], catch_exceptions=False
        )
    finally:
        os.chdir(cwd)  # Runner.run chdirs to the task directory
    assert result.exit_code == 0, result.output
    assert (target_dir / "LOKI_PS122-1_7.zip").exists()
    # The runner writes a timestamped log file next to the task file.
    assert any(p.suffix == ".log" for p in tmp_path.iterdir())
