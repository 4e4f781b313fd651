"""Workload runner scaffold: logging, task-file handling, config dispatch.

Capability parity with ``maze_ipp/pipeline_runner.py``: Rich console +
timestamped file logging, chdir to the task file's directory, excepthook
capture, YAML load, and dispatch to the workload's ``_configure_and_run``.
"""

from __future__ import annotations

import abc
import datetime
import logging
import os
import sys

import yaml

__all__ = ["PipelineRunner"]


class PipelineRunner(abc.ABC):
    @classmethod
    def run(cls, task_fn: str) -> None:
        root_logger = logging.getLogger()
        root_logger.setLevel(logging.INFO)

        try:
            from rich.highlighter import NullHighlighter
            from rich.logging import RichHandler

            stdout_handler: logging.Handler = RichHandler(highlighter=NullHighlighter())
        except ImportError:  # pragma: no cover
            stdout_handler = logging.StreamHandler()
        stdout_handler.setLevel(logging.DEBUG)
        root_logger.addHandler(stdout_handler)

        sys.path.insert(0, os.path.realpath(os.curdir))
        os.chdir(os.path.dirname(task_fn) or ".")

        task_name = os.path.splitext(os.path.basename(task_fn))[0]
        task_mtime = datetime.datetime.fromtimestamp(os.stat(task_fn).st_mtime)

        log_fn = os.path.abspath(
            f"{task_name}-{datetime.datetime.now().isoformat(timespec='seconds')}.log"
        )
        print(f"Logging to {log_fn}.")
        file_handler = logging.FileHandler(log_fn)
        file_handler.setLevel(logging.DEBUG)
        root_logger.addHandler(file_handler)

        def log_except_hook(*exc_info):
            root_logger.error("Unhandled exception", exc_info=exc_info)  # type: ignore[arg-type]

        sys.excepthook = log_except_hook
        logging.captureWarnings(True)

        root_logger.info(
            "Loading pipeline config from %s (last modified %s)",
            task_fn,
            task_mtime.isoformat(timespec="seconds"),
        )

        log_levels = {
            name: logging.getLevelName(logging.getLogger(name).getEffectiveLevel())
            for name in sorted(root_logger.manager.loggerDict)
        }
        root_logger.info("Log levels: %s", log_levels)

        with open(task_fn) as f:
            config_dict = yaml.safe_load(f)

        # Backend override: MAZE_IPP_PLATFORM=cpu forces the CPU backend
        # for a CLI run (smoke tests, hosts whose accelerator is wedged).
        # Applied via the config API because some TPU plugins ignore the
        # JAX_PLATFORMS env var entirely (see CLAUDE.md platform traps).
        platform = os.environ.get("MAZE_IPP_PLATFORM")
        if platform:
            import jax

            root_logger.info("MAZE_IPP_PLATFORM=%s: forcing backend", platform)
            jax.config.update("jax_platforms", platform)

        # Persistent XLA compilation cache: repeat runs skip the minutes of
        # jit compiles on tunneled TPU hosts. Configured via the config API
        # because some TPU plugins ignore the env var (see CLAUDE.md);
        # override the location with MAZE_IPP_COMPILE_CACHE (empty = off).
        cache_dir = os.environ.get(
            "MAZE_IPP_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "maze_ipp_tpu", "xla"
            ),
        )
        if cache_dir:
            try:
                import jax

                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 0.5
                )
            except Exception:  # pragma: no cover - cache is best-effort
                root_logger.warning("Could not enable the XLA compile cache")

        # Optional device tracing: MAZE_IPP_PROFILE_DIR=<dir> captures a
        # jax.profiler trace of the whole run (view with TensorBoard /
        # xprof). SURVEY.md §5: the reference has no tracing; we add it.
        profile_dir = os.environ.get("MAZE_IPP_PROFILE_DIR")
        if profile_dir:
            import jax

            root_logger.info("Capturing jax.profiler trace to %s", profile_dir)
            jax.profiler.start_trace(profile_dir)
        try:
            cls._configure_and_run(config_dict)
        finally:
            if profile_dir:
                import jax

                jax.profiler.stop_trace()

        root_logger.info("Finished processing.")

    @staticmethod
    @abc.abstractmethod
    def _configure_and_run(config_dict): ...
