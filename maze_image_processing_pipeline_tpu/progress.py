"""Rate/ETA progress logging for non-TTY runs.

Capability parity with ``maze_ipp/log_progress.py``: EMA-smoothed processing
rate, SI/IEC number formatting, interval-gated log lines, and a stream node
that derives totals from ``n_remaining_hint``.
"""

from __future__ import annotations

import logging
import time
from typing import Optional

from .engine.core import Node, RawOrVariable, Stream, closing_if_closable

logger = logging.getLogger(__name__)

__all__ = ["ProgressLogger", "LogProgress", "format_number", "format_interval"]

_SI = [(1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "k")]
_IEC = [(2**40, "Ti"), (2**30, "Gi"), (2**20, "Mi"), (2**10, "ki")]


def format_number(x: float, format: Optional[str] = "si") -> str:
    """Format with SI ('si') or binary ('iec') prefixes, or plain (None)."""
    if format == "si":
        table = _SI
    elif format == "iec":
        table = _IEC
    elif format is None:
        return f"{x:.2f}"
    else:
        raise ValueError(f"Unsupported format: {format!r}")
    for factor, suffix in table:
        if abs(x) >= factor:
            return f"{x / factor:.2f}{suffix}"
    return f"{x:.2f}"


def format_interval(t: float) -> str:
    mins, s = divmod(int(t), 60)
    h, m = divmod(mins, 60)
    if h:
        return f"{h:d}:{m:02d}:{s:02d}"
    return f"{m:02d}:{s:02d}"


class ProgressLogger:
    """Log items/sec + ETA at a fixed interval with EMA rate smoothing."""

    def __init__(
        self,
        *,
        description: Optional[str] = None,
        n_total: Optional[float] = None,
        log_interval: float = 60,
        unit: str = "it",
        number_format: Optional[str] = "si",
        smoothing: float = 0.5,
        ema_warmup_count: float = 0,
    ) -> None:
        if smoothing <= 0.0 or smoothing > 1.0:
            raise ValueError(f"smoothing must be in (0, 1], got {smoothing}")
        self.description = description
        self.n_total = n_total
        self.log_interval = log_interval
        self.unit = unit
        self.number_format = number_format
        self.smoothing = smoothing
        self.ema_warmup_count = ema_warmup_count

        self.n_done = 0
        self.t_last_update = time.time()
        self.elapsed = 0.0
        self._last_emit_t: Optional[float] = None
        self._count_at_emit = 0
        self._ema_rate: Optional[float] = None

    def update(self, n: int = 1) -> None:
        now = time.time()
        self.elapsed += now - self.t_last_update
        self.t_last_update = now
        self.n_done += n

        if self._last_emit_t is not None and now <= self._last_emit_t + self.log_interval:
            return

        if self._last_emit_t is None:
            rate = self.n_done / max(self.elapsed, 1e-9)
        else:
            dt = now - self._last_emit_t
            rate = (self.n_done - self._count_at_emit) / max(dt, 1e-9)
            if (
                self._ema_rate is not None
                and self.n_done >= self.ema_warmup_count
            ):
                rate = self.smoothing * self._ema_rate + (1 - self.smoothing) * rate

        self._last_emit_t = now
        self._count_at_emit = self.n_done
        self._ema_rate = rate

        parts = []
        if self.n_total:
            remaining = max(self.n_total - self.n_done, 0) / max(rate, 1e-9)
            parts.append(
                f"{format_number(self.n_done, self.number_format)} / "
                f"{format_number(self.n_total, self.number_format)}"
            )
            parts.append(f"{self.n_done / self.n_total:.2%}")
            parts.append(f"{format_interval(self.elapsed)} + {format_interval(remaining)}")
        else:
            parts.append(f"{format_number(self.n_done, self.number_format)} / ?")
            parts.append(format_interval(self.elapsed))

        if rate >= 1 or rate <= 0:
            parts.append(f"{format_number(rate, self.number_format)}{self.unit}/s")
        else:
            parts.append(f"{1 / rate:.2f}s/{self.unit}")

        msg = ", ".join(parts)
        if self.description:
            msg = f"{self.description}: {msg}"
        logger.info(msg)


class LogProgress(Node):
    """Stream node logging progress; totals come from ``n_remaining_hint``."""

    def __init__(
        self,
        description: Optional[RawOrVariable[str]] = None,
        *,
        log_interval: float = 60,
        unit: str = "it",
        number_format: Optional[str] = "si",
        smoothing: float = 0.5,
        ema_warmup_count: float = 0,
    ) -> None:
        self.description = description
        self.log_interval = log_interval
        self.unit = unit
        self.number_format = number_format
        self.smoothing = smoothing
        self.ema_warmup_count = ema_warmup_count
        super().__init__()

    def transform_stream(self, stream: Stream) -> Stream:
        plog = ProgressLogger(
            log_interval=self.log_interval,
            unit=self.unit,
            number_format=self.number_format,
            smoothing=self.smoothing,
            ema_warmup_count=self.ema_warmup_count,
        )
        with closing_if_closable(stream):
            for n_processed, obj in enumerate(stream):
                description = self.prepare_input(obj, "description")
                if description is not None:
                    plog.description = str(description)
                if obj.n_remaining_hint is not None:
                    plog.n_total = n_processed + obj.n_remaining_hint
                plog.update()
                yield obj
