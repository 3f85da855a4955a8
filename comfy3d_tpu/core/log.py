"""Logging utilities (reference `shared_utils/log_utils.py` role).

`cstr` mirrors the reference's color-string helper API
(`cstr("...").msg.print()` / `.warning.print()` / `.error.print()`)
over a stdlib logger, so node code reads the same while output rides
Python logging (configurable by embedders)."""

from __future__ import annotations

import logging
import sys

logger = logging.getLogger("comfy3d_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stdout)
    _h.setFormatter(logging.Formatter("[comfy3d] %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)

_COLORS = {"msg": "\033[92m", "warning": "\033[93m",
           "error": "\033[91m", "end": "\033[0m"}


class _Styled:
    def __init__(self, text: str, level: str):
        self.text = text
        self.level = level

    def print(self) -> None:
        colored = (f"{_COLORS.get(self.level, '')}{self.text}"
                   f"{_COLORS['end']}")
        if self.level == "error":
            logger.error(colored)
        elif self.level == "warning":
            logger.warning(colored)
        else:
            logger.info(colored)


class cstr(str):
    @property
    def msg(self) -> _Styled:
        return _Styled(self, "msg")

    @property
    def warning(self) -> _Styled:
        return _Styled(self, "warning")

    @property
    def error(self) -> _Styled:
        return _Styled(self, "error")
