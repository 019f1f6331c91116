"""CPU golden reference — the correctness oracle (SURVEY.md §2 C14)."""

from . import golden

__all__ = ["golden"]
