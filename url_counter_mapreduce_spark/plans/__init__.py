"""Plan inspection helpers (scale-posture checks)."""

from .explain import explain_str

__all__ = ["explain_str"]
