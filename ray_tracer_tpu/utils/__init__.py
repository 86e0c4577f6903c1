"""Utility subpackage."""
from .config import RenderParams
__all__ = ["RenderParams"]
