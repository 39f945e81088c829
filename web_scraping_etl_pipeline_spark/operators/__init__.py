from .incremental import newer_than

__all__ = ["newer_than"]
