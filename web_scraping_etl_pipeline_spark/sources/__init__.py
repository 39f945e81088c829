from .star import load_table, load_all, ANCHOR_US, EVENTS_EPOCH_US

__all__ = ["load_table", "load_all", "ANCHOR_US", "EVENTS_EPOCH_US"]
