from .tables import TABLES, events_as_trades, load_table

__all__ = ["TABLES", "load_table", "events_as_trades"]
