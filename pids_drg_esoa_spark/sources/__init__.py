from .tables import TABLES, table, tables, register_views  # noqa: F401
