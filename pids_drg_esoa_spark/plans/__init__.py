from .catalog import QuerySpec, all_specs, queries, oracle_sql, register  # noqa: F401
