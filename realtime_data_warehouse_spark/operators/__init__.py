from . import agg, etl, joins, state  # noqa: F401
