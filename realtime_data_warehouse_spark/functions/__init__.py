from . import scalar  # noqa: F401
from .tokenize import tokenize, register_sql_functions  # noqa: F401
