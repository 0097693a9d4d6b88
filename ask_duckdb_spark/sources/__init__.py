from .catalog import TABLES, load_table, register_views  # noqa: F401
from .display import display_result, result_preview  # noqa: F401
