from .symbols import (
    BASE_ALIASES,
    COMMON_QUOTES,
    normalize_symbol_expr,
    normalize_symbol_py,
    normalize_symbol_udf,
)

__all__ = [
    "COMMON_QUOTES",
    "BASE_ALIASES",
    "normalize_symbol_py",
    "normalize_symbol_expr",
    "normalize_symbol_udf",
]
