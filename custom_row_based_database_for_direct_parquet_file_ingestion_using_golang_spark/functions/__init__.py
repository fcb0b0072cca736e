from .compat import (
    ref_like,
    dual_compare,
    truthy,
    try_num,
)

__all__ = ["ref_like", "dual_compare", "truthy", "try_num"]
