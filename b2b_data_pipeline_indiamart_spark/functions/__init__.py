from . import geo, hashing, prices, rounding, text  # noqa: F401
