from . import geo, hashing, prices, text  # noqa: F401
