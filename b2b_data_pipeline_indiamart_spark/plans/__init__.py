from .queries import ORACLE, QUERIES, flagship  # noqa: F401
