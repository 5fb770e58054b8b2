from . import cc, dedup, lsh, similarity  # noqa: F401
