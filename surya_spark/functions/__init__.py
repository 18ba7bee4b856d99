from . import geometry, text  # noqa: F401
