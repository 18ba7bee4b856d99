from . import geometry, metrics, text  # noqa: F401
