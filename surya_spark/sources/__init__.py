from . import files, json_sink  # noqa: F401
