from . import (  # noqa: F401
    assemble,
    detection,
    layout,
    reading_order,
    recognition,
    slots,
    tables,
)
