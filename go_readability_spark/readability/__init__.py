from .check import check, check_document  # noqa: F401
from .parser import (  # noqa: F401
    Article,
    Parser,
    from_document,
    from_reader,
    from_url,
)
