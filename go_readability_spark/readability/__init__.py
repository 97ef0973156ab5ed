from .check import check, check_document  # noqa: F401
from .parser import Article, Parser, from_document, from_reader  # noqa: F401
