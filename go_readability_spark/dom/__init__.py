from .node import (  # noqa: F401
    COMMENT,
    DOCUMENT,
    DOCTYPE,
    ELEMENT,
    TEXT,
    Node,
    body_element,
    class_and_id,
    class_name,
    create_element,
    create_text,
    document_element,
    get_attribute,
    get_elements_by_tag_name,
    has_attribute,
    iter_elements,
    node_id,
    remove_attribute,
    set_attribute,
    text_content,
)
from .builder import VOID_ELEMENTS, parse_html  # noqa: F401
from .node import unlink_tree  # noqa: F401
from .serialize import inner_html, outer_html, render  # noqa: F401
