from .curate import curate_corpus  # noqa: F401
from .parallelism import ensure_scan_parallelism, session_parallelism  # noqa: F401
from .extract import (  # noqa: F401
    extract_pages,
    extract_record,
    make_extractor,
    run_extraction_job,
    run_extraction_job_atomic,
    with_salt,
)
from .schema import ARTICLES_SCHEMA, CHECKPOINT_SCHEMA, PAGES_SCHEMA  # noqa: F401
from .session import build_session, ship_package  # noqa: F401
