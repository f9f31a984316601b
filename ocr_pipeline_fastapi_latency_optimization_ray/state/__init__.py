from .lineage import (  # noqa: F401
    job_status,
    load_lineage,
    read_output,
    run_extraction_job,
)
