from tissue_analysis_tpu.utils.timing import (  # noqa: F401
    Timings,
    collect,
    profile_trace,
    stage,
)
