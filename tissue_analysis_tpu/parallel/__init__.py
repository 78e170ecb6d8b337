from tissue_analysis_tpu.parallel.sharded import (  # noqa: F401
    analyze_sharded,
    make_mesh,
    sharded_pipeline,
)
