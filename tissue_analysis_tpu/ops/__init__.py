from tissue_analysis_tpu.ops.segred import moment_sweep  # noqa: F401
from tissue_analysis_tpu.ops.stencil import pair_sweep  # noqa: F401
