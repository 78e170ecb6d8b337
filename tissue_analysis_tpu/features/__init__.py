from tissue_analysis_tpu.features.table import FeatureTable  # noqa: F401
from tissue_analysis_tpu.features import finalize  # noqa: F401
