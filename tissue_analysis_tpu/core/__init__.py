from tissue_analysis_tpu.core.spatial_image import SpatialImage, imread, imsave  # noqa: F401
from tissue_analysis_tpu.core.stack import LabeledStack  # noqa: F401
