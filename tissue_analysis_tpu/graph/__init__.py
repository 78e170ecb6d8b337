from tissue_analysis_tpu.graph.property_graph import (  # noqa: F401
    PropertyGraph,
    TemporalPropertyGraph,
)
from tissue_analysis_tpu.graph.from_image import (  # noqa: F401
    graph_from_image,
    graph_from_table,
)
from tissue_analysis_tpu.graph.temporal import (  # noqa: F401
    exist_relative_at_rank,
    relative_temporal_change,
    temporal_change,
)
