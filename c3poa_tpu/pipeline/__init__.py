from .segment import segment_read, Segments
from .run import PipelineConfig, run_pipeline
