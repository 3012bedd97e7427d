from semtpu.pipeline.config import PipelineConfig
from semtpu.pipeline.run import Pipeline
