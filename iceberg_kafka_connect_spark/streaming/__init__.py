from .pipeline import SinkPipeline

__all__ = ["SinkPipeline"]
