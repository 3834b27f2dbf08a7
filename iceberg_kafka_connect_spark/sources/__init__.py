from .stream import file_stream_source, kafka_stream_source

__all__ = ["file_stream_source", "kafka_stream_source"]
