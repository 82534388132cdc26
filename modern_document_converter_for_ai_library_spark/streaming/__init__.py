from .convert_stream import convert_stream

__all__ = ["convert_stream"]
