from .convert import convert_documents, CONVERT_OUTPUT_SCHEMA

__all__ = ["convert_documents", "CONVERT_OUTPUT_SCHEMA"]
