from .session import get_spark, stop_spark
from .salting import with_size_bucket, balance_by_size

__all__ = ["get_spark", "stop_spark", "with_size_bucket", "balance_by_size"]
