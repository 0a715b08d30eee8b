from .numeric import davg, dsum
from .timeutils import anchored_bucket, bucket_trunc

__all__ = ["dsum", "davg", "bucket_trunc", "anchored_bucket"]
