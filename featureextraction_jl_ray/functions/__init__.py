from .hashing import stable_hash_array, bucket_of
from .veccol import list_column_to_numpy, numpy_to_fixed_list_column

__all__ = [
    "stable_hash_array",
    "bucket_of",
    "list_column_to_numpy",
    "numpy_to_fixed_list_column",
]
