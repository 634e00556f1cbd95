from .io import (
    checkpointed_write,
    completed_partitions,
    load_manifest,
    read_table,
    write_table,
)

__all__ = [
    "checkpointed_write",
    "completed_partitions",
    "load_manifest",
    "read_table",
    "write_table",
]
