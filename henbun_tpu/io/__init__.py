"""Native (C++) data path: out-of-core prefetching loader + streaming driver."""
from . import loader, streaming
from .loader import OutOfCoreLoader, write_dataset, read_columns
from .streaming import optimize_streaming
