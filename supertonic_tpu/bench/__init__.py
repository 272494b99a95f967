from .harness import (
    LONG_TEXT,
    MID_TEXT,
    SHORT_TEXT,
    BenchResult,
    bench_batch_throughput,
    bench_single,
    bench_single_ab,
    time_synthesis,
)

__all__ = [
    "BenchResult",
    "LONG_TEXT",
    "MID_TEXT",
    "SHORT_TEXT",
    "bench_batch_throughput",
    "bench_single",
    "bench_single_ab",
    "time_synthesis",
]
