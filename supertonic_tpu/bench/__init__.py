from .harness import (
    LONG_TEXT,
    MID_TEXT,
    SHORT_TEXT,
    BenchResult,
    bench_batch_throughput,
    bench_batch_sweep,
    bench_single,
    bench_single_ab,
    bench_single_matrix,
    link_fingerprint,
    time_synthesis,
)

__all__ = [
    "BenchResult",
    "LONG_TEXT",
    "MID_TEXT",
    "SHORT_TEXT",
    "bench_batch_throughput",
    "bench_batch_sweep",
    "link_fingerprint",
    "bench_single",
    "bench_single_ab",
    "bench_single_matrix",
    "time_synthesis",
]
