"""Benchmark harness package (SURVEY.md section 7.2 item 8).

`protocol` holds the tunnel-hardened measurement primitives; the runnable
entry points are repo-root `bench.py` (driver headline) and
`scripts/bench_kernel.py` (parameterized kernel lab replacing the six
one-shot round-2 ablation scripts).
"""

from .protocol import (  # noqa: F401
    measure_rtt,
    time_fetch,
    time_inprogram,
    time_pipelined,
)
