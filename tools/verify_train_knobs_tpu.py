"""TPU smoke for the batch-2 memory-knob stack — now a bench mode so the driver
captures the numerics gate alongside the perf numbers (VERDICT r4 #8):

    BENCH_KNOBS=1 python bench.py

This shim keeps the old invocation working.
"""
import os
import sys

os.environ["BENCH_KNOBS"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    import bench

    bench.main()
