"""Sequential hardware bench driver: all BASELINE configs in ONE process.

Chip-grant acquisition over the tunnel is a per-process lottery (tens of
seconds to minutes), so running each bench as its own process pays it
repeatedly; this driver imports the bench mains and runs them back to
back on one grant. Each section's output is prefixed so the combined log
splits cleanly. A hard watchdog bounds a wedged tunnel.

Usage: python -u benchmarks/run_all_hw.py [section ...] > file 2>&1
Sections (default all): bench quantics feynman integration rook pallas
"""

import os
import sys
import threading
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_wd = threading.Timer(
    3300.0, lambda: (print("WATCHDOG_EXIT", flush=True), os._exit(3))
)
_wd.daemon = True
_wd.start()


def section(name, fn):
    print(f"===== {name} =====", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"===== {name} FAILED =====", flush=True)
    else:
        print(f"===== {name} done =====", flush=True)


def main():
    want = sys.argv[1:] or [
        "bench", "quantics", "feynman", "integration", "rook", "fused",
        "pallas",
    ]
    from _common import setup_cache

    setup_cache()

    if "bench" in want:
        import bench as bench_mod  # repo-root bench.py

        section("config1_bench", bench_mod.main)
    if "quantics" in want:
        import bench_quantics

        section("config3_quantics", bench_quantics.main)
    if "feynman" in want:
        import bench_feynman

        section("config5_feynman", bench_feynman.main)
    if "integration" in want:
        import bench_integration

        section("config4_integration_device",
                lambda: bench_integration.main(jax_native=True))
    if "rook" in want:
        import bench_rook

        section("rook_vs_full", bench_rook.main)
    if "fused" in want:
        import bench_fused_tiers

        section("fused_tiers", bench_fused_tiers.main)
    if "pallas" in want:
        import probe_pallas_tiled

        section("pallas_tiled_probe", probe_pallas_tiled.main)
    print("ALL_SECTIONS_DONE", flush=True)


if __name__ == "__main__":
    main()
    os._exit(0)
