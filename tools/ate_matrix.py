"""Heavy-series ATE attribution matrix (round-5, VERDICT r4 Weak #3).

Round 4 shipped heavy ATE 1.8 cm vs light 0.45 cm with no attribution.
This tool isolates the candidate terms one variable at a time on the real
chip, reusing bench.py's run_series (same warmup/timing discipline):

  base        shipped heavy shapes (32768 budget, adaptive rematch)
  exact       adaptive rematch OFF (reference re-match every iteration)
  budget48k   post-downsample budget 32768 -> 49152 (does the overflow
              drop path drive the error?)
  light       the light series for scale contrast (different workload:
              20k-pt sweeps in the same world)

Prints one JSON line per variant: {"variant", "scans_per_sec",
"ate_rmse_cm", "compile_s"}.  Run on the TPU from /root/repo:
    python tools/ate_matrix.py [variants...]
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (configures jax cache)


def run(name: str, cfg, points_per_scan: int) -> None:
    seq = bench.make_sequence(points_per_scan)
    out = bench.run_series(cfg, seq)
    out.pop("_probe", None)
    out.pop("_est_positions", None)
    out["variant"] = name
    print(json.dumps(out), flush=True)


def main() -> None:
    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    heavy_cfg = bench.make_config(
        bench.HEAVY["max_raw_points"], bench.HEAVY["max_scan_points"]
    )
    if on("base"):
        run("base", heavy_cfg, bench.HEAVY["points_per_scan"])
    if on("exact"):
        run(
            "exact",
            dataclasses.replace(heavy_cfg, icp_rematch_threshold=0.0),
            bench.HEAVY["points_per_scan"],
        )
    if on("budget48k"):
        run(
            "budget48k",
            dataclasses.replace(heavy_cfg, max_scan_points=49152),
            bench.HEAVY["points_per_scan"],
        )
    if on("heavy20k"):
        # heavy capacities, light point DENSITY: separates sweep density
        # from static capacity as the ATE driver (budget48k already showed
        # capacity is not it)
        run("heavy20k", heavy_cfg, bench.LIGHT["points_per_scan"])
    if on("exact20k"):
        run(
            "exact20k",
            dataclasses.replace(heavy_cfg, icp_rematch_threshold=0.0),
            bench.LIGHT["points_per_scan"],
        )
    if on("light"):
        light_cfg = bench.make_config(
            bench.LIGHT["max_raw_points"], bench.LIGHT["max_scan_points"]
        )
        run("light", light_cfg, bench.LIGHT["points_per_scan"])


if __name__ == "__main__":
    main()
