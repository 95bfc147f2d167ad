"""Per-stage breakdown at the LIGHT series shapes (round-5, VERDICT r4
Weak #4 accounting): bench.py's stage breakdown runs only at heavy shapes;
this runs the identical in-graph timing at the light capacities so the
light-series regression vs round 2 can be attributed stage by stage.
Run on the TPU from /root/repo."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    cfg = bench.make_config(
        bench.LIGHT["max_raw_points"], bench.LIGHT["max_scan_points"]
    )
    seq = bench.make_sequence(bench.LIGHT["points_per_scan"])
    out = bench.run_series(cfg, seq)
    probe = out.pop("_probe")
    out.pop("_est_positions")
    print(json.dumps(out), flush=True)
    stages = bench.stage_breakdown(cfg, probe, lambda: 1e9)
    print(json.dumps({"light_stages_ms": stages}), flush=True)


if __name__ == "__main__":
    main()
