"""Format BASELINE_MEASURED.json into the BASELINE.md tables."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    with open(os.path.join(REPO, "BASELINE_MEASURED.json")) as f:
        data = json.load(f)
    by_cfg = {}
    for rec in data.get("configs", []):
        if "error" in rec:
            continue
        by_cfg.setdefault(rec["config"], {})[rec["platform"]] = rec
    print("| config | sensor | TPU fps | CPU fps | TPU/CPU | ATE RMSE | extras |")
    print("|---|---|---|---|---|---|---|")
    for n in sorted(by_cfg):
        cell = by_cfg[n]
        tpu = cell.get("tpu", {})
        cpu = cell.get("cpu", {})
        ratio = (
            f"{tpu['fps'] / cpu['fps']:.1f}x"
            if tpu.get("fps") and cpu.get("fps")
            else "—"
        )
        extras = []
        for k in ("n_kf", "n_mp", "reloc_ok", "n_loops"):
            if k in tpu:
                extras.append(f"{k}={tpu[k]}")
        ate = tpu.get("ate_rmse", cpu.get("ate_rmse"))
        print(
            f"| {n}. {tpu.get('name', cpu.get('name', '?'))} "
            f"| {tpu.get('sensor', cpu.get('sensor', '?'))} "
            f"| {tpu.get('fps', float('nan')):.2f} "
            f"| {cpu.get('fps', float('nan')):.2f} "
            f"| {ratio} | {ate:.4f} m | {', '.join(extras)} |"
        )
    print()
    print("| virtual devices | wall s / solve | pts per device | final cost |")
    print("|---|---|---|---|")
    for rec in data.get("scaling", []):
        if "error" in rec:
            continue
        print(
            f"| {rec['n_devices']} | {rec['wall_s']:.2f} "
            f"| {rec['pts_per_device']} | {rec['final_cost']:.0f} |"
        )


if __name__ == "__main__":
    sys.exit(main())
