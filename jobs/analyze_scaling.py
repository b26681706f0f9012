"""Derive per-stage hardware attribution from SCALING.json.

For a stage whose 4-core work splits into a CPU-scaling fraction (1-beta)
and a DRAM-bandwidth-bound fraction beta, the best ANY engine can measure on
this box going lo -> hi cores is

    eff(beta) = 1 / (R * ((1 - beta) / C + beta / M))

where R = core ratio (4), C = measured fixed-work CPU capacity ratio
(`hw_capacity_ratio`), and M = measured DRAM copy-bandwidth ratio
(`membw_ratio`). Inverting the measured stage efficiency gives the implied
beta — the fraction of the stage that is memory-streaming. beta in [0, 1]
means the stage is exactly explained by the box's two ceilings (i.e. the
ENGINE leaves nothing on the table); beta < 0 would mean super-hardware
scaling (noise), beta > 1 sub-bandwidth scaling (real engine overhead at
high cores: barriers, task scheduling, python worker startup — expected for
sub-second stages).

Usage: python jobs/analyze_scaling.py [SCALING.json path]
"""

from __future__ import annotations

import json
import sys


def implied_beta(eff: float, core_ratio: float, cpu_ratio: float, mem_ratio: float):
    if eff <= 0:
        return None
    inv = 1.0 / (core_ratio * eff)  # (1-b)/C + b/M
    denom = 1.0 / mem_ratio - 1.0 / cpu_ratio
    if denom == 0:
        return None
    return (inv - 1.0 / cpu_ratio) / denom


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    with open(path) as fh:
        d = json.load(fh)
    R = d.get("core_ratio", 4.0)
    C = d["hw_capacity_ratio"]
    M = d["membw_ratio"]
    print(f"core_ratio={R}  cpu_capacity_ratio={C}  membw_ratio={M}")
    print(f"{'stage':<14}{'lo_wall':>9}{'hi_wall':>9}{'eff_med':>9}{'eff_best':>9}"
          f"{'beta(med)':>11}{'beta(best)':>11}")
    import statistics

    per_stage = d.get("per_stage", {})

    def lo_wall(s: dict) -> float:
        # v4 format ships per-pair triples (same-window); older artifacts
        # shipped pooled medians. Prefer the certified pairs' median lo wall.
        if "per_pair" in s:
            walls = [pp["lo_wall"] for pp in s["per_pair"]
                     if pp.get("window_certified")] or [
                pp["lo_wall"] for pp in s["per_pair"]
            ]
            return statistics.median(walls)
        return s["lo_wall_median"]

    def hi_wall(s: dict) -> float:
        if "per_pair" in s:
            walls = [pp["hi_wall"] for pp in s["per_pair"]
                     if pp.get("window_certified")] or [
                pp["hi_wall"] for pp in s["per_pair"]
            ]
            return statistics.median(walls)
        return s["hi_wall_median"]

    def eff_median(s: dict) -> float:
        # ADVICE r4: the lo/hi wall columns already prefer certified pairs;
        # the efficiency/beta columns must too, or the beta-ceiling analysis
        # mixes certified walls with uncertified efficiencies.
        v = s.get("efficiency_median_certified")
        return v if v is not None else s["efficiency_median"]

    def eff_best(s: dict) -> float:
        v = s.get("efficiency_best_certified")
        return v if v is not None else s["efficiency_best"]

    lo_total = sum(lo_wall(s) for s in per_stage.values())
    for name, s in sorted(per_stage.items(), key=lambda kv: -lo_wall(kv[1])):
        bm = implied_beta(eff_median(s), R, C, M)
        bb = implied_beta(eff_best(s), R, C, M)
        fmt = lambda b: f"{b:.2f}" if b is not None else "-"
        print(f"{name:<14}{lo_wall(s):>9.1f}{hi_wall(s):>9.1f}"
              f"{eff_median(s):>9.2f}{eff_best(s):>9.2f}"
              f"{fmt(bm):>11}{fmt(bb):>11}")
    # weighted composite ceiling: what a PERFECT engine with the same
    # bandwidth mix would measure end-to-end on this box
    betas = {
        n: implied_beta(eff_best(s), R, C, M)
        for n, s in per_stage.items()
    }
    usable = {n: min(max(b, 0.0), 1.0) for n, b in betas.items() if b is not None}
    if usable and lo_total:
        # Two composites, both printed (ADVICE r3: the beta-derived one was
        # computed but never shown). Per-stage efficiencies weighted by
        # lo-wall share approximate end-to-end efficiency when stages are
        # serial (they are).
        beta_ceiling = sum(
            lo_wall(per_stage[n]) / lo_total
            / (R * ((1 - b) / C + b / M))
            for n, b in usable.items()
        )
        print(f"\nbeta-model composite ceiling (perfect engine, measured "
              f"CPU/membw mix): {beta_ceiling:.3f}")
        print(f"lo-wall-weighted composite of BEST stage efficiencies "
              f"(perfect-engine-on-this-box estimate): "
              f"{sum(lo_wall(per_stage[n])/lo_total * eff_best(per_stage[n]) for n in per_stage):.3f}")


if __name__ == "__main__":
    main()
