#!/usr/bin/env python
"""Render the driver-round-5 BASELINE.md table from results_round6.json,
with a delta column vs the last full certified rows (driver r4 where
re-measured, driver r3 results_round5.json otherwise)."""
import json
from pathlib import Path

HERE = Path(__file__).resolve().parent

# Previous certified in-Mpix/s per config prefix: driver-round-4 table
# (BASELINE.md) where the row was re-measured that round, else the
# round-5-file (driver round 3) full run.
PREV = {
    "1:": 70127.4,      # r3 full run
    "1b:": 127405.0,    # r4
    "0:": 167586.0,     # r4 headline (BENCH_r04)
    "2:": 20764.0,      # r4
    "3a:": 65475.2,     # r3
    "3b:": 49562.0,     # r4
    "3c:": 82945.0,     # r4
    "3d:": 63869.2,     # r3
    "3e:": 145638.9,    # r3
    "4:": 108425.0,     # r4
    "5:": None,         # pyr/s handled below
    "5b:": None,
    "6:": 26900.0,      # r4 band 25.8-27.3
    "6b:": None,
    "7:": 58172.0,      # r4
    "7b:": None,
    "8:": 172000.0,     # r3/r4 strip
    "9:": 183282.0,     # r4
    "9b:": 42180.0,     # r4
    "9c:": 24637.0,     # r4
    "9d:": 76140.0,     # r4
}
PREV_PYR = {"5:": 246356.0, "5b:": None}


def main():
    rows = json.load(open(HERE / "results_round6.json"))
    print("| Config | ms/batch | in-Mpix/s | prev | change | exact |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        cfg = r["config"]
        key = cfg.split(" ")[0]
        exact = "✓" if r.get("bit_exact") else "FAIL"
        conf = r.get("confidence", "")
        if "pyr_s" in r or "pyramids_s" in r:
            val = r.get("pyr_s") or r.get("pyramids_s")
            prev = PREV_PYR.get(key)
            chg = f"{val/prev:.2f}×" if prev else "new"
            ms = r.get("ms_per_batch", r.get("ms", ""))
            print(f"| {cfg} | {ms} | **{val:,.0f} pyr/s** | "
                  f"{prev or '—'} | {chg} | {exact} {conf} |")
            continue
        val = r.get("in_mpix_s")
        ms = r.get("ms_per_batch", r.get("ms", ""))
        prev = PREV.get(key)
        chg = f"{val/prev:.2f}×" if prev and val else "new"
        pv = f"{prev:,.0f}" if prev else "—"
        print(f"| {cfg} | {ms} | **{val:,.0f}** | {pv} | {chg} | {exact} {conf} |")


if __name__ == "__main__":
    main()
