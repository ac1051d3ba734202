"""Gate helper: read one bench.py JSON line on stdin, compare against the
stored floors (scripts/perf_floor.json), exit 0 iff both hold.

The release gate (scripts/check.sh) pipes the full-bench output through
this so a throughput/MFU regression fails the gate mechanically instead of
being noticed a round later in the driver artifacts (VERDICT r3 weak #2).
"""
import json
import os
import sys


def main() -> int:
    line = sys.stdin.read().strip().splitlines()
    line = line[-1] if line else ""
    try:
        rec = json.loads(line)
    except (ValueError, IndexError):
        print(f"perf_floor: no bench JSON on stdin: {line[:200]!r}")
        return 1
    with open(os.path.join(os.path.dirname(__file__),
                           "perf_floor.json")) as f:
        floor = json.load(f)
    value = float(rec.get("value", 0.0))
    mfu = float(rec.get("mfu", 0.0))
    ok = (rec.get("unit") == "images/min"
          and value >= floor["min_images_per_min"]
          and mfu >= floor["min_mfu"])
    print(f"perf_floor: {value:.2f} img/min (floor "
          f"{floor['min_images_per_min']}), mfu {mfu:.3f} (floor "
          f"{floor['min_mfu']}) -> {'ok' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
